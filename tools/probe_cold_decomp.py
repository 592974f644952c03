"""Probe: decompose the bench's COLD lineage into construction vs
first execution, per heavy query.

`bench.py`'s cold number is "caches cleared, uncached plan
construction + first execution". Those are different costs with
different 100 TB meanings:

  * construction — Python/py4j plan building PLUS any eager
    construction-time driver work a query does by design (the tx
    pipeline persists its per-batch gates, dedup_groups runs its CC
    fixpoint loop of bounded Spark jobs, capstones localCheckpoint
    intermediate frames). On a long-running engine this is paid once
    per (session, input) — the plan cache's whole point — and in
    streaming shape it's per micro-batch driver work that overlaps
    the previous batch's execution.
  * first execution — the actual data pass at the target SF; the
    number that scales with data volume and executor count.

Separating them shows which lever matters where: a cold-total
regression that lives in construction is a driver/py4j/plan concern
(bounded, amortized), one that lives in execution is an engine-work
concern (scales with the corpus).

Usage: python tools/probe_cold_decomp.py [sf_dir] [query ...]
Defaults to the six heaviest cold queries from BENCH_r06.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.catalog import entries  # noqa: E402

DEFAULT = [
    "tx_denorm_orders",
    "training_mix",
    "curated_corpus",
    "denorm_orders",
    "dedup_groups",
    "dedup_minhash_lsh",
]


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)] or DEFAULT

    spark = get_spark("probe-cold-decomp")
    cat = entries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    print(f"{'query':24s} {'construct':>10s} {'first-exec':>10s} {'cold-total':>10s}  construct-share")
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        df = cat[name].fn.__wrapped__(spark, sf)
        t_con = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exe = time.time() - t0
        total = t_con + t_exe
        print(
            f"{name:24s} {t_con:9.2f}s {t_exe:9.2f}s {total:9.2f}s  {t_con / total:5.0%}"
        )
        # NOTE: catalog.release() would be a no-op here — __wrapped__
        # bypassed the plan cache, so nothing was registered under this
        # name; the blanket clearCache drops whatever the raw
        # construction pinned instead
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

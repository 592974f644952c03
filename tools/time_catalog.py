"""Time arbitrary catalog entries with the bench.py methodology.

Usage: python tools/time_catalog.py <query> [query ...]
       python tools/time_catalog.py --all

Per query: cold (caches cleared, uncached construction + first
execution to the noop sink) and warm (median of 3 steady-state runs
through the catalog plan cache, run 1 pays construction). Prints one
JSON line. Used for the r12 optimization round's per-entry sweeps —
bench.py only times the HEADLINE+EXTRA set.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.catalog import entries, release  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    cat = entries()
    names = sys.argv[1:]
    if names == ["--all"]:
        names = sorted(cat)
    # Capture the window-as-found load BEFORE session creation: the
    # heap pretouch burns ~100 s of 32-thread CPU during startup, which
    # would inflate a post-setup reading and mislabel an idle window as
    # loaded (the exact artifact bench.py's load_found/post_setup split
    # fixed). pretouch_conf is shared with bench.py so the two harness
    # entrypoints cannot drift.
    load0 = os.getloadavg()[0]
    from bench import prefault_python_workers, pretouch_conf

    spark = get_spark("time-catalog", extra_conf=pretouch_conf())
    prefault_python_workers(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    load_post_setup = os.getloadavg()[0]
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        e = cat[name]
        spark.catalog.clearCache()
        t0 = time.time()
        e.fn.__wrapped__(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        runs = []
        for _ in range(4):
            t0 = time.time()
            e.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        warm[name] = round(statistics.median(runs[1:]), 3)
        release(spark, name, SF_DIR)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "queries": warm,
                "queries_cold": cold,
                "total_warm": round(sum(warm.values()), 3),
                "loadavg_start": round(load0, 2),
                "loadavg_post_setup": round(load_post_setup, 2),
                "loadavg_end": round(os.getloadavg()[0], 2),
                "sf_dir": SF_DIR,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

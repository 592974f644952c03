"""Throughput/state-growth measurement for the incremental near-dup
detector: streams the documents table through IncrementalNearDup in
micro-batches and reports per-batch wall time, dup yield, and state
size — the evidence that per-batch cost tracks BATCH size (probe is an
equi-join into the band store), not accumulated corpus size.

Usage: python tools/stress_incremental_dedup.py [--bucketed N] [--seed M] [sf_dir] [n_batches]

``--bucketed N`` runs the external-bucketed-band-store layout
(bands_buckets=N): the probe join reads the store in place instead of
shuffling it each batch — the flat-wall claim measured under both
layouts.

``--seed M`` pre-folds M synthetic docs (the curation probe's
generator) into the store before streaming the sf batches — the
big-store regime where the bucketed layout's elided store-side
shuffle should beat the plain layout's per-batch store shuffle.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.streaming.incremental_dedup import (  # noqa: E402
    IncrementalNearDup,
)
from streaming_examples_spark.tables import load_table  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    buckets = None
    seed = 0
    if "--bucketed" in argv:
        i = argv.index("--bucketed")
        buckets = int(argv[i + 1])
        del argv[i : i + 2]
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    n_batches = int(argv[1]) if len(argv) > 1 else 10

    spark = get_spark("stress-incdedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    state = tempfile.mkdtemp(prefix="incdedup_")
    det = IncrementalNearDup(
        spark, os.path.join(state, "state"), threshold=0.7, bands_buckets=buckets
    )

    if seed:
        from tools.scale_probe_curation import synth_docs

        # seed ids offset past the sf corpus so they never collide
        big = synth_docs(spark, seed).select(
            (F.col("doc_id") + 10**9).alias("doc_id"), "text"
        )
        t0 = time.time()
        det.process_batch(big, -1).count()
        det.compact()  # one file set, the steady-state layout
        print(f"seeded {seed} docs into the store in {time.time() - t0:.1f}s", flush=True)

    total_dups = 0
    t_all = time.time()
    for b in range(n_batches):
        batch = docs.filter(F.pmod(F.col("doc_id"), n_batches) == b)
        t0 = time.time()
        rep = det.process_batch(batch, b)
        n = rep.count()
        dups = rep.filter("is_dup").count()
        total_dups += dups
        print(
            f"batch {b}: {n} docs, {dups} dups, {time.time() - t0:.2f}s",
            flush=True,
        )
    wall = time.time() - t_all
    sigs = spark.read.parquet(os.path.join(det.state_dir, "sigs"))
    print(
        f"total: {n_docs} docs in {wall:.1f}s ({n_docs / wall:.0f} docs/s), "
        f"{total_dups} dups, store={sigs.count()} canonicals"
    )
    if buckets:
        spark.sql(f"DROP TABLE IF EXISTS {det._bands_table}")
    shutil.rmtree(state, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

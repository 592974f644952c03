"""Recall-vs-cap probe for the LSH viral-bucket guard (`max_bucket_size`).

Question answered with measurements (SCALE_NOTES.md): what production
default caps boilerplate buckets WITHOUT losing legitimate near-dup
pairs? A band key shared by n docs contributes n²/2 candidate pairs, so
one viral template re-enters the all-pairs regime the banded equi-join
exists to avoid; the cap drops those buckets and the docs still pair
through their other, more selective bands — unless the docs are
near-identical boilerplate, in which case skipping them is the point.

Corpus = the scale probe's family-structured synthetic docs (clusters
of ≤8 near-dups — the legitimate signal) + a PLANTED viral template:
`40×mult` docs sharing one base text with ~2% word perturbation, the
"unsubscribe footer" shape that detonates uncapped LSH.

Per (multiplier, cap) the probe reports:
  * wall seconds for pair generation + exact verification;
  * legit_recall — capped pairs among non-viral ids vs the UNCAPPED
    run's non-viral pairs (must be 1.0 for any cap ≥ family size);
  * viral_pairs — intra-template pairs produced (the n²/2 term the cap
    is spending); uncapped this is ~(40·mult)²/2 · dup-rate.

An assertion enforces the headline claim: at the chosen production
default (256) legitimate recall is exactly 1.0 at every probed scale.

Usage: python tools/probe_bucket_cap.py [multipliers ...]   (default 1 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from tools.scale_probe_curation import BASE_DOCS, synth_docs  # noqa: E402

#: the defended production default (SCALE_NOTES table): comfortably
#: above real near-dup cluster sizes, far below viral-template fanout
PRODUCTION_CAP = 256

VIRAL_BASE = 10**9  # viral doc ids start here — disjoint from the corpus


def viral_docs(spark: SparkSession, n: int) -> DataFrame:
    """`n` copies of one boilerplate template, ~2% of word slots
    perturbed per copy — high-Jaccard near-identical docs that share
    most LSH band keys (every band bucket goes viral)."""
    words = [f"boiler{j}" for j in range(60)]
    base_arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
    return (
        spark.range(n)
        .select((F.col("id") + VIRAL_BASE).alias("doc_id"))
        .withColumn(
            "text",
            F.expr(
                "array_join(transform(sequence(1, 60), j -> "
                " IF(pmod(xxhash64('vmut', CAST(doc_id AS STRING), j), 50) = 0, "
                "    concat('noise', pmod(xxhash64('vn', CAST(doc_id AS STRING), j), 1000)), "
                f"   element_at({base_arr}, j))), ' ')"
            ),
        )
    )


def main() -> int:
    mults = [int(m) for m in sys.argv[1:]] or [1, 10]
    spark = get_spark("bucket-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'mult':>5} {'docs':>8} {'viral':>6} {'cap':>6} {'wall_s':>7} "
          f"{'pairs':>9} {'viral_pairs':>11} {'legit_recall':>12}")
    ok = True
    for mult in mults:
        n = BASE_DOCS * mult
        n_viral = 40 * mult
        corpus = (
            synth_docs(spark, n)
            .select("doc_id", "text")
            .unionByName(viral_docs(spark, n_viral))
            .localCheckpoint(eager=True)  # freeze: probe measures the operator
        )
        legit_uncapped: set | None = None
        for cap in (None, 64, PRODUCTION_CAP, 1024):
            t0 = time.time()
            # eager checkpoint = the timed region covers the whole pair
            # pipeline; counts below read materialized blocks (at 50×
            # the uncapped viral term is ~2M pairs — counted executor-
            # side, never collected)
            pairs = minhash_lsh_pairs(
                corpus, threshold=0.8, max_bucket_size=cap
            ).localCheckpoint(eager=True)
            wall = time.time() - t0
            n_pairs = pairs.count()
            n_viral_pairs = pairs.filter(F.col("d1") >= VIRAL_BASE).count()
            legit = {
                (r["d1"], r["d2"])
                for r in pairs.filter(F.col("d2") < VIRAL_BASE).collect()
                # bounded: non-viral pairs ≈ family pairs, O(corpus/8)
            }
            if cap is None:
                legit_uncapped = legit
                recall = 1.0
            else:
                recall = (
                    len(legit & legit_uncapped) / len(legit_uncapped)
                    if legit_uncapped
                    else 1.0
                )
                if cap == PRODUCTION_CAP and recall < 1.0:
                    ok = False
            print(
                f"{mult:>5} {n:>8} {n_viral:>6} {str(cap):>6} {wall:>7.1f} "
                f"{n_pairs:>9} {n_viral_pairs:>11} {recall:>12.4f}",
                flush=True,
            )
        corpus.unpersist()
    if not ok:
        print(f"FAIL: legit recall < 1.0 at production cap {PRODUCTION_CAP}")
        return 1
    print(f"OK: legit recall 1.0 at production cap {PRODUCTION_CAP} for all scales")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

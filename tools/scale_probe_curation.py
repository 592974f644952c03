"""Scaling probe for the dedup/curation capstones: dedup_groups and
curated_corpus at 1x / 10x / 50x the sf0.1 documents corpus.

The evidence this produces (recorded in SCALE_NOTES.md):

  * wall-time curve — throughput (docs/s) should be flat or RISING
    with corpus size (fixed per-stage costs amortizing); a bending
    curve means some stage is super-linear.
  * CC iterations-to-converge — must stay O(cluster diameter), i.e.
    roughly constant as the corpus grows (duplicate clusters get more
    numerous, not wider).
  * shuffle bytes — should scale ~linearly with the corpus (candidate
    generation is banded equi-join, never all-pairs).

The synthetic corpus is generated ON EXECUTORS with pure Catalyst
expressions (xxhash64-seeded word picks), no driver-side loop: docs
come in "families" (1-8 docs sharing a base text with per-doc word
perturbations — the near-dup clusters) over a 40-word vocabulary,
mirroring the testdata documents table's shape (~50-word docs, 20
sources). Deterministic in doc_id.

Usage: python tools/scale_probe_curation.py [multipliers ...]
       (default: 1 10 50; sf0.1 base = 5,000 docs)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.operators.curation import curated_corpus  # noqa: E402
from streaming_examples_spark.operators.dedup import dedup_groups  # noqa: E402

BASE_DOCS = 5_000  # sf0.1 documents row count

VOCAB = [
    "spark", "query", "batch", "line", "column", "order", "small", "sort",
    "vector", "part", "scan", "fast", "agg", "join", "shuffle", "plan",
    "stream", "state", "window", "hash", "merge", "index", "cache", "store",
    "read", "write", "group", "filter", "map", "reduce", "stage", "task",
    "node", "disk", "memory", "codec", "page", "block", "row", "span",
]


def synth_docs(spark: SparkSession, n_docs: int) -> DataFrame:
    """documents-shaped frame generated distributed: (doc_id, text,
    lang, source, n_chars). Near-dup structure: docs whose ids fall in
    the same family share a base text; ~15% of word slots are perturbed
    per non-canonical member, so same-family docs sit near Jaccard
    0.7-0.95 — the regime dedup_groups clusters at."""
    vocab_sql = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"
    fam_size = "(1 + pmod(xxhash64('fam', CAST(fam AS STRING)), 8))"
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        # family id: ids partition into runs of 8; within a run the
        # family keeps its first `fam_size` members, the rest are
        # singletons (their "family" is themselves)
        .withColumn("fam", F.expr("CAST(doc_id / 8 AS BIGINT)"))
        .withColumn(
            "base",
            F.expr(f"IF(pmod(doc_id, 8) < {fam_size}, fam * 8, doc_id)"),
        )
        .withColumn("n_words", F.expr("40 + pmod(xxhash64('len', CAST(base AS STRING)), 21)"))
        .withColumn(
            "text",
            F.expr(
                "array_join(transform(sequence(1, n_words), j -> "
                f"  IF(pmod(xxhash64('mut', CAST(doc_id AS STRING), j), 7) = 0"
                f"     AND base <> doc_id, "
                f"     element_at({vocab_sql}, 1 + CAST(pmod(xxhash64('alt', CAST(doc_id AS STRING), j), 40) AS INT)), "
                f"     element_at({vocab_sql}, 1 + CAST(pmod(xxhash64('w', CAST(base AS STRING), j), 40) AS INT)))"
                "), ' ')"
            ),
        )
        .select(
            "doc_id",
            "text",
            F.expr("element_at(array('en','de','fr','es'), 1 + CAST(pmod(xxhash64('lang', CAST(doc_id AS STRING)), 4) AS INT))").alias("lang"),
            F.expr("concat('src', pmod(xxhash64('src', CAST(doc_id AS STRING)), 20))").alias("source"),
            F.length("text").alias("n_chars"),
        )
    )


def _exec_summary(spark) -> dict:
    appid = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{appid}/stages?status=COMPLETE"
    try:
        stages = json.load(urllib.request.urlopen(url, timeout=10))
    except Exception:
        return {}
    return {
        "shuffle_write_mb": sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6,
        "shuffle_read_mb": sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6,
    }


def main() -> int:
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("scale-probe", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'mult':>5} {'docs':>9} {'op':<16} {'wall_s':>7} {'docs/s':>8} "
          f"{'cc_iters':>8} {'rounds_s':<22} {'d_shuf_w_mb':>11}")
    for mult in mults:
        n = BASE_DOCS * mult
        docs = synth_docs(spark, n).localCheckpoint(eager=True)  # freeze input; probe measures the operators, not the generator

        for op_name in ("dedup_groups", "curated_corpus"):
            before = _exec_summary(spark)
            stats: dict = {}
            t0 = time.time()
            if op_name == "dedup_groups":
                out = dedup_groups(docs, threshold=0.9, stats_out=stats)
            else:
                out = curated_corpus(docs, dedup_threshold=0.9, quota_k=50)
            out.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            after = _exec_summary(spark)
            d_shuf = (after.get("shuffle_write_mb", 0) - before.get("shuffle_write_mb", 0))
            print(
                f"{mult:>5} {n:>9} {op_name:<16} {wall:>7.1f} {n / wall:>8.0f} "
                f"{stats.get('iterations', '-'):>8} "
                f"{str(stats.get('round_wall_s', '-')):<22} {d_shuf:>11.1f}",
                flush=True,
            )
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

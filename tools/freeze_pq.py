"""Freeze the PQ / IVF-PQ index artifacts for the catalog oracles.

Trains the (deterministic, md5/id-seeded — no RNG) quantizer artifacts
on the sf0.01 embeddings fixture and writes them as Python literals to
``streaming_examples_spark/functions/pq_frozen.py``:

  * PQ_BOOKS          — plain-PQ codebooks (m=8 subspaces × 16
                        codewords × 8 dims)
  * IVF_PQ_CENTROIDS  — 16 coarse k-means centroids (dim 64)
  * IVF_PQ_BOOKS      — residual codebooks trained against the ROUNDED
                        centroids (so the frozen operator and its
                        oracle see self-consistent artifacts)

Every value is rounded to 6 decimals: short literals, and — because
repr() round-trips and both engines parse decimal strings to the
nearest double — Spark's F.lit() and DuckDB's SQL literal decode to
bit-identical doubles.

This is the production index lifecycle (train offline on a sample,
ship the artifact everywhere), which is also what makes the operators
SQL-expressible: with frozen books, encode + ADC is a pure expression
both engines can replay bit-for-bit.

Rerun only if the testdata or quantizer hyperparameters change:
    python tools/freeze_pq.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.tables import load_table  # noqa: E402

M, K_CODES, N_CENTROIDS, ITERS = 8, 16, 16, 3

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "streaming_examples_spark",
    "functions",
    "pq_frozen.py",
)


def r6_books(books):
    return [[[round(x, 6) for x in cw] for cw in book] for book in books]


def r6_cents(cents):
    return [[round(x, 6) for x in c] for c in cents]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("freeze_pq")
    emb = load_table(spark, sf_dir, "embeddings")

    from pyspark.sql import functions as F

    from streaming_examples_spark.functions.vectors import as_double
    from streaming_examples_spark.operators.similarity import (
        _l2_normalize,
        ivf_pq_train,
        kmeans_centroids,
        pq_codebooks,
    )

    pq_books = r6_books(
        pq_codebooks(emb, m=M, k_codes=K_CODES, iters=ITERS)
    )

    normed = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _l2_normalize(as_double(F.col("embedding"))).alias("nv"),
    )
    cents = r6_cents(
        kmeans_centroids(
            normed, k=N_CENTROIDS, iters=ITERS, vec_col="nv", id_col="neighbor_id"
        )
    )
    # residual books must train against the ROUNDED centroids the
    # frozen operator will subtract — otherwise artifact drift
    _, ivf_books = ivf_pq_train(
        emb, n_centroids=N_CENTROIDS, m=M, k_codes=K_CODES, iters=ITERS,
        centroids=cents,
    )
    ivf_books = r6_books(ivf_books)

    with open(OUT, "w") as f:
        f.write(
            '"""Frozen PQ / IVF-PQ index artifacts (generated — do not edit).\n'
            "\n"
            f"Trained by tools/freeze_pq.py on {os.path.basename(sf_dir)} embeddings\n"
            f"(m={M}, k_codes={K_CODES}, n_centroids={N_CENTROIDS}, iters={ITERS},\n"
            "deterministic id-ordered seeding, no RNG), values rounded to 6\n"
            "decimals so Spark literals and generated DuckDB SQL decode to\n"
            "bit-identical doubles. The catalog's ann_pq / ann_ivf_pq entries\n"
            "apply these like any pretrained index: the same artifact serves\n"
            "every scale factor; only the oracle hash gate depends on the\n"
            'training corpus.\n"""\n\n'
        )
        f.write(f"PQ_BOOKS = {pq_books!r}\n\n")
        f.write(f"IVF_PQ_CENTROIDS = {cents!r}\n\n")
        f.write(f"IVF_PQ_BOOKS = {ivf_books!r}\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

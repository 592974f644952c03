"""Probe: ANN recall-vs-cost across the family's tuning dials, at a
real SF, against the exact brute-force baseline.

The correctness gate proves each ANN operator computes exactly what
its algorithm says (bit-exact oracles); the pytest floors prove
recall is sane at sf0.001. What a deployer actually tunes is the
recall/cost trade-off: IVF ``n_probe``, LSH ``n_tables``, PQ's code
budget ``m``. This tool measures recall@k against
``brute_force_topk`` on the sf0.1 embeddings (2000 × 64) for a sweep
of each dial, alongside the cost driver:

  * IVF / IVF-PQ — fraction of corpus scanned per query is
    ``n_probe / n_centroids`` by construction (cells are ~equal);
  * LSH — measured mean candidate fraction per query (the bucket
    join's actual output size);
  * PQ — always scans the full corpus, but at ``m`` bytes/vector
    instead of ``4·dim``; its dial trades recall against code budget.

Output: one table per family, recall@10 + cost per dial value —
paste-ready for the SCALE_NOTES ops table. Deterministic end to end
(seeded centroids, hyperplane literals, no RNG).

Usage: python tools/probe_ann_recall.py [sf_dir] [--queries N] [--clustered]

``--clustered`` swaps the corpus for a synthetic CLUSTERED one (40
Gaussian clusters in 64-d, seeded numpy, same size) — the shape real
embedding corpora have. Run both and compare: the gap between the two
sweeps is how much the uniform testdata understates each index, which
is the evidence behind SCALE_NOTES calling the uniform curves a
floor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.functions.vectors import as_double  # noqa: E402
from streaming_examples_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_ann_topk,
    ivf_pq_ann_topk,
    lsh_ann_topk,
    lsh_table_buckets,
    pq_ann_topk,
)

K = 10


def _neighbor_sets(df) -> dict[int, set[int]]:
    # bounded collect: Q queries × K ranks
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(exact: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    per_q = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    return sum(per_q) / len(per_q)


def main() -> int:
    argv = list(sys.argv[1:])
    n_q = 50
    clustered = "--clustered" in argv
    if clustered:
        argv.remove("--clustered")
    if "--queries" in argv:
        i = argv.index("--queries")
        n_q = int(argv[i + 1])
        del argv[i : i + 2]  # flag AND value, so neither reads as sf_dir
    sf = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_spark("probe-ann-recall", shuffle_partitions=32)
    if clustered:
        # 40 Gaussian clusters in 64-d, unit-ish scale, seeded: the
        # shape real embedding corpora have (centers dominate, noise
        # sigma well under the inter-center distance)
        import numpy as np

        rng = np.random.RandomState(7)
        centers = rng.normal(0, 1.0, size=(40, 64))
        assign = rng.randint(0, 40, size=2000)
        vecs = centers[assign] + rng.normal(0, 0.15, size=(2000, 64))
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]]) for i in range(2000)],
            "vec_id long, embedding array<double>",
        )
        src = "clustered synthetic (40 centers, sigma 0.15)"
    else:
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        src = sf
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < n_q)
    print(f"corpus={n_corpus} queries={n_q} k={K}  ({src})")

    exact = _neighbor_sets(brute_force_topk(emb, queries, k=K))

    print("\nIVF (n_centroids=16; cost = n_probe/16 of corpus per query)")
    for n_probe in (1, 2, 4, 8):
        r = _recall(exact, _neighbor_sets(
            ivf_ann_topk(emb, queries, k=K, n_centroids=16, n_probe=n_probe)))
        print(f"  n_probe={n_probe}: recall@10={r:.3f}  scan_frac={n_probe / 16:.3f}")

    print("\nLSH (n_planes=4; cost = measured candidate fraction per query)")
    for n_tables in (2, 4, 8, 16):
        approx = _neighbor_sets(lsh_ann_topk(
            emb, queries, k=K, dim=64, n_planes=4, n_tables=n_tables))
        # measured cost: distinct (query, candidate) pairs out of the
        # bucket join, per query, over the corpus — candidates come
        # from the operator's OWN bucketing (lsh_table_buckets), so
        # recall and cost are guaranteed to describe the same index
        def bkts(col):
            return lsh_table_buckets(col, 64, 4, n_tables)

        c_b = emb.select(F.col("vec_id").alias("nid"),
                         F.posexplode(bkts(as_double(F.col("embedding")))).alias("tbl", "bkt"))
        q_b = queries.select(F.col("vec_id").alias("qid"),
                             F.posexplode(bkts(as_double(F.col("embedding")))).alias("tbl", "bkt"))
        n_cand = (c_b.join(q_b, ["tbl", "bkt"])
                  .filter(F.col("nid") != F.col("qid"))
                  .select("qid", "nid").distinct().count())
        frac = n_cand / (n_q * n_corpus)
        r = _recall(exact, approx)
        print(f"  n_tables={n_tables}: recall@10={r:.3f}  cand_frac={frac:.3f}")

    print("\nPQ (full scan at m bytes/vector vs 256 raw; k_codes=16)")
    for m in (4, 8, 16):
        r = _recall(exact, _neighbor_sets(
            pq_ann_topk(emb, queries, k=K, m=m, k_codes=16, iters=5)))
        print(f"  m={m}: recall@10={r:.3f}  bytes/vec={m} (raw 256)")
    for rr in (50, 100):
        r = _recall(exact, _neighbor_sets(
            pq_ann_topk(emb, queries, k=K, m=8, k_codes=16, iters=5, rerank=rr)))
        print(f"  m=8 +rerank{rr}: recall@10={r:.3f}  (+{rr} raw rows/query)")

    print("\nIVF-PQ (n_centroids=16, m=8; cost = n_probe/16 at 8 bytes/vec)")
    for n_probe in (2, 4, 8):
        r = _recall(exact, _neighbor_sets(
            ivf_pq_ann_topk(emb, queries, k=K, n_centroids=16, n_probe=n_probe,
                            m=8, k_codes=16, iters=3)))
        print(f"  n_probe={n_probe}: recall@10={r:.3f}  scan_frac={n_probe / 16:.3f}")
    r = _recall(exact, _neighbor_sets(
        ivf_pq_ann_topk(emb, queries, k=K, n_centroids=16, n_probe=4,
                        m=8, k_codes=16, iters=3, rerank=50)))
    print(f"  n_probe=4 +rerank50: recall@10={r:.3f}  (+50 raw rows/query)")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end corpus curation: the composition the individual
training-data operators exist for.

    raw documents
      → quality gate        (text.quality_scores composite filter)
      → near-dup removal    (dedup.dedup_groups, keep only canonicals)
      → split assignment    (sampling.split_assignment, content-addressed)
      → per-domain quota    (sampling.quota_sample on the survivors)
      → curated corpus

Every stage is deterministic and engine-portable, so the WHOLE pipeline
hash-matches a single composed DuckDB oracle — the strongest correctness
statement in the catalog: if any operator drifted, the composition would
too.

Scale shape: quality gate is map-only; dedup clustering runs on the
near-dup pair list (tiny vs corpus); split is map-only; quota is one
shuffle on the domain key. Semi joins against the (small) passing/canon
id-sets broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streaming_examples_spark.operators.dedup import dedup_groups
from streaming_examples_spark.operators.sampling import quota_sample, split_assignment
from streaming_examples_spark.operators.text import quality_scores


def curated_corpus(
    docs: DataFrame,
    *,
    dedup_threshold: float = 0.9,
    quota_k: int = 50,
) -> DataFrame:
    """One curated row per surviving document: (doc_id, source, split,
    rk). A cluster survives only through its canonical doc — a canonical
    failing quality drops its whole cluster (the conservative choice:
    near-dups of a low-quality doc are low-quality too)."""
    passing = quality_scores(docs).filter(F.col("passes_quality")).select("doc_id")
    canon = (
        dedup_groups(docs, threshold=dedup_threshold)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    survivors = (
        docs.join(F.broadcast(passing), "doc_id", "left_semi")
        .join(F.broadcast(canon), "doc_id", "left_semi")
    )
    with_split = split_assignment(survivors)
    return quota_sample(with_split, group_col="source", k=quota_k).select(
        "doc_id", "source", "split", "rk"
    )

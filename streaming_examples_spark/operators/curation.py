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
shuffle on the domain key. The passing/canon id-sets are O(corpus) —
a quality gate passes most documents — so the semi joins are plain
shuffle joins on doc_id; AQE may still broadcast them at small SF,
but nothing forces that at 100 TB.
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
    # no broadcast hints: both id-sets are O(corpus) in realistic
    # curation regimes (most docs pass quality; most docs are canonical)
    survivors = (
        docs.join(passing, "doc_id", "left_semi")
        .join(canon, "doc_id", "left_semi")
    )
    with_split = split_assignment(survivors)
    return quota_sample(with_split, group_col="source", k=quota_k).select(
        "doc_id", "source", "split", "rk"
    )


def training_mix(
    docs: DataFrame,
    *,
    capacity: int = 2048,
    n_shards: int = 8,
    alpha: float = 0.3,
    dedup_threshold: float = 0.9,
    quota_k: int = 50,
) -> DataFrame:
    """The last mile on top of :func:`curated_corpus`: take the curated
    TRAIN split and emit, per document, its packed-sequence slot and its
    source's temperature-smoothed sampling boost — i.e. everything a
    training reader needs: *which* sequence the doc lands in, *where*,
    and *how often* to sample its source.

      curated train docs → pack_sequences (sharded concat-and-chunk)
                         → mixture_weights (per-source boost), joined back

    Composition stays engine-portable end-to-end, so the whole thing
    hash-matches one composed DuckDB oracle (curation CTEs + window
    cumsum + temperature weights in a single SQL).

    Scale: the curated id-set is ≤ quota_k×#sources rows → broadcast
    semi-join; weights are #sources rows → broadcast; packing is the
    one per-shard window shuffle. Nothing scans the corpus more than
    the curation stages already do.
    """
    from streaming_examples_spark.operators.packing import (
        mixture_weights,
        pack_sequences,
    )

    # The selected train set feeds THREE consumers (packing, weights,
    # the join-back). Tokenize it ONCE into a narrow (doc_id, source,
    # n_tokens) frame and localCheckpoint that: every consumer then
    # reads the materialized rows instead of re-running the whole
    # curation lineage (quality gate + cluster tail + quota window) and
    # re-scanning the corpus per consumer — guide §2.4/§8 "decide on
    # small rows". The frame is quota-bounded (≤ quota_k × #sources ×
    # train share rows), so the checkpoint is tiny at ANY corpus scale;
    # blocks free on GC (the established localCheckpoint pattern here —
    # persist had no unpersist path and a self-join-rewrite cache-miss
    # risk). Measured at sf0.1: warm 2.0 s → 0.66 s, output
    # row-identical; corpus scans in the packing tail: 3 → 1.
    cur = (
        curated_corpus(docs, dedup_threshold=dedup_threshold, quota_k=quota_k)
        .filter(F.col("split") == "train")
        .select("doc_id")
    )
    sel = docs.join(F.broadcast(cur), "doc_id", "left_semi")
    sel_tok = sel.select(
        "doc_id",
        "source",
        # EXACTLY pack_sequences'/mixture_weights' default token count
        # (whitespace split), so tokens_col= below is output-identical
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    packed = pack_sequences(
        sel_tok, capacity=capacity, n_shards=n_shards, tokens_col="n_tokens"
    )
    weights = mixture_weights(sel_tok, alpha=alpha, tokens_col="n_tokens").select(
        "source", "boost"
    )
    return (
        packed.join(sel_tok.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(weights), "source")
        .select(
            "doc_id", "source", "shard", "n_tokens", "seq_id", "seq_offset", "boost"
        )
    )

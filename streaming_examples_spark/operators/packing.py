"""Sequence packing & corpus mixture weighting for LLM training prep.

The last mile of a training-data pipeline: turn a curated document
set into (a) fixed-capacity token sequences and (b) per-source
sampling weights for the data-mixture schedule.

  * ``pack_sequences``   — GPT-style concat-and-chunk packing: docs are
    laid end-to-end in a deterministic order and cut into sequences of
    ``capacity`` tokens. Packing is *sharded*: a global layout would
    need a single-partition running sum (a scale-killer), so docs are
    first routed to ``n_shards`` md5 shards and packed independently
    within each — exactly how production pipelines pack per output
    file. Parallelism = n_shards; one shuffle total.
  * ``mixture_weights``  — temperature-based source reweighting
    (multinomial alpha-smoothing, XLM-R style): q_s ∝ p_s^alpha over
    per-source token mass. One corpus aggregation, then two scalar
    totals broadcast-crossJoined back onto the per-source frame —
    output is one row per source, no single-partition window anywhere.

Both are deterministic (md5 routing, no RNG) so a SQL oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from streaming_examples_spark.operators.sampling import md5_bucket


def _round4(x):
    # portable midpoint rounding: floor(x*1e4 + 0.5)/1e4 matches DuckDB
    return F.floor(x * 10000 + F.lit(0.5)) / F.lit(10000.0)


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every doc a (shard, seq_id, seq_offset) slot in a
    concat-and-chunk packing of ``capacity`` tokens per sequence.

    Token count is the whitespace count (matching ``token_stats``);
    the running sum is a window partitioned BY SHARD — never a global
    single-partition window — ordered by doc_id for reproducibility.
    A doc whose span crosses a boundary belongs to the sequence its
    first token lands in (standard concat-and-chunk: reader chunks the
    shard stream, docs may straddle cuts).

    ``tokens_col`` — name of a precomputed token-count column; when
    set, ``text_col`` is ignored and no tokenization runs here. Lets a
    composed pipeline (``training_mix``) tokenize the corpus ONCE and
    feed the narrow (id, tokens) frame to several consumers instead of
    re-scanning the documents per consumer. Must equal the default
    whitespace count (``size(split(text, ' '))``) for identical output.
    """
    n_tokens = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " ")).cast("long")
    )
    shard = (md5_bucket(F.col(id_col)) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")  # the post-rename name; id_col no longer exists here
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(F.col(id_col).alias("doc_id"), shard, n_tokens.alias("n_tokens"))
        .withColumn("seq_id", F.floor(start / capacity).cast("long"))
        .withColumn("seq_offset", (start % capacity).cast("long"))
    )


def mixture_weights(
    docs: DataFrame,
    *,
    alpha: float = 0.3,
    source_col: str = "source",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-source mixture statistics and temperature-smoothed sampling
    weights: p_s = token share, q_s = p_s^alpha / Σ p_s^alpha, and
    boost = q_s/p_s (the up/down-sampling factor a reader applies).
    alpha<1 lifts low-resource sources — the XLM-R / mT5 recipe.

    ``tokens_col`` — precomputed token-count column (see
    :func:`pack_sequences`); when set no tokenization runs here.
    """
    tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " "))
    )
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).cast("long").alias("n_tokens"),
    )
    # The totals live on the POST-AGG frame (one row per source —
    # dozens of rows at any corpus size). Two tiny aggs + broadcast
    # crossJoins instead of an empty-partition window: same arithmetic
    # (p, then pow(p, alpha) — NOT the pow-quotient identity, which
    # differs in low bits), but no WindowExec single-partition path, so
    # logs stay free of "No Partition Defined" noise that is
    # indistinguishable from a real global-window bug. ReuseExchange
    # dedupes the per_source shuffle across the branches — documents is
    # still scanned once.
    tok_tot = per_source.agg(F.sum("n_tokens").alias("_tot_tokens"))
    with_p = per_source.crossJoin(F.broadcast(tok_tot)).withColumn(
        "_p", F.col("n_tokens") / F.col("_tot_tokens")
    )
    pa_tot = with_p.agg(F.sum(F.pow(F.col("_p"), alpha)).alias("_tot_pa"))
    q = F.pow(F.col("_p"), alpha) / F.col("_tot_pa")
    return with_p.crossJoin(F.broadcast(pa_tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        _round4(F.col("_p")).alias("p"),
        _round4(q).alias("q"),
        _round4(q / F.col("_p")).alias("boost"),
    )

"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language identification, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate) — JVM-side and
codegen'd; the per-doc cost is O(len) with no Python boundary, so the
operators scale linearly with corpus bytes.

The language-ID word lists are module constants; the DuckDB oracle
SQL is *generated from the same constants* (catalog_datapipe.py), so
both engines score identically by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from streaming_examples_spark.functions.hashing import minhash, word_shingles

#: tiny high-frequency marker words per language (demonstration
#: heuristic — swap for char-trigram profiles in production)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "fr": ("le", "la", "les", "et", "des", "une", "est"),
    "zh": ("的", "了", "是", "我", "不", "在", "他"),
}

STOPWORDS = LANG_MARKERS["en"] + ("for", "on", "with", "as", "at", "by", "it")


def token_stat_exprs(text: Column) -> list[Column]:
    words = F.split(text, " ")
    # BPE-ish: letter runs, digit runs, and single symbols as tokens
    # (RE2-compatible — no lookarounds — so the oracle matches exactly)
    bpe_ish = F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]"), 0)
    return [
        F.length(text).alias("n_chars"),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_unique_tokens"),
        F.size(bpe_ish).alias("n_bpe_tokens"),
        F.round(F.length(F.regexp_replace(text, r"\s", "")) / F.size(words), 4).alias(
            "avg_token_len"
        ),
    ]


def token_stats(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts and length stats per doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *token_stat_exprs(F.col(text_col))
    )


def quality_score_exprs(text: Column, *, with_n_chars: bool = True) -> list[Column]:
    words = F.split(F.lower(text), " ")
    n_words = F.size(words)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return ([n_chars.alias("n_chars")] if with_n_chars else []) + [
        n_words.alias("n_words"),
        F.round(n_stop / n_words, 4).alias("stopword_ratio"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round(F.size(F.array_distinct(words)) / n_words, 4).alias("unique_ratio"),
        # composite gate: long enough, not punctuation soup, not repetitive
        (
            (n_words >= 10)
            & (n_punct / n_chars < 0.2)
            & (F.size(F.array_distinct(words)) / n_words > 0.1)
        ).alias("passes_quality"),
    ]


def quality_scores(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: length, punctuation density, stopword
    ratio, repetition (unique/total tokens) — the classic pre-training
    quality filters."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *quality_score_exprs(F.col(text_col))
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    words = F.split(F.lower(text), " ")
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        out.append((lang, F.size(F.filter(words, lambda w: F.array_contains(arr, w)))))
    return out


def lang_id_exprs(text: Column) -> list[Column]:
    scores = lang_scores(text)
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed so that on ties the alphabetically-first language wins
    for lang, score in reversed(scores):
        pred = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    return [pred.alias("pred_lang"), best_score.alias("marker_hits")]


def lang_id(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts,
    alphabetical-first tie-break, 'und' (undetermined) when all zero."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *lang_id_exprs(F.col(text_col))
    )


def normalize_text(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical cleaning pass: lowercase, strip punctuation, collapse
    whitespace, trim — the normalization stage that precedes dedup /
    tokenization in a training pipeline."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *normalize_exprs(F.col(text_col))
    )


def normalize_exprs(text: Column) -> list[Column]:
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^\w\s]", " "), r"\s+", " "
        )
    )
    return [
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_chars"),
        (F.length(text) - F.length(cleaned)).alias("chars_removed"),
    ]


def fingerprint_exprs(text: Column, *, shingles_name: str = "n_shingles") -> list[Column]:
    sh = word_shingles(text, 3)
    return [
        F.when(F.size(sh) > 0, minhash(sh, "fp_")).otherwise(F.lit(None)).alias("fp"),
        F.size(sh).alias(shingles_name),
    ]


def fingerprint(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shingle fingerprint: md5-MinHash over 3-word shingles (a
    compact rolling-hash-style document signature, engine-portable)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *fingerprint_exprs(F.col(text_col))
    )


def text_profile(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    balance_partitions: int | None = None,
) -> DataFrame:
    """Fused doc-grain profile of the five map-only text operators
    (token stats, quality, language ID, normalization, fingerprint) in
    ONE projection over ONE corpus scan, left-joined with the
    shingle-grain repetition aggregate (left: docs under 3 words emit
    no repetition row).

    Same output as joining the six standalone operators on doc_id, but
    1 scan + 1 aggregate + 1 join instead of 6 scans + 5 joins — at
    corpus scale the difference is five full corpus reads and five
    doc-grain shuffles. The standalone operators stay the unit of
    reuse; this is the composition a profiling pass should run.

    ``balance_partitions``: the projection's regex/shingle work runs
    inside the scan tasks, so its parallelism IS the scan's. A corpus
    of normal-sized parquet (row groups ≲ maxPartitionBytes) scans
    wide and needs nothing here — leave None; a single-row-group file
    (the local test fixtures) plans ONE scan task and serializes the
    whole profile, so pass the core count to spread the rows first
    (one tiny shuffle ≪ the expression work it parallelizes).

    The balance shuffle is keyed by HASH OF ``id_col``, not
    round-robin: the repetition branch's two aggregations group by
    (doc_id, shingle) and doc_id, and the final join is on doc_id —
    all satisfied by hashpartitioning(doc_id), so the exploded
    shingle rows (≈ k× the corpus tokens) never cross the network and
    the whole profile runs off ONE exchange (guide §2.4; measured at
    sf0.1: 6 exchanges → 2, warm 1.1 s → 0.65 s, output identical).
    doc_id cardinality ≫ partitions, so the hash spreads as evenly as
    round-robin for any non-degenerate corpus.
    """
    if balance_partitions:
        docs = docs.repartition(balance_partitions, F.col(id_col))
    text = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *token_stat_exprs(text),
        # n_chars already emitted by the token exprs (same definition)
        *quality_score_exprs(text, with_n_chars=False),
        *lang_id_exprs(text),
        *normalize_exprs(text),
        *fingerprint_exprs(text, shingles_name="fp_shingles"),
    )
    rep = repetition_score(docs, text_col=text_col, id_col=id_col).select(
        "doc_id",
        F.col("n_shingles").alias("rep_shingles"),
        "dup_frac",
        "top_shingle_frac",
    )
    return base.join(rep, "doc_id", "left")


def tfidf_top_terms(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    Two aggregations (term frequency per doc, document frequency per
    term) + a broadcast join of the vocabulary frame — the vocabulary
    is tiny relative to the corpus, so the scoring join is shuffle-free
    at any corpus size. IDF uses the smoothed form
    ``ln((1 + N) / (1 + df)) + 1`` (never divides by zero, never goes
    negative). Ranking is a per-doc window on the scored frame;
    deterministic tiebreak on the term itself.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + F.lit(1.0)),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", F.round("tfidf", 4).alias("tfidf"))
    )


def ngram_doc_freq(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3, top: int = 100
) -> DataFrame:
    """Corpus-wide k-gram document frequency, top-``top`` grams — the
    boilerplate/contamination detector (grams present in many docs are
    headers, licenses, templates). Shingles are distinct per doc, so
    the count IS document frequency. Global top-k goes through
    sort+limit (TakeOrderedAndProject: per-partition heads merged on
    the driver, no single-task global window); the (n_docs, gram) total
    order makes the selected set deterministic."""
    g = docs.select(F.explode(word_shingles(F.col(text_col), k)).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "gram")
        .limit(top)
    )


#: PII redaction patterns — RE2-safe, Java/RE2-identical (plain char
#: classes, no lookarounds) so the DuckDB oracle matches byte-for-byte
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
}


def scrub_pii(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction for training corpora: replace emails / phone
    numbers / IPv4s with typed placeholders and count redactions per
    category. Pure ``regexp_replace``/``regexp_extract_all`` chain —
    map-only, no shuffle, O(bytes); the pattern order matters (emails
    are scrubbed before IPs so a host part can't double-match).
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, (pat, repl) in PII_PATTERNS.items():
        # count on the text AS THIS PATTERN SEES IT (post prior
        # replacements), so counts equal actual redactions even when
        # patterns overlap (an IP inside an email host is not counted —
        # the email rule already consumed it)
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("scrubbed"),
        *counts,
    )


def repetition_score(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Gopher-style repetition metrics per document: the fraction of
    duplicated k-word shingles (1 − distinct/total) and the share of
    the single most repeated shingle. High values flag boilerplate,
    keyword stuffing, and degenerate generations.

    Shape: explode ALL shingle occurrences (not the distinct set the
    dedup ops use) → one shuffle on (doc, shingle) for the frequency
    table → per-doc aggregate. Docs shorter than k words are excluded
    (no shingles to score).
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(words)
    all_shingles = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    ex = (
        docs.filter(n >= k)
        .select(F.col(id_col).alias("doc_id"), F.explode(all_shingles).alias("g"))
    )
    freq = ex.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    r4 = lambda x: F.floor(x * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_shingles"),
        r4(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_frac"),
        r4(F.max("c") / F.sum("c")).alias("top_shingle_frac"),
    )

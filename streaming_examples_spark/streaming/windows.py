"""Streaming windowed aggregations with event-time watermarks.

The reference handles late/idle data with custom watermarks; the
Spark-native form is ``withWatermark`` + ``window``/``session_window``
aggregation (SURVEY.md §1 mapping). These builders work on streaming
DataFrames; on batch frames the same expressions compute the final
(complete) answer, which is how the oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_minutes: int = 60,
    watermark_minutes: int = 30,
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per key with a late-data watermark.

    On a stream: late events beyond the watermark are dropped and
    windows finalize (append mode). On a batch frame: the complete
    aggregation (watermark is a no-op) — identical output for on-time
    data, which the tests exploit.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return (
        src.groupBy(
            F.window(F.col(ts_col), f"{window_minutes} minutes").alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    key_col: str = "user_id",
    watermark_minutes: int = 60,
) -> DataFrame:
    """True streaming session windows (`session_window`) — the
    streaming twin of operators/windows.sessionize."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            key_col,
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay_minutes: int = 30,
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state size tracks the delay
    window instead of the whole stream — the only viable exact-dedup
    shape on an unbounded 100 TB/day feed. On a batch frame this is
    plain ``dropDuplicates`` (complete, unbounded-state answer).
    """
    keys = keys or ["event_type", "user_id", ts_col]
    if events.isStreaming:
        return events.withWatermark(ts_col, f"{delay_minutes} minutes").dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)

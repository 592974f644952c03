"""Window-function operators: upsert materialization, fill-forward,
ranking, sessionization.

Covers SURVEY.md §2.4 A3 (last-value-per-key — the upsert-table
semantics of TxAwareTwoInputNonBroadcastJoinProcessOperator.java:
369-430 and the upsert-kafka connector, KafkaUpsertJob.java:23-38)
and §2.5 W1 (LAST_VALUE ... OVER fill-forward — SqlOverAggJob.java:
109-135), plus ranking/lag and gaps-and-islands sessionization (the
batch shape of a streaming session window).

Scale notes: every operator here is one hash shuffle on the partition
key followed by an in-partition sort — the canonical window plan.
``latest_per_key`` deliberately uses ``max_by`` (a plain aggregate,
map-side combinable) instead of row_number-over-window: an aggregate
does partial aggregation before the shuffle, a window function cannot.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Column,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Upsert-table materialization: latest row per key by a version
    column (LSN in the reference; (ts, event_id) on testdata).

    ``max_by(struct(values), struct(order, tiebreak))`` — a single
    aggregate with map-side combine: at 100 TB this shuffles one
    pre-reduced row per (key, map partition), not every row, which a
    row_number() window would.
    """
    order_expr = F.col(order_col) if isinstance(order_col, str) else order_col
    version = (
        F.struct(order_expr.alias("v0"), F.col(tiebreak_col).alias("v1"))
        if tiebreak_col
        else order_expr
    )
    picked = F.max_by(F.struct(*[F.col(c).alias(c) for c in value_cols]), version)
    out = df.groupBy(*key_cols).agg(picked.alias("_latest"))
    return out.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in value_cols])


def fill_forward(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    target: Column,
    out_name: str,
) -> DataFrame:
    """Per-key fill-forward of the last non-null value — the batch
    idiom of the reference's TOAST backfill (W1: ``LAST_VALUE(...)
    OVER (PARTITION BY id ORDER BY ...)`` SqlOverAggJob.java:120-126).

    ``last(..., ignorenulls=True)`` over an unbounded-preceding frame.
    One shuffle on the key + in-partition sort; no state, no UDF.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_name, F.last(target, ignorenulls=True).over(w))


def fill_forward_range(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    target: Column,
    out_name: str,
    *,
    days: int = 30,
) -> DataFrame:
    """The reference's exact W1 frame: ``LAST_VALUE(...) OVER
    (PARTITION BY id ORDER BY ts RANGE BETWEEN INTERVAL '30' DAY
    PRECEDING AND CURRENT ROW)`` (SqlOverAggJob.java:120-126) — the
    fill-forward expires after ``days`` of silence.

    ``rangeBetween`` needs a numeric ordering column → order on the
    epoch-seconds cast of the timestamp.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).cast("double"))
        .rangeBetween(-days * 86400, 0)
    )
    return df.withColumn(out_name, F.last(target, ignorenulls=True).over(w))


def event_ranks(events: DataFrame) -> DataFrame:
    """Ranking + lag analytics per user: sequence number, previous
    value delta, running total. One window spec → one shuffle+sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("seq"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias(
            "value_delta"
        ),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_value"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    The batch twin of a Structured Streaming
    ``session_window``-ed aggregation; lag + conditional cumulative
    sum over one window spec (single shuffle on the key).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    gap_sec = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    with_id = events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        with_id.groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            # floor(x*100+0.5)/100, not round(x, 2): thousands of small
            # per-session sums land on .xx5 midpoints where Spark's
            # BigDecimal HALF_UP and other engines' rounding disagree;
            # the floor form is pure IEEE ops, portable bit-for-bit.
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / F.lit(100.0)).alias(
                "session_value"
            ),
        )
        .withColumn(
            "duration_sec",
            F.round(
                F.col("session_end").cast("double") - F.col("session_start").cast("double"),
                3,
            ),
        )
    )

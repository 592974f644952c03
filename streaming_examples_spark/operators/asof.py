"""As-of and range joins — operators Spark lacks natively.

The tx pipeline's "latest version ≤ commit LSN" scans are an as-of
join; this module exposes the general operator (the time-series /
feature-lookup staple: for each left row, the latest right row at or
before it, per key).

Formulation matters at scale. The naive
``left.join(right, key ∧ r.ts ≤ l.ts)`` + max_by explodes to
|left| × |right-per-key| intermediate rows. The union formulation
used here is one shuffle + one in-partition sort, O(n log n), no pair
blowup:

    tag left/right → union → window last(right cols, ignorenulls)
    over (key ORDER BY ts, side) → keep left rows.

Right rows sort before left rows at equal timestamps (side ordering),
so ties resolve to "at or before" semantics, matching DuckDB's
``ASOF JOIN`` which the oracle uses.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right_ts <= left_ts`` per ``on`` key (nulls when none).

    Returns all left columns plus ``<col><suffix>`` for each of
    ``right_cols``.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    # one struct carries ALL right columns so the fill takes them from a
    # single right row — per-column last(ignorenulls) would mix columns
    # from different right rows whenever the latest row has NULLs
    r_struct_type = T.StructType([right.schema[c] for c in right_cols])
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_rf"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_rf.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    range_seconds: float,
) -> DataFrame:
    """Band/range join: pairs with |left_ts − right_ts| ≤ range.

    Bucketized: both sides land in ``range_seconds``-wide time buckets;
    a pair within range is in the same or adjacent bucket, so the
    cross product shrinks to an equi-join on (key, bucket) with the
    exact predicate as post-filter — the standard interval-join plan
    Spark's optimizer does not synthesize on its own.
    """
    bucket = lambda ts: F.floor(F.col(ts).cast("double") / range_seconds)  # noqa: E731
    l_b = left.withColumn(
        "_bkt", F.explode(F.array(bucket(left_ts) - 1, bucket(left_ts), bucket(left_ts) + 1))
    )
    r_b = right.withColumn("_bkt", bucket(right_ts))
    joined = l_b.join(r_b, [*on, "_bkt"])
    in_range = (
        F.abs(F.col(left_ts).cast("double") - F.col(right_ts).cast("double"))
        <= range_seconds
    )
    return joined.filter(in_range).drop("_bkt")

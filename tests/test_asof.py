"""As-of and range join operator tests (edge cases beyond the oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_examples_spark.operators.asof import asof_join, range_join_buckets


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (2, 50, 5.0)],
        "k long, ts long, lval double",
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 150, "b"), (1, 300, "c")],
        "k long, ts long, rval string",
    )
    out = {
        (r["k"], r["ts"]): r["rval_asof"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rval"]
        ).collect()
    }
    assert out[(1, 100)] == "a"   # latest at-or-before 100
    assert out[(1, 200)] == "b"   # 300 is in the future
    assert out[(2, 50)] is None   # no right rows for key → null


def test_asof_equal_timestamp_inclusive(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame([(1, 100, "exact")], "k long, ts long, rval string")
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rval"]
    ).first()
    assert row["rval_asof"] == "exact"  # ties are at-or-BEFORE


def test_asof_null_in_latest_right_row_not_mixed(spark):
    # latest qualifying right row has NULL in one column: the output must
    # take that NULL, never splice the column from an older right row
    left = spark.createDataFrame([(1, 200)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, "old", 1.0), (1, 150, None, 2.0)],
        "k long, ts long, a string, b double",
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["a", "b"]
    ).first()
    assert row["b_asof"] == 2.0
    assert row["a_asof"] is None  # from the ts=150 row, not "old" from ts=100


def test_asof_row_count_preserved(spark, tables):
    ev = tables["events"]
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", right_cols=["value"]
    )
    assert out.count() == left.count()  # left join: every left row exactly once


def test_range_join_matches_naive(spark, tables):
    ev = tables["events"].limit(400)
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"), "user_id", F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("user_id"), F.col("ts").alias("b_ts")
    )
    fast = range_join_buckets(
        a, b, on=["user_id"], left_ts="a_ts", right_ts="b_ts", range_seconds=1800.0
    ).select("a_id", "b_id")
    naive = (
        a.join(b, "user_id")
        .filter(F.abs(F.col("a_ts").cast("double") - F.col("b_ts").cast("double")) <= 1800.0)
        .select("a_id", "b_id")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0

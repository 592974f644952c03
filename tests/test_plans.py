"""Physical-plan assertions: the scale-critical plan properties the
operators were designed around must actually hold (a regression here
is a 10× slowdown at 100 TB, invisible at test SF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_examples_spark.operators.analytics import (
    pricing_summary,
    regional_revenue,
    top_customers,
)
from streaming_examples_spark.operators.denormalize import denormalize_orders_lineitem
from streaming_examples_spark.operators.windows import latest_per_key
from streaming_examples_spark.plans.inspect import (
    count_occurrences,
    exchange_count,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
    read_schemas,
)


def test_pricing_summary_pushdown_and_pruning(tables):
    df = pricing_summary(tables["lineitem"])
    # filter reaches the parquet scan
    assert any("IsNotNull(l_shipdate)" in f or "l_shipdate" in f for f in pushed_filters(df))
    # scan reads only referenced columns, not all 16
    schemas = read_schemas(df)
    assert schemas, "no parquet scan found"
    cols = schemas[0].split(",")
    assert len(cols) <= 7
    assert not any("l_orderkey" in c for c in cols)


def test_regional_revenue_broadcasts_dims(tables):
    df = regional_revenue(
        tables["region"], tables["nation"], tables["customer"],
        tables["orders"], tables["lineitem"],
    )
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    # dims broadcast → only the fact-fact join shuffles: ≤3 hash
    # exchanges (two join inputs + final agg; AQE may coalesce)
    assert exchange_count(df) <= 3


def test_topk_uses_take_ordered(tables):
    from streaming_examples_spark.plans.inspect import node_count

    df = top_customers(tables["customer"], tables["orders"], tables["lineitem"], n=20)
    assert node_count(df, "TakeOrderedAndProject") == 1  # never a global sort
    assert node_count(df, "Sort") == 0


def test_denormalize_single_shuffle_reuse(tables):
    df = denormalize_orders_lineitem(tables["orders"], tables["lineitem"])
    # join and groupBy share the order-key partitioning: one exchange
    # per side, none between join and aggregate
    assert exchange_count(df) <= 2
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_latest_per_key_is_aggregate_not_window(tables):
    df = latest_per_key(
        tables["events"].select("user_id", "event_type", "value", "event_id"),
        key_cols=["user_id"],
        order_col="event_id",
        value_cols=["event_type", "value"],
    )
    plan = formatted_plan(df)
    # max_by compiles to partial+final aggregate (map-side combine);
    # a window implementation would show Window + full-row shuffle
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_projection_prunes_unused_columns(tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    schemas = read_schemas(df)
    assert schemas and len(schemas[0].split(",")) == 2

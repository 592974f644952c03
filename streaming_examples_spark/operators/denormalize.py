"""Order denormalization — the reference's north-star query.

Reference: transactional-cdc-processing/transactional-cdc-processing-poc.md:14-27

    SELECT po.id, po.order_date, po.purchaser_id,
           ARRAY_AGG(ROW(ol.id, ol.product_id, ol.quantity, ol.price))
    FROM purchase_orders po
    LEFT JOIN order_lines ol ON ol.order_id = po.id
    GROUP BY po.id, po.order_date, po.purchaser_id;

Spark-first shape: LEFT JOIN + ``collect_list(struct(...))``. The join
and the aggregation share the same key (order id), so Catalyst reuses
one hash partitioning: a single shuffle of each side on the key, then
join + partial/final aggregate colocated — no second exchange. At
100 TB both sides are fact-sized, which is exactly the shuffled-HASH
join regime: the orders side is one narrow row per key, so a
partition of it hashes in bounded memory, and skipping sort-merge's
two per-partition sorts measured 2.4× faster (1.69 s → 0.71 s at
sf0.1 steady state). The hint builds on the orders side; AQE skew
splitting applies to shuffled hash joins the same as to sort-merge.

``collect_list`` is order-insensitive (the reference's golden tests
also compare leniently — PurchaseOrderJoinerIT.java:575-582); we
``array_sort`` by line number for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def denormalize(
    orders: DataFrame,
    lines: DataFrame,
    *,
    order_key: str,
    line_order_key: str,
    order_cols: list[str],
    line_cols: list[str],
    lines_alias: str = "lines",
) -> DataFrame:
    """orders ⟕ lines → one row per order with ``lines`` array<struct>.

    An order with zero lines still appears, with an empty array (LEFT
    JOIN target semantics, poc.md:235-237).
    """
    joined = orders.hint("SHUFFLE_HASH").join(
        lines, orders[order_key] == lines[line_order_key], "left"
    )
    line_struct: Column = F.struct(*[lines[c].alias(c) for c in line_cols])
    agg = (
        joined.groupBy(*[orders[c].alias(c) for c in order_cols])
        .agg(
            F.array_sort(
                # filter() drops the all-null struct produced by an
                # unmatched LEFT JOIN row → empty array, not [null-struct]
                F.filter(
                    F.collect_list(
                        F.when(lines[line_order_key].isNotNull(), line_struct)
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias(lines_alias)
        )
    )
    return agg


def denormalize_orders_lineitem(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The north-star query bound to the testdata schema
    (orders/lineitem play purchase_orders/order_lines — FIXTURES.md §4)."""
    return denormalize(
        orders,
        lineitem,
        order_key="o_orderkey",
        line_order_key="l_orderkey",
        order_cols=["o_orderkey", "o_orderdate", "o_custkey"],
        line_cols=["l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"],
    )


def denormalize_orders_serialized(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Hash-checkable serialization of the nested north-star output.

    The driver's value-hash canonicalizer cannot hash an
    ``array<struct>`` column, so the nested ``denorm_orders`` entry is
    rows-only. This twin proves the *values* of the nested doc: each
    line struct is rendered to a portable string (ints verbatim, money
    as integer cents via ``floor(x*100+0.5)`` — pure IEEE, identical in
    every engine) and the sorted array is joined with ``|``. Any
    discrepancy in the array contents, order, or per-line values flips
    the hash. JSON rendering is deliberately avoided: engines disagree
    on float formatting ("5.0" vs "5"), integer-cent strings do not.

    Same single-shuffle join+agg plan as the nested form; the
    serialization is a map-side ``transform``/``array_join`` over the
    already-aggregated array.
    """
    nested = denormalize_orders_lineitem(orders, lineitem)
    line_str = lambda x: F.concat_ws(  # noqa: E731
        ",",
        x["l_linenumber"].cast("string"),
        x["l_partkey"].cast("string"),
        F.floor(x["l_quantity"] * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.floor(x["l_extendedprice"] * 100 + F.lit(0.5)).cast("long").cast("string"),
    )
    return nested.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_custkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.array_join(F.transform("lines", line_str), "|").alias("lines_ser"),
    )


def denormalize_flat_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Hash-checkable flat companion of the nested doc: per-order line
    count + quantity/price sums. Same join+agg plan, scalar output."""
    joined = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "left")
    return (
        joined.groupBy(
            orders["o_orderkey"].alias("o_orderkey"),
            orders["o_custkey"].alias("o_custkey"),
        )
        .agg(
            F.count(lineitem["l_orderkey"]).alias("n_lines"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias("sum_qty"),
            F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2).alias("sum_price"),
        )
    )

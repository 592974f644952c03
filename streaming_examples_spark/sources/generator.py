"""CDC workload generator — the pgbench analog (SURVEY.md §6's
load-generation recipe) as a distributed Spark job.

Generates a deterministic orders/order_lines transaction log of any
size *on the executors* (``spark.range`` → column expressions — no
driver-side materialization), shaped like the reference's inventory
workload: each transaction inserts one order with a zipf-ish number of
lines, later transactions update/delete earlier orders.

Used for scale stress runs: generate N transactions, push them through
``tx_denormalize``, and measure events/sec at sizes far beyond the
driver testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.model.fixtures import LINE_ROW_SCHEMA, ORDER_ROW_SCHEMA  # noqa: F401


def _source(table, lsn, tx):
    return F.struct(
        F.lit("2.5").alias("version"),
        F.lit("postgresql").alias("connector"),
        F.lit("gen").alias("name"),
        (F.lit(1700000000000) + lsn).alias("ts_ms"),
        F.lit(False).alias("snapshot"),
        F.lit("gendb").alias("db"),
        F.lit(None).cast("string").alias("sequence"),
        F.lit("public").alias("schema"),
        F.lit(table).alias("table"),
        tx.cast("long").alias("txId"),
        lsn.cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("xmin"),
    )


def generate_workload(
    spark: SparkSession,
    n_txs: int,
    *,
    max_lines: int = 4,
    partitions: int = 32,
    whale_lines: int = 0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build (order_events, line_events, tx_events) for ``n_txs``
    insert transactions. Tx i: order i + (i % max_lines + 1) lines.
    LSN space: tx i owns [i*100, i*100+99]; commit at i*100+99.

    ``whale_lines`` > 0 appends one extra "whale" transaction (id
    ``n_txs``) inserting ONE order with that many lines — a planted
    hot key for skew measurements. Its LSN space starts at
    ``n_txs*100`` (above every normal tx), so the commit-order and
    completeness invariants hold unchanged; the whale's line ids live
    at ``n_txs*1_000_000 + ln`` to stay collision-free.
    """
    txs = spark.range(0, n_txs, 1, partitions).withColumnRenamed("id", "tx")
    tx = F.col("tx")
    commit_lsn = tx * 100 + 99
    tx_ref = F.concat_ws(":", tx, commit_lsn)
    n_lines = (tx % max_lines + 1).cast("int")

    order_events = txs.select(
        F.lit(None)
        .cast("struct<id:bigint,order_date:int,purchaser:int,shipping_address:string>")
        .alias("before"),
        F.struct(
            tx.alias("id"),
            (F.lit(19000) + (tx % 1000).cast("int")).cast("int").alias("order_date"),
            (tx % 5000).cast("int").alias("purchaser"),
            F.concat(F.lit("addr-"), tx).alias("shipping_address"),
        ).alias("after"),
        _source("orders", tx * 100, tx).alias("source"),
        F.lit("c").alias("op"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
        F.struct(tx_ref.alias("id")).alias("transaction"),
    )

    lines = txs.select(
        "tx", F.explode(F.sequence(F.lit(1), n_lines)).alias("ln")
    )
    ln = F.col("ln")
    line_events = lines.select(
        F.lit(None)
        .cast("struct<id:bigint,order_id:bigint,product_id:int,quantity:int,price:string>")
        .alias("before"),
        F.struct(
            (tx * 10 + ln).alias("id"),
            tx.alias("order_id"),
            ((tx + ln) % 1000).cast("int").alias("product_id"),
            (ln % 10 + 1).cast("int").alias("quantity"),
            F.concat((ln * 7 + 1).cast("string"), F.lit(".99")).alias("price"),
        ).alias("after"),
        _source("order_lines", tx * 100 + ln, tx).alias("source"),
        F.lit("c").alias("op"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
        F.struct(tx_ref.alias("id")).alias("transaction"),
    )

    tx_events = txs.select(
        F.lit("END").alias("status"),
        tx_ref.alias("id"),
        (n_lines + 1).cast("long").alias("event_count"),
        F.array(
            F.struct(
                F.lit("public.orders").alias("data_collection"),
                F.lit(1).cast("long").alias("event_count"),
            ),
            F.struct(
                F.lit("public.order_lines").alias("data_collection"),
                n_lines.cast("long").alias("event_count"),
            ),
        ).alias("data_collections"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
    )

    if whale_lines > 0:
        w_tx, base = n_txs, n_txs * 100
        w_commit = base + whale_lines + 1
        w_ref = F.lit(f"{w_tx}:{w_commit}")
        wt = F.lit(w_tx)
        one = spark.range(1)
        w_order = one.select(
            F.lit(None)
            .cast("struct<id:bigint,order_date:int,purchaser:int,shipping_address:string>")
            .alias("before"),
            F.struct(
                wt.cast("long").alias("id"),
                F.lit(19000).alias("order_date"),
                F.lit(0).alias("purchaser"),
                F.lit(f"addr-{w_tx}").alias("shipping_address"),
            ).alias("after"),
            _source("orders", F.lit(base), wt).alias("source"),
            F.lit("c").alias("op"),
            (F.lit(1700000000000) + wt).alias("ts_ms"),
            F.struct(w_ref.alias("id")).alias("transaction"),
        )
        wl = F.col("id")  # 1..whale_lines, generated on executors
        w_lines = spark.range(1, whale_lines + 1, 1, partitions).select(
            F.lit(None)
            .cast("struct<id:bigint,order_id:bigint,product_id:int,quantity:int,price:string>")
            .alias("before"),
            F.struct(
                (F.lit(w_tx).cast("long") * 1_000_000 + wl).alias("id"),
                wt.cast("long").alias("order_id"),
                (wl % 1000).cast("int").alias("product_id"),
                (wl % 10 + 1).cast("int").alias("quantity"),
                F.concat((wl % 90 + 1).cast("string"), F.lit(".99")).alias("price"),
            ).alias("after"),
            _source("order_lines", F.lit(base) + wl, wt).alias("source"),
            F.lit("c").alias("op"),
            (F.lit(1700000000000) + wt).alias("ts_ms"),
            F.struct(w_ref.alias("id")).alias("transaction"),
        )
        w_end = one.select(
            F.lit("END").alias("status"),
            w_ref.alias("id"),
            F.lit(whale_lines + 1).cast("long").alias("event_count"),
            F.array(
                F.struct(
                    F.lit("public.orders").alias("data_collection"),
                    F.lit(1).cast("long").alias("event_count"),
                ),
                F.struct(
                    F.lit("public.order_lines").alias("data_collection"),
                    F.lit(whale_lines).cast("long").alias("event_count"),
                ),
            ).alias("data_collections"),
            (F.lit(1700000000000) + wt).alias("ts_ms"),
        )
        order_events = order_events.unionByName(w_order)
        line_events = line_events.unionByName(w_lines)
        tx_events = tx_events.unionByName(w_end)

    return order_events, line_events, tx_events

"""SQL entry-point tests: CDC views queryable via spark.sql, UDTF
registration, and the workload generator feeding the tx pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_examples_spark.model.fixtures import TxLog
from streaming_examples_spark.sql_surface import create_cdc_table, register_engine_functions


def test_cdc_views_queryable(spark):
    log = TxLog()
    log.tx(lambda t: t.insert_order(10001, addr="1 Main St"))
    log.tx(lambda t: t.update_order(10001, shipping_address="2 Oak Ave"))
    create_cdc_table(spark, "orders_cdc", log.order_events_df(spark), key_cols=["id"])

    up = spark.sql("SELECT id, shipping_address FROM orders_cdc_upsert").collect()
    assert len(up) == 1 and up[0]["shipping_address"] == "2 Oak Ave"
    kinds = [
        r["row_kind"]
        for r in spark.sql(
            "SELECT row_kind FROM orders_cdc_changelog ORDER BY ts_ms, row_kind"
        ).collect()
    ]
    assert kinds == ["+I", "+U", "-U"][0:1] + sorted(["-U", "+U"])
    n = spark.sql("SELECT count(*) AS n FROM orders_cdc_append").first()["n"]
    assert n == 2


def test_generator_through_tx_pipeline(spark):
    from streaming_examples_spark.operators.txjoin import tx_denormalize
    from streaming_examples_spark.sources.generator import generate_workload

    o, l, x = generate_workload(spark, 200, max_lines=3, partitions=4)
    res = tx_denormalize(o, l, x)
    docs = res.emissions
    assert docs.count() == 200  # one emission per tx
    sample = docs.filter(F.col("order_key") == 7).first()
    assert len(sample["lines"]) == 7 % 3 + 1
    assert str(sample["lines"][0]["price"]).endswith(".99")


def test_register_engine_functions(spark):
    register_engine_functions(spark)
    spark.createDataFrame(
        [(1, 1, "c", "v1")], "id long, lsn long, op string, value string"
    ).createOrReplaceTempView("reg_fn_events")
    out = spark.sql(
        """SELECT * FROM toast_backfill(
             TABLE(SELECT id, lsn, op, value FROM reg_fn_events)
             PARTITION BY id ORDER BY lsn)"""
    ).collect()
    assert out[0]["value"] == "v1"

"""Ingest-mode tests: the four changelog semantics + flatten + dedup
(SURVEY.md §2.1), on deterministic CDC fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_examples_spark.model.fixtures import TxLog
from streaming_examples_spark.operators.ingest import (
    ROWKIND_DELETE,
    ROWKIND_INSERT,
    ROWKIND_UPDATE_AFTER,
    ROWKIND_UPDATE_BEFORE,
    as_append,
    as_changelog,
    as_upsert,
    changelog_to_upsert,
    dedup_cdc,
    flatten,
    with_lsn,
)


@pytest.fixture(scope="module")
def order_log(spark):
    log = TxLog()
    log.tx(lambda t: t.insert_order(10001, addr="1 Main St"))
    log.tx(lambda t: t.update_order(10001, shipping_address="2 Oak Ave"))
    log.tx(lambda t: t.insert_order(10002, addr="3 Pine Rd"))
    log.tx(lambda t: t.delete_order(10002))
    return log.order_events_df(spark)


def test_append_metadata_columns(spark, order_log):
    out = as_append(order_log)
    rows = out.orderBy("ts_ms").collect()
    assert len(rows) == 4  # immutable facts: every event kept
    assert rows[0]["source_table"] == "public.orders"
    assert rows[0]["source_properties"]["connector"] == "postgresql"
    assert rows[0]["ingest_ts"] is not None


def test_changelog_rowkinds(spark, order_log):
    out = as_changelog(order_log).orderBy("ts_ms", "row_kind")
    kinds = [r["row_kind"] for r in out.collect()]
    # c → +I ; u → -U,+U ; c → +I ; d → -D
    assert kinds == [
        ROWKIND_INSERT,
        ROWKIND_UPDATE_AFTER,
        ROWKIND_UPDATE_BEFORE,
        ROWKIND_INSERT,
        ROWKIND_DELETE,
    ]
    upd_after = out.filter(F.col("row_kind") == ROWKIND_UPDATE_AFTER).first()
    assert upd_after["row"]["shipping_address"] == "2 Oak Ave"


def test_upsert_latest_wins_and_tombstones(spark, order_log):
    out = as_upsert(order_log, ["id"]).orderBy("id")
    rows = out.collect()
    assert [r["id"] for r in rows] == [10001]  # 10002 deleted
    assert rows[0]["shipping_address"] == "2 Oak Ave"  # latest wins


def test_changelog_to_upsert_roundtrip(spark, order_log):
    cl = as_changelog(order_log)
    out = changelog_to_upsert(cl, ["id"]).orderBy("id").collect()
    assert [r["id"] for r in out] == [10001]
    assert out[0]["shipping_address"] == "2 Oak Ave"


def test_flatten_delete_rewrite(spark, order_log):
    out = flatten(order_log).orderBy("ts_ms")
    rows = out.collect()
    assert rows[-1]["__deleted"] is True
    assert rows[-1]["id"] == 10002  # before-image surfaces the key
    live = flatten(order_log, drop_deletes=True).collect()
    assert all(not r["__deleted"] for r in live)


def test_dedup_cdc(spark, order_log):
    dup = order_log.union(order_log)  # at-least-once redelivery
    out = dedup_cdc(dup)
    assert out.count() == order_log.count()


def test_lookup_patch_reselect(spark):
    """S13 re-select: sentinel values patched from a lookup frame."""
    from streaming_examples_spark.model.envelope import TOAST_SENTINEL
    from streaming_examples_spark.sources.jdbc import lookup_patch

    batch = spark.createDataFrame(
        [(1, TOAST_SENTINEL), (2, "real"), (3, TOAST_SENTINEL)],
        "id long, biography string",
    )
    lookup = spark.createDataFrame([(1, "from db")], "id long, biography string")
    got = {r["id"]: r["biography"] for r in
           lookup_patch(batch, lookup, key_cols=["id"], patch_col="biography").collect()}
    assert got[1] == "from db"
    assert got[2] == "real"
    assert got[3] == TOAST_SENTINEL  # no lookup row → sentinel stays


def test_with_lsn_parses_transaction_id(spark, order_log):
    out = with_lsn(order_log).orderBy("event_lsn").collect()
    assert all(r["commit_lsn"] is not None for r in out)
    assert all(r["commit_lsn"] > r["event_lsn"] for r in out)
    assert out[0]["tx_id"] == out[0]["source"]["txId"]


def test_changelog_aggregate_equals_materialize_then_aggregate(spark):
    """On a well-formed changelog (every key: +I, then -U/+U pairs,
    maybe -D), the retraction-aware aggregate must equal aggregating
    the materialized latest-per-key state — Flink's changelog-agg
    equivalence (KafkaChangelogJob.java:26-48)."""
    from streaming_examples_spark.operators.ingest import changelog_aggregate

    rows = []  # (row_kind, id, value, lsn)
    histories = {
        1: [("+I", 10.0, 100), ("-U", 10.0, 200), ("+U", 25.0, 200)],
        2: [("+I", 5.0, 110), ("-U", 5.0, 210), ("+U", 7.5, 210),
            ("-D", 7.5, 300)],
        3: [("+I", 40.0, 120)],
        14: [("+I", 2.25, 130), ("-U", 2.25, 220), ("+U", 3.75, 220)],
    }
    for k, hist in histories.items():
        for kind, v, lsn in hist:
            rows.append((kind, k, v, lsn))
    cl = spark.createDataFrame(rows, "row_kind string, id long, value double, lsn long")
    # shape it like as_changelog output (row struct + source.lsn + ts_ms)
    cl = cl.select(
        "row_kind",
        F.struct(F.col("id").alias("id"), F.col("value").alias("value")).alias("row"),
        F.struct(F.col("lsn").alias("lsn")).alias("source"),
        F.col("lsn").alias("ts_ms"),
    )

    direct = {
        r["cohort"]: (r["n_live"], r["sum_value_cents"])
        for r in changelog_aggregate(
            cl, [F.pmod(F.col("row.id"), F.lit(10)).alias("cohort")], F.col("row.value")
        ).collect()
    }
    state = changelog_to_upsert(cl, ["id"])  # id, value of live rows
    materialized = {
        r["cohort"]: (r["n_live"], r["sum_value_cents"])
        for r in state.groupBy(F.pmod("id", F.lit(10)).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .collect()
    }
    # the one legitimate difference: a group whose every row was
    # retracted nets to (0, 0) in the direct aggregate but is simply
    # absent once materialized — same information, different encoding
    assert {k: v for k, v in direct.items() if v != (0, 0)} == materialized
    assert direct[1] == (1, 2500)   # id 1 updated 10.0 → 25.0
    assert direct[4] == (1, 375)    # id 14 updated 2.25 → 3.75
    assert direct[3] == (1, 4000)   # id 3 untouched insert
    assert direct[2] == (0, 0)      # id 2 deleted: retractions net out

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

"""transformWithStateInPandas path — runs where protobuf + RocksDB
are available; skipped in environments without them (this container
lacks protobuf; fill_forward.py's applyInPandasWithState is the
tested stateful path there)."""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf")

from streaming_examples_spark.model.envelope import TOAST_SENTINEL


def test_fill_forward_tws(spark):
    from streaming_examples_spark.streaming.stateful import fill_forward_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    df = spark.createDataFrame(
        [
            (1001, 10, "c", "bio v1"),
            (1001, 20, "u", TOAST_SENTINEL),
            (1002, 15, "c", TOAST_SENTINEL),
        ],
        "id long, event_lsn long, op string, value string",
    )
    out = {(r["id"], r["event_lsn"]): r["value"] for r in fill_forward_tws(df).collect()}
    assert out[(1001, 20)] == "bio v1"
    assert out[(1002, 15)] is None

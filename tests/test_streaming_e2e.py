"""End-to-end streaming test: three file-backed CDC streams (orders,
order_lines, transaction metadata — the reference's three Kafka
topics) through start_tx_denorm_stream, with a transaction split
across micro-batches, tombstones, and the monitoring surface."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from streaming_examples_spark.model.fixtures import TxLog
from streaming_examples_spark.sources.files import (
    read_envelope_log,
    read_tx_log,
    write_event_log,
)
from streaming_examples_spark.model.fixtures import LINE_ROW_SCHEMA, ORDER_ROW_SCHEMA
from streaming_examples_spark.streaming.cdc_stream import start_tx_denorm_stream


def test_full_stream_pipeline(spark, tmp_path):
    log = TxLog()
    log.tx(
        lambda t: t.insert_order(10001),
        lambda t: t.insert_line(100001, 10001, price="19.99"),
        lambda t: t.insert_line(100002, 10001, price="5.00"),
    )
    log.tx(lambda t: t.update_order(10001, shipping_address="2 Oak Ave"))
    log.tx(lambda t: t.delete_line(100002), lambda t: t.delete_order(10001))

    orders = [e for e in log.events if e["source"]["table"] == "orders"]
    lines = [e for e in log.events if e["source"]["table"] == "order_lines"]

    dirs = {n: str(tmp_path / n) for n in ("orders", "lines", "txs", "out", "state", "ckpt")}
    # split into multiple files → multiple micro-batches (incl. one
    # that splits tx 1 across batches: 3 events over 2-event chunks)
    write_event_log(orders, dirs["orders"], files=2)
    write_event_log(lines, dirs["lines"], files=2)
    write_event_log(log.tx_events, dirs["txs"], files=1)

    q = start_tx_denorm_stream(
        spark,
        read_envelope_log(spark, dirs["orders"], ORDER_ROW_SCHEMA, streaming=True),
        read_envelope_log(spark, dirs["lines"], LINE_ROW_SCHEMA, streaming=True),
        read_tx_log(spark, dirs["txs"], streaming=True),
        state_dir=dirs["state"],
        output_dir=dirs["out"],
        checkpoint_dir=dirs["ckpt"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(dirs["out"]).orderBy("commit_lsn")
    rows = out.collect()
    # exactly one emission per (order, tx): 3 txs → 3 rows
    assert len(rows) == 3
    assert [r["deleted"] for r in rows] == [False, False, True]
    assert rows[0]["shipping_address"] == "1 Main St" and len(rows[0]["lines"]) == 2
    assert rows[1]["shipping_address"] == "2 Oak Ave"
    assert rows[2]["order_key"] == 10001  # tombstone carries the key
    # commit-LSN emission order
    lsns = [r["commit_lsn"] for r in rows]
    assert lsns == sorted(lsns)

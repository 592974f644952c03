"""End-to-end streaming test: three file-backed CDC streams (orders,
order_lines, transaction metadata — the reference's three Kafka
topics) through start_tx_denorm_stream, with a transaction split
across micro-batches, tombstones, and the monitoring surface."""

from __future__ import annotations

import os
import time

import pytest

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


def _emission_seq(spark, out_dir):
    """Canonical emission sequence for run-vs-run comparison: one tuple
    per doc in commit-LSN order, including the line set."""
    rows = spark.read.parquet(out_dir).orderBy("commit_lsn").collect()
    return [
        (
            r["order_key"],
            r["commit_lsn"],
            r["deleted"],
            r["shipping_address"],
            tuple((ln["id"], str(ln["price"])) for ln in (r["lines"] or [])),
        )
        for r in rows
    ]


@pytest.mark.slow
def test_restart_batch_processor_from_persisted_state(spark, tmp_path):
    """Kill-and-recreate mid-history: batches 0..1 run on one
    TxDenormBatchProcessor, then a FRESH processor on the same state
    dir replays the remaining events — including a fully redelivered
    overlap batch — and the emission sequence must equal the
    uninterrupted golden run exactly (no duplicate, no loss, commit
    order preserved). The reference snapshots/restores operator state
    (TxAwareTwoInputNonBroadcastJoinProcessOperator.java:100-160) and
    documents its own restore gap (poc.md:359-361); this pins the
    equivalent guarantee for the parquet state-dir design."""
    from streaming_examples_spark.streaming.cdc_stream import TxDenormBatchProcessor

    log = TxLog()
    log.tx(
        lambda t: t.insert_order(10001),
        lambda t: t.insert_line(100001, 10001, price="19.99"),
    )
    log.tx(
        lambda t: t.update_order(10001, shipping_address="2 Oak Ave"),
        lambda t: t.insert_line(100002, 10001, price="40.00"),
    )
    log.tx(
        lambda t: t.insert_order(10002),
        lambda t: t.insert_line(100003, 10002, price="7.50"),
    )
    orders, lines, txs = (
        log.order_events_df(spark),
        log.line_events_df(spark),
        log.tx_events_df(spark),
    )
    # three LSN windows; the first cut splits tx2 across batches so the
    # restart happens with live carry-over state
    data_lsns = sorted(
        e["source"]["lsn"]
        for e in log.events
        if e["source"]["table"] in ("orders", "order_lines")
    )
    tx_order: list[int] = []
    for e in log.events:
        if e["source"]["txId"] not in tx_order:
            tx_order.append(e["source"]["txId"])
    tx2_events = [
        e["source"]["lsn"] for e in log.events if e["source"]["txId"] == tx_order[1]
    ]
    c1 = (min(tx2_events) + max(tx2_events)) // 2  # between tx2's events
    c2 = max(tx2_events)  # tx3 entirely in the last window
    assert c1 > min(data_lsns) and c2 < max(data_lsns)

    def window(lo, hi):
        cond = (F.col("source.lsn") > lo) & (F.col("source.lsn") <= hi)
        return orders.filter(cond), lines.filter(cond)

    batches = [window(0, c1), window(c1, c2), window(c2, 10**9)]

    # golden: one processor, uninterrupted
    gold = TxDenormBatchProcessor(spark, str(tmp_path / "state_g"), str(tmp_path / "out_g"))
    for i, (o, l) in enumerate(batches):
        gold.process(o, l, txs, batch_id=i)

    # interrupted: processor A dies after batch 1; a FRESH processor B
    # resumes from the persisted state dir, first re-receiving batch 1
    # whole (at-least-once redelivery), then the rest of the history
    state_i, out_i = str(tmp_path / "state_i"), str(tmp_path / "out_i")
    proc_a = TxDenormBatchProcessor(spark, state_i, out_i)
    proc_a.process(*batches[0], txs, batch_id=0)
    proc_a.process(*batches[1], txs, batch_id=1)
    del proc_a  # crash: nothing in-memory survives

    proc_b = TxDenormBatchProcessor(spark, state_i, out_i)
    proc_b.process(*batches[1], txs, batch_id=2)  # redelivered overlap
    proc_b.process(*batches[2], txs, batch_id=3)

    golden_seq = _emission_seq(spark, str(tmp_path / "out_g"))
    restart_seq = _emission_seq(spark, out_i)
    assert len(golden_seq) == 3  # one emission per tx
    assert restart_seq == golden_seq


@pytest.mark.slow
def test_restart_stream_from_checkpoint(spark, tmp_path):
    """Stop the streaming query mid-history and start a NEW query (a
    fresh foreachBatch processor) on the same checkpoint + state dirs;
    the resumed stream must pick up exactly the unprocessed files and
    the combined output must equal the single-run golden — exactly one
    emission per tx, commit order intact."""
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

    def start():
        return start_tx_denorm_stream(
            spark,
            read_envelope_log(spark, dirs["orders"], ORDER_ROW_SCHEMA, streaming=True),
            read_envelope_log(spark, dirs["lines"], LINE_ROW_SCHEMA, streaming=True),
            read_tx_log(spark, dirs["txs"], streaming=True),
            state_dir=dirs["state"],
            output_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
        )

    # phase 1: the first two events of each data stream + all tx
    # metadata — tx1 and tx2 complete, tx3's deletes not yet delivered
    write_event_log(orders[:2], dirs["orders"], files=2)
    write_event_log(lines[:2], dirs["lines"], files=2)
    write_event_log(log.tx_events, dirs["txs"], files=1)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_phase1 = spark.read.parquet(dirs["out"]).count()
    assert n_phase1 == 2  # tx1 + tx2 emitted before the shutdown

    # phase 2: append the remaining events as new files, then resume on
    # the same checkpoint with a brand-new query/processor
    write_event_log(orders[2:], dirs["orders"], files=1, offset=2)
    write_event_log(lines[2:], dirs["lines"], files=1, offset=2)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    out = spark.read.parquet(dirs["out"]).orderBy("commit_lsn").collect()
    assert len(out) == 3  # no duplicates from the restart, no loss
    assert [r["deleted"] for r in out] == [False, False, True]
    assert out[1]["shipping_address"] == "2 Oak Ave"
    assert out[2]["order_key"] == 10001  # tombstone
    lsns = [r["commit_lsn"] for r in out]
    assert lsns == sorted(lsns)

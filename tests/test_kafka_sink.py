"""Kafka sink logic without a broker (SURVEY §2.1 S5/S6/S8/T4).

The wire encoding and tombstone routing are the testable contract; the
broker I/O is the client library's job. A file-backed stub producer
(picklable, ships to executors) captures exactly what would be sent:
key bytes, value bytes or tombstone-null, per-partition producer
lifecycle (reference: KafkaChangelogJob.java:50-65,
OrderWithLinesSerializationSchema.java:41-75).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from streaming_examples_spark.sources.kafka import (
    changelog_kv,
    serialize_upsert_row,
    upsert_sink_batch,
)


def _file_stub_factory(out_dir: str, prefix: str = ""):
    """Producer factory whose instances record sends to one file per
    producer — executors share the local FS in local mode, so the
    driver-side test can read back exactly what each partition sent.
    ``prefix`` orders files across factories (e.g. per micro-batch);
    a real broker orders per topic-partition instead."""

    def factory():
        import json as _json
        import os as _os
        import uuid as _uuid

        class _StubProducer:
            def __init__(self):
                self.path = _os.path.join(
                    out_dir, f"{prefix}producer-{_uuid.uuid4().hex}.jsonl"
                )
                self.records = []
                self.flushed = False

            def send(self, topic, key=None, value=None):
                assert not self.flushed, "send after flush"
                self.records.append(
                    {
                        "topic": topic,
                        "key": key.decode(),
                        "value": None if value is None else value.decode(),
                    }
                )

            def flush(self):
                with open(self.path, "w") as f:
                    for r in self.records:
                        f.write(_json.dumps(r) + "\n")
                self.flushed = True

            def close(self):
                # lifecycle contract: every producer that sent rows was
                # flushed before close (at-least-once before task success)
                assert self.flushed or not self.records, "closed without flush"

        return _StubProducer()

    return factory


def _read_sent(out_dir: str) -> list[list[dict]]:
    out = []
    for name in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, name)) as f:
            out.append([json.loads(line) for line in f])
    return out


def test_serialize_upsert_row_tombstone_and_payload():
    key, value = serialize_upsert_row(
        {"id": 7, "deleted": False, "qty": 3}, key_col="id", deleted_col="deleted"
    )
    assert key == b"7"
    assert json.loads(value) == {"id": 7, "qty": 3}  # deleted flag not on the wire
    key, value = serialize_upsert_row(
        {"id": 8, "deleted": True, "qty": None}, key_col="id", deleted_col="deleted"
    )
    assert (key, value) == (b"8", None)  # delete → tombstone (null value)


def test_upsert_sink_routes_tombstones_and_keys(spark, tmp_path):
    out_dir = str(tmp_path / "sent")
    os.makedirs(out_dir)
    batch = spark.createDataFrame(
        [(1, False, "a"), (2, True, None), (3, False, "c")],
        "id long, deleted boolean, payload string",
    )
    upsert_sink_batch(
        batch.repartition(2),
        bootstrap_servers="unused:9092",
        topic="docs",
        key_col="id",
        producer_factory=_file_stub_factory(out_dir),
    )
    per_producer = _read_sent(out_dir)
    sent = {r["key"]: r for p in per_producer for r in p}
    assert set(sent) == {"1", "2", "3"}
    assert all(r["topic"] == "docs" for r in sent.values())
    assert sent["2"]["value"] is None  # deleted row → tombstone
    assert json.loads(sent["1"]["value"]) == {"id": 1, "payload": "a"}
    assert json.loads(sent["3"]["value"]) == {"id": 3, "payload": "c"}
    # one producer per non-empty partition, never per row
    assert 1 <= len(per_producer) <= 2


def test_upsert_sink_empty_partitions_open_no_producer(spark, tmp_path):
    out_dir = str(tmp_path / "sent")
    os.makedirs(out_dir)
    batch = spark.createDataFrame([(1, False)], "id long, deleted boolean")
    upsert_sink_batch(
        batch.repartition(8),  # 7 empty partitions
        bootstrap_servers="unused:9092",
        topic="docs",
        key_col="id",
        producer_factory=_file_stub_factory(out_dir),
    )
    assert len(_read_sent(out_dir)) == 1


def test_changelog_kv_projection(spark):
    df = spark.createDataFrame([(42, "NEW", 9.5)], "id long, status string, total double")
    row = changelog_kv(df, "id").first()
    assert row["key"] == "42"
    assert json.loads(row["value"]) == {"id": 42, "status": "NEW", "total": 9.5}


def test_upsert_sink_decimal_and_nested_payload(spark, tmp_path):
    """The real emission schema has DECIMAL and array<struct> columns —
    the wire encoding must serialize both deterministically."""
    out_dir = str(tmp_path / "sent")
    os.makedirs(out_dir)
    batch = spark.createDataFrame(
        [(10, False, [(1, "19.99")], "2024-01-05")],
        "id long, deleted boolean, lines array<struct<lid:long,price:string>>, d string",
    ).select(
        "id",
        "deleted",
        F.transform(
            "lines",
            lambda x: F.struct(
                x["lid"].alias("lid"), x["price"].cast("decimal(10,2)").alias("price")
            ),
        ).alias("lines"),
        F.col("d").cast("date").alias("d"),
    )
    upsert_sink_batch(
        batch,
        bootstrap_servers="unused:9092",
        topic="docs",
        key_col="id",
        producer_factory=_file_stub_factory(out_dir),
    )
    [records] = _read_sent(out_dir)
    payload = json.loads(records[0]["value"])
    assert payload["d"] == "2024-01-05"
    assert payload["lines"] == [{"lid": 1, "price": "19.99"}]


@pytest.mark.slow
def test_stream_e2e_through_kafka_upsert_sink(spark, tmp_path):
    """Full streaming pipeline → the REAL Kafka sink code path
    (upsert_sink_batch inside the emission-sink slot, before the state
    swap), against the file-backed producer double: closes the
    env-gated seam where the sink was only unit-tested on synthetic
    frames. Asserts the reference's wire semantics end to end
    (KafkaChangelogJob.java:50-65, OrderWithLinesSerializationSchema
    .java:41-75): key = order id utf-8, upserts as canonical JSON,
    delete as a tombstone (null value), last-per-key state replayable
    by an upsert consumer."""
    from streaming_examples_spark.model.fixtures import (
        LINE_ROW_SCHEMA,
        ORDER_ROW_SCHEMA,
        TxLog,
    )
    from streaming_examples_spark.sources.files import (
        read_envelope_log,
        read_tx_log,
        write_event_log,
    )
    from streaming_examples_spark.streaming.cdc_stream import start_tx_denorm_stream

    log = TxLog()
    log.tx(
        lambda t: t.insert_order(10001),
        lambda t: t.insert_line(100001, 10001, price="19.99"),
    )
    log.tx(
        lambda t: t.insert_order(10002),
        lambda t: t.update_order(10001, shipping_address="2 Oak Ave"),
    )
    log.tx(lambda t: t.delete_order(10002))

    orders = [e for e in log.events if e["source"]["table"] == "orders"]
    lines = [e for e in log.events if e["source"]["table"] == "order_lines"]
    dirs = {n: str(tmp_path / n) for n in ("orders", "lines", "txs", "out", "state", "ckpt", "sent")}
    os.makedirs(dirs["sent"])
    write_event_log(orders, dirs["orders"], files=2)  # multiple micro-batches
    write_event_log(lines, dirs["lines"], files=1)
    write_event_log(log.tx_events, dirs["txs"], files=1)

    def sink(emissions, batch_id):
        # one producer file per batch, batch-ordered by name, rows in
        # commit-LSN order (coalesce(1) concatenates the range
        # partitions in index order) — stands in for Kafka's per-
        # topic-partition ordering so per-key sequences are assertable
        upsert_sink_batch(
            emissions.coalesce(1),
            bootstrap_servers="unused:9092",
            topic="docs.upserts",
            key_col="order_key",
            producer_factory=_file_stub_factory(
                dirs["sent"], prefix=f"{batch_id:05d}-"
            ),
        )

    q = start_tx_denorm_stream(
        spark,
        read_envelope_log(spark, dirs["orders"], ORDER_ROW_SCHEMA, streaming=True),
        read_envelope_log(spark, dirs["lines"], LINE_ROW_SCHEMA, streaming=True),
        read_tx_log(spark, dirs["txs"], streaming=True),
        state_dir=dirs["state"],
        output_dir=dirs["out"],
        checkpoint_dir=dirs["ckpt"],
        emission_sink=sink,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sent = [r for p in _read_sent(dirs["sent"]) for r in p]
    assert sent and all(r["topic"] == "docs.upserts" for r in sent)
    # at-least-once: no LOST emissions; replay an upsert consumer
    # (last value per key in commit order) over the wire records
    by_key: dict[str, list] = {}
    for r in sent:
        by_key.setdefault(r["key"], []).append(r["value"])
    assert set(by_key) == {"10001", "10002"}
    # order 10001: two upserts (insert, address update), never deleted
    payloads = [json.loads(v) for v in by_key["10001"] if v is not None]
    assert len(payloads) == len(by_key["10001"])  # no tombstone for 10001
    assert {p["shipping_address"] for p in payloads} == {"1 Main St", "2 Oak Ave"}
    final = max(payloads, key=lambda p: p["commit_lsn"])
    assert final["shipping_address"] == "2 Oak Ave"
    assert [ln["id"] for ln in final["lines"]] == [100001]
    # order 10002: insert then delete → last record is a TOMBSTONE
    assert by_key["10002"][-1] is None
    assert json.loads(by_key["10002"][0])["shipping_address"] == "1 Main St"
    # the deleted flag itself never rides the wire (tombstone IS the delete)
    for vs in by_key.values():
        for v in vs:
            if v is not None:
                assert "deleted" not in json.loads(v)

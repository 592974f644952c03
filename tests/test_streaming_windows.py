"""Watermark + windowed aggregation tests: late data dropped on the
stream, session windows, and batch/stream agreement."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaming_examples_spark.streaming.windows import session_window_agg, tumbling_counts


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


SCHEMA = "ts timestamp, event_type string, user_id long, value double"


def test_tumbling_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: on-time events up to 03:30
    _write(src + "/b1.json", [
        {"ts": "2024-01-01 01:10:00", "event_type": "click", "user_id": 1, "value": 1.0},
        {"ts": "2024-01-01 01:20:00", "event_type": "click", "user_id": 1, "value": 2.0},
        {"ts": "2024-01-01 03:30:00", "event_type": "view", "user_id": 2, "value": 5.0},
    ])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    )
    out = tumbling_counts(stream, window_minutes=60, watermark_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("tumbling_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one very late event (01:15, watermark is 03:00) + one on-time
        _write(src + "/b2.json", [
            {"ts": "2024-01-01 01:15:00", "event_type": "click", "user_id": 1, "value": 100.0},
            {"ts": "2024-01-01 04:10:00", "event_type": "view", "user_id": 2, "value": 1.0},
        ])
        q.processAllAvailable()
        # batch 3: advance watermark so remaining windows close
        _write(src + "/b3.json", [
            {"ts": "2024-01-01 09:00:00", "event_type": "view", "user_id": 2, "value": 1.0},
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["window_start_us"], r["event_type"]): r
            for r in spark.sql("SELECT * FROM tumbling_out").collect()}
    # the 01:00 click window: the late 100.0 event must NOT be counted
    one_am = [r for (start, et), r in rows.items() if et == "click"]
    assert len(one_am) == 1
    assert one_am[0]["n_events"] == 2
    assert one_am[0]["sum_value"] == 3.0


def test_batch_stream_agreement(spark, tables):
    """The same expression on a batch frame computes the complete
    answer — oracle for the streaming path."""
    ev = tables["events"].select("ts", "event_type", "user_id", "value")
    batch = tumbling_counts(ev, window_minutes=60)
    total = batch.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()


def test_session_window_agg_batch(spark, tables):
    ev = tables["events"].select("ts", "event_type", "user_id", "value")
    sess = session_window_agg(ev, gap_minutes=30)
    # session windows partition all events
    assert sess.agg(F.sum("n_events")).first()[0] == ev.count()
    # agrees with the gaps-and-islands batch twin on session count
    from streaming_examples_spark.operators.windows import sessionize

    gi = sessionize(ev.withColumn("event_id", F.monotonically_increasing_id()), gap_minutes=30)
    assert sess.count() == gi.count()


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    from streaming_examples_spark.streaming.windows import dedup_within_watermark

    src = str(tmp_path / "dsrc")
    ev = {"ts": "2024-01-01 01:00:00", "event_type": "click", "user_id": 1, "value": 1.0}
    other = {"ts": "2024-01-01 01:05:00", "event_type": "view", "user_id": 2, "value": 2.0}
    _write(src + "/b1.json", [ev, other])
    # batch 2 redelivers ev within the 30-min watermark window → must dedup
    _write(src + "/b2.json", [dict(ev, value=9.0)])
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    out = dedup_within_watermark(stream, keys=["event_type", "user_id", "ts"])
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT event_type, user_id, value FROM dedup_out").collect()
    assert len(rows) == 2  # redelivered duplicate suppressed across micro-batches
    assert {(r["event_type"], r["user_id"]) for r in rows} == {("click", 1), ("view", 2)}
    # batch twin: same call shape, complete answer
    batch = spark.createDataFrame(
        [("2024-01-01 01:00:00", "click", 1, 1.0), ("2024-01-01 01:00:00", "click", 1, 9.0)],
        "ts string, event_type string, user_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert dedup_within_watermark(batch, keys=["event_type", "user_id", "ts"]).count() == 1

"""Monitoring surface (SURVEY §6): the reference's Debezium/JMX metric
catalog (postgres-replication-slots/connect/jmx_exporter_config.yml)
re-expressed over micro-batch progress. Pure-Python — no SparkSession.
"""

from __future__ import annotations

import time

from streaming_examples_spark.streaming.monitoring import PipelineMetrics


def _progress(batch_id: int, rows: int, desc: str = "FileSource"):
    return {
        "batchId": batch_id,
        "numInputRows": rows,
        "sources": [{"description": desc, "numInputRows": rows}],
    }


def test_counters_accumulate_and_dedupe_batches():
    m = PipelineMetrics()
    m.observe_progress(_progress(0, 100))
    m.observe_progress(_progress(0, 100))  # same batch re-reported → no double count
    m.observe_progress(_progress(1, 50))
    assert m.total_events_seen == 150
    assert m.batches == 2
    assert m.rows_scanned == {"FileSource": 150}


def test_lag_and_idle_metrics():
    m = PipelineMetrics()
    now_ms = time.time() * 1000
    m.observe_event_time(int(now_ms - 5_000))  # newest event 5s old
    assert 4_000 <= m.ms_behind_source <= 60_000
    # derived gauge: near-zero right after an event, and it keeps
    # TICKING while the source is idle (Debezium's continuously-
    # updating MilliSecondsSinceLastEvent), with no observe call needed
    assert 0.0 <= m.ms_since_last_event < 1_000
    first = m.ms_since_last_event
    time.sleep(0.01)
    m.observe_event_time(None)  # idle batch (S14 heartbeat analog)
    assert m.ms_since_last_event > first
    assert 4_000 <= m.ms_behind_source <= 60_000  # unchanged by idle batch


def test_initial_load_rows_counter_per_table():
    """Snapshot-phase RowsScanned parity (jmx_exporter_config.yml:12-18
    tracks it PER TABLE): the initial-load counter accumulates per
    table, lives in the snapshot under its own key, and is disjoint
    from the streaming-phase rows_scanned."""
    m = PipelineMetrics()
    m.observe_initial_load("orders", 20)
    m.observe_initial_load("lines", 55)
    m.observe_initial_load("lines", 5)  # multi-chunk initial load
    assert m.snapshot_rows_scanned == {"orders": 20, "lines": 60}
    snap = m.snapshot()
    assert snap["snapshot_rows_scanned"] == {"orders": 20, "lines": 60}
    assert snap["rows_scanned"] == {}  # streaming-phase counter untouched

    # at-least-once: a RETRY of the initial batch (same batch_id) must
    # not double the snapshot counts
    m2 = PipelineMetrics()
    m2.observe_initial_load("orders", 20, batch_id=0)
    m2.observe_initial_load("lines", 55, batch_id=0)
    m2.observe_initial_load("orders", 20, batch_id=0)  # crash-replay
    m2.observe_initial_load("lines", 55, batch_id=0)
    assert m2.snapshot_rows_scanned == {"orders": 20, "lines": 55}


def test_throughput_and_committed_tx_counters():
    m = PipelineMetrics()
    m.observe_batch(n_events=1000, duration_sec=2.0, n_committed_txs=7)
    m.observe_batch(n_events=500, duration_sec=1.0, n_committed_txs=3)
    assert m.committed_transactions == 10
    assert m.last_batch_events_per_sec == 500.0
    m.observe_backlog(42)
    snap = m.snapshot()
    assert snap["backlog_rows"] == 42
    assert snap["committed_transactions"] == 10
    # every reference metric name has a mapped key in the snapshot
    for key in (
        "total_events_seen",        # TotalNumberOfEventsSeen
        "ms_behind_source",         # MilliSecondsBehindSource
        "ms_since_last_event",      # MilliSecondsSinceLastEvent
        "committed_transactions",   # NumberOfCommittedTransactions
        "rows_scanned",             # RowsScanned
        "backlog_rows",             # wal_lsn_diff / retained backlog
    ):
        assert key in snap

"""Streaming flagship pipeline: tx-consistent denormalization under
Structured Streaming.

The reference runs its operator chain per event (DataStreamV2Job.java:
61-139); the Spark-first execution strategy (SURVEY.md §3.2) is a
``foreachBatch`` loop: each micro-batch is a superset of zero or more
transactions — complete ones are applied in commit-LSN order through
``tx_denormalize``; incomplete ones (a micro-batch may split a
transaction, poc.md:343) carry over via a persisted state directory.

State layout (parquet, atomically swapped per batch):
    <state_dir>/order_state/   latest order image per id
    <state_dir>/line_state/    latest line image per line id
    <state_dir>/carry_orders/  incomplete-tx order events
    <state_dir>/carry_lines/   incomplete-tx line events

At scale each of these is a keyed columnar table (in production:
Delta/Iceberg MERGE targets); the per-batch cost is proportional to
the batch plus the touched keys, never the full history. Structured
Streaming's checkpoint gives at-least-once batch replay; replaying a
batch re-derives the same state (tx application is idempotent per
commit_lsn) and re-emits the same docs — the reference sink is also
AT_LEAST_ONCE (DataStreamV2Job.java:102).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.operators.txjoin import TxDenormResult, tx_denormalize

_STATE_TABLES = (
    "order_state",
    "line_state",
    "carry_orders",
    "carry_lines",
    "carry_txs",
    "applied_txs",
)


class TxDenormBatchProcessor:
    """The ``foreachBatch`` body, also usable standalone for replaying
    a partitioned event log batch-by-batch (tests do exactly that)."""

    def __init__(self, spark: SparkSession, state_dir: str, output_dir: str | None = None):
        from streaming_examples_spark.streaming.monitoring import PipelineMetrics

        self.spark = spark
        self.state_dir = state_dir
        self.output_dir = output_dir
        self.metrics = PipelineMetrics()
        os.makedirs(state_dir, exist_ok=True)

    def _load(self, name: str) -> DataFrame | None:
        path = os.path.join(self.state_dir, name)
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        return None

    def _store_all(self, frames: dict[str, DataFrame]) -> None:
        """Two-phase swap: every new state frame is materialized to a
        tmp dir *before* any old dir is replaced — the four frames
        share lazy inputs (the old state dirs), so an early swap would
        invalidate a later frame's scan."""
        tmp_paths = {}
        for name, df in frames.items():
            path = os.path.join(self.state_dir, name)
            tmp = path + "._tmp"
            df.write.mode("overwrite").parquet(tmp)
            tmp_paths[name] = (tmp, path)
        for tmp, path in tmp_paths.values():
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(tmp, path)

    def process(
        self,
        order_events: DataFrame,
        line_events: DataFrame,
        tx_events: DataFrame,
        batch_id: int = 0,
    ) -> DataFrame:
        """Apply one micro-batch; returns (and optionally writes) the
        emissions in commit-LSN order."""
        # tx metadata persists across batches (the reference keeps it in
        # broadcast state, CommitLsnFixer.java:75-89): a tx's END may
        # arrive batches before/after its data events. GC below drops
        # metadata of emitted txs (the :130-151 pruning heuristic, but
        # exact: we know which txs completed).
        carry_txs = self._load("carry_txs")
        tx_all = (
            tx_events.unionByName(carry_txs) if carry_txs is not None else tx_events
        ).dropDuplicates(["status", "id"])

        # at-least-once replay protection: a tx already applied must
        # never re-block the barrier nor re-emit — drop its metadata
        # AND its data events (the (txId, lsn) dedup of SURVEY §7.4).
        applied = self._load("applied_txs")
        if applied is not None:
            applied_b = F.broadcast(applied)
            tx_all = tx_all.join(
                applied_b,
                F.split(tx_all["id"], ":").getItem(0).cast("long") == applied["tx_id"],
                "left_anti",
            )
            order_events = order_events.join(
                applied_b,
                order_events["source.txId"] == applied["tx_id"],
                "left_anti",
            )
            line_events = line_events.join(
                applied_b,
                line_events["source.txId"] == applied["tx_id"],
                "left_anti",
            )

        res: TxDenormResult = tx_denormalize(
            order_events,
            line_events,
            tx_all,
            order_state=self._load("order_state"),
            line_state=self._load("line_state"),
            carryover_orders=self._load("carry_orders"),
            carryover_lines=self._load("carry_lines"),
        )
        emitted = res.emitted_txs.select(
            F.col("tx_id").cast("string").alias("_emitted_tx")
        )
        tx_keep = tx_all.join(
            emitted,
            F.split(tx_all["id"], ":").getItem(0) == emitted["_emitted_tx"],
            "left_anti",
        )
        emissions = res.emissions.orderBy("commit_lsn").cache()
        emissions.count()  # materialize before state swap
        # monitoring (§6 metric catalog): events seen, source lag, backlog
        n_events = order_events.count() + line_events.count()
        self.metrics.total_events_seen += n_events
        max_ts = (
            order_events.select(F.max("ts_ms")).first()[0]
            if n_events
            else None
        )
        self.metrics.observe_event_time(max_ts)
        self._store_all(
            {
                "order_state": res.order_state,
                "line_state": res.line_state,
                "carry_orders": res.carryover_orders,
                "carry_lines": res.carryover_lines,
                "carry_txs": tx_keep,
                "applied_txs": (
                    applied.unionByName(res.emitted_txs).distinct()
                    if applied is not None
                    else res.emitted_txs
                ),
            }
        )
        self.metrics.observe_backlog(
            self.spark.read.parquet(os.path.join(self.state_dir, "carry_orders")).count()
            + self.spark.read.parquet(os.path.join(self.state_dir, "carry_lines")).count()
        )
        if self.output_dir:
            (
                emissions.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(self.output_dir)
            )
        return emissions


def start_tx_denorm_stream(
    spark: SparkSession,
    order_stream: DataFrame,
    line_stream: DataFrame,
    tx_stream: DataFrame,
    *,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_seconds: float = 1.0,
):
    """Wire the three CDC streams (orders / order_lines / transaction
    metadata — the reference's three Kafka topics, DataStreamV2Job.
    java:70-97) into one driving query.

    Spark cannot foreachBatch three independent streams in lockstep,
    so the streams are unioned with a ``_stream`` tag (their schemas
    are reconciled to JSON strings) and split again inside the batch —
    one logical clock, one state, one emission order.
    """
    tagged = (
        order_stream.select(F.lit("orders").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        .unionByName(
            line_stream.select(F.lit("order_lines").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        )
        .unionByName(
            tx_stream.select(F.lit("tx").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        )
    )
    processor = TxDenormBatchProcessor(spark, state_dir, output_dir)

    from streaming_examples_spark.model.envelope import (
        data_change_event_schema,
        transaction_event_schema,
    )
    from streaming_examples_spark.model.fixtures import LINE_ROW_SCHEMA, ORDER_ROW_SCHEMA

    def handle(batch: DataFrame, batch_id: int) -> None:
        orders = batch.filter(F.col("_stream") == "orders").select(
            F.from_json("payload", data_change_event_schema(ORDER_ROW_SCHEMA)).alias("e")
        ).select("e.*")
        lines = batch.filter(F.col("_stream") == "order_lines").select(
            F.from_json("payload", data_change_event_schema(LINE_ROW_SCHEMA)).alias("e")
        ).select("e.*")
        txs = batch.filter(F.col("_stream") == "tx").select(
            F.from_json("payload", transaction_event_schema()).alias("e")
        ).select("e.*")
        processor.process(orders, lines, txs, batch_id)

    return (
        tagged.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )

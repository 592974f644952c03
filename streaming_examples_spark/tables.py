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


def _nested_nanos(t) -> bool:
    """True if a ``timestamp[ns]`` occurs anywhere INSIDE ``t`` (below
    the top level): struct fields, list elements, map entries."""
    import pyarrow as pa

    for i in range(t.num_fields):
        child = t.field(i).type
        if (pa.types.is_timestamp(child) and child.unit == "ns") or _nested_nanos(
            child
        ):
            return True
    return False


@lru_cache(maxsize=256)
def _footer_info(path: str):
    """One local pyarrow footer read per path: the Spark read schema
    plus the TIMESTAMP(NANOS) column list.

    Handing ``spark.read`` an explicit schema skips the JVM-side
    inference pass (driver file listing + footer parse), measured ~4×
    faster per read (~0.12 s → ~0.03 s warm) — across a cold catalog
    sweep that is seconds of pure driver latency, and on a real
    cluster it is the difference between a metastore-style metadata
    lookup and touching storage at plan time. The mapping is the
    official Arrow→Spark one (``from_arrow_schema``); NANOS timestamps
    are overridden to LONG because that is what the scan yields under
    ``nanosAsLong`` (schema equality with inference is pinned in
    tests/test_tables.py for every testdata table).

    The LONG override only applies to TOP-LEVEL nanos columns. A nanos
    timestamp nested inside a struct/array/map would also scan as LONG
    under ``nanosAsLong``, but ``from_arrow_schema`` maps it to
    TimestampType — the explicit schema would diverge from the files
    and the read break. No testdata table has one; if a future file
    does, return ``(None, <top-level nanos names>)`` so ``load_table``
    falls back to plain JVM inference for that path, while STILL
    decoding the top-level nanos columns it knows about — a nested
    nanos field must not change the loaded type of an unrelated
    top-level column (LONG on the fallback path vs TimestampType on
    the fast path)."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_schema

    pa_schema = pq.read_schema(path)
    top_nanos = tuple(
        f.name for f in pa_schema if str(f.type).startswith("timestamp[ns")
    )
    if any(_nested_nanos(f.type) for f in pa_schema):
        return None, top_nanos
    spark_schema = from_arrow_schema(pa_schema, prefer_timestamp_ntz=False)
    if top_nanos:
        spark_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType(), f.nullable)
                if f.name in top_nanos
                else f
                for f in spark_schema.fields
            ]
        )
    return spark_schema, top_nanos


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
    schema, nanos_cols = _footer_info(path)
    if schema is None:
        # nested nanos timestamp in the footer: the top-level LONG
        # override can't describe it — use JVM inference (see
        # _footer_info docstring)
        df = spark.read.parquet(path)
    else:
        df = spark.read.schema(schema).parquet(path)
    for c in nanos_cols:
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

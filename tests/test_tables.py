"""Loader invariants: every testdata table must come back with plain
TimestampType — never TIMESTAMP_NTZ — regardless of the parquet encoding
the driver generated (timestamp[ns] in round 1, timestamp[us] in round 2).

Round-2 postmortem: the driver regenerated testdata as timestamp[us];
Spark 4's inferTimestampNTZ read it as TIMESTAMP_NTZ and every
unix_micros / ts-cast expression downstream failed analysis.  This test
pins the contract at the single choke point (tables.load_table).
"""

from __future__ import annotations

import os

import pytest

from streaming_examples_spark.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_no_ntz_columns_survive_load(spark, name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in testdata")
    df = load_table(spark, SF_DIR, name)
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    assert ntz == [], f"{name}: NTZ columns leaked through load_table: {ntz}"


def test_events_ts_is_usable_timestamp(spark):
    """unix_micros — the expression that broke in round 2 — must resolve."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    row = ev.select(F.unix_micros("ts").alias("us")).limit(1).collect()
    assert row and row[0]["us"] is not None


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_footer_schema_matches_jvm_inference(spark, name):
    """load_table hands spark.read an explicit schema built from a
    pyarrow footer read (skips the JVM inference pass, ~4× faster per
    read). The shortcut is only legal if the schema is EXACTLY what
    inference would produce — a drift (wrong width, missed nanos
    override) would surface as scan errors or silent misreads."""
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in testdata")
    from streaming_examples_spark.tables import _footer_info

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    inferred = spark.read.parquet(path).schema
    explicit, _ = _footer_info(path)
    assert explicit == inferred, (
        f"{name}: footer-derived schema diverges from inference:\n"
        f"  explicit: {explicit.simpleString()}\n"
        f"  inferred: {inferred.simpleString()}"
    )


def test_nested_nanos_timestamp_falls_back_to_inference(spark, tmp_path):
    """A TIMESTAMP(NANOS) nested inside a struct can't be described by
    the footer fast-path's top-level LONG override (from_arrow_schema
    maps it to TimestampType while the nanosAsLong scan yields LONG) —
    load_table must detect it in the footer and fall back to plain JVM
    inference so the read still works and matches inference exactly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_examples_spark.tables import _footer_info, load_table

    ts = pa.array(
        [datetime.datetime(2024, 1, 1, 12, 0, 0)], type=pa.timestamp("ns")
    )
    table = pa.table(
        {
            "id": pa.array([1], type=pa.int64()),
            # top-level nanos NEXT TO the nested one: its loaded type
            # must not depend on which path (fast/fallback) ran
            "created_at": ts,
            "meta": pa.StructArray.from_arrays([ts], names=["created"]),
            "history": pa.ListArray.from_arrays(pa.array([0, 1]), ts),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path)

    schema, nanos = _footer_info(path)
    # fallback signalled, but the footer still reports the TOP-LEVEL
    # nanos columns so load_table decodes them on the inference path
    # too — a nested nanos field must not flip an unrelated top-level
    # column from TimestampType to LongType
    assert schema is None and nanos == ("created_at",)

    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["created_at"].dataType.typeName() == "timestamp"
    row = df.collect()[0]
    assert row["id"] == 1 and row["meta"]["created"] is not None
    assert row["created_at"] == datetime.datetime(2024, 1, 1, 12, 0, 0)

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

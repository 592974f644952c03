"""File-based CDC sources — the tested ingest path (stands in for the
embedded Debezium engine, SURVEY.md §2.1 S11: a CDC source without a
Kafka hop).

An event log directory of NDJSON envelope files is a deterministic,
replayable CDC source: batch reads load the full log; streaming reads
(``maxFilesPerTrigger``) replay it file-by-file as micro-batches —
which is exactly how the streaming tests drive multi-batch scenarios.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from streaming_examples_spark.model.envelope import (
    data_change_event_schema,
    transaction_event_schema,
)


def write_event_log(rows: list[dict], path: str, files: int = 1, *, offset: int = 0) -> None:
    """Write envelope dicts as NDJSON split into ``files`` chunks
    (ordered) — each chunk becomes one micro-batch under
    ``maxFilesPerTrigger=1``. ``offset`` shifts the chunk numbering so
    a later call can APPEND new micro-batches to a live log (the
    restart-from-checkpoint tests feed a source this way)."""
    os.makedirs(path, exist_ok=True)
    per = max(1, (len(rows) + files - 1) // files)
    for i in range(0, len(rows), per):
        with open(os.path.join(path, f"chunk-{i // per + offset:05d}.json"), "w") as f:
            for r in rows[i : i + per]:
                f.write(json.dumps(r) + "\n")


def read_envelope_log(
    spark: SparkSession, path: str, row_schema, *, streaming: bool = False
) -> DataFrame:
    schema = data_change_event_schema(row_schema)
    if streaming:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(path)
        )
    return spark.read.schema(schema).json(path)


def read_tx_log(spark: SparkSession, path: str, *, streaming: bool = False) -> DataFrame:
    schema = transaction_event_schema()
    if streaming:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(path)
        )
    return spark.read.schema(schema).json(path)

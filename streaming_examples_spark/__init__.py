"""streaming_examples_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of gunnarmorling/streaming-examples (Debezium → Kafka →
Flink CDC pipelines) on idiomatic PySpark: DataFrame/SQL + Catalyst
for relational work, Structured Streaming + stateful processing for
the changelog/transactional semantics, and Arrow-batched Pandas UDFs
only where built-ins cannot express the semantics.

Layers (see SURVEY.md §7.1):
  model/      — CDC envelope + transaction-metadata schemas, decoders
  operators/  — ingest modes, tx-grouped processing, joins/aggs,
                backfill, dedup, similarity, text analysis, multimodal
  functions/  — reusable column expressions (vectors, hashing)
  sources/    — batch/stream source builders over parquet/JSON/Kafka
  streaming/  — Structured Streaming pipelines (foreachBatch tx
                processor, stateful fill-forward)
"""

from streaming_examples_spark.session import get_spark
from streaming_examples_spark.tables import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"

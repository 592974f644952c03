"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship denormalization query (the reference's
north-star query, transactional-cdc-processing-poc.md:14-27) on
sf0.001. ``queries()`` / ``oracle_sql()`` — the full operator catalog
from ``streaming_examples_spark.catalog`` (one entry per SURVEY.md §2
inventory row plus the training-data pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_examples_spark import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from streaming_examples_spark.operators.denormalize import (
        denormalize_orders_lineitem,
    )
    from streaming_examples_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    return denormalize_orders_lineitem(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per query; omitted keys → rows-only check."""
    return _catalog.oracle_sql()

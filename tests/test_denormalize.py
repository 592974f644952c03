from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from streaming_examples_spark.operators.denormalize import (
    denormalize_flat_stats,
    denormalize_orders_lineitem,
)
from tests.conftest import SF_DIR


def test_denormalize_row_count_matches_orders(spark, tables):
    out = denormalize_orders_lineitem(tables["orders"], tables["lineitem"])
    assert out.count() == tables["orders"].count()


def test_denormalize_line_counts(spark, tables):
    out = denormalize_orders_lineitem(tables["orders"], tables["lineitem"])
    got = (
        out.select("o_orderkey", F.size("lines").alias("n"))
        .orderBy("o_orderkey")
        .limit(50)
        .collect()
    )
    expected = dict(
        duckdb.sql(
            f"""
            SELECT o_orderkey, count(l_orderkey) AS n
            FROM '{SF_DIR}/orders.parquet' o
            LEFT JOIN '{SF_DIR}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 50
            """
        ).fetchall()
    )
    for row in got:
        assert row["n"] == expected[row["o_orderkey"]]


def test_denormalize_lines_sorted_and_typed(spark, tables):
    out = denormalize_orders_lineitem(tables["orders"], tables["lineitem"])
    row = out.filter(F.size("lines") >= 2).first()
    nums = [ln["l_linenumber"] for ln in row["lines"]]
    assert nums == sorted(nums)


def test_flat_stats_match_duckdb(spark, tables):
    out = denormalize_flat_stats(tables["orders"], tables["lineitem"])
    got = {r["o_orderkey"]: (r["n_lines"], r["sum_qty"]) for r in out.collect()}
    exp = duckdb.sql(
        f"""
        SELECT o_orderkey, count(l_orderkey) AS n,
               round(coalesce(sum(l_quantity), 0), 2) AS q
        FROM '{SF_DIR}/orders.parquet' o
        LEFT JOIN '{SF_DIR}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY o_orderkey
        """
    ).fetchall()
    assert len(exp) == len(got)
    for k, n, q in exp:
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(q, abs=1e-6)

"""Deterministic sampling & split assignment for dataset curation.

Random sampling (`df.sample`) is irreproducible across runs/engines;
curation at scale wants *content-addressed* sampling: a row's fate is
a pure function of its id via md5, so any engine — and any re-run over
reshuffled/re-partitioned data — selects the identical subset. All
three operators are narrow (filter / window on small groups), no
driver-side randomness, and oracle-portable (DuckDB computes the same
md5 buckets).

  * ``deterministic_sample`` — keep ~rate of rows by 16-bit md5 bucket
  * ``split_assignment``     — stable train/val/test labels (80/10/10)
  * ``quota_sample``         — at most k rows per group, md5-ranked
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

BUCKETS = 1 << 16  # 4 hex chars of md5 → [0, 65536)


def md5_bucket(id_col: Column) -> Column:
    """Deterministic 16-bit bucket of a key: first 4 md5 hex chars."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")


def deterministic_sample(
    df: DataFrame, *, id_col: str = "doc_id", rate: float = 0.1
) -> DataFrame:
    """Keep ≈``rate`` of rows, chosen by md5 bucket of the id — a
    reproducible sample any engine re-derives. A pure filter: no
    shuffle, pushes past column pruning, trivially parallel at 100 TB."""
    return df.filter(md5_bucket(F.col(id_col)) < int(rate * BUCKETS))


def split_assignment(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Stable train/val/test assignment per row (default 80/10/10).
    Content-addressed: a document keeps its split across reprocessing
    runs, which is what prevents train/test leakage when the corpus is
    rebuilt incrementally."""
    bucket = md5_bucket(F.col(id_col)) % 100
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def quota_sample(
    df: DataFrame, *, group_col: str = "source", id_col: str = "doc_id", k: int = 20
) -> DataFrame:
    """At most ``k`` rows per group, ranked by md5 of the id — caps any
    one domain's contribution to the corpus (anti-boilerplate /
    anti-monoculture quota). One shuffle on the group key; with heavy
    group skew, rank via two-phase top-k (per-partition head, then
    merge) — same output, bounded per-task memory."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )

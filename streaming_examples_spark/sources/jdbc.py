"""JDBC lookup enrichment — SURVEY.md §2.1 S13 parity.

The reference's TOAST "re-select" post-processor re-queries the source
database for columns carrying the unavailable-value sentinel
(postgres-toast-backfill/inventory-reselect-source.json:21-25). The
Spark shape is a per-micro-batch lookup join: inside ``foreachBatch``,
read just the sentinel keys back from the database and patch the rows.

No database exists in this container — the builder is exercised via
``lookup_patch`` with an injected lookup DataFrame (tests), and
``jdbc_lookup`` documents the production wiring.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.model.envelope import TOAST_SENTINEL


def lookup_patch(
    batch: DataFrame,
    lookup: DataFrame,
    *,
    key_cols: Sequence[str],
    patch_col: str,
    sentinel: str = TOAST_SENTINEL,
) -> DataFrame:
    """Replace sentinel values from a lookup table (broadcast join —
    the lookup holds only the sentinel keys, always small relative to
    the batch)."""
    needs = F.col(patch_col) == F.lit(sentinel)
    looked = lookup.select(
        *[F.col(k).alias(f"_lk_{k}") for k in key_cols],
        F.col(patch_col).alias("_lk_value"),
    )
    cond = None
    for k in key_cols:
        c = batch[k] == F.col(f"_lk_{k}")
        cond = c if cond is None else cond & c
    return (
        batch.join(F.broadcast(looked), cond, "left")
        .withColumn(
            patch_col,
            F.when(needs & F.col("_lk_value").isNotNull(), F.col("_lk_value")).otherwise(
                F.col(patch_col)
            ),
        )
        .drop("_lk_value", *[f"_lk_{k}" for k in key_cols])
    )


def jdbc_lookup(
    spark: SparkSession,
    batch: DataFrame,
    *,
    url: str,
    table: str,
    key_cols: Sequence[str],
    patch_col: str,
    sentinel: str = TOAST_SENTINEL,
    **jdbc_options: str,
) -> DataFrame:
    """Production wiring: collect the sentinel keys of this micro-batch
    (bounded — only rows carrying the sentinel), push them as a
    predicate to the source database, and patch.

    The keys-IN predicate keeps the JDBC read proportional to the
    sentinel rows, not the table.
    """
    keys = (
        batch.filter(F.col(patch_col) == F.lit(sentinel))
        .select(*key_cols)
        .distinct()
        .collect()
    )
    if not keys:
        return batch
    key_list = ", ".join(str(r[key_cols[0]]) for r in keys)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT * FROM {table} WHERE {key_cols[0]} IN ({key_list})")
    )
    for k, v in jdbc_options.items():
        reader = reader.option(k, v)
    return lookup_patch(
        batch, reader.load(), key_cols=key_cols, patch_col=patch_col, sentinel=sentinel
    )

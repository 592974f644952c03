"""Vector column expressions — dot product, norms, cosine similarity.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``):
JVM-side, codegen'd, no Python boundary. Fold order is left-to-right,
matching DuckDB's list aggregates, so oracle comparisons are exact at
double precision.

At 100 TB embedding scale the brute-force path is only for the probe
side of a broadcast (small query set × big corpus); the scale path is
LSH bucketing (operators/similarity.py) which turns the cross product
into an equi-join on bucket keys.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a| |b|); inputs should be array<double>."""
    return dot(a, b) / (norm(a) * norm(b))

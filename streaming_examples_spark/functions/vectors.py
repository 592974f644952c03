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


def _sql_double_array(o) -> str:
    if isinstance(o, (list, tuple)):
        return "array(" + ",".join(_sql_double_array(v) for v in o) + ")"
    return repr(float(o)) + "D"


def lit_double_array(o) -> Column:
    """Nested Python floats → one DOUBLE array literal Column via a
    single generated-SQL F.expr. Building a 16×64 centroid matrix out
    of individual F.lit/F.array calls costs ~2000 py4j round-trips
    (measured ≈1 s of pure driver latency PER literal instance — the
    dominant cost of the frozen-artifact ANN operators, not Catalyst
    or the executors); one parse of the equivalent SQL text is
    sub-millisecond. repr() round-trips doubles exactly and the 'D'
    suffix forces DoubleType (Spark would otherwise read 0.123456 as
    DECIMAL), so values are bit-identical to the F.lit form."""
    return F.expr(_sql_double_array(o))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a| |b|); inputs should be array<double>."""
    return dot(a, b) / (norm(a) * norm(b))

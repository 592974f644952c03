"""Local mimic of the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at the
given SF and compares row count, column names, and an order-insensitive
value hash — canonicalized through PANDAS on both sides, exactly like
the driver does (``sdf.toPandas()`` vs ``con.execute(sql).df()``).

The pandas route matters: DuckDB returns HUGEINT (int128) for
``sum(BIGINT)``, which pandas converts to float64 ("1540.0" vs Spark's
"1540") — a mismatch ``fetchall()``-based comparison silently masks.
Round-2 lost ``mixture_weights`` (and round-1 ``sessionize_events``)
to exactly that gap.

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs on a bare ``SparkSession`` (no engine configs) —
the driver's session shape. Catches configs the engine forgot to set
defensively at runtime (the nanosAsLong class of bug).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.catalog import entries, release  # noqa: E402
from streaming_examples_spark.tables import TABLE_NAMES  # noqa: E402


def normalize(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    # date/timestamp: Spark's toPandas yields datetime.date for DateType
    # while DuckDB's .df() yields datetime64 — fold both to one string.
    # (The driver's r2 hash PASSED tx_denorm_orders, which emits a date
    # column, so the driver normalizes these too.)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        v = datetime.datetime(v.year, v.month, v.day)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def canon_lines(df) -> list[str]:
    """pandas DataFrame -> sorted list of row strings, columns sorted by
    name, values normalized. NaN/NaT (pandas' null for float/ts cols)
    folds to NULL like None does."""
    import pandas as pd

    cols = sorted(df.columns)
    lines = []
    for row in df[cols].itertuples(index=False, name=None):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                parts.append("NULL")
            else:
                parts.append(normalize(v))
        lines.append("\x01".join(parts))
    lines.sort()
    return lines


def value_hash(lines: list[str]) -> str:
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    failures = []
    for name, e in sorted(entries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = e.fn(spark, sf_dir)
        spdf = sdf.toPandas()
        spark_t = time.time() - t0
        if e.oracle is None:
            print(f"  {name:28s} rows-only: {len(spdf)} rows  ({spark_t:.1f}s)")
            if len(spdf) == 0:
                failures.append((name, "zero rows"))
            release(spark, name, sf_dir)
            continue
        t0 = time.time()
        opdf = con.execute(e.oracle).df()
        duck_t = time.time() - t0
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount {len(spdf)} != {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"cols {sorted(spdf.columns)} != {sorted(opdf.columns)}")
        if not problems:
            ls, lo = canon_lines(spdf), canon_lines(opdf)
            if value_hash(ls) != value_hash(lo):
                problems.append("value hash mismatch")
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"      spark: {a[:200]}")
                        print(f"      duck : {b[:200]}")
                        break
        status = "OK " if not problems else "FAIL"
        print(f"  {name:28s} {status} {len(spdf)} rows  (spark {spark_t:.1f}s, duck {duck_t:.2f}s)"
              + ("  " + "; ".join(problems) if problems else ""))
        if problems:
            failures.append((name, "; ".join(problems)))
        # drop this entry's cached plan + pinned frames before the next
        # one: executor storage stays flat across the 50-entry sweep,
        # and the release() lifecycle gets exercised on every real entry
        release(spark, name, sf_dir)
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, p in failures:
            print(f"  {n}: {p}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local mimic of the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at the
given SF, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values normalized).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
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
from streaming_examples_spark.catalog import entries  # noqa: E402
from streaming_examples_spark.tables import TABLE_NAMES  # noqa: E402


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(normalize(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
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
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_t = time.time() - t0
        if e.oracle is None:
            print(f"  {name:28s} rows-only: {len(srows)} rows  ({spark_t:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "zero rows"))
            continue
        t0 = time.time()
        res = con.execute(e.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_t = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
                # show first diff
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(normalize(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x01".join(normalize(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"      spark: {a[:200]}")
                        print(f"      duck : {b[:200]}")
                        break
        status = "OK " if not problems else "FAIL"
        print(f"  {name:28s} {status} {len(srows)} rows  (spark {spark_t:.1f}s, duck {duck_t:.2f}s)"
              + ("  " + "; ".join(problems) if problems else ""))
        if problems:
            failures.append((name, "; ".join(problems)))
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

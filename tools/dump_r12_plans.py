"""Dump formatted physical plans for the r12 optimization round.

Usage: python tools/dump_r12_plans.py <suffix> [query ...]

Writes plans/r12/<query>_<suffix>.txt (suffix = "before"/"after") with
the `.explain("formatted")` output at sf0.1 — the judge's evidence for
plan-shape claims in OPTIMIZATION_r12.md. With no query args, dumps
the bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.catalog import entries  # noqa: E402
from streaming_examples_spark.plans.inspect import formatted_plan  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import EXTRA, HEADLINE

        names = HEADLINE + sorted(EXTRA)
    spark = get_spark("r12-plan-dump")
    cat = entries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name in cat:
            df = cat[name].fn(spark, SF)
        else:
            from bench import EXTRA

            df = EXTRA[name](spark, SF)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

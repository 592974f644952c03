"""Probe: when does Spark's runtime bloom-filter injection fire for
this engine's join shapes?

Spark (3.4+) ships ``InjectRuntimeFilter``: for a shuffle equi-join
whose creation side is a *selective filter over a scan*, it injects a
``bloom_filter_agg`` subquery on the creation side and a
``BloomFilterMightContain`` predicate into the application side's
scan — semi-join reduction for free, exactly the shuffle-read cut you
want when a 100 TB fact side joins a filtered dim.

Defaults (verified on this build): ``runtime.bloomFilter.enabled=
true``, application-side scan threshold 10 GB, creation-side
threshold 10 MB — i.e. silent at test SF, armed at cluster scale
with no engine configuration needed.

What this probe establishes (run it — output is the evidence):

1. The rule DOES fire for the engine's dim-fact shapes (selective
   filter on orders joined to lineitem): ``bloom_filter_agg`` +
   ``might_contain`` appear once broadcast is off (the 100 TB regime)
   and the size thresholds are met.
2. The rule does NOT fire for the curation family's semi-joins
   (curated_corpus / training_mix / decontaminate_train), even with
   thresholds forced low: their creation sides are dedup/quality
   *aggregates*, and ``extractSelectiveFilterOverScan`` only traces
   creation sides through Filter/Project/Join — never Aggregate.

Consequence for the 100 TB design, recorded in SCALE_NOTES: the
engine's explicit reduction strategies (bounded broadcast key sets,
bucketed candidate equi-joins, the LSH band index) are NOT redundant
with Spark's automatic bloom filters — for every aggregate-derived
semi-join in the curation path, the explicit strategy is the only
reduction that exists.

Usage: python tools/probe_runtime_bloom.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import catalog, get_spark  # noqa: E402


def _bloom_nodes(df) -> tuple[int, int]:
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    return plan.count("bloom_filter_agg"), plan.count("might_contain")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # The 100 TB regime, shrunk to test SF: broadcast off (fact-fact
    # joins shuffle), size thresholds scaled down in proportion.
    spark = get_spark(
        "probe-runtime-bloom",
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        },
    )

    print("== qualifying shape: selective dim filter -> fact scan ==")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    dim_fact = li.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        li.l_orderkey == orders.o_orderkey,
    )
    agg, might = _bloom_nodes(dim_fact)
    print(f"  lineitem x filtered-orders: bloom_filter_agg={agg} might_contain={might}")
    ok_fires = agg >= 1 and might >= 1

    print("== curation semi-joins: creation side is an aggregate ==")
    ok_silent = True
    for name in ("curated_corpus", "training_mix", "decontaminate_train"):
        agg, might = _bloom_nodes(catalog.queries()[name](spark, sf))
        print(f"  {name}: bloom_filter_agg={agg} might_contain={might}")
        ok_silent &= agg == 0 and might == 0

    if ok_fires and ok_silent:
        print(
            "\nCONFIRMED: auto bloom reduction covers plain dim-fact joins; "
            "every aggregate-derived curation semi-join relies on the "
            "engine's explicit reduction (bounded broadcasts / bucketed "
            "candidates) and on nothing else."
        )
        return 0
    print("\nUNEXPECTED: injection behavior changed — re-derive SCALE_NOTES entry")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Steady-state A/B measurement for the r5 warm-lineage watch-list
(tx_denorm_orders +32 %, training_mix +35 %, multimodal extras +75 %
vs r4 in single bench runs — variance suspect, per the repo's own
methodology bar: never conclude from single runs).

Measures EXECUTION only: each query's DataFrame is constructed ONCE
(catalog plan cache / memo), then executed ``n_runs`` times to a noop
sink; reports every run plus min/median. Run it back-to-back against
two code roots (same machine, no background load) to compare builds:

    python tools/ab_watchlist.py                       # this checkout
    git worktree add .ab_r4 b545642
    SPARK_GRAFT_ROOT=.ab_r4 python tools/ab_watchlist.py   # r4 build

Prints one JSON line: {"root": ..., "sf_dir": ..., "queries":
{name: {"runs": [...], "min": m, "median": d}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.abspath(
    os.environ.get(
        "SPARK_GRAFT_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
)
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _extras():
    from streaming_examples_spark.operators.multimodal import (
        decode_and_featurize,
        decode_audio,
        resize_payloads,
        sample_frames,
        with_audio_payload,
        with_binary_payload,
        with_video_payload,
    )
    from streaming_examples_spark.tables import load_table

    def docs(spark):
        return load_table(spark, SF_DIR, "documents")

    return {
        "multimodal_decode": lambda s: decode_and_featurize(with_binary_payload(docs(s))),
        "multimodal_frames": lambda s: sample_frames(with_video_payload(docs(s))),
        "multimodal_audio": lambda s: decode_audio(with_audio_payload(docs(s))),
        "multimodal_resize": lambda s: resize_payloads(
            with_binary_payload(docs(s)), width=64, height=64
        ),
    }


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from streaming_examples_spark import get_spark
    from streaming_examples_spark.catalog import entries

    spark = get_spark("ab-watchlist")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    cat = entries()
    targets: dict[str, object] = {
        "tx_denorm_orders": lambda s: cat["tx_denorm_orders"].fn(s, SF_DIR),
        "training_mix": lambda s: cat["training_mix"].fn(s, SF_DIR),
        # r7 single-run bench drift watch (judge: +44 %/+30 % dedup_groups,
        # +21 % text_stats, +38 % multimodal_audio on untouched code)
        "dedup_groups": lambda s: cat["dedup_groups"].fn(s, SF_DIR),
        "text_stats": lambda s: cat["text_stats"].fn(s, SF_DIR),
        # r8 single-run bench drift watch (judge: cold +33 % on
        # untouched code; its cold is 92 % construction, so measured
        # in construct+exec mode)
        "dedup_minhash_lsh": lambda s: cat["dedup_minhash_lsh"].fn(s, SF_DIR),
    }
    targets.update(_extras())
    # construction-dominated entries (eager checkpoints / CC fixpoint:
    # 78-92 % of their cold time is CONSTRUCTION, probe_cold_decomp) —
    # exec-only repeats would miss the drifted term, so each run
    # releases the memo and rebuilds from scratch
    rebuild = {"dedup_groups", "dedup_minhash_lsh"}

    out = {}
    for name, build in targets.items():
        if name in rebuild:
            from streaming_examples_spark.catalog import release

            runs = []
            df = None
            for _ in range(n_runs):
                if df is not None:
                    release(spark, name, SF_DIR)
                    spark.catalog.clearCache()
                    df = None
                    import gc

                    gc.collect()  # free prior run's localCheckpoint blocks now
                t0 = time.time()
                df = build(spark)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            out[name] = {
                "runs": runs,
                "min": min(runs),
                "median": round(statistics.median(runs), 3),
                "mode": "construct+exec",
            }
            print(f"{name}: {runs} min={min(runs)}", file=sys.stderr, flush=True)
            for p in getattr(df, "_sg_pinned", ()) or ():
                try:
                    p.unpersist()
                except Exception:
                    pass
            spark.catalog.clearCache()
            continue
        df = build(spark)  # construct once; repeats measure execution
        df.write.format("noop").mode("overwrite").save()  # warm (not timed)
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "runs": runs,
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
        }
        print(f"{name}: {runs} min={min(runs)}", file=sys.stderr, flush=True)
        # same discipline as bench.py: drop this query's pinned frames
        # and any leftover caches so later queries are not timed with
        # residual executor storage resident (order-dependence, and an
        # asymmetry between builds whose pinned sets differ)
        for p in getattr(df, "_sg_pinned", ()) or ():
            try:
                p.unpersist()
            except Exception:
                pass
        spark.catalog.clearCache()

    print(json.dumps({"root": ROOT, "sf_dir": SF_DIR, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

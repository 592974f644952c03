"""Property soak of the flagship tx pipeline (VERDICT r10 #2, r11 #2).

The r10 bug class (state roll-forward vs touched-pair contract across a
micro-batch boundary) survived 10 rounds because the CI property test
samples 5 (seed, cut) points per run — interleaving × cut-position
space is far bigger than that. This tool drives the SAME checker the
test suite uses (tests/test_tx_properties.check_history: batch
processor + naive-replay oracle, all three contracts) much harder:

  * EXHAUSTIVE cut positions: for each seed, every event-boundary cut
    of the log (every 2-batch split that exists), not one random one —
    the r10 falsifying example needed cut_frac=0.8 specifically.
  * 3-batch splits: a sample of (c1, c2) pairs per seed, exercising
    marker-over-marker and carryover-over-carryover state roll-forward.
  * seeds from --seed-offset upward (seed 13 = the r10 example).

Budget-bounded (--budget-sec, default 3600): runs until the budget or
the seed list is exhausted, whichever first, then prints one JSON
summary line. Any assertion failure aborts immediately with the
(seed, cuts) coordinates — rerun deterministically with
pytest-style check_history on those coordinates to triage.

Since r12 the core loop (``run_soak``) is ALSO a standing slow-tier
test (tests/test_tx_soak.py) with a per-day rotating seed offset, so
interleaving × cut coverage accrues every round instead of only when
someone remembers to run this tool (VERDICT r11 #2).

Usage:
    python tools/soak_tx_properties.py [--seeds 40] [--budget-sec 3600]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def run_soak(
    spark,
    *,
    budget_sec: float,
    seed_offset: int = 0,
    seed_stride: int = 1,
    max_seeds: int | None = None,
    three_batch_samples: int = 3,
    n_buckets: int = 8,
    log=print,
) -> dict:
    """The soak core: seeds from ``seed_offset`` (stepping
    ``seed_stride``) until ``budget_sec`` or ``max_seeds`` is
    exhausted; per seed every exhaustive 2-batch cut plus
    ``three_batch_samples`` random 3-batch splits, each run through
    check_history (processor vs naive-replay oracle, all three
    contracts). Raises AssertionError on the first violation, after
    logging its (seed, cuts) coordinates; returns a summary dict."""
    from test_tx_properties import _random_log, check_history  # noqa: E402

    def _release():
        # each check_history abandons its processor after the last
        # batch, whose emissions frame is still pinned (a live stream
        # unpersists it at the NEXT batch) — hundreds of soak runs in
        # one session would otherwise accumulate cache entries until
        # the driver heap dies (observed at ~seed-0 run 40 with 1g)
        spark.catalog.clearCache()

    t0 = time.time()
    runs = two_batch = three_batch = 0
    seeds_done = 0
    last_seed = None
    root = tempfile.mkdtemp(prefix="tx_soak_")
    try:
        seed = seed_offset
        while True:
            if time.time() - t0 > budget_sec:
                break
            if max_seeds is not None and seeds_done >= max_seeds:
                break
            log_obj = _random_log(seed)
            n_events = len(log_obj.events)
            # exhaustive 2-batch cuts: one per distinct event boundary
            fracs = sorted({i / (n_events - 1) for i in range(n_events)})
            completed = True
            for f in fracs:
                if time.time() - t0 > budget_sec:
                    completed = False
                    break
                state = os.path.join(root, f"s{seed}-f{f:.4f}")
                try:
                    check_history(spark, state, log_obj, [f], n_buckets=n_buckets)
                except AssertionError:
                    log(json.dumps({
                        "soak": "FAIL", "seed": seed, "cuts": [f],
                        "runs": runs,
                    }))
                    raise
                _release()
                runs += 1
                two_batch += 1
            rng = random.Random(seed * 7919 + 17)
            for _ in range(three_batch_samples):
                if time.time() - t0 > budget_sec:
                    completed = False
                    break
                c1 = rng.uniform(0.1, 0.45)
                c2 = rng.uniform(0.55, 0.9)
                state = os.path.join(root, f"s{seed}-3b-{c1:.3f}-{c2:.3f}")
                try:
                    check_history(spark, state, log_obj, [c1, c2], n_buckets=n_buckets)
                except AssertionError:
                    log(json.dumps({
                        "soak": "FAIL", "seed": seed, "cuts": [c1, c2],
                        "runs": runs,
                    }))
                    raise
                _release()
                runs += 1
                three_batch += 1
            if completed:
                # a budget-truncated seed must NOT count as covered:
                # the summary's seed window is recorded per round as
                # accrued coverage, and an untested tail would never
                # be revisited (r12 self-review finding)
                seeds_done += 1
                last_seed = seed
                log(
                    f"[soak] seed {seed} done: {len(fracs)} exhaustive cuts "
                    f"+ {three_batch_samples} 3-batch splits "
                    f"({runs} runs, {time.time() - t0:.0f}s)",
                )
            else:
                log(
                    f"[soak] seed {seed} TRUNCATED by budget "
                    f"(not counted; {runs} total runs)",
                )
            seed += seed_stride
    finally:
        shutil.rmtree(root, ignore_errors=True)

    return {
        "soak": "PASS",
        "seed_offset": seed_offset,
        "seed_stride": seed_stride,
        "seeds_completed": seeds_done,
        "last_seed": last_seed,
        "runs": runs,
        "two_batch_runs": two_batch,
        "three_batch_runs": three_batch,
        "wall_sec": round(time.time() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=40,
                    help="max number of seeds to complete")
    ap.add_argument("--budget-sec", type=float, default=3600.0)
    ap.add_argument("--three-batch-samples", type=int, default=3,
                    help="random (c1,c2) 3-batch splits per seed")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--seed-offset", type=int, default=0,
                    help="first seed (shard with --seed-stride for parallel workers)")
    ap.add_argument("--seed-stride", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("soak_tx_properties")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    summary = run_soak(
        spark,
        budget_sec=args.budget_sec,
        seed_offset=args.seed_offset,
        seed_stride=args.seed_stride,
        max_seeds=args.seeds,
        three_batch_samples=args.three_batch_samples,
        log=lambda m: print(m, flush=True),
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Standing budget-bounded property soak of the flagship tx pipeline
(VERDICT r11 #2).

The r10 state-roll bug class survived 10 rounds because the CI
property test samples 5 (seed, cut) points per run; the 480-run soak
that validated the fix was a one-off tool invocation. This slow-tier
shard runs the SAME soak core (tools/soak_tx_properties.run_soak:
exhaustive 2-batch cuts + sampled 3-batch splits per seed, each
checked against the naive-replay oracle on all three contracts) for a
bounded budget every round, with a per-day ROTATING seed offset — so
interleaving × cut coverage accrues across rounds instead of
revisiting the same seeds. The covered seed window is in the test's
captured output (and recorded per-round in TESTS.md)."""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

# the soak runs ~20-60 check_history replays in its budget: slow tier
pytestmark = pytest.mark.slow

SOAK_BUDGET_SEC = float(os.environ.get("TX_SOAK_BUDGET_SEC", "180"))


def test_soak_tx_properties_budget(spark):
    from soak_tx_properties import run_soak

    # rotate the window daily (wall-clock driven on purpose: each
    # round/day covers FRESH seeds; any failure prints deterministic
    # (seed, cuts) coordinates, so reproducibility is per-finding, not
    # per-run). Seeds 0..40 were exhausted by the r11 480-run soak;
    # start past them and walk a coprime stride through seed space.
    day = int(time.time() // 86400)
    offset = 41 + (day * 17) % 10_000
    # the soak replays tiny synthetic logs: the session's default 32
    # shuffle partitions are pure scheduling overhead here (~20 s per
    # replay vs ~6 s at 8 — measured r12); narrow for the soak only
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        summary = run_soak(
            spark,
            budget_sec=SOAK_BUDGET_SEC,
            seed_offset=offset,
            three_batch_samples=3,
            log=lambda m: print(m, flush=True),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    assert summary["soak"] == "PASS"
    # the budget must buy real coverage (a replay costs ~20 s under
    # the shared test session — measured r12 — so 180 s ≈ 8 runs; the
    # rotating offset makes coverage ACCRUE across rounds rather than
    # revisit the same seeds)
    assert summary["runs"] >= 5, summary
    assert summary["two_batch_runs"] >= 3, summary
    print(
        f"[soak] window: seeds {offset}..{summary['last_seed']} "
        f"({summary['runs']} runs in {summary['wall_sec']}s)",
        flush=True,
    )

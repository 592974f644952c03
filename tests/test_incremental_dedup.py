"""Incremental near-dup detection: state accumulation, cross-batch
matching, replay idempotence, store growth ∝ unique content."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees"
)
NEAR = BASE.replace("lazy dog", "lazy hound")  # high-Jaccard variant
OTHER = (
    "completely different content about spark query engines and the "
    "catalyst optimizer rewriting logical plans into physical plans"
)


@pytest.fixture()
def detector(spark, tmp_path):
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    return IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_near_dup_detected(spark, detector):
    r1 = {r["doc_id"]: r for r in detector.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0).collect()}
    assert not r1[1]["is_dup"] and not r1[2]["is_dup"]

    r2 = {r["doc_id"]: r for r in detector.process_batch(_docs(spark, [(3, NEAR), (4, "tiny")]), 1).collect()}
    assert r2[3]["is_dup"] and r2[3]["dup_of"] == 1
    assert not r2[4]["is_dup"]  # < k words: no shingles, trivially canonical


def test_within_batch_peers_point_at_smallest(spark, detector):
    r = {r["doc_id"]: r for r in detector.process_batch(
        _docs(spark, [(10, BASE), (11, NEAR), (12, OTHER)]), 0).collect()}
    assert not r[10]["is_dup"]
    assert r[11]["is_dup"] and r[11]["dup_of"] == 10
    assert not r[12]["is_dup"]


def test_replayed_ids_dropped_and_store_bounded(spark, detector):
    detector.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    # replay batch 0 plus one dup and one new doc
    r = {r["doc_id"]: r for r in detector.process_batch(
        _docs(spark, [(1, BASE), (2, OTHER), (3, NEAR), (5, "fresh unseen text about databases and storage engines")]), 1).collect()}
    # replayed known ids produce no report rows (already folded in)
    assert set(r) == {3, 5}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1
    assert not r[5]["is_dup"]

    # store holds CANONICAL docs only: 1, 2, 5 — not the dup 3
    import os
    sigs = spark.read.parquet(os.path.join(detector.state_dir, "sigs"))
    assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2, 5]


def test_dup_of_dup_still_matches_canonical(spark, detector):
    detector.process_batch(_docs(spark, [(1, BASE)]), 0)
    detector.process_batch(_docs(spark, [(2, NEAR)]), 1)  # dup of 1, not stored
    # another variant arrives later: must match the stored canonical 1
    NEAR2 = BASE.replace("warm fire", "cold fire")
    r = {x["doc_id"]: x for x in detector.process_batch(_docs(spark, [(3, NEAR2)]), 2).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1


def test_restart_fresh_detector_resumes_from_store(spark, detector, tmp_path):
    """Kill-and-recreate: a FRESH IncrementalNearDup on the same state
    dir must see everything the dead one stored — including a replayed
    overlap batch producing no duplicate state rows — mirroring the tx
    pipeline's restart guarantee for the dedup store."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    detector.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    del detector  # crash: nothing in-memory survives

    fresh = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
    # at-least-once redelivery of batch 0 into the fresh instance:
    # known ids fold away, state stays canonical-only
    assert fresh.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 1).count() == 0
    # cross-restart match: a near-dup of a doc stored BEFORE the crash
    r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 2).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1
    sigs = spark.read.parquet(os.path.join(fresh.state_dir, "sigs"))
    assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2]


def test_bucketed_band_store_same_verdicts_and_restart(spark, tmp_path):
    """bands_buckets=N switches the probe index to an external bucketed
    table (the 100 TB layout): verdicts must be identical to the plain
    store, appends must accumulate across batches, a catalog-less
    restart (fresh session ≈ dropped table) must re-register the table
    over the existing files, and compaction must keep it queryable."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
    try:
        r1 = {r["doc_id"]: r for r in det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0).collect()}
        assert not r1[1]["is_dup"] and not r1[2]["is_dup"]
        r2 = {r["doc_id"]: r for r in det.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r2[3]["is_dup"] and r2[3]["dup_of"] == 1

        # restart with a cold catalog: drop ONLY the table metadata
        # (external files stay), build a fresh detector — it must
        # re-register from DDL and still match docs stored pre-restart
        spark.sql(f"DROP TABLE {det._bands_table}")
        fresh = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4
        )
        NEAR2 = BASE.replace("warm fire", "cold fire")
        r3 = {r["doc_id"]: r for r in fresh.process_batch(_docs(spark, [(4, NEAR2)]), 2).collect()}
        assert r3[4]["is_dup"] and r3[4]["dup_of"] == 1

        # compaction rewrites to one file set per bucket and the store
        # keeps answering
        fresh.compact(target_partitions=1)
        r4 = {r["doc_id"]: r for r in fresh.process_batch(
            _docs(spark, [(9, BASE.replace("green trees", "green woods"))]), 3).collect()}
        assert r4[9]["is_dup"] and r4[9]["dup_of"] == 1
        sigs = spark.read.parquet(os.path.join(fresh.state_dir, "sigs"))
        assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2]
    finally:
        spark.sql(
            "DROP TABLE IF EXISTS incdedup_bands_"
            + __import__("hashlib").md5(
                os.path.abspath(str(tmp_path / "state")).encode()
            ).hexdigest()[:12]
        )


def test_compaction_preserves_state_and_verdicts(spark, detector):
    import glob
    import os

    detector.process_batch(_docs(spark, [(1, BASE)]), 0)
    detector.process_batch(_docs(spark, [(2, OTHER)]), 1)
    detector.process_batch(_docs(spark, [(5, "fresh unseen text about databases and storage engines")]), 2)

    n_before = len(glob.glob(os.path.join(detector.state_dir, "sigs", "*.parquet")))
    detector.compact(target_partitions=1)
    n_after = len(glob.glob(os.path.join(detector.state_dir, "sigs", "*.parquet")))
    assert n_after < n_before and n_after == 1

    sigs = spark.read.parquet(os.path.join(detector.state_dir, "sigs"))
    assert sorted(r["doc_id"] for r in sigs.select("doc_id").collect()) == [1, 2, 5]
    # probe still works against the compacted store
    r = {x["doc_id"]: x for x in detector.process_batch(_docs(spark, [(9, NEAR)]), 3).collect()}
    assert r[9]["is_dup"] and r[9]["dup_of"] == 1

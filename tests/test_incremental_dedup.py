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


def _backends():
    from streaming_examples_spark.streaming.state_backend import (
        LaggedManifestBackend,
        LocalPosixBackend,
        ManifestBackend,
    )

    return {
        "posix": LocalPosixBackend,
        "manifest": ManifestBackend,
        # list-after-write lag on every backend-mediated read (LISTs
        # stale for 5 ops after a mutation, GETs fresh) — the same
        # third parameterization the tx suite runs. The detector does
        # the same carry/list/dir_exists dance over the same seam
        # (epoch GC, adoption, compaction pointer flips), so the exact
        # bug class the lagged double caught there (stale-absent
        # dir_exists = silent state loss) must be probed here too.
        "manifest-lagged": LaggedManifestBackend,
    }


@pytest.fixture(params=sorted(_backends()))
def backend_cls(request):
    return _backends()[request.param]


@pytest.fixture(params=sorted(_backends()))
def detector(spark, tmp_path, request):
    """The plain detector, parameterized over BOTH storage backends:
    every lifecycle test in this module doubles as proof that the
    store's commit protocol carries no POSIX assumption (hardlinks,
    directory renames, synchronous prefix deletes)."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    return IncrementalNearDup(
        spark,
        str(tmp_path / "state"),
        threshold=0.5,
        backend=_backends()[request.param](),
    )


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
    sigs = detector.read_store("sigs")
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
    backend_cls = type(detector.backend)
    del detector  # crash: nothing in-memory survives

    fresh = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, backend=backend_cls()
    )
    # at-least-once redelivery of batch 0 into the fresh instance:
    # known ids fold away, state stays canonical-only
    assert fresh.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 1).count() == 0
    # cross-restart match: a near-dup of a doc stored BEFORE the crash
    r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 2).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1
    sigs = fresh.read_store("sigs")
    assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2]


def _drop_store_tables(spark, state_dir):
    import hashlib
    import os

    tag = hashlib.md5(os.path.abspath(str(state_dir)).encode()).hexdigest()[:12]
    # table names are epoch-versioned (compaction registers the new
    # epoch under a new name): drop every epoch's registration
    for row in spark.sql(f"SHOW TABLES LIKE 'incdedup_*{tag}*'").collect():
        spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")


def test_bucketed_band_store_same_verdicts_and_restart(spark, tmp_path, backend_cls):
    """bands_buckets=N switches BOTH stores to external bucketed tables
    (the 100 TB layout): verdicts must be identical to the plain
    store, appends must accumulate across batches, a catalog-less
    restart (fresh session ≈ dropped table) must re-register the table
    over the existing files, and compaction must keep it queryable —
    under BOTH storage backends."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
        backend=backend_cls(),
    )
    try:
        r1 = {r["doc_id"]: r for r in det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0).collect()}
        assert not r1[1]["is_dup"] and not r1[2]["is_dup"]
        r2 = {r["doc_id"]: r for r in det.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r2[3]["is_dup"] and r2[3]["dup_of"] == 1

        # restart with a cold catalog: drop ONLY the table metadata
        # (external files stay), build a fresh detector — it must
        # re-register from DDL and still match docs stored pre-restart
        spark.sql(f"DROP TABLE {det.store_table('bands')}")
        spark.sql(f"DROP TABLE {det.store_table('sigs')}")
        fresh = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
            backend=backend_cls(),
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
        sigs = fresh.read_store("sigs")
        assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2]
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_layout_mismatch_raises_on_restart(spark, tmp_path):
    """Re-opening a store with a different bucket count would hash
    probes into the wrong buckets — silent recall loss. The persisted
    layout makes it raise at init instead."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
    try:
        det.process_batch(_docs(spark, [(1, BASE)]), 0)
        with pytest.raises(ValueError, match="bands_buckets=4"):
            IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=8)
        with pytest.raises(ValueError, match="bands_buckets=4"):
            IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
        # the declared layout still opens fine
        again = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4
        )
        r = {x["doc_id"]: x for x in again.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r[3]["is_dup"] and r[3]["dup_of"] == 1
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_plain_layout_mismatch_raises_when_reopened_bucketed(spark, tmp_path):
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
    det.process_batch(_docs(spark, [(1, BASE)]), 0)
    with pytest.raises(ValueError, match="bands_buckets=None"):
        IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)


def test_legacy_bucketed_store_without_layout_refuses(spark, tmp_path):
    """A pre-layout store + a bucketed layout (declared or detected in
    the file names) cannot be validated — adopting a guessed count and
    sealing it into _layout.json would be the silent recall loss the
    guard exists to stop. Must refuse, even when the declared count
    happens to be right (we cannot know that)."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
    try:
        det.process_batch(_docs(spark, [(1, BASE)]), 0)
        os.remove(os.path.join(str(tmp_path / "state"), "_layout.json"))
        with pytest.raises(ValueError, match="cannot be validated"):
            IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
        with pytest.raises(ValueError, match="cannot be validated"):
            IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_viral_bucket_cap_gates_probe_and_peer(spark, tmp_path):
    """The cap counts the UNION of store+batch members per band key and
    gates both the store probe and the within-batch self-join: with
    cap=1 every shared key has ≥2 members, so no candidate survives;
    with the default cap the same pairs match."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    capped = IncrementalNearDup(
        spark, str(tmp_path / "capped"), threshold=0.5, max_bucket_size=1
    )
    # within-batch peers share band keys (count 2 > 1) -> peer path gated
    r = {x["doc_id"]: x for x in capped.process_batch(
        _docs(spark, [(10, BASE), (11, NEAR)]), 0).collect()}
    assert not r[10]["is_dup"] and not r[11]["is_dup"] and r[11]["n_candidates"] == 0
    # cross-batch: stored key + batch key (count 2 > 1) -> hist path gated
    r2 = {x["doc_id"]: x for x in capped.process_batch(
        _docs(spark, [(12, BASE.replace("warm fire", "cold fire"))]), 1).collect()}
    assert not r2[12]["is_dup"]

    # same inputs under the measured default cap: both paths match
    open_det = IncrementalNearDup(spark, str(tmp_path / "open"), threshold=0.5)
    r3 = {x["doc_id"]: x for x in open_det.process_batch(
        _docs(spark, [(10, BASE), (11, NEAR)]), 0).collect()}
    assert r3[11]["is_dup"] and r3[11]["dup_of"] == 10


def _crash_once(obj, method, should, exc_msg="injected crash"):
    """Wrap a backend method on the INSTANCE: raise once when `should`
    matches, pass through otherwise — the seam-level injection the tx
    store's crash suite uses (works for ANY backend, unlike patching
    os.rename/os.replace)."""
    real = getattr(obj, method)
    state = {"armed": True, "calls": 0}

    def wrapper(*a, **kw):
        state["calls"] += 1
        if state["armed"] and should(*a, **kw):
            state["armed"] = False
            raise RuntimeError(exc_msg)
        return real(*a, **kw)

    setattr(obj, method, wrapper)
    return state


def test_compact_crash_before_pointer_commit_loses_nothing(
    spark, tmp_path, backend_cls, monkeypatch
):
    """Crash-atomicity of the bucketed compact under BOTH backends: the
    rewritten epoch is fully written BEFORE the pointer flips, so dying
    at the flip leaves the committed store intact — a fresh detector
    still matches every pre-compact canonical, and a later compact
    completes over the crash garbage."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
        backend=backend_cls(),
    )
    try:
        det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)

        _crash_once(det.backend, "commit_pointer", lambda *_a, **_k: True)
        with pytest.raises(RuntimeError, match="injected crash"):
            det.compact()

        fresh = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
            backend=backend_cls(),
        )
        r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r[3]["is_dup"] and r[3]["dup_of"] == 1
        # and a later compact (no crash) completes and stays queryable
        fresh.compact()
        r2 = {x["doc_id"]: x for x in fresh.process_batch(
            _docs(spark, [(4, BASE.replace("green trees", "green woods"))]), 2).collect()}
        assert r2[4]["is_dup"] and r2[4]["dup_of"] == 1
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_compact_crash_mid_commit_keeps_one_store_epoch_behind(
    spark, tmp_path, backend_cls
):
    """Dying at the SECOND store's pointer flip leaves the stores at
    different compaction epochs — legal, because compaction preserves
    content and each store commits independently. Verdicts must be
    unchanged, and the next compact converges both stores."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
        backend=backend_cls(),
    )
    try:
        det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
        calls = {"n": 0}

        def second_call(*_a, **_k):
            calls["n"] += 1
            return calls["n"] == 2

        _crash_once(det.backend, "commit_pointer", second_call)
        with pytest.raises(RuntimeError, match="injected crash"):
            det.compact()
        # one store advanced, the other did not
        epochs = {n: det._epoch(n) for n in ("sigs", "bands")}
        assert sorted(epochs.values()) == [1, 2], epochs

        fresh = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
            backend=backend_cls(),
        )
        r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r[3]["is_dup"] and r[3]["dup_of"] == 1
        before = {n: fresh._epoch(n) for n in ("sigs", "bands")}
        fresh.compact()
        # each store advanced exactly one epoch from wherever it was
        assert {n: fresh._epoch(n) for n in ("sigs", "bands")} == {
            n: e + 1 for n, e in before.items()
        }
        # the GC reclaimed every superseded epoch dir
        for n in ("sigs", "bands"):
            stray = [
                e
                for e in os.listdir(os.path.join(str(tmp_path / "state"), n))
                if e.startswith("v") and e != f"v{fresh._epoch(n)}"
            ]
            assert not stray, (n, stray)
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_compact_crash_after_commit_gcs_stray_epoch(spark, tmp_path, backend_cls):
    """Dying AFTER the pointer flip but before the superseded epoch's
    removal leaves a stray epoch dir: the new state is live (verdicts
    from the compacted store), and the next locked operation's GC
    reclaims the stray."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
        backend=backend_cls(),
    )
    try:
        det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
        # the first remove_tree AFTER a commit is the superseded-epoch
        # cleanup (pre-commit remove_tree calls clear empty garbage
        # paths; gate on the path actually existing)
        committed = {"yes": False}
        real_commit = det.backend.commit_pointer

        def tracking_commit(root, version):
            committed["yes"] = True
            return real_commit(root, version)

        det.backend.commit_pointer = tracking_commit
        _crash_once(
            det.backend,
            "remove_tree",
            lambda path: committed["yes"] and os.path.isdir(path),
        )
        with pytest.raises(RuntimeError, match="injected crash"):
            det.compact()

        fresh = IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4,
            backend=backend_cls(),
        )
        r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
        assert r[3]["is_dup"] and r[3]["dup_of"] == 1
        # the batch's GC pass reclaimed every non-current epoch dir
        for n in ("sigs", "bands", "band_hot"):
            root = os.path.join(str(tmp_path / "state"), n)
            if not os.path.isdir(root):
                continue
            cur = fresh.backend.read_pointer(root)
            stray = [
                e for e in os.listdir(root)
                if e.startswith("v") and e != f"v{cur}"
            ]
            assert not stray, (n, stray)
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_lost_pointer_refused_not_gcd(spark, tmp_path):
    """A store whose pointer vanished (partial restore, deleted
    CURRENT) while committed epoch dirs remain must REFUSE, not treat
    the live epochs as orphans and GC them — that would silently
    re-admit every known doc. Epochs ≥ 2 only exist after a pointer
    committed, so pointer 0 beside them proves the loss."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    state = str(tmp_path / "state")
    det = IncrementalNearDup(spark, state, threshold=0.5)
    det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    det.compact()  # stores now at epoch 2
    assert det._epoch("sigs") == 2
    os.unlink(os.path.join(state, "sigs", "CURRENT"))

    fresh = IncrementalNearDup(spark, state, threshold=0.5)
    with pytest.raises(ValueError, match="no committed pointer"):
        fresh.process_batch(_docs(spark, [(3, NEAR)]), 1)
    # the refusal destroyed nothing: restore the pointer and resume
    with open(os.path.join(state, "sigs", "CURRENT"), "w") as fh:
        fh.write("2")
    r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1


def test_cross_backend_reopen_refused(spark, tmp_path):
    """The layout seals the backend that committed the store: the two
    encode pointers differently, so a foreign reopen would read epoch 0
    and GC live files — the same silent-loss class as a bucket-count
    mismatch. Must refuse at init."""
    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup
    from streaming_examples_spark.streaming.state_backend import (
        LocalPosixBackend,
        ManifestBackend,
    )

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, backend=ManifestBackend()
    )
    det.process_batch(_docs(spark, [(1, BASE)]), 0)
    with pytest.raises(ValueError, match="storage backend"):
        IncrementalNearDup(
            spark, str(tmp_path / "state"), threshold=0.5,
            backend=LocalPosixBackend(),
        )
    # and the sealed backend still opens
    again = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, backend=ManifestBackend()
    )
    r = {x["doc_id"]: x for x in again.process_batch(_docs(spark, [(2, NEAR)]), 1).collect()}
    assert r[2]["is_dup"] and r[2]["dup_of"] == 1


def test_legacy_root_level_store_adopted_in_place(spark, tmp_path):
    """A pre-r9 store (live parquet at the store ROOT, no pointer) is
    adopted at the first locked operation: files move into v1, the
    pointer commits, and every pre-adoption canonical still matches —
    including across a crash mid-adoption (re-entry completes it)."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    state = str(tmp_path / "state")
    det = IncrementalNearDup(spark, state, threshold=0.5)
    det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)

    # demote to the legacy layout: move epoch files back to the roots,
    # drop the pointers (exactly what an r8 store looks like on disk)
    import shutil

    for name in ("sigs", "bands"):
        root = os.path.join(state, name)
        epoch_dir = os.path.join(root, f"v{det.backend.read_pointer(root)}")
        for n in os.listdir(epoch_dir):
            os.rename(os.path.join(epoch_dir, n), os.path.join(root, n))
        shutil.rmtree(epoch_dir)
        os.unlink(os.path.join(root, "CURRENT"))
    # r9 layouts seal the backend; r8 layouts had only bucket counts
    import json

    with open(os.path.join(state, "_layout.json"), "w") as fh:
        json.dump({"bands_buckets": None, "sigs_buckets": None}, fh)

    # a PUBLIC read on the un-adopted dir must see the state too
    # (adopt-on-read), not silently report an empty store
    inspect = IncrementalNearDup(spark, state, threshold=0.5)
    assert sorted(
        r["doc_id"] for r in inspect.read_store("sigs").collect()
    ) == [1, 2]

    fresh = IncrementalNearDup(spark, state, threshold=0.5)
    r = {x["doc_id"]: x for x in fresh.process_batch(_docs(spark, [(3, NEAR)]), 1).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1
    # adopted: files now live under v1 with a committed pointer
    for name in ("sigs", "bands"):
        root = os.path.join(state, name)
        assert fresh.backend.read_pointer(root) >= 1
        assert not [n for n in os.listdir(root) if n.endswith(".parquet")]
    # a manifest detector cannot adopt a POSIX-sealed legacy dir
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    with pytest.raises(ValueError, match="storage backend"):
        IncrementalNearDup(spark, state, threshold=0.5, backend=ManifestBackend())


def test_per_bucket_compaction_touches_only_hot_buckets(spark, tmp_path):
    """hot_bucket_threshold compaction must rewrite ONLY buckets whose
    file count exceeds the threshold (at 100 TB a full-store rewrite is
    itself a scale event), leave cold buckets' files byte-identical,
    and keep verdicts intact."""
    import glob
    import os

    from pyspark.sql import functions as F

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
    try:
        def synth(ids):
            return _docs(spark, [
                (i, f"document number {i} talks about subject s{i} using "
                    f"unique words w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g")
                for i in ids
            ])

        det.process_batch(synth(range(1, 9)), 0)
        det.process_batch(synth(range(9, 17)), 1)

        # heat up ONE sigs bucket: ids hashing to bucket 0 (the bucketed
        # writer's id = pmod(murmur3(doc_id), n_buckets), same as F.hash)
        cand = spark.range(100, 200).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.hash(F.col("id").cast("long")), F.lit(4)).alias("b"),
        )
        hot_ids = [r["doc_id"] for r in cand.filter("b = 0").limit(12).collect()]
        det.process_batch(synth(hot_ids[:6]), 2)
        det.process_batch(synth(hot_ids[6:]), 3)

        from streaming_examples_spark.streaming.incremental_dedup import _BUCKET_ID_RE

        def files_per_bucket(store):
            out = {}
            for f in glob.glob(os.path.join(det._data_path(store), "*.parquet")):
                m = _BUCKET_ID_RE.search(os.path.basename(f))
                out.setdefault(int(m.group(1)), set()).add(os.path.basename(f))
            return out

        before = files_per_bucket("sigs")
        counts = {b: len(fs) for b, fs in before.items()}
        thr = min(counts.values())
        assert max(counts.values()) > thr, f"need a hot bucket, got {counts}"

        det.compact(hot_bucket_threshold=thr)

        after = files_per_bucket("sigs")
        for b, fs in before.items():
            if len(fs) <= thr:
                assert after[b] == fs, f"cold bucket {b} was touched"
            else:
                assert len(after[b]) == 1, f"hot bucket {b} not merged: {after[b]}"

        # store still answers: canonical set unchanged, probe works
        sigs = det.read_store("sigs")
        assert sigs.count() == sigs.select("doc_id").distinct().count()
        dup_of_one = synth([1]).collect()[0]["text"]
        r = {x["doc_id"]: x for x in det.process_batch(
            _docs(spark, [(5000, dup_of_one)]), 4).collect()}
        assert r[5000]["is_dup"] and r[5000]["dup_of"] == 1
    finally:
        _drop_store_tables(spark, tmp_path / "state")


def test_hot_bucket_compaction_crash_leaves_duplicates_not_holes(
    spark, tmp_path, monkeypatch
):
    """The per-bucket pass appends the merged file BEFORE deleting its
    inputs, so a crash between the two leaves duplicate rows at worst —
    never missing rows. After the crash: every pre-compact canonical is
    still matched (the probe's distinct collapses the dupes), and a
    later full compact heals the store back to one row per canonical."""
    import glob
    import os as _os

    from pyspark.sql import functions as F

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4)
    try:
        def synth(ids):
            return _docs(spark, [
                (i, f"document number {i} talks about subject s{i} using "
                    f"unique words w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g")
                for i in ids
            ])

        # plant a hot sigs bucket: ids hashing to bucket 0 across two
        # batches (bucket id = pmod(murmur3(doc_id), n), same as F.hash)
        cand = spark.range(100, 200).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.hash(F.col("id").cast("long")), F.lit(4)).alias("b"),
        )
        hot_ids = [r["doc_id"] for r in cand.filter("b = 0").limit(8).collect()]
        det.process_batch(synth(hot_ids[:4]), 0)
        det.process_batch(synth(hot_ids[4:]), 1)

        def sigs_state():
            sigs = det.read_store("sigs")
            ids = {r["doc_id"] for r in sigs.select("doc_id").distinct().collect()}
            return ids, sigs.count()

        ids_before, rows_before = sigs_state()
        n_files = len(glob.glob(_os.path.join(det._data_path("sigs"), "*.parquet")))
        assert n_files >= 2, "need a fragmented hot bucket"

        # inject at the seam: the first input deletion after the merged
        # append dies (works for any backend, unlike an os.remove patch)
        real_remove = det.backend.remove_file

        def crash_on_first_delete(path):
            raise RuntimeError("injected crash before input deletion")

        det.backend.remove_file = crash_on_first_delete
        with pytest.raises(RuntimeError, match="injected crash"):
            det.compact(hot_bucket_threshold=1)
        det.backend.remove_file = real_remove

        # duplicates, not holes: same canonical id set, MORE rows
        ids_after, rows_after = sigs_state()
        assert ids_after == ids_before
        assert rows_after > rows_before

        # the probe still matches a near-dup of a pre-crash canonical
        dup_of_first = synth([hot_ids[0]]).collect()[0]["text"]
        r = {x["doc_id"]: x for x in det.process_batch(
            _docs(spark, [(5000, dup_of_first)]), 2).collect()}
        assert r[5000]["is_dup"] and r[5000]["dup_of"] == hot_ids[0]

        # a later FULL compact heals: one row per canonical, verdicts keep
        # (5000 was a dup — dups are never folded into the store)
        det.compact()
        ids_healed, rows_healed = sigs_state()
        assert ids_healed == ids_before
        assert rows_healed == len(ids_healed)
        r2 = {x["doc_id"]: x for x in det.process_batch(
            _docs(spark, [(6000, dup_of_first)]), 3).collect()}
        assert r2[6000]["is_dup"] and r2[6000]["dup_of"] == hot_ids[0]
    finally:
        _drop_store_tables(spark, tmp_path / "state")


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 1234, 999983])
def test_random_stream_invariants(spark, tmp_path, seed):
    """Property test over random duplicate streams: families of exact
    copies (disjoint vocabularies across families) delivered in random
    batch splits with random redelivery of earlier batches' ids.
    Invariants, independent of the random order:

      * exactly ONE canonical per family — the smallest id in the
        family's earliest batch; every other member reports is_dup with
        dup_of inside the family (store match or smaller batch peer)
      * the sigs store holds exactly the canonicals
      * canonical ids are reported exactly once (redelivery folds away)
      * a full replay of every batch reports only dup ids, with the
        same verdicts (redelivery can re-verdict a dup, never flip it
        or duplicate state)
    """
    import os
    import random

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    rng = random.Random(seed)
    n_fam = rng.randint(2, 4)
    fam_text = {
        f: " ".join(f"fam{f}word{j}" for j in range(12)) for f in range(n_fam)
    }
    docs = []  # (doc_id, family)
    next_id = 100
    for f in range(n_fam):
        for _ in range(rng.randint(1, 4)):
            docs.append((next_id, f))
            next_id += rng.randint(1, 7)
    rng.shuffle(docs)
    n_batches = rng.randint(1, min(3, len(docs)))
    batches = [docs[i::n_batches] for i in range(n_batches)]

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
    family_of = dict(docs)
    reports = []
    for b, members in enumerate(batches):
        rows = [(i, fam_text[f]) for i, f in members]
        # redeliver some ids from STRICTLY earlier batches
        for earlier in batches[:b]:
            for i, f in earlier:
                if rng.random() < 0.3:
                    rows.append((i, fam_text[f]))
        reports.extend(det.process_batch(_docs(spark, rows), b).collect())

    # expected canonical per family: smallest id in its earliest batch
    expected_canon = {}
    for members in batches:
        for i, f in sorted(members, key=lambda x: x[0]):
            if f not in expected_canon:
                expected_canon[f] = i

    by_id = {}
    for r in reports:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert set(by_id) == {i for i, _ in docs}
    for i, f in docs:
        rows = by_id[i]
        if i == expected_canon[f]:
            assert len(rows) == 1 and not rows[0]["is_dup"]
        else:
            for r in rows:
                assert r["is_dup"] and family_of[r["dup_of"]] == f and r["dup_of"] != i

    sigs = det.read_store("sigs")
    assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == sorted(
        expected_canon.values()
    )

    # full replay: canonicals fold away; dups re-verdict identically
    for b, members in enumerate(batches):
        replay = {
            r["doc_id"]: r
            for r in det.process_batch(
                _docs(spark, [(i, fam_text[f]) for i, f in members]), 100 + b
            ).collect()
        }
        for i, r in replay.items():
            f = family_of[i]
            assert i != expected_canon[f]
            assert r["is_dup"] and family_of[r["dup_of"]] == f
    sigs2 = det.read_store("sigs")
    assert sigs2.count() == len(expected_canon)


@pytest.mark.slow
def test_streaming_foreachbatch_e2e(spark, tmp_path):
    """The detector really runs as the foreachBatch processor the
    module docstring promises: a file-backed document stream delivered
    in two micro-batches, per-batch reports appended by the sink, the
    cross-batch near-dup found against state folded in by an earlier
    BATCH of the SAME query — not a direct process_batch call."""
    import os

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    src = str(tmp_path / "src")
    out = str(tmp_path / "reports")
    os.makedirs(src)
    _docs(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode("append").parquet(src)

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)

    def sink(df, batch_id):
        det.process_batch(df, batch_id).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch arrives after the first is fully folded in
        _docs(
            spark,
            [(3, NEAR), (4, "fresh unseen text about databases and storage engines")],
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    reports = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(reports) == {1, 2, 3, 4}
    assert not reports[1]["is_dup"] and not reports[2]["is_dup"]
    assert reports[3]["is_dup"] and reports[3]["dup_of"] == 1
    assert not reports[4]["is_dup"]


def test_compaction_preserves_state_and_verdicts(spark, detector):
    import glob
    import os

    detector.process_batch(_docs(spark, [(1, BASE)]), 0)
    detector.process_batch(_docs(spark, [(2, OTHER)]), 1)
    detector.process_batch(_docs(spark, [(5, "fresh unseen text about databases and storage engines")]), 2)

    n_before = len(glob.glob(os.path.join(detector._data_path("sigs"), "*.parquet")))
    detector.compact(target_partitions=1)
    n_after = len(glob.glob(os.path.join(detector._data_path("sigs"), "*.parquet")))
    assert n_after < n_before and n_after == 1

    sigs = detector.read_store("sigs")
    assert sorted(r["doc_id"] for r in sigs.select("doc_id").collect()) == [1, 2, 5]
    # probe still works against the compacted store
    r = {x["doc_id"]: x for x in detector.process_batch(_docs(spark, [(9, NEAR)]), 3).collect()}
    assert r[9]["is_dup"] and r[9]["dup_of"] == 1


def test_writer_lock_blocks_concurrent_writers(spark, detector, tmp_path):
    """A live lock (owner = this very-alive process) must make BOTH
    writer entry points refuse: an append racing compact()'s directory
    swap is renamed into .old and deleted — silent store loss."""
    import json
    import os
    import socket

    detector.process_batch(_docs(spark, [(1, BASE)]), 0)

    lock = detector._lock_path()
    with open(lock, "w") as fh:
        json.dump(
            {"pid": os.getpid(), "host": socket.gethostname(), "role": "compact"}, fh
        )
    try:
        with pytest.raises(RuntimeError, match="locked by another writer"):
            detector.process_batch(_docs(spark, [(2, OTHER)]), 1)
        with pytest.raises(RuntimeError, match="locked by another writer"):
            detector.compact()
    finally:
        os.unlink(lock)
    # and with the lock gone, both run again (released on exit, too)
    detector.process_batch(_docs(spark, [(2, OTHER)]), 1)
    detector.compact()
    assert not os.path.exists(lock)


def test_writer_lock_breaks_stale_lock_of_dead_process(spark, detector):
    """A lock whose owner pid is verifiably dead on this host is a
    crash leftover: broken automatically, batch proceeds. An owner on
    another host can NOT be proven dead — refuse instead."""
    import json
    import os
    import socket
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    os.makedirs(detector.state_dir, exist_ok=True)
    with open(detector._lock_path(), "w") as fh:
        json.dump(
            {"pid": proc.pid, "host": socket.gethostname(), "role": "compact"}, fh
        )
    out = {r["doc_id"]: r for r in detector.process_batch(_docs(spark, [(1, BASE)]), 0).collect()}
    assert not out[1]["is_dup"]  # stale lock broken, batch ran
    assert not os.path.exists(detector._lock_path())

    with open(detector._lock_path(), "w") as fh:
        json.dump({"pid": proc.pid, "host": "some-other-host", "role": "compact"}, fh)
    try:
        with pytest.raises(RuntimeError, match="locked by another writer"):
            detector.process_batch(_docs(spark, [(2, OTHER)]), 1)
    finally:
        os.unlink(detector._lock_path())


def _lock_hammer_worker(state_dir, log_path, n_iters):
    import os
    import time as _t

    from streaming_examples_spark.streaming.incremental_dedup import writer_lock

    done = 0
    while done < n_iters:
        try:
            with writer_lock(state_dir, "hammer"):
                fd = os.open(log_path, os.O_WRONLY | os.O_APPEND | os.O_CREAT)
                os.write(fd, f"enter {os.getpid()}\n".encode())
                _t.sleep(0.001)
                os.write(fd, f"exit {os.getpid()}\n".encode())
                os.close(fd)
            done += 1
        except RuntimeError:
            _t.sleep(0.0005)  # non-blocking lock: busy-retry


def _assert_strictly_serial(log_path):
    import os

    events = []
    with open(log_path) as fh:
        for line in fh:
            kind, pid = line.split()
            events.append((kind, pid))
    assert events, "no critical sections ran"
    for i in range(0, len(events), 2):
        assert events[i][0] == "enter" and events[i + 1][0] == "exit"
        assert events[i][1] == events[i + 1][1]  # same holder, no overlap
    return len(events) // 2


def test_writer_lock_multiprocess_hammer(tmp_path):
    """Mutual exclusion under real contention: four processes hammer
    one state dir; the enter/exit log must be strictly serial — any
    TOCTOU in acquire (the reviewed two-breakers race) shows up as
    interleaved enters."""
    import multiprocessing as mp

    state, log = str(tmp_path / "state"), str(tmp_path / "log")
    procs = [
        mp.Process(target=_lock_hammer_worker, args=(state, log, 15))
        for _ in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert _assert_strictly_serial(log) == 4 * 15


def test_writer_lock_stale_break_race_stays_exclusive(tmp_path):
    """Four processes all find the same dead-owner lock and race to
    break it: exactly one rename can win, everyone eventually gets a
    turn, and the critical sections stay strictly serial."""
    import json
    import multiprocessing as mp
    import os
    import socket
    import subprocess

    state, log = str(tmp_path / "state"), str(tmp_path / "log")
    os.makedirs(state)
    dead = subprocess.Popen(["true"])
    dead.wait()
    with open(os.path.join(state, "_writer.lock"), "w") as fh:
        json.dump(
            {"pid": dead.pid, "host": socket.gethostname(), "role": "crashed"}, fh
        )
    procs = [
        mp.Process(target=_lock_hammer_worker, args=(state, log, 5))
        for _ in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert _assert_strictly_serial(log) == 4 * 5


def test_cap_uses_compacted_summary_and_survives_restart(spark, tmp_path):
    """After compact(), store-side viral membership comes from the
    band_hot summary (the per-batch check reads the summary + appends
    since it, never the whole bands store). A key whose STORE
    membership alone reaches the cap must gate a later single-
    occurrence batch doc — including in a fresh detector instance
    (restart path: summary + delta rebuilt from disk)."""
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    import os

    state = str(tmp_path / "state")
    det = IncrementalNearDup(spark, state, threshold=0.5, max_bucket_size=2)
    # batch 0: three identical docs — within-batch count 3 > cap 2, so
    # the peer path is gated and all three land in the store canonical
    r0 = {x["doc_id"]: x for x in det.process_batch(
        _docs(spark, [(1, BASE), (2, BASE), (3, BASE)]), 0).collect()}
    assert not any(r0[i]["is_dup"] for i in (1, 2, 3))
    det.compact()
    assert os.path.exists(os.path.join(det._data_path("band_hot"), "_files.json"))
    # batch 1, same detector: the duplicate's keys hit store count 3 ≥
    # cap via the summary → hist path gated, no candidates
    r1 = det.process_batch(_docs(spark, [(4, BASE)]), 1).collect()[0]
    assert not r1["is_dup"] and r1["n_candidates"] == 0
    # batch 2, FRESH instance (restart): summary + post-compact delta
    # (doc 4's append) reload from disk; still gated
    det2 = IncrementalNearDup(spark, state, threshold=0.5, max_bucket_size=2)
    r2 = det2.process_batch(_docs(spark, [(5, BASE)]), 2).collect()[0]
    assert not r2["is_dup"] and r2["n_candidates"] == 0
    # control: an uncapped detector on the same inputs DOES match
    open_det = IncrementalNearDup(
        spark, str(tmp_path / "open"), threshold=0.5, max_bucket_size=None
    )
    open_det.process_batch(_docs(spark, [(1, BASE)]), 0).collect()
    ro = open_det.process_batch(_docs(spark, [(6, BASE)]), 1).collect()[0]
    assert ro["is_dup"]


def test_gc_drops_stale_epoch_table_registrations(spark, tmp_path):
    """A compaction crash after the pointer flip but before its DROP
    TABLE leaves the SUPERSEDED epoch's table registered in any
    session that survives the crash, pointing at a directory the GC
    then deletes. The next locked op must re-drop every registered
    epoch-version that is not the committed one (fresh sessions never
    see the problem — table names are epoch-versioned)."""
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )

    det = IncrementalNearDup(
        spark, str(tmp_path / "state"), threshold=0.5, bands_buckets=4
    )
    try:
        det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
        cur_table = det.store_table("bands")  # ..._v1
        # simulate the crash window: the NEXT epoch's name left
        # registered by a compaction that died post-flip (here: a stale
        # registration over the CURRENT dir — content irrelevant, the
        # registration itself is the hazard)
        stale = f"{det._bands_table}_v9"
        spark.sql(
            f"CREATE TABLE {stale} (band_id INT, band_key STRING, doc_id BIGINT) "
            f"USING parquet LOCATION '{det._data_path('bands')}'"
        )
        det.process_batch(_docs(spark, [(3, NEAR)]), 1)  # locked op runs GC
        names = {
            r.tableName
            for r in spark.sql(f"SHOW TABLES LIKE '{det._bands_table}*'").collect()
        }
        assert stale.split(".")[-1] not in names
        assert cur_table.split(".")[-1] in names  # the live epoch stays
    finally:
        _drop_store_tables(spark, tmp_path / "state")


@pytest.mark.slow
def test_dual_writer_build_fencing_detector(spark, tmp_path, monkeypatch):
    """Two-host schedule over one manifest-backed detector store (the
    advisory lock is per-filesystem — defeated to model two hosts):
    a remote builder's claim on the next epoch makes the local
    compact raise 'dual-writer detected'; the documented manual heal
    unblocks; a mid-build reclaim (second same-host writer once the
    lock is defeated) fails the first writer's commit-time validation
    instead of publishing a dir it no longer owns. Interleaved appends
    from two instances stay additive; verdicts stay correct after
    every step."""
    import contextlib
    import os

    from streaming_examples_spark.streaming import incremental_dedup as incdedup_mod
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    monkeypatch.setattr(
        incdedup_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    state = str(tmp_path / "state")
    detA = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    detA.process_batch(_docs(spark, [(1, BASE)]), 0)
    # interleaved appends from a SECOND instance are additive
    detB = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    detB.process_batch(_docs(spark, [(2, OTHER)]), 1)
    r = {x["doc_id"]: x for x in detA.process_batch(_docs(spark, [(3, NEAR)]), 2).collect()}
    assert r[3]["is_dup"] and r[3]["dup_of"] == 1

    # (1) a REMOTE host's claim on the bands next-epoch blocks compact
    # — and blocks it BEFORE touching the dir: hostB's in-flight
    # writes must survive the refusal (a delete-then-refuse order
    # would gut the dir while hostB's intact marker still lets it
    # validate and commit the half-deleted epoch)
    b = ManifestBackend()
    bands_v2 = os.path.join(state, "bands", "v2")
    b.claim_build(bands_v2, "hostB:1:feedface")
    b.prepare_dir(bands_v2)
    sentinel = os.path.join(bands_v2, "part-hostB-0000.parquet")
    b.publish_file(sentinel, b"hostB-in-flight")
    with pytest.raises(RuntimeError, match="dual-writer detected"):
        detA.compact(target_partitions=1)
    assert b.read_pointer(os.path.join(state, "bands")) == 1  # intact
    assert os.path.exists(sentinel)  # hostB's build untouched
    b.release_build(bands_v2)  # operator: hostB is dead
    b.remove_tree(bands_v2)  # operator clears the dead build too
    detA.compact(target_partitions=1)
    assert b.read_pointer(os.path.join(state, "bands")) == 2

    # (2) mid-build reclaim: B compacts fully between A's claim and
    # A's commit-time validation — A must refuse to commit
    real_validate = detA.backend.validate_build
    fired = {"done": False}

    def hijack(path, owner):
        if not fired["done"]:
            fired["done"] = True
            detB.compact(target_partitions=1)
        return real_validate(path, owner)

    monkeypatch.setattr(detA.backend, "validate_build", hijack)
    with pytest.raises(RuntimeError, match="build fencing violation"):
        detA.compact(target_partitions=1)
    # B's compaction committed; the store still answers correctly
    detC = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    NEAR2 = BASE.replace("warm fire", "cold fire")
    r2 = {x["doc_id"]: x for x in detC.process_batch(_docs(spark, [(4, NEAR2)]), 3).collect()}
    assert r2[4]["is_dup"] and r2[4]["dup_of"] == 1
    sigs = detC.read_store("sigs")
    assert sorted(x["doc_id"] for x in sigs.select("doc_id").collect()) == [1, 2]


@pytest.mark.slow
def test_compact_folds_concurrent_remote_append(spark, tmp_path, monkeypatch):
    """The append-vs-remote-compact race, healed instead of silently
    lost: a second writer's append landing in the CURRENT epoch after
    the compact pinned its source-file set (advisory lock defeated to
    model a second host) must survive the epoch flip — folded into the
    new epoch and counted in metrics.folded_straggler_files — so the
    straggler doc keeps catching its future near-duplicates."""
    import contextlib

    from streaming_examples_spark.streaming import incremental_dedup as incdedup_mod
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    monkeypatch.setattr(
        incdedup_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    state = str(tmp_path / "state")
    detA = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    detA.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)

    THIRD = (
        "entirely new material on state stores committing epochs through "
        "generation pointers with conditional puts on object storage"
    )
    detB = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    # model the actual race window: a REMOTE batch whose (lagging)
    # listing never showed the in-flight build dir — with a fresh
    # listing its _gc_epochs would refuse on detA's live claim (the
    # fencing test above) or, same-host, reclaim it (which the
    # advisory lock forbids while detA holds it); neither is the
    # schedule the fold exists for
    monkeypatch.setattr(detB, "_gc_epochs", lambda: None)
    real_commit = detA.backend.commit_pointer
    fired = {"done": False}

    def inject_remote_append(root, version):
        # between the rewrite (which consumed the pinned file set) and
        # the pointer flip, a remote batch appends to the OLD epoch
        if not fired["done"]:
            fired["done"] = True
            detB.process_batch(_docs(spark, [(5, THIRD)]), 100)
        return real_commit(root, version)

    monkeypatch.setattr(detA.backend, "commit_pointer", inject_remote_append)
    detA.compact(target_partitions=1)
    folded = detA.metrics.snapshot()["folded_straggler_files"]
    assert sum(folded.values()) >= 1, folded

    # the straggler doc's signatures/bands made it into the new epoch:
    # a near-variant still dedups against it, and its sig row survives
    detC = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    sigs = {x["doc_id"] for x in detC.read_store("sigs").select("doc_id").collect()}
    assert 5 in sigs, sigs
    NEAR_THIRD = THIRD.replace("object storage", "cloud storage")
    r = {
        x["doc_id"]: x
        for x in detC.process_batch(_docs(spark, [(6, NEAR_THIRD)]), 101).collect()
    }
    assert r[6]["is_dup"] and r[6]["dup_of"] == 5


def test_gc_refolds_stragglers_after_crash_between_flip_and_removal(
    spark, tmp_path, monkeypatch
):
    """The r10 fold's crash window, now healed (r10 ADVICE): a
    compaction that dies AFTER its pointer flip but BEFORE folding +
    removing the superseded epoch hands that dir to the next
    _gc_epochs — which must re-run the straggler fold from the
    persisted ``_consumed.json`` manifest instead of deleting the
    remote host's unconsumed append blind."""
    import contextlib

    from streaming_examples_spark.streaming import incremental_dedup as incdedup_mod
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    monkeypatch.setattr(
        incdedup_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    state = str(tmp_path / "state")
    detA = IncrementalNearDup(spark, state, threshold=0.5, backend=ManifestBackend())
    detA.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)

    THIRD = (
        "entirely new material on state stores committing epochs through "
        "generation pointers with conditional puts on object storage"
    )
    detB = IncrementalNearDup(spark, state, threshold=0.5, backend=ManifestBackend())
    monkeypatch.setattr(detB, "_gc_epochs", lambda: None)
    real_commit = detA.backend.commit_pointer
    fired = {"done": False}

    def inject_remote_append(root, version):
        if not fired["done"]:
            fired["done"] = True
            detB.process_batch(_docs(spark, [(5, THIRD)]), 100)
        return real_commit(root, version)

    monkeypatch.setattr(detA.backend, "commit_pointer", inject_remote_append)

    # crash exactly in the window: pointer flipped, fold never ran
    def crash(*a, **kw):
        raise RuntimeError("simulated crash between flip and fold")

    monkeypatch.setattr(detA, "_fold_stragglers", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        detA.compact(target_partitions=1)

    # recovery: a fresh detector's first locked op runs _gc_epochs,
    # which folds the straggler from the manifest before reclaiming
    detC = IncrementalNearDup(spark, state, threshold=0.5, backend=ManifestBackend())
    NEAR_THIRD = THIRD.replace("object storage", "cloud storage")
    r = {
        x["doc_id"]: x
        for x in detC.process_batch(_docs(spark, [(6, NEAR_THIRD)]), 101).collect()
    }
    folded = detC.metrics.snapshot()["folded_straggler_files"]
    assert sum(folded.values()) >= 1, folded
    sigs = {x["doc_id"] for x in detC.read_store("sigs").select("doc_id").collect()}
    assert 5 in sigs, sigs
    assert r[6]["is_dup"] and r[6]["dup_of"] == 5
    # and no below-pointer epoch dirs survive the healed GC
    for store in ("sigs", "bands"):
        root = detC._path(store)
        cur = detC.backend.read_pointer(root)
        import re as _re

        epochs = [
            int(m.group(1))
            for entry in detC.backend.list_dir(root)
            if (m := _re.fullmatch(r"v(\d+)", entry))
        ]
        assert all(e == cur for e in epochs), (store, cur, epochs)


def test_detector_backlog_metrics_track_appends_and_epochs(spark, tmp_path):
    """Backlog/lag monitoring (the replication-slot dashboard analog):
    a two-batch run must report per-batch appended-file counts, a
    monotone total, per-store epochs, and store_stats() sizes that
    grow with content and reflect a compaction's epoch bump."""
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )

    det = IncrementalNearDup(spark, str(tmp_path / "state"), threshold=0.5)
    det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    m1 = det.metrics.snapshot()
    assert m1["batches"] == 1 and m1["compactions"] == 0
    assert m1["appended_files_last_batch"]["sigs"] >= 1
    assert m1["appended_files_last_batch"]["bands"] >= 1
    assert m1["store_epoch"] == {"sigs": 1, "bands": 1}

    s1 = det.store_stats()
    assert s1["stores"]["sigs"]["files"] >= 1 and s1["stores"]["sigs"]["bytes"] > 0
    assert s1["stores"]["bands"]["epoch"] == 1
    assert s1["stores"]["band_hot"] == {"epoch": 0, "files": 0, "bytes": 0}

    # batch 2: one new canonical + one dup (dup appends nothing extra
    # beyond the canonical's rows); totals are monotone
    det.process_batch(_docs(spark, [(3, NEAR), (5, "fresh unseen text about databases and storage engines")]), 1)
    m2 = det.metrics.snapshot()
    assert m2["batches"] == 2
    assert m2["appended_files_total"]["sigs"] >= m1["appended_files_total"]["sigs"]
    assert m2["appended_files_last_batch"]["sigs"] >= 1
    s2 = det.store_stats()
    assert s2["stores"]["sigs"]["bytes"] > s1["stores"]["sigs"]["bytes"] or (
        s2["stores"]["sigs"]["files"] > s1["stores"]["sigs"]["files"]
    )

    # compaction bumps epochs and the compaction counter; the rewritten
    # store reads back with FEWER-OR-EQUAL files than the append pile
    det.compact(target_partitions=1)
    m3 = det.metrics.snapshot()
    assert m3["compactions"] == 1
    assert m3["store_epoch"]["sigs"] == 2 and m3["store_epoch"]["bands"] == 2
    s3 = det.store_stats()
    assert s3["stores"]["sigs"]["epoch"] == 2
    assert s3["stores"]["sigs"]["files"] <= s2["stores"]["sigs"]["files"]
    # an empty batch appends nothing: the last-batch gauge resets
    det.process_batch(_docs(spark, [(1, BASE)]), 2)  # replayed id only
    m4 = det.metrics.snapshot()
    assert m4["appended_files_last_batch"].get("sigs", 0) == 0

    # a REAL append after the compaction is counted against a fresh
    # baseline — the compaction cleared the append-count cache, so the
    # delta is not computed against the pre-rewrite file pile
    det.process_batch(
        _docs(spark, [(7, "wholly new corpus text on bucketed joins")]), 3
    )
    m5 = det.metrics.snapshot()
    assert m5["appended_files_last_batch"]["sigs"] >= 1
    assert m5["appended_files_last_batch"]["bands"] >= 1


def test_rebuild_hot_coverage_exact_under_list_lag(spark, tmp_path):
    """The band_hot summary's ``_files.json`` must name EXACTLY the
    files the summary aggregation read. Under list-after-write lag the
    backend listing runs stale-SHORT right after the compaction
    rewrite; a summary covering fewer files than it aggregated makes
    the per-batch refresh delta-count those files ON TOP of the
    summary — double-counted membership, spurious virality, probes
    permanently skipped (the unsafe direction). _rebuild_hot therefore
    takes coverage from the frame's own inputFiles(); this pins both
    the invariant and the behavioral consequence."""
    import json
    import os

    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    from streaming_examples_spark.streaming.state_backend import (
        LaggedManifestBackend,
    )

    state = str(tmp_path / "state")
    det = IncrementalNearDup(
        spark, state, threshold=0.5, max_bucket_size=2,
        backend=LaggedManifestBackend(),
    )
    # 3 identical docs, within-batch count 3 > cap 2: peer path gated,
    # all three stored canonical — every shared band key has n=3
    det.process_batch(_docs(spark, [(1, BASE), (2, BASE), (3, BASE)]), 0)
    det.compact()  # rewrites bands, rebuilds band_hot INSIDE lag windows
    with open(os.path.join(det._data_path("band_hot"), "_files.json")) as fh:
        covered = fh.read()
    physical = sorted(
        n
        for n in os.listdir(det._data_path("bands"))
        if n.endswith(".parquet")
    )
    assert physical and json.loads(covered) == physical
    # behavioral pin: a FRESH instance with cap 5 sees true membership
    # 3 < 5 and must still MATCH a new copy; stale-short coverage would
    # have delta-recounted the same 3 docs on top of the summary
    # (3 + 3 = 6 ≥ 5 → spuriously gated, no candidates)
    det2 = IncrementalNearDup(
        spark, state, threshold=0.5, max_bucket_size=5,
        backend=LaggedManifestBackend(),
    )
    r = det2.process_batch(_docs(spark, [(4, BASE)]), 1).collect()[0]
    assert r["is_dup"] and r["dup_of"] == 1


def test_cap_cache_singleton_eviction_bounds_driver_memory(spark, tmp_path):
    """cap_cache_max_keys bounds the driver-side since-compact count
    cache: overflow evicts singleton entries (understate ≤1 — the cap
    fires late, never early). With a tiny bound, a refresh that reads
    prior appends must leave the cache within the bound."""
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )

    det = IncrementalNearDup(
        spark,
        str(tmp_path / "state"),
        threshold=0.5,
        max_bucket_size=100,
        cap_cache_max_keys=3,
    )
    det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0).count()
    # batch 1's refresh reads batch 0's appended band files (~18
    # singleton keys > bound 3) and must evict down to the bound
    det.process_batch(_docs(spark, [(3, NEAR)]), 1).count()
    assert len(det._cap_delta) <= 3


def test_compact_crash_before_summary_swap_resets_cap_cache(spark, tmp_path):
    """A compact() that rewrites the bands store but dies BEFORE the
    band_hot summary swap leaves the epoch token unchanged (still
    '<no-summary>'): a cache that survived would keep delta counts for
    the DELETED files while re-counting their rewritten replacements —
    counts double (stale-HIGH), keys turn spuriously viral, probes get
    skipped forever. Both guards must hold: the same-process compact
    failure drops the cache outright, and a DIFFERENT process whose
    cache references the vanished files goes cold at its next refresh."""
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )

    state = str(tmp_path / "state")
    det = IncrementalNearDup(spark, state, threshold=0.5, max_bucket_size=100)
    det.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0).count()
    # batch 1's refresh folds batch 0's append files into the delta
    det.process_batch(_docs(spark, [(3, NEAR)]), 1).count()
    assert det._cap_seen and det._cap_delta

    # a second process's cache also warmed from the same files
    other = IncrementalNearDup(spark, state, threshold=0.5, max_bucket_size=100)
    other._refresh_cap_counts()
    assert det._cap_seen <= other._cap_seen  # det has not seen batch 1's own appends yet

    def boom():
        raise RuntimeError("crash before summary swap")

    det._rebuild_hot = boom  # bands rewrite completes, summary never lands
    with pytest.raises(RuntimeError, match="summary swap"):
        det.compact()
    # guard 1: the failing process dropped its cache on the way out
    assert det._cap_epoch is None and not det._cap_seen and not det._cap_delta
    # the rewrite replaced every pre-crash file name
    assert not (other._cap_seen & set(det._bands_data_files()))

    # guard 2: the OTHER process's next refresh sees its counted files
    # vanished and restarts cold instead of double-counting
    other._refresh_cap_counts()
    fresh = IncrementalNearDup(spark, state, threshold=0.5, max_bucket_size=100)
    fresh._refresh_cap_counts()  # exact cold rebuild from the live store
    assert other._cap_delta == fresh._cap_delta
    assert other._cap_seen == fresh._cap_seen

    # and the failing process's own next batch rebuilds exact counts too
    det.process_batch(_docs(spark, [(4, BASE + " extra tail words")]), 2).count()
    for key, n in fresh._cap_delta.items():
        assert det._cap_delta.get(key, 0) >= n  # includes batch 2's appends
        assert det._cap_delta[key] <= n + 1  # never doubled


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 4242])
def test_random_lifecycle_compactions_crashes_restarts(spark, tmp_path, seed, backend_cls):
    """Durability soak over the epoch-pointer layout: a random
    duplicate-family stream interleaved with random MAINTENANCE events
    — full compactions, hot-bucket compactions, crash injections at
    random backend primitives mid-compact, and kill-and-restart with a
    fresh detector + fresh backend instance — under BOTH storage
    backends. Invariants at the end, regardless of the schedule:

      * exactly ONE canonical per family (smallest id of its earliest
        batch); every other member reported is_dup with an in-family
        dup_of
      * redelivered ids fold away (no duplicate canonical reports)
      * after a final full compact, the sigs store holds exactly the
        canonicals, one row each (crash-window duplicates healed)
    """
    import random

    from streaming_examples_spark.streaming.incremental_dedup import IncrementalNearDup

    rng = random.Random(seed)
    state = str(tmp_path / "state")
    n_fam = rng.randint(2, 3)
    fam_text = {f: " ".join(f"fam{f}tok{j}" for j in range(12)) for f in range(n_fam)}
    docs = []
    next_id = 100
    for f in range(n_fam):
        for _ in range(rng.randint(2, 4)):
            docs.append((next_id, f))
            next_id += rng.randint(1, 5)
    rng.shuffle(docs)
    n_batches = rng.randint(3, 4)
    batches = [docs[i::n_batches] for i in range(n_batches)]

    def fresh_detector():
        return IncrementalNearDup(
            spark, state, threshold=0.5, bands_buckets=4, backend=backend_cls()
        )

    det = fresh_detector()
    reports = []
    try:
        for b, members in enumerate(batches):
            rows = [(i, fam_text[f]) for i, f in members]
            for earlier in batches[:b]:
                for i, f in earlier:
                    if rng.random() < 0.3:
                        rows.append((i, fam_text[f]))  # redelivery
            reports.extend(det.process_batch(_docs(spark, rows), b).collect())

            event = rng.choice(["none", "compact", "hot", "crash", "restart"])
            if event == "compact":
                det.compact()
            elif event == "hot":
                det.compact(hot_bucket_threshold=rng.choice([1, 2]))
            elif event == "crash":
                # die once at a random primitive inside the compaction,
                # then RESTART over whatever the crash left behind
                method = rng.choice(["commit_pointer", "remove_tree", "remove_file"])
                calls = {"n": 0, "at": rng.randint(1, 3)}

                def should(*_a, **_k):
                    calls["n"] += 1
                    return calls["n"] == calls["at"]

                _crash_once(det.backend, method, should)
                try:
                    det.compact(
                        hot_bucket_threshold=rng.choice([None, 1])
                    )
                except RuntimeError:
                    pass  # the injected crash (may also not fire: short passes)
                det = fresh_detector()
            elif event == "restart":
                det = fresh_detector()

        # expected canonical per family: smallest id in its earliest batch
        expected_canon = {}
        for members in batches:
            for i, f in sorted(members, key=lambda x: x[0]):
                if f not in expected_canon:
                    expected_canon[f] = i
        family_of = dict(docs)

        by_id = {}
        for r in reports:
            by_id.setdefault(r["doc_id"], []).append(r)
        assert set(by_id) == {i for i, _ in docs}
        for i, f in docs:
            rows = by_id[i]
            if i == expected_canon[f]:
                assert len(rows) == 1 and not rows[0]["is_dup"], (i, rows)
            else:
                for r in rows:
                    assert r["is_dup"] and family_of[r["dup_of"]] == f and r["dup_of"] != i

        det.compact()  # heal any crash-window duplicate rows
        sigs = det.read_store("sigs")
        got = sorted(x["doc_id"] for x in sigs.collect())
        assert got == sorted(expected_canon.values())
    finally:
        _drop_store_tables(spark, tmp_path / "state")


@pytest.mark.slow
@pytest.mark.parametrize("seed", [13, 4711])
def test_random_dual_host_schedules_fail_loud_or_heal(
    spark, tmp_path, seed, monkeypatch
):
    """Dual-HOST soak over one manifest-backed detector store: two
    instances carrying DIFFERENT host identities (the advisory lock is
    defeated — the object-store scenario it cannot order) run a random
    interleaved schedule of batches, full compactions, hot-bucket
    compactions, and mid-compact remote appends (the straggler-fold
    window, injected at the victim's commit_pointer with the remote
    batch's epoch GC lag-stubbed as in the focused fold test).

    Allowed outcomes per op: success, or a LOUD fencing/CAS error
    ("dual-writer detected" / "build conflict" / "build fencing
    violation" / "pointer generation conflict"). Forbidden, and
    asserted at the end regardless of schedule:

      * silent canonical loss — every doc a COMPLETED batch reported
        canonical must still catch a near-variant at the end
      * double canonicals — at most one canonical per family across
        both writers' completed reports
      * an unreadable store — a fresh instance compacts and reads it
    """
    import contextlib
    import random
    import re as _re

    from streaming_examples_spark.streaming import incremental_dedup as incdedup_mod
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
    )
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    monkeypatch.setattr(
        incdedup_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    _ALLOWED = _re.compile(
        "dual-writer detected|build conflict|build fencing violation"
        "|pointer generation conflict"
    )
    rng = random.Random(seed)
    state = str(tmp_path / "state")

    def fresh(host):
        det = IncrementalNearDup(
            spark, state, threshold=0.5, backend=ManifestBackend()
        )
        det._writer_token = f"{host}:1:{rng.randrange(16**6):06x}"
        return det

    # NOTE: same-host reclaim logic keys on socket.gethostname(); both
    # tokens here are FOREIGN to it, so each instance refuses the
    # other's live claims — the faithful two-host model.
    dets = {"hostA": fresh("hostA"), "hostB": fresh("hostB")}

    fam_text = {
        f: " ".join(f"dw{seed}fam{f}tok{j}" for j in range(12)) for f in range(3)
    }
    next_id = {"n": 1000}
    canonical: dict[int, int] = {}  # doc_id -> family, completed reports only
    batch_no = {"n": 0}

    def run_batch(det, allow_gc_stub=False):
        f = rng.randrange(3)
        doc_id = next_id["n"]
        next_id["n"] += rng.randint(1, 5)
        batch_no["n"] += 1
        rows = [(doc_id, fam_text[f])]
        if canonical and rng.random() < 0.4:  # redelivery of a known doc
            known = rng.choice(sorted(canonical))
            rows.append((known, fam_text[canonical[known]]))
        try:
            rep = det.process_batch(_docs(spark, rows), batch_no["n"]).collect()
        except RuntimeError as e:
            assert _ALLOWED.search(str(e)), f"NOT a loud fencing error: {e}"
            return
        for r in rep:
            if not r["is_dup"]:
                canonical[r["doc_id"]] = f

    def run_compact(det, hot):
        try:
            det.compact(hot_bucket_threshold=rng.choice([1, 2]) if hot else None)
        except RuntimeError as e:
            assert _ALLOWED.search(str(e)), f"NOT a loud fencing error: {e}"

    def run_racing_compact(victim_host):
        """Remote batch lands mid-compact, after the rewrite pinned its
        file set (the straggler-fold window)."""
        victim = dets[victim_host]
        other = dets["hostB" if victim_host == "hostA" else "hostA"]
        real_commit = victim.backend.commit_pointer
        real_gc = other._gc_epochs
        fired = {"done": False}

        def inject(root, version):
            if not fired["done"]:
                fired["done"] = True
                # the remote batch's listing lags: it never saw the
                # in-flight build (fresh listing would refuse loudly —
                # covered by the plain-schedule ops above)
                other._gc_epochs = lambda: None
                try:
                    run_batch(other)
                finally:
                    other._gc_epochs = real_gc
            return real_commit(root, version)

        victim.backend.commit_pointer = inject
        try:
            run_compact(victim, hot=False)
        finally:
            victim.backend.commit_pointer = real_commit

    # seed both stores before the random schedule so mid-compact races
    # always target stores WITH data (a compact over empty stores never
    # reaches its commit point, making the injected race inert)
    run_batch(dets["hostA"])
    run_batch(dets["hostB"])
    for _ in range(10):
        host = rng.choice(["hostA", "hostB"])
        op = rng.choice(["batch", "batch", "batch", "compact", "hot", "race"])
        if op == "batch":
            run_batch(dets[host])
        elif op == "compact":
            run_compact(dets[host], hot=False)
        elif op == "hot":
            run_compact(dets[host], hot=True)
        else:
            run_racing_compact(host)

    # at most one canonical per family across both writers
    fams = list(canonical.values())
    assert len(fams) == len(set(fams)), f"double canonicals: {canonical}"

    # no silent canonical loss: every reported canonical still catches
    # a near-variant through a FRESH instance after a healing compact
    final = IncrementalNearDup(
        spark, state, threshold=0.5, backend=ManifestBackend()
    )
    final.compact(target_partitions=1)
    probe_id = 90000
    for doc_id, f in sorted(canonical.items()):
        near = fam_text[f].replace(f"dw{seed}fam{f}tok11", "variantword")
        batch_no["n"] += 1
        rep = {
            x["doc_id"]: x
            for x in final.process_batch(
                _docs(spark, [(probe_id, near)]), 10000 + batch_no["n"]
            ).collect()
        }
        assert rep[probe_id]["is_dup"], f"lost canonical {doc_id} (family {f})"
        assert rep[probe_id]["dup_of"] == doc_id
        probe_id += 1


# -- COMPOSED adversarial soak: dual-host × list-after-write lag ×
# crash injection on ONE detector store (VERDICT r11 #3). The three
# dimensions exist as separate soaks; a real object store presents
# them together: a shared LaggedManifestBackend models the server-side
# eventual-consistency view BOTH hosts read through, crashes fire at
# random backend primitives mid-op, and abandoned foreign claims are
# healed the documented way (heal_stale_builds) before the retry.


@pytest.mark.slow
@pytest.mark.parametrize("seed", [31, 77])
def test_composed_dual_host_lag_crash_detector_soak(
    spark, tmp_path, seed, monkeypatch
):
    """Every op succeeds or fails LOUDLY (fencing/CAS/injected crash);
    wedged claims heal via the operator recipe; at the end: no double
    canonicals, no silent canonical loss, and a fresh instance reads
    and compacts the store.

    One documented exception, asserted as such: a doc appended by the
    RACED remote batch (a dual-writer append mid-compact — already a
    contract violation the fold metric flags) may lose its bands when
    the post-flip straggler fold's listing is served stale by the lag
    double — `_fold_stragglers` is explicitly best-effort under
    list-after-write lag ("closing that needs time-bound leases").
    Those docs are TAINTED: their canonicals are tracked separately,
    allowed to be superseded by a later clean canonical, and their
    probe accepts documented loss. Everything the protocol PROMISES
    (all non-raced schedules, crash+heal+retry, fencing under lag)
    stays strict."""
    import contextlib
    import random
    import re as _re
    import time as _time

    from streaming_examples_spark.streaming import incremental_dedup as incdedup_mod
    from streaming_examples_spark.streaming.incremental_dedup import (
        IncrementalNearDup,
        _STORES,
    )
    from streaming_examples_spark.streaming.state_backend import (
        LaggedManifestBackend,
        heal_stale_builds,
    )

    monkeypatch.setattr(
        incdedup_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    _ALLOWED = _re.compile(
        "dual-writer detected|build conflict|build fencing violation"
        "|pointer generation conflict|injected crash"
    )
    rng = random.Random(seed)
    state = str(tmp_path / "state")
    shared_backend = LaggedManifestBackend(lag_ops=rng.randint(3, 12))

    def fresh(host):
        det = IncrementalNearDup(
            spark, state, threshold=0.5, backend=shared_backend
        )
        det._writer_token = f"{host}:1:{rng.randrange(16**6):06x}"
        return det

    dets = {"hostA": fresh("hostA"), "hostB": fresh("hostB")}

    def heal_all():
        # the documented operator action for a dead foreign builder:
        # age out its claims, store by store (markers sit at each
        # store root). TTL is safe here — the schedule is sequential,
        # so no build can be in flight during the heal.
        _time.sleep(0.05)
        det = dets["hostA"]
        for name in (*_STORES, "band_hot"):
            heal_stale_builds(shared_backend, det._path(name), 0.01)

    fam_text = {
        f: " ".join(f"cx{seed}fam{f}tok{j}" for j in range(12)) for f in range(3)
    }
    next_id = {"n": 1000}
    canonical: dict[int, int] = {}  # clean completed reports: strict
    raced_canonical: dict[int, int] = {}  # raced appends: documented
    batch_no = {"n": 0}

    def run_batch(det, tainted=False):
        f = rng.randrange(3)
        doc_id = next_id["n"]
        next_id["n"] += rng.randint(1, 5)
        batch_no["n"] += 1
        rows = [(doc_id, fam_text[f])]
        if canonical and rng.random() < 0.4:
            known = rng.choice(sorted(canonical))
            rows.append((known, fam_text[canonical[known]]))
        try:
            rep = det.process_batch(_docs(spark, rows), batch_no["n"]).collect()
        except RuntimeError as e:
            assert _ALLOWED.search(str(e)), f"NOT a loud error: {e}"
            return False
        for r in rep:
            if not r["is_dup"]:
                (raced_canonical if tainted else canonical)[r["doc_id"]] = f
        return True

    def run_compact(det, hot):
        try:
            det.compact(hot_bucket_threshold=rng.choice([1, 2]) if hot else None)
            return True
        except RuntimeError as e:
            assert _ALLOWED.search(str(e)), f"NOT a loud error: {e}"
            return False

    def run_crash(host):
        """Arm a one-shot crash at a random backend primitive, run a
        random op; on the loud failure heal + retry on a fresh
        instance — the full operator recovery loop under lag."""
        prim = rng.choice(["commit_pointer", "publish_file", "carry_file"])
        calls = {"n": 0, "at": rng.randint(1, 3)}
        real = getattr(shared_backend, prim)

        def wrapper(*a, **kw):
            calls["n"] += 1
            if calls["n"] == calls["at"]:
                raise RuntimeError("injected crash")
            return real(*a, **kw)

        setattr(shared_backend, prim, wrapper)
        op = rng.choice([lambda d: run_batch(d), lambda d: run_compact(d, False)])
        try:
            op(dets[host])
        finally:
            try:
                delattr(shared_backend, prim)
            except AttributeError:
                pass
        heal_all()
        dets[host] = fresh(host)
        assert run_batch(dets[host]), "post-crash retry did not complete"

    def run_racing_compact(victim_host):
        victim = dets[victim_host]
        other = dets["hostB" if victim_host == "hostA" else "hostA"]
        real_commit = shared_backend.commit_pointer
        real_gc = other._gc_epochs
        fired = {"done": False}

        def inject(root, version):
            if not fired["done"]:
                fired["done"] = True
                other._gc_epochs = lambda: None
                try:
                    run_batch(other, tainted=True)
                finally:
                    other._gc_epochs = real_gc
            return real_commit(root, version)

        monkeypatch.setattr(shared_backend, "commit_pointer", inject)
        try:
            run_compact(victim, hot=False)
        finally:
            monkeypatch.setattr(shared_backend, "commit_pointer", real_commit)

    run_batch(dets["hostA"])
    run_batch(dets["hostB"])
    for _ in range(8):
        host = rng.choice(["hostA", "hostB"])
        op = rng.choice(["batch", "batch", "compact", "hot", "race", "crash"])
        if op == "batch":
            run_batch(dets[host])
        elif op == "compact":
            run_compact(dets[host], hot=False)
        elif op == "hot":
            run_compact(dets[host], hot=True)
        elif op == "race":
            run_racing_compact(host)
        else:
            run_crash(host)

    # CLEAN canonicals are strictly unique per family; a raced
    # (tainted) canonical may additionally exist for a family — the
    # documented dual-writer-append residual, not a protocol promise
    fams = list(canonical.values())
    assert len(fams) == len(set(fams)), f"double canonicals: {canonical}"

    heal_all()
    final = IncrementalNearDup(
        spark, state, threshold=0.5, backend=shared_backend
    )
    final.compact(target_partitions=1)
    probe_id = 90000
    for doc_id, f in sorted(canonical.items()):
        # strict: a clean canonical must still catch near-variants —
        # dup_of may name an earlier raced canonical of the family if
        # that one's bands DID survive (both are legitimate members)
        near = fam_text[f].replace(f"cx{seed}fam{f}tok11", "variantword")
        batch_no["n"] += 1
        rep = {
            x["doc_id"]: x
            for x in final.process_batch(
                _docs(spark, [(probe_id, near)]), 10000 + batch_no["n"]
            ).collect()
        }
        assert rep[probe_id]["is_dup"], f"lost canonical {doc_id} (family {f})"
        legit = {doc_id} | {
            d for d, rf in raced_canonical.items() if rf == f
        }
        assert rep[probe_id]["dup_of"] in legit, (rep[probe_id], legit)
        probe_id += 1
    # documented-loss accounting for raced docs: the near-variant of a
    # family whose ONLY canonical was raced either still resolves (the
    # fold won its race) or reports canonical — silent loss confined
    # to the contract-violating append, never a wrong answer
    clean_fams = set(canonical.values())
    for f in sorted(set(raced_canonical.values()) - clean_fams):
        near = fam_text[f].replace(f"cx{seed}fam{f}tok11", "variantword")
        batch_no["n"] += 1
        rep = {
            x["doc_id"]: x
            for x in final.process_batch(
                _docs(spark, [(probe_id, near)]), 10000 + batch_no["n"]
            ).collect()
        }
        if rep[probe_id]["is_dup"]:
            raced_docs = {d for d, rf in raced_canonical.items() if rf == f}
            assert rep[probe_id]["dup_of"] in raced_docs
        probe_id += 1

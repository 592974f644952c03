"""The storage seam, proven with TWO backends.

`StateStorageBackend` (streaming/state_backend.py) documents an
object-store translation of the versioned pointer-commit protocol;
until round 8 only `LocalPosixBackend` existed, so a POSIX-shaped
assumption could hide in the protocol itself (reads resolving by
directory listing, carry targets assumed to have local bytes,
remove_tree assumed synchronous-visible). `ManifestBackend` enforces
the object-store constraints — no hardlinks, no directory renames,
deferred reference-aware deletes — and this module drives the SAME
lifecycle + crash-window suite through both backends, with the crash
injected at the seam (the backend methods), not at POSIX primitives.

Reference parity: the reference delegates equivalent durability to
Flink checkpoints + Kafka (transactional-cdc-processing
DataStreamV2Job.java:62-65 sync hashmap state backend); this engine
owns its state files, so it owns — and must prove — the protocol.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streaming_examples_spark.model.fixtures import TxLog
from streaming_examples_spark.streaming.cdc_stream import TxDenormBatchProcessor
from streaming_examples_spark.streaming.state_backend import (
    LaggedManifestBackend,
    LocalPosixBackend,
    ManifestBackend,
)

BACKENDS = {
    "posix": LocalPosixBackend,
    "manifest": ManifestBackend,
    # list-after-write lag (the classic object-store hazard): every
    # LIST-backed read serves a stale view for 5 operations after a
    # mutation; GETs stay fresh. The same suite must hold — the
    # protocol may never depend on a listing reflecting a just-issued
    # write (GC deferred deletes, carry enumeration, bucket loads).
    "manifest-lagged": LaggedManifestBackend,
}


@pytest.fixture(params=sorted(BACKENDS))
def backend_cls(request):
    return BACKENDS[request.param]


def _seed_log(n=8, base=30000):
    log = TxLog()
    for i in range(n):
        oid = base + i
        log.tx(
            lambda t, oid=oid: t.insert_order(oid),
            lambda t, oid=oid: t.insert_line(oid * 10, oid, price="5.00"),
        )
    return log


def _dfs(spark, log):
    return (
        log.order_events_df(spark),
        log.line_events_df(spark),
        log.tx_events_df(spark),
    )


def _one_line_tx(lsn, tx, line_id, order_id, price):
    log = TxLog()
    log._lsn, log._next_tx = lsn, tx
    log.tx(lambda t: t.insert_line(line_id, order_id, price=price))
    return log


def _crash_once(obj, method, should, exc_msg="injected crash"):
    """Wrap a backend method on the INSTANCE: raise once when `should`
    matches, pass through otherwise — the seam-level analog of the
    os.replace/os.link monkeypatching the POSIX-specific tests do."""
    real = getattr(obj, method)
    state = {"armed": True}

    def wrapper(*a, **kw):
        if state["armed"] and should(*a, **kw):
            state["armed"] = False
            raise RuntimeError(exc_msg)
        return real(*a, **kw)

    setattr(obj, method, wrapper)
    return state


# -- lifecycle: multi-batch, carry chains, restart -----------------------


@pytest.mark.slow
def test_lifecycle_carry_chain_and_restart(spark, tmp_path, backend_cls):
    """Three batches where most buckets go UNTOUCHED twice in a row
    (the manifest backend then carries a reference to a reference —
    must stay depth-1 and readable), then a fresh processor restarts
    over the same state dir and both old and new keys resolve."""
    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend_cls())
    assert proc.process(*_dfs(spark, _seed_log()), batch_id=0).count() == 8

    # batches 1 and 2 each touch ONE order: 30000's bucket twice
    d1 = proc.process(
        *_dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00")), batch_id=1
    ).collect()
    assert sorted(str(l["price"]) for l in d1[0]["lines"]) == ["5.00", "9.00"]
    d2 = proc.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300002, 30000, "2.00")), batch_id=2
    ).collect()
    assert sorted(str(l["price"]) for l in d2[0]["lines"]) == ["2.00", "5.00", "9.00"]

    # restart: a DIFFERENT order whose bucket has been carried through
    # v1→v2→v3 must still see its batch-0 state
    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend_cls())
    d3 = fresh.process(
        *_dfs(spark, _one_line_tx(99000, 990, 300073, 30007, "3.00")), batch_id=3
    ).collect()
    assert len(d3) == 1
    assert sorted(str(l["price"]) for l in d3[0]["lines"]) == ["3.00", "5.00"]

    # backend-aware state inspection sees EVERY key — physical and
    # carried buckets alike (a raw spark.read on the version dir would
    # miss manifest-carried buckets)
    keys = {
        r["order_key"]
        for r in fresh.read_state("order_state").select("order_key").collect()
    }
    assert keys == {30000 + i for i in range(8)}


@pytest.mark.slow
def test_manifest_backend_never_links_or_renames_dirs(spark, tmp_path, monkeypatch):
    """The constraint the double exists to enforce, enforced with
    tripwires: run the carry-heavy lifecycle under ManifestBackend
    while os.link on state files and any directory rename raise
    unconditionally — the batches must still commit, so the backend
    provably used neither."""
    import shutil as _shutil

    state = str(tmp_path / "state")
    real_link, real_rename, real_replace = os.link, os.rename, os.replace

    def no_link(src, dst, **kw):
        if "_bucket=" in str(dst):
            raise AssertionError(f"hardlink attempted on state file: {dst}")
        return real_link(src, dst, **kw)  # writer lock's claim stays legal

    def no_dir_rename(real):
        def guard(src, dst, **kw):
            if os.path.isdir(src):
                raise AssertionError(f"directory rename attempted: {src}")
            return real(src, dst, **kw)

        return guard

    monkeypatch.setattr("os.link", no_link)
    monkeypatch.setattr("os.rename", no_dir_rename(real_rename))
    monkeypatch.setattr("os.replace", no_dir_rename(real_replace))
    monkeypatch.setattr(  # shutil.move falls back to copy? forbid too
        "shutil.move",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("move attempted")),
    )

    proc = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=ManifestBackend()
    )
    assert proc.process(*_dfs(spark, _seed_log()), batch_id=0).count() == 8
    docs = proc.process(
        *_dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00")), batch_id=1
    ).collect()
    assert sorted(str(l["price"]) for l in docs[0]["lines"]) == ["5.00", "9.00"]
    # and the carried buckets really are manifests, not byte copies:
    # the current version holds _carry.json entries pointing at v1
    cur = ManifestBackend().read_pointer(state)
    carried = []
    for frame in ("order_state", "line_state"):
        froot = os.path.join(state, f"v{cur}", frame)
        for b in os.listdir(froot):
            mp = os.path.join(froot, b, "_carry.json")
            if b.startswith("_bucket=") and os.path.exists(mp):
                import json

                carried += list(json.load(open(mp)).values())
    assert carried and all(f"{os.sep}v1{os.sep}" in p for p in carried)
    _shutil  # keep import referenced


@pytest.mark.slow
def test_manifest_deferred_delete_retains_referenced_bytes(spark, tmp_path):
    """remove_tree on a superseded version is a DEFERRED delete: files
    still referenced from the committed version's manifests survive it
    (deleting them would destroy carried state); everything else in
    the prefix goes. Once a later batch rewrites the referencing
    bucket, a subsequent GC pass finally drops the orphans."""
    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(
        spark, state, n_buckets=4, backend=ManifestBackend()
    )
    # two orders in DIFFERENT buckets (4 buckets, 8 seeded keys ⇒ pick
    # two that land apart is not guaranteed — derive from the layout)
    assert proc.process(*_dfs(spark, _seed_log(n=8)), batch_id=0).count() == 8

    proc.process(
        *_dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00")), batch_id=1
    ).count()
    # v1 survived the post-commit remove_tree exactly where referenced
    v1 = os.path.join(state, "v1")
    assert os.path.isdir(v1)
    remaining = [
        os.path.join(dp, f) for dp, _, fs in os.walk(v1) for f in fs
    ]
    assert remaining, "deferred delete must retain referenced bytes"
    live = ManifestBackend()._live_refs(state)
    assert {os.path.realpath(p) for p in remaining} <= live

    # drive more batches touching the SAME key: v1's bytes stay exactly
    # the carried ones; the moment every bucket has been rewritten the
    # references drop and GC may clear it (not asserted — cadence is
    # an implementation detail; what matters is no LIVE byte vanishes)
    d = proc.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300002, 30000, "2.00")), batch_id=2
    ).collect()
    assert sorted(str(l["price"]) for l in d[0]["lines"]) == ["2.00", "5.00", "9.00"]


def test_manifest_commit_is_conditional_put(tmp_path):
    """Two writers committing the same generation: exactly one wins,
    the other gets the conditional-put conflict error — never a silent
    last-writer-wins overwrite (the property object stores actually
    give you, and the one the protocol's single-writer lock assumes)."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    a, b = ManifestBackend(), ManifestBackend()
    a.commit_pointer(state, 1)
    assert b.read_pointer(state) == 1
    # simulate the race: b resolves the generation candidates (its
    # read of the current etag), a commits first, then b acts on the
    # STALE resolution — b's exclusive create of the same generation
    # object must fail. (Freeze the full _gen_candidates resolution:
    # since r12 a stale LISTING alone is healed by the _latest hint +
    # forward GET probes, which is a separate test; the genuinely
    # simultaneous read-before-either-creates race is what the CAS
    # alone must catch.)
    gen_dir = os.path.join(state, "_pointer")
    stale = b._gen_candidates(gen_dir)
    a.commit_pointer(state, 2)
    b._gen_candidates = lambda _dir: stale  # freeze b's view at the stale read
    with pytest.raises(RuntimeError, match="conditional put"):
        b.commit_pointer(state, 3)
    assert a.read_pointer(state) == 2  # a's commit stands, untouched


def _cas_hammer_worker(state_dir, log_path, barrier, rounds):
    """One 'host' racing the conditional put: every round, all workers
    hit commit_pointer for the same logical step at the same instant
    (barrier), bypassing the local advisory lock entirely — a real
    object store has two HOSTS, and only the CAS stands between them."""
    import os

    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    be = ManifestBackend()
    pid = os.getpid()
    for r in range(1, rounds + 1):
        barrier.wait()
        try:
            gen = be.commit_pointer(state_dir, r)
            line = f"win {pid} {r} {gen}\n"
        except RuntimeError:
            line = f"lose {pid} {r}\n"
        # pointer must be readable mid-contention, never torn
        assert be.read_pointer(state_dir) >= 0
        fd = os.open(log_path, os.O_WRONLY | os.O_APPEND | os.O_CREAT)
        os.write(fd, line.encode())
        os.close(fd)


def test_manifest_cas_multi_writer_hammer(tmp_path):
    """Two+ PROCESSES race commit_pointer's O_EXCL generation CAS
    directly — not through the advisory writer lock, which is local
    and cannot order two hosts. Invariants: every generation number is
    won by exactly one writer, losers fail loudly with the
    conditional-put error (never silent last-writer-wins), the pointer
    stays readable throughout, and at least one real collision
    occurred (the race was exercised, not dodged)."""
    import multiprocessing as mp

    state, log = str(tmp_path / "state"), str(tmp_path / "log")
    os.makedirs(state)
    n_workers, rounds = 4, 12
    barrier = mp.Barrier(n_workers)
    procs = [
        mp.Process(
            target=_cas_hammer_worker, args=(state, log, barrier, rounds)
        )
        for _ in range(n_workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    wins_by_gen: dict[int, list[str]] = {}
    wins_per_round: dict[int, int] = {}
    losses = 0
    with open(log) as fh:
        for line in fh:
            parts = line.split()
            if parts[0] == "win":
                wins_by_gen.setdefault(int(parts[3]), []).append(parts[1])
                wins_per_round[int(parts[2])] = (
                    wins_per_round.get(int(parts[2]), 0) + 1
                )
            else:
                losses += 1
    # exactly one winner per generation — the CAS held under contention
    multi = {g: ws for g, ws in wins_by_gen.items() if len(ws) > 1}
    assert not multi, f"generations won twice: {multi}"
    # every round made progress, and the race genuinely collided
    assert set(wins_per_round) == set(range(1, rounds + 1))
    assert losses > 0, "no CAS conflict ever fired — the hammer missed"
    # the surviving pointer is clean and parseable
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    assert ManifestBackend().read_pointer(state) in range(1, rounds + 1)


def test_manifest_torn_generation_skipped_not_unlinked(tmp_path):
    """A crash between the exclusive create and the durable write
    leaves an empty/partial gen object. A real conditional put is
    atomic and cannot produce this, so the emulation must treat it as
    a FAILED commit: read_pointer resolves the previous generation
    (not a bare int('') ValueError on every reopen). It must NOT
    unlink the torn object — a reader cannot tell an abandoned torn
    write from a commit that is mid-write, and deleting the latter
    would destroy a succeeding commit and free its generation number
    for reuse. The next successful commit numbers ABOVE the torn name
    and its superseded-generation cleanup reclaims it."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    be = ManifestBackend()
    be.commit_pointer(state, 7)
    gen_dir = os.path.join(state, "_pointer")
    # the crash artifacts: an empty gen and a torn (non-numeric) gen
    open(os.path.join(gen_dir, "gen-000000000002"), "w").close()
    with open(os.path.join(gen_dir, "gen-000000000003"), "w") as fh:
        fh.write("par")  # partial write
    assert be.read_pointer(state) == 7
    # the read path left everything in place (no reader-side deletes);
    # _latest is the r12 resolution hint (published by the commit) and
    # .hint.lock its conditional-PUT emulation lock
    assert sorted(os.listdir(gen_dir)) == [
        ".hint.lock",
        "_latest",
        "gen-000000000001",
        "gen-000000000002",
        "gen-000000000003",
    ]
    # the next commit lands ABOVE the torn names (no number reuse)...
    won = be.commit_pointer(state, 8)
    assert won == 4
    assert be.read_pointer(state) == 8
    # ...and its cleanup reclaimed the torn objects
    assert sorted(os.listdir(gen_dir)) == [
        ".hint.lock",
        "_latest",
        "gen-000000000004",
    ]
    # a torn object with no predecessor reads as "no commit yet"
    state2 = str(tmp_path / "state2")
    os.makedirs(os.path.join(state2, "_pointer"))
    open(os.path.join(state2, "_pointer", "gen-000000000001"), "w").close()
    assert be.read_pointer(state2) == 0


# -- r12: generation resolution must not trust the _pointer/ LISTING.
# The _latest hint object (PUT after every create, BEFORE superseded-
# generation cleanup) + forward exact-key GET probes are the resolution
# path; the prefix listing is only a hint. These tests run the lag
# double with the pointer listing frozen STALE — the last implicit
# correctness-bearing LIST in the protocol, retired here.


def test_pointer_resolution_with_permanently_stale_listing(tmp_path):
    """Commits through a lag window so wide the _pointer/ listing never
    reflects ANY generation: every commit must still win the next dense
    generation (no conditional-put false conflict, no silent reuse of a
    reclaimed number), and read_pointer must resolve the latest version
    via the _latest hint + probes alone."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    lag = LaggedManifestBackend(lag_ops=10_000)
    gens = [lag.commit_pointer(state, v) for v in (11, 22, 33)]
    assert gens == [1, 2, 3]  # dense wins despite the stale-empty LIST
    # the stale view really is open (the probe below is the LIST path)
    gen_dir = os.path.join(state, "_pointer")
    assert lag._physical_listing(gen_dir) == []
    # lagged reader resolves by hint+GET; a fresh handle agrees
    assert lag.read_pointer(state) == 33
    assert ManifestBackend().read_pointer(state) == 33


def test_dual_writer_stale_pointer_listing_no_lost_commit(tmp_path):
    """THE lost-commit scenario the hint exists for: host B's pointer
    listing is stale (shows only gen-5) while host A has advanced to
    gen-8 and cleanup reclaimed gens 5-7. Without the hint, B would
    compute nxt=6 and its exclusive create of the RECLAIMED gen-6 name
    would SUCCEED — a silently lost commit (readers resolve gen-8,
    B thinks it won). With the hint GET, B must win gen-9 and its
    version must become the one every reader resolves."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    a = ManifestBackend()
    for v in range(1, 6):
        a.commit_pointer(state, v)  # gen-5 is the live generation
    b = LaggedManifestBackend(lag_ops=10_000)
    gen_dir = os.path.join(state, "_pointer")
    b.note_spark_write(gen_dir)  # freeze B's LIST view at {gen-5}
    for v in range(6, 9):
        a.commit_pointer(state, v)  # cleanup reclaims gens 5..7
    assert [g for g, _ in b._generations(gen_dir)] == [5]  # stale view
    won = b.commit_pointer(state, 99)
    assert won == 9, "stale listing must not re-win a reclaimed generation"
    assert ManifestBackend().read_pointer(state) == 99
    assert b.read_pointer(state) == 99


def test_failed_hint_publish_does_not_fail_the_committed_batch(tmp_path):
    """The exclusive create IS the commit point; the hint is advisory.
    A hint-PUT failure right after the create must therefore NOT raise
    out of commit_pointer — the caller would replay a batch whose
    state transition already landed (duplicate application). Instead
    the commit succeeds with a warning, the superseded-generation
    cleanup is SKIPPED (deleting under a stale hint would break the
    resolution invariant), resolution heals via the +1 forward probe,
    and the next successful commit re-publishes the hint and reclaims.
    """
    state = str(tmp_path / "state")
    os.makedirs(state)
    lag = LaggedManifestBackend(lag_ops=10_000)
    lag.commit_pointer(state, 1)
    lag.commit_pointer(state, 2)
    gen_dir = os.path.join(state, "_pointer")
    real_publish = LaggedManifestBackend.publish_file
    crashed = []

    def crash_on_hint(self, path, data):
        if os.path.basename(path) == ManifestBackend.LATEST and not crashed:
            crashed.append(path)
            raise RuntimeError("injected hint-publish failure")
        return real_publish(self, path, data)

    lag.publish_file = crash_on_hint.__get__(lag)
    with pytest.warns(RuntimeWarning, match="hint publish failed"):
        assert lag.commit_pointer(state, 3) == 3  # commit REPORTED won
    assert crashed  # the injection really fired
    # the hint is stale at 2, the listing stale-empty, gen-2 retained
    # (cleanup skipped — the invariant "deleted ⇒ hint ≥ superseder")
    assert lag._read_hint(gen_dir) == 2
    assert lag._physical_listing(gen_dir) == []
    assert os.path.exists(os.path.join(gen_dir, "gen-000000000002"))
    assert lag.read_pointer(state) == 3  # +1 probe past the stale hint
    # next commit numbers above the crash-committed gen, heals the
    # hint, and its cleanup reclaims the retained gen-2
    assert lag.commit_pointer(state, 4) == 4
    assert lag._read_hint(gen_dir) == 4
    assert lag.read_pointer(state) == 4
    assert not os.path.exists(os.path.join(gen_dir, "gen-000000000002"))


def test_hint_publish_is_monotonic_and_legacy_stores_still_resolve(tmp_path):
    """(a) A delayed writer must never move the hint backwards — the
    deletion invariant readers rely on assumes monotonicity. (b) A
    store written only by pre-hint code (gens present, no _latest)
    resolves from the listing exactly as before, and its first commit
    under hint-aware code publishes the hint, closing the adoption
    window for every later read."""
    state = str(tmp_path / "state")
    gen_dir = os.path.join(state, "_pointer")
    os.makedirs(gen_dir)
    # legacy layout: cleanup already ran (only the live gen remains)
    with open(os.path.join(gen_dir, "gen-000000000003"), "w") as fh:
        fh.write("30")
    be = ManifestBackend()
    assert be._read_hint(gen_dir) == 0  # genuinely hint-less
    assert be.read_pointer(state) == 30  # legacy listing path
    assert be.commit_pointer(state, 40) == 4  # numbers above legacy gens
    assert be._read_hint(gen_dir) == 4  # hint published on first commit
    # (a) the guard: a stale writer's lower hint write is a no-op
    be._publish_hint(gen_dir, 2)
    assert be._read_hint(gen_dir) == 4
    # from here even a stale-listing reader resolves correctly
    lag = LaggedManifestBackend(lag_ops=10_000)
    lag.note_spark_write(gen_dir)
    be.commit_pointer(state, 50)
    assert [g for g, _ in lag._generations(gen_dir)] == [4]  # stale
    assert lag.read_pointer(state) == 50


def test_hint_guard_is_atomic_under_interleaved_writers(tmp_path):
    """The monotonic guard must be check+PUT ATOMIC: a writer stalling
    between reading the hint and writing its lower value must not
    regress a hint a faster writer advanced past (review repro: hint
    7 → 5 re-opened the reclaimed-generation reuse, because gens
    between the regressed hint and the live one were already cleanup-
    deleted and the +1 probe cannot cross the gap). The flock held
    across check+PUT — the local emulation of a conditional PUT —
    forces the interleave to serialize; final hint == max, always."""
    import threading

    state = str(tmp_path / "state")
    gen_dir = os.path.join(state, "_pointer")
    os.makedirs(gen_dir)
    slow = ManifestBackend()
    fast = ManifestBackend()
    real_publish = ManifestBackend.publish_file

    def slow_publish(self, path, data):
        import time as _t

        _t.sleep(0.3)  # stall INSIDE the critical section
        return real_publish(self, path, data)

    slow.publish_file = slow_publish.__get__(slow)
    t = threading.Thread(target=lambda: slow._publish_hint(gen_dir, 5))
    t.start()
    import time as _t

    _t.sleep(0.05)  # let the slow writer enter its check first
    fast._publish_hint(gen_dir, 7)
    t.join()
    assert fast._read_hint(gen_dir) == 7, "hint regressed past a superseder"


def test_corrupt_pointer_hint_fails_loud_not_silent(tmp_path):
    """publish_file is an atomic PUT on every targeted store, so
    unreadable _latest bytes mean the store broke that contract.
    Degrading silently to the (possibly stale) listing would be the
    r10 silent-state-loss class — resolution must raise instead."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    be = ManifestBackend()
    be.commit_pointer(state, 5)
    gen_dir = os.path.join(state, "_pointer")
    with open(os.path.join(gen_dir, "_latest"), "w") as fh:
        fh.write("not-a-generation")
    with pytest.raises(RuntimeError, match="corrupt pointer hint"):
        be.read_pointer(state)
    with pytest.raises(RuntimeError, match="corrupt pointer hint"):
        be.commit_pointer(state, 6)


def test_publish_pointer_hint_tool_closes_adoption_window(tmp_path):
    """tools/publish_pointer_hint.py is the documented one-time
    adoption step for pre-r12 manifest stores: run where the listing
    is fresh, it publishes _latest so every LATER read resolves by GET
    even under a stale pointer listing. POSIX-layout and empty dirs
    are explicit no-ops."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from publish_pointer_hint import publish_hint

    # pre-r12 store: live gen only (legacy cleanup ran), no hint
    state = str(tmp_path / "state")
    gen_dir = os.path.join(state, "_pointer")
    os.makedirs(gen_dir)
    with open(os.path.join(gen_dir, "gen-000000000007"), "w") as fh:
        fh.write("70")
    msg = publish_hint(state)
    assert "published _latest = gen-7" in msg
    # a reader whose pointer listing is frozen stale-empty now resolves
    lag = LaggedManifestBackend(lag_ops=10_000)
    lag.note_spark_write(gen_dir)
    with open(os.path.join(gen_dir, "gen-000000000008"), "w") as fh:
        fh.write("80")  # adversarial: a gen the stale listing never shows
    ManifestBackend()._publish_hint(gen_dir, 8)
    assert [g for g, _ in lag._generations(gen_dir)] == [7]  # stale LIST
    assert lag.read_pointer(state) == 80
    # idempotent + refuses regression
    assert "no-op" in publish_hint(state)
    # POSIX layout: explicit no-op
    pstate = str(tmp_path / "posix")
    os.makedirs(pstate)
    LocalPosixBackend().commit_pointer(pstate, 3)
    assert "POSIX layout" in publish_hint(pstate)
    # nothing committed: explicit no-op
    estate = str(tmp_path / "empty")
    os.makedirs(os.path.join(estate, "_pointer"))
    assert "nothing committed" in publish_hint(estate)


def test_backends_exclude_writer_sidecars_from_logical_namespace(tmp_path):
    """Hadoop checksum files (.part-*.crc) and _SUCCESS markers are
    writer-internal: list_dir carrying them would record dead weight
    in manifests (and the deferred delete would then retain stale
    .crc bytes via the live-reference set forever). Partition dirs
    (_bucket=K) are data-bearing despite the underscore and must
    survive the filter."""
    d = tmp_path / "bucket"
    d.mkdir()
    (d / "part-0001.parquet").write_bytes(b"x")
    (d / ".part-0001.parquet.crc").write_bytes(b"c")
    (d / "_SUCCESS").write_bytes(b"")
    (d / "_bucket=3").mkdir()
    for be in (LocalPosixBackend(), ManifestBackend()):
        assert be.list_dir(str(d)) == ["_bucket=3", "part-0001.parquet"], type(be)

    # a manifest-backed carry of the dir records only data entries,
    # and read_locations never surfaces sidecars — even ones a legacy
    # manifest recorded before the filter existed
    mb = ManifestBackend()
    dst = tmp_path / "carried"
    dst.mkdir()
    for name in mb.list_dir(str(d)) :
        if name != "_bucket=3":
            mb.carry_file(str(d / name), str(dst / name))
    mb._write_manifest(
        str(dst),
        {**mb._manifest(str(dst)), ".legacy.crc": str(d / ".part-0001.parquet.crc")},
    )
    assert mb.list_dir(str(dst)) == ["part-0001.parquet"]
    assert mb.read_locations(str(dst)) == [str(d / "part-0001.parquet")]


# -- crash windows, injected at the seam ---------------------------------


def _first_batch(spark, tmp_path, backend):
    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend)
    assert proc.process(*_dfs(spark, _seed_log()), batch_id=0).count() == 8
    return state, proc


@pytest.mark.slow
def test_crash_during_carry_replays_complete_old_state(
    spark, tmp_path, backend_cls
):
    """Seam-level twin of the POSIX hardlink-crash test: carry_file
    raises mid-carry, the pointer never flips, the replay sees
    complete OLD state and converges — for BOTH backends."""
    state, proc = _first_batch(spark, tmp_path, backend_cls())
    _crash_once(
        proc.backend, "carry_file", lambda src, dst: "_bucket=" in str(dst)
    )
    batch = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    with pytest.raises(RuntimeError, match="injected crash"):
        proc.process(*batch, batch_id=1)

    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend_cls())
    docs = fresh.process(*batch, batch_id=1).collect()
    assert len(docs) == 1
    assert sorted(str(l["price"]) for l in docs[0]["lines"]) == ["5.00", "9.00"]
    # untouched keys survived the crash + replay
    d2 = fresh.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300073, 30007, "3.00")), batch_id=2
    ).collect()
    assert sorted(str(l["price"]) for l in d2[0]["lines"]) == ["3.00", "5.00"]


@pytest.mark.slow
def test_crash_at_commit_replays_and_reemits(spark, tmp_path, backend_cls):
    """commit_pointer raises before committing: every frame of the new
    version is on disk but the batch is NOT committed — the replay
    must re-run in full and re-emit (at-least-once), with no
    mixed-frame view."""
    state, proc = _first_batch(spark, tmp_path, backend_cls())
    _crash_once(proc.backend, "commit_pointer", lambda *a, **kw: True)
    batch = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    with pytest.raises(RuntimeError, match="injected crash"):
        proc.process(*batch, batch_id=1)
    assert backend_cls().read_pointer(state) == 1  # still the old version

    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend_cls())
    docs = fresh.process(*batch, batch_id=1).collect()
    assert len(docs) == 1  # re-emitted, exactly the once for the replay
    assert sorted(str(l["price"]) for l in docs[0]["lines"]) == ["5.00", "9.00"]
    assert backend_cls().read_pointer(state) == 2


@pytest.mark.slow
def test_crash_after_commit_filters_replay(spark, tmp_path, backend_cls):
    """remove_tree raises during post-commit cleanup: state is
    committed, so the replayed batch is dropped by the applied-txs
    filter (its output already reached the sink) and the leftover
    superseded version is GC'd by the next batch."""
    state, proc = _first_batch(spark, tmp_path, backend_cls())
    _crash_once(
        proc.backend,
        "remove_tree",
        lambda path: str(path).rstrip(os.sep).endswith("v1")
        and proc.backend.read_pointer(state) == 2,
    )
    batch = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    with pytest.raises(RuntimeError, match="injected crash"):
        proc.process(*batch, batch_id=1)
    assert backend_cls().read_pointer(state) == 2  # commit stuck

    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend_cls())
    assert fresh.process(*batch, batch_id=2).count() == 0  # replay filtered
    d = fresh.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300002, 30000, "2.00")), batch_id=3
    ).collect()
    assert sorted(str(l["price"]) for l in d[0]["lines"]) == ["2.00", "5.00", "9.00"]


@pytest.mark.slow
def test_tx_metadata_order_regression_raises_not_silent(
    spark, tmp_path, backend_cls
):
    """The tx-metadata delivery-order contract, ENFORCED: an END whose
    commit LSN is at or below the already-emitted high-watermark must
    fail LOUDLY (the composed e2e's mtime-tie trap showed a reordering
    source otherwise yields silently out-of-commit-order emissions —
    cdc_stream contract docs; the reference is immune via its
    single-partition tx topic, DataStreamV2Job.java:70-97). The
    watermark sidecar rides _store_all's single commit point, so the
    check also holds across a restart; at-least-once REPLAY of an
    applied tx must NOT trip it (anti-joined away before the check);
    enforce_tx_order=False downgrades to warn + counter."""
    import warnings

    state, proc = _first_batch(spark, tmp_path, backend_cls())
    # batch 1 at high LSNs emits and advances the watermark to ~90k
    batch1 = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    assert proc.process(*batch1, batch_id=1).count() == 1

    # REPLAY control: redelivering batch 1 verbatim (applied tx) is
    # at-least-once business as usual — dropped, never an order error
    assert proc.process(*batch1, batch_id=2).count() == 0

    # regression: a tx whose END carries a LOWER commit LSN than the
    # emitted watermark arrives in a later batch
    late = _dfs(spark, _one_line_tx(50000, 400, 300002, 30001, "1.00"))
    with pytest.raises(RuntimeError, match="delivery-order violation"):
        proc.process(*late, batch_id=3)

    # the check fires BEFORE any emission or state write: a fresh
    # processor (restart) sees uncorrupted state, re-raises on the
    # same reordered feed, and a conforming batch still goes through
    fresh = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=backend_cls()
    )
    with pytest.raises(RuntimeError, match="delivery-order violation"):
        fresh.process(*late, batch_id=3)
    ok = fresh.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300003, 30000, "2.00")),
        batch_id=4,
    ).collect()
    assert sorted(str(l["price"]) for l in ok[0]["lines"]) == [
        "2.00",
        "5.00",
        "9.00",
    ]

    # quarantine mode: warn + count, emissions proceed (operator's
    # choice of lag over a halted pipeline)
    lenient = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=backend_cls(),
        enforce_tx_order=False,
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert lenient.process(*late, batch_id=5).count() == 1
    assert any("delivery-order violation" in str(w.message) for w in caught)
    assert lenient.metrics.tx_order_regressions == 1


@pytest.mark.slow
def test_dual_writer_build_fencing_tx_store(spark, tmp_path, monkeypatch):
    """Two-host schedule over one manifest-backed tx store (the
    advisory lock is per-filesystem — defeated here to model separate
    hosts): (1) a REMOTE builder's claim on the next version dir makes
    the local batch raise 'dual-writer detected' instead of GC'ing and
    interleaving writes; the documented manual heal (remove the
    builder marker of a known-dead host) unblocks. (2) A builder whose
    version dir is reclaimed mid-build (GC + re-claim by a second
    same-host writer once the lock is defeated) must fail its
    commit-time claim validation — never publish a dir it no longer
    owns. State stays all-old-or-all-new throughout."""
    import contextlib

    from streaming_examples_spark.streaming import locks as locks_mod
    from streaming_examples_spark.streaming.state_backend import ManifestBackend

    monkeypatch.setattr(
        locks_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    state = str(tmp_path / "state")
    procA = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=ManifestBackend()
    )
    assert procA.process(*_dfs(spark, _seed_log()), batch_id=0).count() == 8

    # (1) remote host mid-build: its claim blocks the local writer
    b = ManifestBackend()
    v2 = os.path.join(state, "v2")
    b.claim_build(v2, "hostB:1:feedface")
    # hostB's in-flight writes must survive the refusal: the refuse
    # runs BEFORE any GC of the contested dir (delete-then-refuse
    # would gut a dir hostB's intact marker still lets it commit)
    b.prepare_dir(v2)
    sentinel = os.path.join(v2, "part-hostB-0000.parquet")
    b.publish_file(sentinel, b"hostB-in-flight")
    batch1 = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    with pytest.raises(RuntimeError, match="dual-writer detected"):
        procA.process(*batch1, batch_id=1)
    assert b.read_pointer(state) == 1  # nothing committed, state intact
    assert os.path.exists(sentinel)  # hostB's build untouched
    b.release_build(v2)  # operator: hostB is dead — remove its marker
    b.remove_tree(v2)  # operator clears the dead build too
    assert procA.process(*batch1, batch_id=1).count() == 1
    assert b.read_pointer(state) == 2

    # (2) mid-build reclaim: B runs a FULL batch between A's claim and
    # A's commit-time validation (B's GC reclaims A's same-host claim —
    # legitimate only because the lock normally forbids this schedule)
    procB = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=ManifestBackend()
    )
    # A's tx carries the HIGHER commit LSN: after B's tx emits first,
    # A's retry still satisfies the (also enforced) commit-order intake
    batchA = _dfs(spark, _one_line_tx(99000, 990, 300002, 30000, "2.00"))
    batchB = _dfs(spark, _one_line_tx(97000, 970, 300003, 30001, "3.00"))
    real_validate = procA.backend.validate_build
    fired = {"done": False}

    def hijack(path, owner):
        if not fired["done"]:
            fired["done"] = True
            procB.process(*batchB, batch_id=7)
        return real_validate(path, owner)

    monkeypatch.setattr(procA.backend, "validate_build", hijack)
    with pytest.raises(RuntimeError, match="build fencing violation"):
        procA.process(*batchA, batch_id=6)
    # B's commit won; the store is ALL-B for that version — and a
    # fresh processor (A's retry) lands cleanly on top
    assert b.read_pointer(state) == 3
    fresh = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=ManifestBackend()
    )
    d = fresh.process(*batchA, batch_id=8).collect()
    assert sorted(str(l["price"]) for l in d[0]["lines"]) == [
        "2.00",
        "5.00",
        "9.00",
    ]


def test_cross_backend_reopen_refused(spark, tmp_path):
    """A state dir committed by one backend reopened under the other
    must RAISE: the two encode the commit pointer differently (CURRENT
    file vs _pointer/gen-*), so a cross-backend reopen reads version 0,
    treats live state as fresh, and the batch-start GC would delete the
    committed versions as garbage — the same silent-loss class as an
    n_buckets mismatch, sealed in _layout.json the same way."""
    log = TxLog()
    log.tx(lambda t: t.insert_order(10001), lambda t: t.insert_line(100001, 10001))
    b0 = _dfs(spark, log)
    for committer, reopener in (
        (LocalPosixBackend, ManifestBackend),
        (ManifestBackend, LocalPosixBackend),
    ):
        state = str(tmp_path / f"state_{committer.layout_id}")
        proc = TxDenormBatchProcessor(spark, state, n_buckets=4, backend=committer())
        assert proc.process(*b0, batch_id=0).count() == 1
        wrong = TxDenormBatchProcessor(spark, state, n_buckets=4, backend=reopener())
        with pytest.raises(ValueError, match="storage backend"):
            wrong.process(*b0, batch_id=1)
        # nothing was deleted by the refused open: the committed state
        # is intact for the matching backend
        again = TxDenormBatchProcessor(spark, state, n_buckets=4, backend=committer())
        assert again.process(*b0, batch_id=1).count() == 0  # replay filtered


@pytest.mark.slow
def test_manifest_orphans_reclaimed_and_versions_bounded(spark, tmp_path):
    """Deferred deletes must CONVERGE, not accumulate: once later
    batches rewrite the buckets whose manifests referenced an old
    version's files, a subsequent GC pass reclaims that version dir
    entirely, and across a long alternating run the number of version
    dirs stays bounded (current + still-referenced + at most one
    awaiting its next GC) — the orphan-file story of any manifest
    table format."""
    import re

    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(spark, state, n_buckets=2, backend=ManifestBackend())

    # two keys provably in DIFFERENT buckets of 2
    cand = [30000 + i for i in range(8)]
    buckets = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in cand], "k long")
        .select("k", proc._bucket_of(F.col("k")).alias("b"))
        .collect()
    }
    key_a = cand[0]
    key_b = next(k for k in cand if buckets[k] != buckets[key_a])

    log = TxLog()
    for oid in (key_a, key_b):
        log.tx(
            lambda t, oid=oid: t.insert_order(oid),
            lambda t, oid=oid: t.insert_line(oid * 10, oid, price="5.00"),
        )
    assert proc.process(*_dfs(spark, log), batch_id=0).count() == 2

    def version_dirs():
        return sorted(
            d for d in os.listdir(state)
            if re.fullmatch(r"v\d+", d) and os.path.isdir(os.path.join(state, d))
        )

    lsn, tx, line = 90000, 900, 300001
    for i in range(1, 7):
        key = key_a if i % 2 else key_b
        out = proc.process(
            *_dfs(spark, _one_line_tx(lsn, tx, line, key, "1.00")), batch_id=i
        )
        assert out.count() == 1
        vdirs = version_dirs()
        assert len(vdirs) <= 3, vdirs  # bounded, never accumulating
        lsn, tx, line = lsn + 5000, tx + 50, line + 1
    # the seed version's bytes were dereferenced by the first rewrite of
    # each bucket; GC has long since reclaimed the dir itself
    assert "v1" not in version_dirs()
    # and no live byte was lost along the way: every key still resolves
    keys = {
        r["order_key"]
        for r in proc.read_state("order_state").select("order_key").collect()
    }
    assert keys == {key_a, key_b}


@pytest.mark.slow
def test_stream_runs_on_manifest_backend(spark, tmp_path):
    """start_tx_denorm_stream's backend/n_buckets passthrough: a real
    micro-batch stream commits its state through ManifestBackend (the
    generation-object pointer proves which backend ran), produces the
    same emissions, and a restarted stream would reopen it — the seam
    is usable from the public streaming entry point, not only from the
    processor."""
    import os

    from streaming_examples_spark.model.fixtures import (
        LINE_ROW_SCHEMA,
        ORDER_ROW_SCHEMA,
    )
    from streaming_examples_spark.sources.files import (
        read_envelope_log,
        read_tx_log,
        write_event_log,
    )
    from streaming_examples_spark.streaming.cdc_stream import start_tx_denorm_stream

    log = TxLog()
    log.tx(
        lambda t: t.insert_order(10001),
        lambda t: t.insert_line(100001, 10001, price="19.99"),
    )
    log.tx(lambda t: t.insert_line(100002, 10001, price="5.00"))

    orders = [e for e in log.events if e["source"]["table"] == "orders"]
    lines = [e for e in log.events if e["source"]["table"] == "order_lines"]
    dirs = {n: str(tmp_path / n) for n in ("o", "l", "x", "out", "state", "ckpt")}
    write_event_log(orders, dirs["o"], files=1)
    write_event_log(lines, dirs["l"], files=2)  # ≥2 micro-batches
    write_event_log(log.tx_events, dirs["x"], files=1)

    q = start_tx_denorm_stream(
        spark,
        read_envelope_log(spark, dirs["o"], ORDER_ROW_SCHEMA, streaming=True),
        read_envelope_log(spark, dirs["l"], LINE_ROW_SCHEMA, streaming=True),
        read_tx_log(spark, dirs["x"], streaming=True),
        state_dir=dirs["state"],
        output_dir=dirs["out"],
        checkpoint_dir=dirs["ckpt"],
        n_buckets=4,
        backend=ManifestBackend(),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(dirs["out"]).orderBy("commit_lsn").collect()
    assert [len(r["lines"] or []) for r in rows] == [1, 2]
    # the manifest pointer encoding is on disk (not a CURRENT file) and
    # the layout sealed the backend identity
    assert os.path.isdir(os.path.join(dirs["state"], "_pointer"))
    assert not os.path.exists(os.path.join(dirs["state"], "CURRENT"))
    import json

    with open(os.path.join(dirs["state"], "_layout.json")) as fh:
        layout = json.load(fh)
    assert layout == {"n_buckets": 4, "backend": "manifest"}


@pytest.mark.parametrize("backend_key", sorted(BACKENDS))
def test_acquire_build_claim_first_protocol(tmp_path, backend_key):
    """acquire_build is claim-FIRST (a conditional put, never a
    probe-then-claim): it takes over an abandoned same-host claim
    atomically, refuses a remote host's claim with the dual-writer
    error, and the base class ships NO marker implementation — a real
    object-store backend must provide its own conditional put, or the
    fence would silently compare each host's local disk."""
    import socket

    from streaming_examples_spark.streaming.state_backend import (
        StateStorageBackend,
        acquire_build,
    )

    b = BACKENDS[backend_key]()
    path = str(tmp_path / "v7")

    # virgin dir: claim lands, owner readable, double-claim conflicts
    acquire_build(b, path, "me:1:aaa")
    assert b.read_build_owner(path) == "me:1:aaa"
    with pytest.raises(RuntimeError, match="build conflict"):
        b.claim_build(path, "me:2:bbb")
    b.validate_build(path, "me:1:aaa")
    with pytest.raises(RuntimeError, match="build fencing violation"):
        b.validate_build(path, "me:2:bbb")
    b.release_build(path)
    b.release_build(path)  # idempotent

    # abandoned same-host claim (crashed earlier instance): reclaimed
    b.claim_build(path, f"{socket.gethostname()}:999:dead")
    acquire_build(b, path, "me:3:ccc")
    assert b.read_build_owner(path) == "me:3:ccc"
    b.release_build(path)

    # remote host's claim: refused loudly, claim left intact
    b.claim_build(path, "otherhost:1:feed")
    with pytest.raises(RuntimeError, match="dual-writer detected"):
        acquire_build(b, path, "me:4:ddd")
    assert b.read_build_owner(path) == "otherhost:1:feed"

    # the abstract base carries contracts, not an implementation
    base = StateStorageBackend()
    for call in (
        lambda: base.claim_build(path, "x"),
        lambda: base.read_build_owner(path),
        lambda: base.validate_build(path, "x"),
        lambda: base.release_build(path),
        lambda: base.file_size(path),
    ):
        with pytest.raises(NotImplementedError):
            call()


@pytest.mark.parametrize("backend_key", sorted(BACKENDS))
def test_heal_stale_builds_ages_out_dead_hosts_claims(tmp_path, backend_key):
    """The manual heal, scriptable (state_backend.heal_stale_builds):
    claims older than the operator's threshold are released whatever
    host wrote them (a dead remote host's wedge auto-clears); younger
    claims and dry-run are untouched; a healed-but-alive zombie still
    cannot commit — its commit-time validate_build fails against the
    re-owned marker."""
    import time as _time

    from streaming_examples_spark.streaming.state_backend import (
        acquire_build,
        heal_stale_builds,
    )

    b = BACKENDS[backend_key]()
    root = str(tmp_path / "state")
    old, fresh = os.path.join(root, "v3"), os.path.join(root, "v4")
    b.claim_build(old, "deadhost:1:aaaa")
    b.claim_build(fresh, "livehost:2:bbbb")
    # backdate the dead host's claim beyond the threshold
    stale_t = _time.time() - 3600
    os.utime(b._build_marker(old), (stale_t, stale_t))

    with pytest.raises(ValueError):
        heal_stale_builds(b, root, 0)

    # dry-run reports both, releases neither
    rep = heal_stale_builds(b, root, 600, dry_run=True)
    assert [e["dir"] for e in rep["healed"]] == [old]
    assert [e["dir"] for e in rep["kept"]] == [fresh]
    assert b.read_build_owner(old) == "deadhost:1:aaaa"

    # apply: the stale claim clears, the fresh one survives, and the
    # wedged version becomes buildable again
    rep = heal_stale_builds(b, root, 600)
    assert [e["dir"] for e in rep["healed"]] == [old]
    assert b.read_build_owner(old) is None
    assert b.read_build_owner(fresh) == "livehost:2:bbbb"
    acquire_build(b, old, "me:5:cccc")

    # zombie safety: if deadhost was in fact alive, its commit-time
    # validation fails against the re-owned marker — it cannot publish
    with pytest.raises(RuntimeError, match="build fencing violation"):
        b.validate_build(old, "deadhost:1:aaaa")


def test_heal_stale_builds_tool_covers_both_layouts(tmp_path):
    """tools/heal_stale_builds.py walks the tx version root AND nested
    detector store roots, honors dry-run-by-default, and releases only
    with --apply."""
    import json as _json
    import subprocess
    import sys as _sys
    import time as _time

    from streaming_examples_spark.streaming.state_backend import (
        LocalPosixBackend,
    )

    b = LocalPosixBackend()
    state = tmp_path / "state"
    tx_dir, bands = str(state / "v9"), str(state / "bands" / "v2")
    b.claim_build(tx_dir, "deadhost:1:aaaa")
    b.claim_build(bands, "deadhost:1:bbbb")
    stale_t = _time.time() - 7200
    for p in (tx_dir, bands):
        os.utime(b._build_marker(p), (stale_t, stale_t))

    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "heal_stale_builds.py",
    )

    def run(*extra):
        proc = subprocess.run(
            [_sys.executable, tool, str(state), "--older-than", "3600", *extra],
            capture_output=True,
            text=True,
            check=True,
        )
        return _json.loads(proc.stdout)

    out = run()  # dry-run by default
    healed = [e["dir"] for r in out["reports"] for e in r["healed"]]
    assert sorted(healed) == sorted([tx_dir, bands])
    assert b.read_build_owner(tx_dir) == "deadhost:1:aaaa"  # untouched

    out = run("--apply")
    assert out["apply"] is True
    assert b.read_build_owner(tx_dir) is None
    assert b.read_build_owner(bands) is None


# -- randomized dual-host soak over the TX store (VERDICT r10 #5) ---------


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 4711])
def test_random_dual_host_tx_schedules_exactly_once_or_loud(
    spark, tmp_path, seed, monkeypatch
):
    """Randomized dual-HOST soak over one manifest-backed tx store —
    the tx-store counterpart of the detector soak
    (test_incremental_dedup.py): two TxDenormBatchProcessor instances
    with distinct writer tokens (the advisory lock is defeated to
    model separate hosts) drive a random interleaved history through a
    random schedule of plain batches, injected crashes at random
    backend primitives (then retry on a fresh host), host restarts,
    and remote full batches hijacked into the victim's commit window
    (the dual-writer schedule the build markers fence).

    Invariants, asserted at the end regardless of schedule:

      * fail-loud: every op either succeeds or raises a KNOWN loud
        error (injected crash / build fencing violation / dual-writer
        detected / pointer generation conflict) — never silent
      * sink-level at-least-once, nothing lost: the union of pairs
        delivered through emission_sink == the oracle's touched pairs
      * caller-level exactly-once: pairs across successfully RETURNED
        frames are unique and a subset of the oracle's
      * per-frame commit-LSN emission order
      * the store survives: a fresh processor lands a clean tail batch
    """
    import contextlib
    import random as _random

    from test_tx_properties import _naive_replay, _random_log, lsn_cut_bounds

    from streaming_examples_spark.streaming import locks as locks_mod

    monkeypatch.setattr(
        locks_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    rng = _random.Random(seed)
    log = _random_log(seed)
    exp_orders, exp_lines, exp_touched = _naive_replay(log)
    o, l, x = _dfs(spark, log)
    state = str(tmp_path / "state")

    sink_pairs: list[tuple] = []

    def sink(df, batch_id):
        sink_pairs.extend(
            (r["order_key"], r["commit_lsn"]) for r in df.collect()
        )

    def mk_host():
        return TxDenormBatchProcessor(
            spark, state, n_buckets=8, backend=ManifestBackend(),
            emission_sink=sink,
        )

    hosts = [mk_host(), mk_host()]
    LOUD = (
        "injected crash",
        "build fencing violation",
        "dual-writer detected",
        "generation conflict",
    )

    n_batches = rng.randint(3, 4)
    bounds = lsn_cut_bounds(log, [i / n_batches for i in range(1, n_batches)])
    frame_rows: list = []

    def good(df):
        # a successfully returned frame must be in commit-LSN order
        rows = df.collect()
        lsns_f = [r["commit_lsn"] for r in rows]
        assert lsns_f == sorted(lsns_f)
        frame_rows.extend(rows)

    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        cond = (F.col("source.lsn") > F.lit(lo)) & (F.col("source.lsn") <= F.lit(hi))
        batch = (o.filter(cond), l.filter(cond), x)
        event = rng.choice(["plain", "plain", "crash", "restart", "remote_mid_commit"])
        h = rng.randrange(2)
        if event == "restart":
            hosts[h] = mk_host()
            event = "plain"

        if event == "plain":
            good(hosts[h].process(*batch, batch_id=i))
        elif event == "crash":
            prim = rng.choice(["commit_pointer", "carry_file", "remove_tree"])
            calls = {"n": 0, "at": rng.randint(1, 2)}

            def should(*_a, **_k):
                calls["n"] += 1
                return calls["n"] == calls["at"]

            _crash_once(hosts[h].backend, prim, should)
            try:
                good(hosts[h].process(*batch, batch_id=i))
            except RuntimeError as e:
                assert any(p in str(e) for p in LOUD), e
                # retry on a FRESH host (crash-replay contract)
                hosts[h] = mk_host()
                good(hosts[h].process(*batch, batch_id=i))
            else:
                hosts[h] = mk_host()  # uninjected wrapper must not linger
        else:  # remote_mid_commit: other host runs the SAME batch inside
            # the victim's commit window (build-marker fencing schedule)
            victim, remote = hosts[h], hosts[1 - h]
            real_validate = victim.backend.validate_build
            fired = {"done": False}

            def hijack(path, owner, _remote=remote, _batch=batch, _i=i,
                       _real=real_validate):
                if not fired["done"]:
                    fired["done"] = True
                    good(_remote.process(*_batch, batch_id=_i))
                return _real(path, owner)

            monkeypatch.setattr(victim.backend, "validate_build", hijack)
            try:
                good(victim.process(*batch, batch_id=i))
            except RuntimeError as e:
                assert any(p in str(e) for p in LOUD), e
            finally:
                monkeypatch.setattr(victim.backend, "validate_build", real_validate)
            hosts[h] = mk_host()  # victim's in-flight state is untrusted

    # -- invariants ------------------------------------------------------
    exp_pairs = sorted(exp_touched)
    got_frame_pairs = [(r["order_key"], r["commit_lsn"]) for r in frame_rows]
    # caller-level exactly-once: no duplicates, nothing invented
    assert len(got_frame_pairs) == len(set(got_frame_pairs)), got_frame_pairs
    assert set(got_frame_pairs) <= set(exp_pairs)
    # sink-level: nothing lost (dups allowed — at-least-once)
    assert set(sink_pairs) == set(exp_pairs), (
        sorted(set(exp_pairs) - set(sink_pairs)),
        sorted(set(sink_pairs) - set(exp_pairs)),
    )
    # NOTE: no frame-level completeness assertion — a crash injected
    # AFTER the state swap (remove_tree cleanup) correctly makes the
    # retry return an empty frame (applied-tx filter); the pairs were
    # delivered through the sink, which is the completeness gate above.

    # the store survives: a fresh processor lands a clean tail batch
    tail = TxLog()
    tail._lsn, tail._next_tx = 900000, 9000
    tail.tx(lambda t: t.insert_order(90001), lambda t: t.insert_line(990001, 90001))
    fresh = mk_host()
    d = fresh.process(*_dfs(spark, tail), batch_id=99).collect()
    assert len(d) == 1 and d[0]["id"] == 90001


@pytest.mark.slow
def test_stream_gc_horizon_trims_delete_markers(spark, tmp_path):
    """The deleted-order marker retention dial, stream-level: markers
    persist across batches by default (so cross-batch tombstone
    re-emission works — the r10 fix); a callable
    ``order_delete_gc_horizon_lsn`` consulted per batch drops markers
    below the fed horizon LAZILY, when their bucket is next rewritten
    (n_buckets=1 here so every batch touches the marker's bucket)."""
    state = str(tmp_path / "state")
    horizon = {"lsn": None}
    proc = TxDenormBatchProcessor(
        spark, state, n_buckets=1,
        order_delete_gc_horizon_lsn=lambda: horizon["lsn"],
    )
    log = TxLog()
    c1 = log.tx(lambda t: t.insert_order(30000),
                lambda t: t.insert_line(300001, 30000))
    c_del = log.tx(lambda t: t.delete_line(300001),
                   lambda t: t.delete_order(30000))
    c3 = log.tx(lambda t: t.insert_order(30009))
    o, l, x = _dfs(spark, log)

    def batch(lo, hi):
        cond = (F.col("source.lsn") > lo) & (F.col("source.lsn") <= hi)
        return o.filter(cond), l.filter(cond), x

    assert proc.process(*batch(-1, c1), batch_id=0).count() == 1
    assert proc.process(*batch(c1, c_del), batch_id=1).count() == 1

    # horizon unset → the delete marker persisted into state
    st = proc._load_buckets("order_state", [0]).collect()
    assert [(r["order_key"], r["op"]) for r in st] == [(30000, "d")]

    # operator feeds a horizon past the delete; the next batch's state
    # roll (bucket 0 touched by the new order) drops the marker
    horizon["lsn"] = c_del + 1
    assert proc.process(*batch(c_del, c3), batch_id=2).count() == 1
    st2 = proc._load_buckets("order_state", [0]).collect()
    assert {r["order_key"]: r["op"] for r in st2} == {30009: "c"}


def test_carry_enumeration_sidecar_and_pre_r11_fallback(spark, tmp_path):
    """r11/r12: the untouched-bucket carry enumerates from the
    committed version's ``_parts.json`` sidecar (a GET — immune to
    list-after-write lag). r12 writes format 2, an EXACT enumeration
    (every listed part physically exists — a touched bucket whose
    every key was deleted is NOT listed), so the carry needs no
    existence probe. A pre-r11 version without the sidecar goes
    through witness-checked legacy adoption (fresh listings here —
    POSIX backend — so adoption succeeds and still carries)."""
    import json as _json

    state, proc = _first_batch(spark, tmp_path, LocalPosixBackend())
    batch = _dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00"))
    assert proc.process(*batch, batch_id=1).count() == 1

    v = proc._current_version()
    sidecar_path = os.path.join(state, f"v{v}", "_parts.json")
    with open(sidecar_path) as fh:
        sidecar = _json.load(fh)
    assert sidecar["format"] == 2
    frames = sidecar["frames"]
    assert sorted(frames) == ["line_state", "order_state"]
    # the seeded 8 orders span several of the 8 buckets; every part the
    # version holds must be enumerated
    assert all(p.startswith("_bucket=") for p in frames["order_state"])
    assert len(frames["order_state"]) >= 2
    # format 2 is EXACT: every enumerated part physically exists
    for name in ("order_state", "line_state"):
        for part in frames[name]:
            assert os.path.isdir(os.path.join(state, f"v{v}", name, part)), (
                f"format-2 sidecar lists absent part {name}/{part}"
            )

    # pre-r11 shape: no sidecar → witness-checked adoption must carry
    os.remove(sidecar_path)
    proc._adopted_parts.clear()
    d = proc.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300073, 30007, "3.00")),
        batch_id=2,
    ).collect()
    assert sorted(str(l["price"]) for l in d[0]["lines"]) == ["3.00", "5.00"]
    # an order untouched since batch 0 survived the fallback carry…
    d2 = proc.process(
        *_dfs(spark, _one_line_tx(97000, 970, 300011, 30001, "2.00")),
        batch_id=3,
    ).collect()
    assert sorted(str(l["price"]) for l in d2[0]["lines"]) == ["2.00", "5.00"]
    # …and the post-fallback commits write the sidecar again
    assert os.path.exists(
        os.path.join(state, f"v{proc._current_version()}", "_parts.json")
    )


# -- pre-r11 (sidecar-less) store adoption: the last LIST-gated read --
# r12 (VERDICT r11 #1): a store committed by pre-r11 code has no
# _parts.json, so its part enumeration can only come from backend
# listings — the exact read class that silently emptied state twice
# (r10 detector _load_store, r11 tx _load_buckets). Adoption must
# therefore be witness-checked: any listing that disagrees with a GET
# raises StateAdoptionError instead of loading state as None.


def _strip_sidecar(state, version):
    os.remove(os.path.join(state, f"v{version}", "_parts.json"))


def test_pre_r11_adoption_fails_loud_under_open_lag_window(spark, tmp_path):
    """Adopting a sidecar-less store while the legacy writer's
    list-after-write windows (including spark-write windows) are still
    open must raise StateAdoptionError — never silently load state as
    None. Once the windows expire, the SAME store adopts correctly:
    reads resolve every key, a follow-up batch carries untouched
    buckets, and its commit reinstates a format-2 sidecar."""
    import json as _json

    from streaming_examples_spark.streaming.cdc_stream import (
        StateAdoptionError,
    )

    # lag_ops large enough that every window opened by the final
    # legacy batch is still open at adoption time (reads never advance
    # the double's op clock, so the window provably spans the attempt)
    backend = LaggedManifestBackend(lag_ops=64)
    state, proc = _first_batch(spark, tmp_path, backend)
    assert (
        proc.process(
            *_dfs(spark, _one_line_tx(90000, 900, 300001, 30000, "9.00")),
            batch_id=1,
        ).count()
        == 1
    )
    v = proc._current_version()
    _strip_sidecar(state, v)  # raw remove: simulates a pre-r11 writer

    # a FRESH processor (adoption path — empty memo) on the same
    # still-lagged backend: the version root's stale view predates its
    # prepare_dir, so witness 1 (committed pointer vs dir probe) fires
    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend)
    with pytest.raises(StateAdoptionError, match="stale"):
        fresh.read_state("order_state")
    with pytest.raises(StateAdoptionError, match="stale"):
        fresh._load_buckets("order_state", [0, 1, 2, 3])
    # the writer path refuses too: processing a batch over the adopted
    # store must not commit against silently-empty state
    with pytest.raises(StateAdoptionError, match="stale"):
        fresh.process(
            *_dfs(spark, _one_line_tx(95000, 950, 300073, 30007, "3.00")),
            batch_id=2,
        )

    # expire every window (mutations advance the op clock; reads do
    # not), then the same store adopts from fresh listings
    scratch = tmp_path / "scratch"
    os.makedirs(scratch, exist_ok=True)
    for i in range(70):
        backend.publish_file(str(scratch / f"x{i}"), b"")
    adopted = TxDenormBatchProcessor(
        spark, state, n_buckets=8, backend=backend
    )
    keys = {
        r["order_key"]
        for r in adopted.read_state("order_state")
        .select("order_key")
        .collect()
    }
    assert keys == {30000 + i for i in range(8)}
    # follow-up batch: a bucket untouched since batch 0 still carries
    d = adopted.process(
        *_dfs(spark, _one_line_tx(95000, 950, 300073, 30007, "3.00")),
        batch_id=2,
    ).collect()
    assert sorted(str(l["price"]) for l in d[0]["lines"]) == ["3.00", "5.00"]
    # …and the adopting commit wrote an exact format-2 sidecar
    raw = backend.read_file(
        os.path.join(state, f"v{adopted._current_version()}", "_parts.json")
    )
    assert _json.loads(raw)["format"] == 2


def test_adoption_witness_catches_partial_root_listing(spark, tmp_path):
    """Witness 2: a stale root listing frozen from a crashed build
    attempt can be PRESENT but PARTIAL (missing frame dirs every
    committed version contains) — adoption must refuse it."""
    from streaming_examples_spark.streaming.cdc_stream import (
        StateAdoptionError,
    )

    backend = LaggedManifestBackend(lag_ops=5)
    state, proc = _first_batch(spark, tmp_path, backend)
    v = proc._current_version()
    _strip_sidecar(state, v)
    root = os.path.abspath(os.path.join(state, f"v{v}"))
    # freeze a partial view: the dir "exists" but lists only two of
    # the six frame dirs (what a crashed attempt's snapshot looks like)
    backend._stale[root] = (
        backend._ops + 1000,
        True,
        ["order_state", "carry_orders"],
    )
    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend)
    with pytest.raises(StateAdoptionError, match="missing frame dirs"):
        fresh.read_state("order_state")


def test_adoption_witness_catches_frame_probe_mismatch(spark, tmp_path):
    """Witness 3: a frame dir the (fresh) root listing names must
    itself probe present; a stale per-dir absent view raises."""
    from streaming_examples_spark.streaming.cdc_stream import (
        StateAdoptionError,
    )

    backend = LaggedManifestBackend(lag_ops=5)
    state, proc = _first_batch(spark, tmp_path, backend)
    v = proc._current_version()
    _strip_sidecar(state, v)
    frame = os.path.abspath(os.path.join(state, f"v{v}", "order_state"))
    backend._stale[frame] = (backend._ops + 1000, False, None)
    fresh = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend)
    with pytest.raises(StateAdoptionError, match="probes absent"):
        fresh.read_state("order_state")


def test_store_all_publishes_sidecar_without_bucketed_frames(
    spark, tmp_path, backend_cls
):
    """r11 ADVICE: a version committed with NO bucketed frames must
    still publish the sidecar (truthfully empty) — otherwise the next
    reader of a post-r11 store would fall into legacy adoption."""
    import json as _json

    backend = backend_cls()
    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(spark, state, n_buckets=8, backend=backend)
    df = spark.createDataFrame([(1,)], "x long")
    proc._store_all({"carry_orders": df})
    raw = backend.read_file(os.path.join(state, "v1", "_parts.json"))
    assert raw is not None
    data = _json.loads(raw)
    assert data == {"format": 2, "frames": {}}


# -- deleted-order markers: advancing GC horizon + reader contract ----
# r12 (VERDICT r11 #4, #5): the operational GC recipe feeds a
# monotonically ADVANCING horizon (pg_replication_slots.restart_lsn per
# checkpoint), and every public reader of order_state must understand
# the r11 state contract (op='d' marker rows with NULL after).


def _marker_log():
    log = TxLog()
    c1 = log.tx(lambda t: t.insert_order(30000),
                lambda t: t.insert_line(300001, 30000))
    c2 = log.tx(lambda t: t.delete_line(300001),
                lambda t: t.delete_order(30000))
    c3 = log.tx(lambda t: t.insert_order(30009))
    c4 = log.tx(lambda t: t.insert_order(30010))
    return log, (c1, c2, c3, c4)


def _run_marker_batches(spark, state, horizon_schedule):
    """Replay the marker log in 4 single-tx batches; horizon_schedule
    maps batch_id -> horizon fed that batch (None = retention)."""
    horizon = {"lsn": None}
    proc = TxDenormBatchProcessor(
        spark, state, n_buckets=1,
        order_delete_gc_horizon_lsn=lambda: horizon["lsn"],
    )
    log, cuts = _marker_log()
    o, l, x = _dfs(spark, log)
    emissions = []
    bounds = [(-1, cuts[0]), (cuts[0], cuts[1]), (cuts[1], cuts[2]),
              (cuts[2], cuts[3])]
    states = {}
    for bid, (lo, hi) in enumerate(bounds):
        horizon["lsn"] = horizon_schedule.get(bid)
        cond = (F.col("source.lsn") > lo) & (F.col("source.lsn") <= hi)
        emissions += [
            tuple(r)
            for r in proc.process(
                o.filter(cond), l.filter(cond), x, batch_id=bid
            ).collect()
        ]
        states[bid] = [
            (r["order_key"], r["op"])
            for r in proc._load_buckets("order_state", [0]).collect()
        ]
    return proc, emissions, states, cuts


@pytest.mark.slow
def test_stream_gc_horizon_advancing_per_batch(spark, tmp_path):
    """The horizon advances batch-over-batch (the restart_lsn feed):
    markers strictly below each batch's horizon drop at that batch's
    state roll, and the emissions are byte-equal to a full-retention
    run — GC is a pure state-size knob, never a semantics knob."""
    log, cuts = _marker_log()
    c1, c2, c3, c4 = cuts

    _, control_emis, control_states, _ = _run_marker_batches(
        spark, str(tmp_path / "ctl"), {}
    )
    # advancing schedule: each batch feeds (previous batch's max commit
    # LSN) + 1 — always ≤ the oldest in-flight LSN of its own batch
    schedule = {2: c2 + 1, 3: c3 + 1}
    _, gc_emis, gc_states, _ = _run_marker_batches(
        spark, str(tmp_path / "gc"), schedule
    )

    assert sorted(map(str, gc_emis)) == sorted(map(str, control_emis))
    # batch 1 (horizon unset): the marker is in state in BOTH runs
    assert (30000, "d") in gc_states[1]
    assert (30000, "d") in control_states[1]
    # batch 2 (horizon = c2+1 > marker's commit_lsn): the GC run drops
    # it at the roll; the control retains it forever
    assert (30000, "d") not in gc_states[2]
    assert (30000, "d") in control_states[2]
    assert (30000, "d") in control_states[3]
    # live images are never GC'd
    assert (30009, "c") in gc_states[2]


@pytest.mark.slow
def test_stream_gc_horizon_ahead_of_inflight_is_refused(spark, tmp_path):
    """A horizon AHEAD of the oldest in-flight LSN could trim a marker
    a pending tx still needs — the stream refuses it loudly instead of
    applying it (the restart_lsn feed can never legitimately do this:
    restart_lsn ≤ every in-flight LSN by definition)."""
    horizon = {"lsn": None}
    proc = TxDenormBatchProcessor(
        spark, str(tmp_path / "state"), n_buckets=1,
        order_delete_gc_horizon_lsn=lambda: horizon["lsn"],
    )
    log, cuts = _marker_log()
    c1 = cuts[0]
    o, l, x = _dfs(spark, log)
    cond = (F.col("source.lsn") > -1) & (F.col("source.lsn") <= c1)
    b0 = (o.filter(cond), l.filter(cond), x)
    horizon["lsn"] = c1 + 10_000  # ahead of every LSN in flight
    with pytest.raises(ValueError, match="ahead of the oldest in-flight"):
        proc.process(*b0, batch_id=0)
    # the refusal left no committed version behind — a corrected feed
    # replays the same batch cleanly
    horizon["lsn"] = None
    assert proc.process(*b0, batch_id=0).count() == 1


def test_marker_bearing_store_through_public_readers(spark, tmp_path):
    """VERDICT r11 #5: every public reader of a marker-bearing store
    must see the r11 contract — op='d' rows with NULL after — and
    survive sidecar-less adoption without dropping markers."""
    state = str(tmp_path / "state")
    _, _, states, _ = _run_marker_batches(spark, state, {})
    assert (30000, "d") in states[3]

    # read_state: markers visible, after is NULL, live rows intact
    fresh = TxDenormBatchProcessor(spark, state, n_buckets=1)
    rows = {
        r["order_key"]: (r["op"], r["after"])
        for r in fresh.read_state("order_state").collect()
    }
    assert rows[30000][0] == "d" and rows[30000][1] is None
    assert rows[30009][0] == "c" and rows[30009][1] is not None

    # _load_buckets: the bucket-pruned path sees the same contract
    lb = {
        r["order_key"]: r["op"]
        for r in fresh._load_buckets("order_state", [0]).collect()
    }
    assert lb[30000] == "d"

    # sidecar-less adoption (pre-r11 store shape): markers survive —
    # adoption enumerates PARTS, never filters rows
    v = fresh._current_version()
    _strip_sidecar(state, v)
    adopted = TxDenormBatchProcessor(spark, state, n_buckets=1)
    arows = {
        r["order_key"]: r["op"]
        for r in adopted.read_state("order_state").collect()
    }
    assert arows[30000] == "d"


# -- COMPOSED adversarial soak: dual-host × list-after-write lag × crash
# (VERDICT r11 #3). The per-dimension soaks exist separately (dual-host
# above; lag via the backend_cls matrix; crash via _crash_once suites);
# a real object store presents all three AT ONCE. One shared
# LaggedManifestBackend models the server-side eventual-consistency
# view both hosts read through; crashes leave same-host-reclaimable
# claims the retry heals; the remote-mid-commit hijack exercises the
# build-marker fence under stale listings.


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 9001])
def test_composed_dual_host_lag_crash_tx_soak(
    spark, tmp_path, seed, monkeypatch
):
    """Every op must succeed or fail LOUDLY; at the end: sink-level
    at-least-once completeness, caller-level exactly-once, per-frame
    commit-LSN order, and a fresh processor lands a clean tail batch —
    regardless of the random schedule."""
    import contextlib
    import random as _random

    from test_tx_properties import _naive_replay, _random_log, lsn_cut_bounds

    from streaming_examples_spark.streaming import locks as locks_mod

    monkeypatch.setattr(
        locks_mod, "writer_lock", lambda *a, **kw: contextlib.nullcontext()
    )
    rng = _random.Random(seed)
    log = _random_log(seed)
    exp_orders, exp_lines, exp_touched = _naive_replay(log)
    o, l, x = _dfs(spark, log)
    state = str(tmp_path / "state")

    # ONE shared lag double: the store's eventual-consistency view is
    # server-side, so either host's mutation lags BOTH hosts' listings
    shared_backend = LaggedManifestBackend(lag_ops=rng.randint(3, 12))

    sink_pairs: list[tuple] = []

    def sink(df, batch_id):
        sink_pairs.extend(
            (r["order_key"], r["commit_lsn"]) for r in df.collect()
        )

    def mk_host():
        return TxDenormBatchProcessor(
            spark, state, n_buckets=8, backend=shared_backend,
            emission_sink=sink,
        )

    hosts = [mk_host(), mk_host()]
    LOUD = (
        "injected crash",
        "build fencing violation",
        "dual-writer detected",
        "generation conflict",
    )

    n_batches = rng.randint(3, 4)
    bounds = lsn_cut_bounds(log, [i / n_batches for i in range(1, n_batches)])
    frame_rows: list = []

    def good(df):
        rows = df.collect()
        lsns_f = [r["commit_lsn"] for r in rows]
        assert lsns_f == sorted(lsns_f)
        frame_rows.extend(rows)

    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        cond = (F.col("source.lsn") > F.lit(lo)) & (F.col("source.lsn") <= F.lit(hi))
        batch = (o.filter(cond), l.filter(cond), x)
        event = rng.choice(
            ["plain", "plain", "crash", "restart", "remote_mid_commit"]
        )
        h = rng.randrange(2)
        if event == "restart":
            hosts[h] = mk_host()
            event = "plain"

        if event == "plain":
            good(hosts[h].process(*batch, batch_id=i))
        elif event == "crash":
            # publish_file covers the r12 sidecar/scalar publishes —
            # a crash between the bucketed writes and the sidecar (or
            # between sidecar and pointer flip) must replay cleanly
            prim = rng.choice(
                ["commit_pointer", "carry_file", "remove_tree", "publish_file"]
            )
            calls = {"n": 0, "at": rng.randint(1, 2)}

            def should(*_a, **_k):
                calls["n"] += 1
                return calls["n"] == calls["at"]

            _crash_once(shared_backend, prim, should)
            try:
                good(hosts[h].process(*batch, batch_id=i))
            except RuntimeError as e:
                assert any(p in str(e) for p in LOUD), e
                hosts[h] = mk_host()
                good(hosts[h].process(*batch, batch_id=i))
            else:
                hosts[h] = mk_host()
            # drop the instance-level wrapper (fired or not) so later
            # ops fall back to the class method, uninjected
            try:
                delattr(shared_backend, prim)
            except AttributeError:
                pass
        else:  # remote_mid_commit inside the victim's commit window
            victim, remote = hosts[h], hosts[1 - h]
            real_validate = shared_backend.validate_build
            fired = {"done": False}

            def hijack(path, owner, _remote=remote, _batch=batch, _i=i,
                       _real=real_validate):
                if not fired["done"]:
                    fired["done"] = True
                    good(_remote.process(*_batch, batch_id=_i))
                return _real(path, owner)

            monkeypatch.setattr(shared_backend, "validate_build", hijack)
            try:
                good(victim.process(*batch, batch_id=i))
            except RuntimeError as e:
                assert any(p in str(e) for p in LOUD), e
            finally:
                monkeypatch.setattr(
                    shared_backend, "validate_build", real_validate
                )
            hosts[h] = mk_host()

    exp_pairs = sorted(exp_touched)
    got_frame_pairs = [(r["order_key"], r["commit_lsn"]) for r in frame_rows]
    assert len(got_frame_pairs) == len(set(got_frame_pairs)), got_frame_pairs
    assert set(got_frame_pairs) <= set(exp_pairs)
    assert set(sink_pairs) == set(exp_pairs), (
        sorted(set(exp_pairs) - set(sink_pairs)),
        sorted(set(sink_pairs) - set(exp_pairs)),
    )

    tail = TxLog()
    tail._lsn, tail._next_tx = 900000, 9000
    tail.tx(lambda t: t.insert_order(90001), lambda t: t.insert_line(990001, 90001))
    fresh = mk_host()
    d = fresh.process(*_dfs(spark, tail), batch_id=99).collect()
    assert len(d) == 1 and d[0]["id"] == 90001


def test_bucketed_frame_emptied_by_deletes_roundtrip(spark, tmp_path):
    """A touched bucket whose EVERY key is deleted writes no part dirs
    (partitionBy of zero rows leaves only _SUCCESS): the format-2
    sidecar records the frame with zero parts, reads return None
    instead of tripping schema inference on the empty dir, the next
    batch carries nothing for it, and sidecar-less adoption of the
    same shape degrades identically."""
    import json as _json

    state = str(tmp_path / "state")
    proc = TxDenormBatchProcessor(spark, state, n_buckets=1)
    log = TxLog()
    c1 = log.tx(lambda t: t.insert_order(30000),
                lambda t: t.insert_line(300001, 30000))
    c2 = log.tx(lambda t: t.delete_line(300001),
                lambda t: t.delete_order(30000))
    c3 = log.tx(lambda t: t.insert_order(30009),
                lambda t: t.insert_line(300091, 30009))
    o, l, x = _dfs(spark, log)

    def batch(lo, hi):
        cond = (F.col("source.lsn") > lo) & (F.col("source.lsn") <= hi)
        return o.filter(cond), l.filter(cond), x

    assert proc.process(*batch(-1, c1), batch_id=0).count() == 1
    assert proc.process(*batch(c1, c2), batch_id=1).count() == 1

    v = proc._current_version()
    raw = proc.backend.read_file(os.path.join(state, f"v{v}", "_parts.json"))
    frames = _json.loads(raw)["frames"]
    # line_state emptied → exact sidecar records it with ZERO parts;
    # order_state keeps the delete marker → one part remains
    assert frames["line_state"] == []
    assert len(frames["order_state"]) == 1

    assert proc.read_state("line_state") is None
    assert proc._load_buckets("line_state", [0]) is None
    # the marker is still readable through both paths
    assert proc.read_state("order_state").count() == 1

    # adoption of the same shape (pre-r11 store): the empty bucketed
    # frame is absent from the adopted enumeration and reads as None
    _strip_sidecar(state, v)
    adopted = TxDenormBatchProcessor(spark, state, n_buckets=1)
    assert adopted.read_state("line_state") is None
    assert adopted.read_state("order_state").count() == 1

    # the next batch commits cleanly over the empty frame (carry loop
    # iterates zero parts) and the new sidecar is exact again
    d = adopted.process(*batch(c2, c3), batch_id=2).collect()
    assert len(d) == 1 and d[0]["id"] == 30009
    raw2 = adopted.backend.read_file(
        os.path.join(state, f"v{adopted._current_version()}", "_parts.json")
    )
    frames2 = _json.loads(raw2)["frames"]
    assert len(frames2["line_state"]) == 1

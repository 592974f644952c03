"""Incremental near-duplicate detection over a document stream.

The streaming counterpart of ``operators/dedup.py:minhash_lsh_pairs``:
a corpus grows batch by batch (a crawl, a feed, CDC on a documents
table) and every new document must be checked against EVERYTHING seen
so far — without ever re-scanning old text.

Design (all equi-joins, no pair space, state ∝ unique corpus):

  * The state directory keeps two append-only parquet stores:
      ``bands/``  (band_id, band_key, doc_id)   — the LSH probe index
      ``sigs/``   (doc_id, sig ARRAY<LONG>)     — MinHash signatures
    Only CANONICAL (non-duplicate) docs are stored, so state grows
    with unique content, not with stream length — re-crawled copies
    never inflate it.
  * Every store commits through the same ``StateStorageBackend`` seam
    as the tx state store (``state_backend.py``): each store's live
    files sit under ``<store>/v<E>/`` and a per-store generation
    pointer (``commit_pointer`` — POSIX rename flip or object-store
    conditional put) names the committed epoch. Appends land in the
    CURRENT epoch dir (Spark's write commit makes the files appear
    whole); only COMPACTION bumps the epoch: the rewritten store is
    fully written under ``v<E+1>`` before one pointer flip makes it
    live, and the superseded epoch is removed through the backend
    (deferred, reference-aware under a manifest backend). No
    ``os.rename`` directory swaps anywhere — this store is the one a
    100 TB deployment must host on object storage, so the commit
    protocol carries no POSIX assumption (proven by running the crash
    suite over ``LocalPosixBackend`` AND ``ManifestBackend``,
    tests/test_incremental_dedup.py). Pre-r9 root-level stores are
    adopted in place (``_adopt_legacy``: files → ``v1`` + pointer,
    pure same-directory renames under the writer lock).
  * Per batch: new docs are shingled once (`shingle_base_hashes`, one
    md5 per shingle); candidates come from an equi-join on
    (band_id, band_key) against the store AND a within-batch band
    self-join; similarity is verified on the MinHash signatures
    (matching-position fraction estimates Jaccard) — old TEXT is
    never needed, so the store stays narrow.
  * Replayed doc_ids (at-least-once sources) are dropped against
    ``sigs`` before processing: re-delivery cannot duplicate state or
    flip an earlier verdict.
  * Viral band keys (boilerplate shared by thousands of docs) are
    capped exactly like the batch LSH family (``dedup.py:_cap_buckets``,
    measured default 256): a key whose combined store+batch membership
    exceeds ``max_bucket_size`` is skipped by both the store probe and
    the within-batch self-join, so one template key accumulated in the
    store can never make every future batch pay its full fan-out. The
    membership counts are amortized — a compact-built ``band_hot``
    summary + driver-side counts of since-compact appends, never a
    per-batch store scan (see the viral-cap section below, ~4-5 %
    measured premium).

At 100 TB pass ``bands_buckets=N``: BOTH stores become EXTERNAL
BUCKETED tables — ``bands`` on (band_id, band_key), ``sigs`` on
doc_id — so every per-batch store join (replay anti-join, band probe,
signature verify) shuffles only the (small) batch side to the bucket
count; the corpus-sized stores are read in place, never shuffled
(plan-asserted in tests/test_plans.py). The append-only layout is
bucket-compatible (each batch appends one file set per bucket;
``compact`` restores one file per bucket), and a restart re-registers
the tables over the existing files — bucket ids live in the file
names, so a fresh session's catalog recovers full bucket-awareness
from DDL alone. The bucket counts are persisted in
``state_dir/_layout.json`` on first write and validated at init:
re-opening a store with a different count would silently hash probes
into the wrong buckets (permanent recall loss), so a mismatch raises
instead. The default (None) keeps plain append-only parquet for
warehouse-free tests.

Single-writer contract: ``process_batch`` and ``compact`` take an
advisory writer lock on the state dir (``_writer.lock``) — running
them concurrently could lose appends inside compact's directory swap,
so the overlap raises loudly instead; a crashed local owner's lock is
broken automatically (see ``_writer_lock``).

Reference parity: the reference has no incremental near-dup operator —
this extends its CDC-state patterns (bounded keyed state, replay
dedup: TxAware...Operator.java:357-430) to the training-data domain.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    band_keys_from_hashes,
    perm_constants,
    shingle_base_hashes,
    word_shingles,
)

from streaming_examples_spark.streaming.locks import (  # noqa: F401
    _pid_alive,  # re-exported: tests exercise the pid-liveness gate
    writer_lock,
)
from streaming_examples_spark.streaming.state_backend import (
    LocalPosixBackend,
    StateStorageBackend,
)

_SIG_SCHEMA = "doc_id long, sig array<long>"
_BAND_SCHEMA = "band_id int, band_key string, doc_id long"


_STORES = {
    "sigs": (_SIG_SCHEMA, ("doc_id",), "(doc_id BIGINT, sig ARRAY<BIGINT>)"),
    "bands": (
        _BAND_SCHEMA,
        ("band_id", "band_key"),
        "(band_id INT, band_key STRING, doc_id BIGINT)",
    ),
}

#: Spark bucketed data files carry their bucket id in the name
#: (``part-00007-<uuid>_00003.c000.snappy.parquet`` → bucket 3); the
#: per-bucket compactor groups files by this, the same convention the
#: scan uses to map files to buckets.
_BUCKET_ID_RE = re.compile(r"_(\d+)\.c\d+")


def _data_file_names(uris) -> list[str]:
    """Sorted parquet basenames from a DataFrame.inputFiles() list."""
    return sorted(
        os.path.basename(u) for u in uris if u.endswith(".parquet")
    )


def minhash_signature(hs, n_perms: int) -> F.Column:
    """Full MinHash signature (array of per-permutation minima) over a
    precomputed base-hash array — same hash family as the LSH bands."""
    def perm_min(i: int):
        a, b = perm_constants(i)
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
        )

    return F.array(*[perm_min(i) for i in range(n_perms)])


def estimated_jaccard(sig_a, sig_b) -> F.Column:
    """Matching-position fraction of two equal-length MinHash
    signatures — an unbiased estimator of Jaccard similarity."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches / F.size(sig_a)


class IncrementalNearDup:
    """foreachBatch processor: feed each micro-batch of (doc_id, text)
    to :meth:`process_batch`; it returns the dedup report for the batch
    and folds the batch's canonical docs into the store."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        threshold: float = 0.7,
        k: int = 3,
        n_perms: int = LSH_BANDS * LSH_ROWS,
        text_col: str = "text",
        id_col: str = "doc_id",
        bands_buckets: int | None = None,
        sigs_buckets: int | None = None,
        max_bucket_size: int | None = 256,
        cap_cache_max_keys: int = 5_000_000,
        backend: StateStorageBackend | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        #: storage primitives behind every store commit (epoch pointer
        #: flips, epoch-dir removal, logical listings) — the same seam
        #: the tx state store runs on; identity sealed in _layout.json
        #: so a state dir is only reopened by the backend that wrote it
        self.backend = backend if backend is not None else LocalPosixBackend()
        self.threshold = threshold
        self.k = k
        self.n_perms = n_perms
        self.text_col = text_col
        self.id_col = id_col
        #: the 100 TB layout the module docstring promises: both stores
        #: as EXTERNAL BUCKETED tables (bands on (band_id, band_key),
        #: sigs on doc_id), so every per-batch store join shuffles only
        #: the (small) batch side — the corpus-sized stores are read in
        #: place, never shuffled (Exchange elided; plan-asserted in
        #: tests/test_plans.py). None keeps plain append-only parquet
        #: (the no-warehouse test default). ``sigs_buckets`` defaults to
        #: ``bands_buckets`` — one dial covers both stores.
        self.bands_buckets = bands_buckets
        self.sigs_buckets = sigs_buckets if sigs_buckets is not None else bands_buckets
        #: viral-band guard, same measured default as the batch LSH
        #: family (``operators/dedup.py:_cap_buckets`` / SCALE_NOTES
        #: recall-vs-cap table): keys whose combined store+batch
        #: membership exceeds this are skipped by probe AND self-join;
        #: near-dups still pair through their other, selective bands.
        self.max_bucket_size = max_bucket_size
        #: memory bound for the driver-side since-compact count cache
        #: (_cap_delta): beyond this many keys, singleton entries are
        #: evicted (each eviction can understate that key by 1 — the
        #: cap fires late, the safe direction). The bound exists for
        #: deployments that outrun the documented compact cadence;
        #: compact() resets the cache against the exact rebuilt summary.
        self.cap_cache_max_keys = cap_cache_max_keys
        #: backlog/maintenance gauges (store growth, appended files per
        #: batch, epoch per store) — the replication-slot-backlog
        #: analog; see monitoring.DetectorMetrics and store_stats()
        from streaming_examples_spark.streaming.monitoring import DetectorMetrics

        self.metrics = DetectorMetrics()
        # last post-append file count per (store, epoch) — saves one
        # backend LIST per append for the metrics gauge (advisory)
        self._append_count_cache: dict[tuple[str, int], int] = {}
        # build-marker fencing identity (state_backend.claim_build):
        # compaction epoch builds are claimed exclusively so a second
        # HOST (the advisory lock is per-filesystem) fails loudly
        # instead of interleaving writes into the same epoch dir
        from streaming_examples_spark.streaming.locks import owner_token

        self._writer_token = owner_token()
        self._reset_cap_cache()
        if self.bands_buckets or self.sigs_buckets:
            import hashlib

            tag = hashlib.md5(os.path.abspath(state_dir).encode()).hexdigest()[:12]
            self._bands_table = "incdedup_bands_" + tag
            self._sigs_table = "incdedup_sigs_" + tag
        self._check_layout()

    # -- state layout ---------------------------------------------------
    # Each store (bands, sigs, band_hot) is its own pointer-committed
    # unit: <state_dir>/<store>/v<E>/ holds the live files, and the
    # backend's per-store pointer names E. Appends write into the
    # current epoch (Spark's job commit makes files appear whole);
    # only compaction creates a new epoch and flips the pointer — the
    # single atomic commit point, replacing the pre-r9 two-rename
    # directory swaps that could not run on an object store.
    def _path(self, name: str) -> str:
        """Store ROOT (pointer + epoch dirs live under it)."""
        return os.path.join(self.state_dir, name)

    def _epoch(self, name: str) -> int:
        """Committed epoch of a store; 0 = store not created yet."""
        return self.backend.read_pointer(self._path(name))

    def _data_path(self, name: str, epoch: int | None = None) -> str | None:
        """The epoch dir holding the store's live files (None before
        the first append commits epoch 1)."""
        e = self._epoch(name) if epoch is None else epoch
        return os.path.join(self._path(name), f"v{e}") if e else None

    def _ensure_epoch(self, name: str) -> tuple[int, str]:
        """Create-and-commit epoch 1 on first use; return the current
        (epoch, epoch dir). A crash between prepare and commit leaves
        an empty v1 with no pointer — healed by ``_adopt_legacy``'s
        pointer-finalize pass (same end state as a crashed adoption)."""
        e = self._epoch(name)
        if e == 0:
            path = os.path.join(self._path(name), "v1")
            self.backend.prepare_dir(path)
            self.backend.commit_pointer(self._path(name), 1)
            return 1, path
        return e, os.path.join(self._path(name), f"v{e}")

    def _gc_epochs(self) -> None:
        """Remove epoch dirs the pointer no longer names: crash garbage
        from a compaction that died before its cleanup (superseded
        epoch) or after writing but before committing (orphan next
        epoch). Runs under the writer lock; idempotent — the manifest
        backend's remove_tree is deferred/reference-aware by design.

        Refuses when the pointer reads 0 but epoch dirs ≥ v2 exist:
        that state is only reachable by LOSING the pointer (a partial
        restore, a deleted CURRENT/_pointer, a foreign backend reading
        a flat pre-layout dir) — epochs ≥ 2 are created exclusively by
        compaction, which requires a committed pointer first. Treating
        them as orphans would GC the live store and silently re-admit
        every known doc; a v1 with no pointer is the adoption /
        first-append crash window and is finalized by
        ``_adopt_legacy`` before this runs."""
        for name in (*_STORES, "band_hot"):
            root = self._path(name)
            if not self.backend.dir_exists(root):
                continue
            cur = self.backend.read_pointer(root)
            epochs = [
                int(m.group(1))
                for entry in self.backend.list_dir(root)
                if (m := re.fullmatch(r"v(\d+)", entry))
            ]
            if cur == 0 and any(e >= 2 for e in epochs):
                raise ValueError(
                    f"incremental-dedup store {root} holds epoch dirs "
                    f"{sorted(epochs)} but no committed pointer — the "
                    "pointer was lost (partial restore? wrong backend?). "
                    "Refusing to GC: reclaiming these dirs would silently "
                    "reset the dedup state. Restore the pointer to the "
                    "store's true epoch, or rebuild the store."
                )
            for e in epochs:
                if e != cur:
                    stray = os.path.join(root, f"v{e}")
                    if e > cur:
                        # an epoch ABOVE the pointer is a compaction in
                        # flight or its crash garbage: CLAIM it before
                        # touching it — _acquire_build raises on a live
                        # foreign builder (dual-host schedule) and
                        # atomically takes over an abandoned same-host
                        # claim, so this GC can never race a fresh
                        # claimer between a probe and the delete
                        self._acquire_build(stray)
                        self.backend.remove_tree(stray)
                        self.backend.release_build(stray)
                    else:
                        # BELOW the pointer: committed, superseded — no
                        # live build possible. A compaction crash between
                        # its pointer flip and its remove_tree lands the
                        # dir HERE; re-run the straggler fold from the
                        # persisted consumed manifest before reclaiming,
                        # so concurrently-appended files are not lost
                        # (band_hot holds summaries, never appends —
                        # nothing to fold)
                        if name != "band_hot":
                            # best-effort: a torn/corrupt straggler file
                            # (crash garbage is exactly what lands here)
                            # must not wedge every subsequent locked op —
                            # r10 reclaimed blind and made progress; warn
                            # LOUDLY and degrade to that rather than
                            # raising out of every future _gc_epochs
                            try:
                                self._fold_stragglers_from_manifest(name, e)
                            except Exception as exc:  # noqa: BLE001
                                import warnings

                                warnings.warn(
                                    f"GC-time straggler fold of {stray} "
                                    f"failed ({exc!r}); reclaiming the "
                                    "superseded epoch WITHOUT the fold — "
                                    "unconsumed concurrent appends in it "
                                    "(if any) are lost, the r10 behavior"
                                )
                        # release-then-remove so a crash between the two
                        # cannot strand a marker on a dir no listing
                        # will surface again
                        self.backend.release_build(stray)
                        self.backend.remove_tree(stray)
        # A crash between a compaction's pointer flip and its DROP TABLE
        # leaves the SUPERSEDED epoch's table registered in any session
        # that survives the crash (fresh sessions never see it — table
        # names are epoch-versioned). The dirs those registrations point
        # at were just reclaimed above, so re-drop every registered
        # epoch-version that is not the committed one.
        if self.bands_buckets or self.sigs_buckets:
            for name in _STORES:
                if not self._buckets(name):
                    continue
                base = self._bands_table if name == "bands" else self._sigs_table
                cur = self._epoch(name)
                for row in self.spark.sql(f"SHOW TABLES LIKE '{base}_v*'").collect():
                    m = re.fullmatch(re.escape(base) + r"_v(\d+)", row.tableName)
                    if m and int(m.group(1)) != cur:
                        self.spark.sql(f"DROP TABLE IF EXISTS {row.tableName}")

    def _acquire_build(self, path: str) -> None:
        """Claim-first acquisition of a build dir: raises on a live
        remote-host claim; atomically takes over an abandoned
        same-host one (state_backend.acquire_build — the claim CAS
        runs BEFORE any probe, closing the probe-then-claim window)."""
        from streaming_examples_spark.streaming.state_backend import (
            acquire_build,
        )

        acquire_build(self.backend, path, self._writer_token)

    def _buckets(self, name: str) -> int | None:
        # only the two corpus stores are bucketable; routing any other
        # name (e.g. 'band_hot', a valid STORE name) to the sigs config
        # would silently hand back the wrong store's table
        if name not in _STORES:
            raise ValueError(
                f"store {name!r} has no bucket configuration; bucketed "
                f"stores are {tuple(_STORES)}"
            )
        return self.bands_buckets if name == "bands" else self.sigs_buckets

    def _table(self, name: str, epoch: int | None = None) -> str:
        """External-table name for a store epoch. Epoch-versioned: a
        compaction registers the NEW epoch under a new name and drops
        the old one after the pointer flip, so no location check (or
        mid-query table mutation) is ever needed."""
        if name not in _STORES:
            raise ValueError(
                f"store {name!r} is not a bucketed store "
                f"({tuple(_STORES)}); it has no registered table"
            )
        base = self._bands_table if name == "bands" else self._sigs_table
        e = self._epoch(name) if epoch is None else epoch
        return f"{base}_v{e}"

    def store_table(self, name: str) -> str:
        """Public: the registered table name of a bucketed store's
        current epoch (plan tests / operational inspection). Adopts a
        pre-r9 dir first; raises (instead of returning a never-created
        ``_v0`` name) while the store has no committed epoch.

        UNLOCKED reader: the name (and the directory behind it) is only
        stable while no ``compact()``/``process_batch()`` runs — a
        concurrent compaction flips the pointer and GCs the epoch this
        name resolves to, failing a query planned against it. Hold off
        writers, or snapshot via ``read_store()`` + ``localCheckpoint``
        when you need the content to outlive a compaction."""
        if not self._buckets(name):
            raise ValueError(
                f"store {name!r} is plain parquet (no bucket count declared); "
                "only bucketed stores register a table — read it with "
                "read_store() instead"
            )
        self._adopt_if_legacy()
        e = self._epoch(name)
        if e == 0:
            raise ValueError(
                f"store {name!r} has no committed epoch yet (nothing has "
                "been appended); there is no table to read."
            )
        self._ensure_table(name, e)
        return self._table(name, e)

    def _layout_path(self) -> str:
        return os.path.join(self.state_dir, "_layout.json")

    def _check_layout(self) -> None:
        """A store hashed into N buckets read back as M buckets probes
        the wrong files — silent, permanent recall loss. The layout file
        written with the first append makes the mismatch loud instead.

        A pre-layout (legacy) store is adopted ONLY when both sides are
        verifiably flat: a bucketed declaration over legacy files (or
        files whose names carry bucket ids under a flat declaration)
        cannot be validated, and adopting a wrong count would be exactly
        the silent recall loss this guard exists to stop — then SEAL the
        wrong count into the layout file. Refuse instead."""
        declared = {"bands_buckets": self.bands_buckets, "sigs_buckets": self.sigs_buckets}
        if not os.path.exists(self._layout_path()):
            store_files = [
                f
                for n in _STORES
                # root level (pre-layout legacy) AND epoch dirs (a
                # layout file deleted out from under a live store)
                for pat in ("*.parquet", "v*/*.parquet")
                for f in glob.glob(os.path.join(self._path(n), pat))
            ]
            if not store_files:
                return  # fresh state dir: layout written with first append
            looks_bucketed = any(
                _BUCKET_ID_RE.search(os.path.basename(f)) for f in store_files
            )
            if self.bands_buckets or self.sigs_buckets or looks_bucketed:
                raise ValueError(
                    f"incremental-dedup state at {self.state_dir} predates the "
                    "layout file and a bucketed layout is involved (declared "
                    f"bands_buckets={self.bands_buckets}/sigs_buckets="
                    f"{self.sigs_buckets}, files "
                    f"{'carry' if looks_bucketed else 'carry no'} bucket ids): "
                    "the bucket count cannot be validated, and probing with a "
                    "wrong count is silent recall loss. Write _layout.json "
                    "with the store's true counts, or rebuild the store."
                )
            return  # legacy flat store + flat declaration: safe to adopt
        try:
            with open(self._layout_path()) as fh:
                stored = json.load(fh)
        except ValueError as exc:
            raise ValueError(
                f"incremental-dedup layout file {self._layout_path()} is "
                f"unreadable ({exc}); it seals the store's bucket counts and "
                "storage backend, so a torn/corrupted seal cannot be "
                "adopted silently. Restore it with the store's true values."
            ) from exc
        # backend identity first (the tx store's r8 seal): the two
        # backends encode pointers differently, so a foreign reopen
        # would read epoch 0 and GC live state. Missing key = the
        # local-posix default every pre-r9 layout was written under.
        have_backend = stored.get("backend", LocalPosixBackend.layout_id)
        if have_backend != self.backend.layout_id:
            raise ValueError(
                f"incremental-dedup state at {self.state_dir} was committed "
                f"by the '{have_backend}' storage backend but this detector "
                f"runs '{self.backend.layout_id}'; the pointer encodings "
                "differ, so a cross-backend reopen would read no committed "
                "epoch and reclaim live files. Reopen with the sealed "
                "backend, or migrate the store explicitly."
            )
        for key, want in declared.items():
            have = stored.get(key)
            if have != want:
                raise ValueError(
                    f"incremental-dedup state at {self.state_dir} was written "
                    f"with {key}={have} but this detector declares {key}={want}; "
                    "re-opening with a different bucket count would probe the "
                    "wrong buckets (silent recall loss). Pass the stored count, "
                    "or compact()+migrate the store explicitly."
                )

    def _write_layout(self) -> None:
        if os.path.exists(self._layout_path()):
            return
        os.makedirs(self.state_dir, exist_ok=True)
        self.backend.publish_file(
            self._layout_path(),
            json.dumps(
                {
                    "bands_buckets": self.bands_buckets,
                    "sigs_buckets": self.sigs_buckets,
                    "backend": self.backend.layout_id,
                }
            ).encode(),
        )

    # -- single-writer mutual exclusion ---------------------------------
    def _lock_path(self) -> str:
        return os.path.join(self.state_dir, "_writer.lock")

    @contextlib.contextmanager
    def _writer_lock(self, role: str):
        """Advisory single-writer lock making :meth:`process_batch` and
        :meth:`compact` mutually exclusive on one state dir.

        The race it closes: ``compact`` rewrites the store under the
        NEXT epoch from a snapshot of the current one — an append that
        lands in the CURRENT epoch between that snapshot and the
        pointer flip is absent from the rewrite and reclaimed with the
        superseded epoch, silently losing those canonical docs from
        the store (and, for ``sigs``, their replay protection). The
        operational contract is therefore one writer at a time: the
        stream OR the maintenance job — and that contract SPANS HOSTS.
        This advisory lock is per-filesystem and cannot order two
        hosts on an object store. What the r10 build-marker fencing
        (state_backend.claim_build, validated before every pointer
        flip) adds on top: two hosts COMPACTING concurrently now fail
        loudly — the second claimer loses the conditional put, a
        GC'd-and-reclaimed builder fails its commit-time validation,
        and the epoch GC refuses to reclaim a remote host's live claim
        — so no dual-compact schedule can publish an interleaved
        epoch. The append-vs-remote-compact race (appends never touch
        the pointer or a marker) gets a best-effort HEAL, not a fence:
        compact diffs the superseded epoch's post-flip listing against
        the file set its rewrite consumed and folds stragglers into
        the new epoch (:meth:`_fold_stragglers`) — but a straggler the
        lagging listing hides is still lost, and a reclaimed builder's
        still-running Spark tasks can still write into a new owner's
        dir; closing those fully needs time-bound leases.
        Multi-host deployments must still enforce single-writer
        externally (one owner per state prefix — the same rule every
        LSM table format imposes), with the markers as the
        defense-in-depth that turns most violations into loud errors.
        Acquisition and stale-break mechanics: :func:`writer_lock`.
        """
        with writer_lock(self.state_dir, role):
            yield

    # -- state I/O ------------------------------------------------------
    def _adopt_legacy(self) -> None:
        """Adopt a pre-r9 store in place, under the writer lock.

        Legacy layout: live files at the store ROOT, compaction via
        two-rename directory swaps (the ``.old`` window ``_recover``
        used to heal). Adoption: heal any crashed swap first, then move
        the root-level files into ``v1`` and commit the pointer — pure
        same-directory renames, so POSIX-only; a manifest-backed dir
        can never be legacy (the layout seal refuses foreign dirs
        before this runs, and pre-r9 dirs seal as local-posix).
        Crash-safe by re-entry: files move one by one (re-running moves
        the rest), and the pointer-commit is the last step — a dir with
        everything in ``v1`` and no pointer just gets the commit."""
        names = (*_STORES, "band_hot")
        legacy: dict[str, list[str]] = {}
        for name in names:
            root = self._path(name)
            old, tmp = root + ".old", root + ".compact"
            if os.path.isdir(old):
                # crashed pre-r9 compact swap: live dir missing → the
                # old copy IS the store (the compaction is lost);
                # otherwise the swap completed and .old is garbage
                if not os.path.isdir(root):
                    os.rename(old, root)
                else:
                    shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(root):
                continue
            files = [
                n
                for n in os.listdir(root)
                if n.endswith(".parquet") or n == "_files.json"
            ]
            if files:
                legacy[name] = files
            elif os.path.isdir(os.path.join(root, "v1")) and (
                self.backend.read_pointer(root) == 0
            ):
                # all files moved (or first epoch prepared) but the
                # pointer-commit never ran: finalize it
                self.backend.commit_pointer(root, 1)
        if not legacy:
            return
        if self.backend.layout_id != LocalPosixBackend.layout_id:
            raise ValueError(
                f"incremental-dedup state at {self.state_dir} holds pre-r9 "
                "root-level store files, which only the local-posix backend "
                f"can adopt (renames); backend '{self.backend.layout_id}' "
                "cannot host this dir. Adopt it with a local detector first."
            )
        for name, files in legacy.items():
            root = self._path(name)
            if self.backend.read_pointer(root) != 0:
                raise ValueError(
                    f"incremental-dedup store {root} has BOTH root-level "
                    "files and a committed epoch pointer — not a state this "
                    "engine writes; refusing to guess which is live."
                )
            v1 = os.path.join(root, "v1")
            os.makedirs(v1, exist_ok=True)
            for n in files:
                os.replace(os.path.join(root, n), os.path.join(v1, n))
            self.backend.commit_pointer(root, 1)

    def _ensure_table(self, name: str, epoch: int | None = None) -> None:
        """Re-register the external bucketed table after a restart: a
        fresh session's catalog doesn't know it, but the bucket ids
        live in the file names, so DDL over the existing epoch dir
        restores a fully bucket-aware table."""
        if not self._buckets(name):
            return
        e = self._epoch(name) if epoch is None else epoch
        if self.spark.catalog.tableExists(self._table(name, e)):
            return
        path = self._data_path(name, e)
        # pointer ≥ 1 (a GET) already witnesses the epoch dir: gating
        # the DDL on a LIST-backed dir_exists would skip registration
        # inside a list-after-write lag window and silently read the
        # store as empty (same bug class as _load_store's direct read)
        if path is not None:
            _, cols, ddl_cols = _STORES[name]
            key_list = ", ".join(cols)
            self.spark.sql(
                f"CREATE TABLE {self._table(name, e)} {ddl_cols} USING parquet "
                f"CLUSTERED BY ({key_list}) SORTED BY ({key_list}) "
                f"INTO {self._buckets(name)} BUCKETS "
                f"LOCATION '{path}'"
            )

    def _load_store(self, name: str) -> DataFrame:
        """Missing store -> empty frame (first batch). A store that
        EXISTS but fails to read must raise: swallowing a corrupted
        parquet would silently reset the dedup state (every known doc
        re-admitted as canonical). The epoch is resolved ONCE per call
        and threaded through — a per-helper pointer read would be
        needlessly chatty on an object store, and an unlocked reader
        could otherwise straddle a concurrent epoch flip (table name
        from one epoch validated against another)."""
        schema = _STORES[name][0]
        e = self._epoch(name)
        if not self._buckets(name):
            path = self._data_path(name, e)
            if path is None:
                return self.spark.createDataFrame([], schema)
            # The committed pointer (an object GET) is the existence
            # witness: prepare_dir ran before the pointer committed, so
            # the epoch dir is real. Do NOT gate this read on a
            # LIST-backed probe or enumerate the files through the
            # backend listing — list-after-write lag serves a stale
            # view of a dir Spark just appended into, and an empty
            # read here silently re-admits every known doc (found by
            # running this suite under LaggedManifestBackend: batch
            # N+1 read batch N's store as absent). Spark enumerates
            # the data files itself; detector stores never receive
            # carried (manifest-referenced) files — appends, rewrites
            # and POSIX-only adoption all land physical files — so the
            # dir IS the content on every backend.
            return self.spark.read.schema(schema).parquet(path)
        self._ensure_table(name, e)
        if self.spark.catalog.tableExists(self._table(name, e)):
            return self.spark.table(self._table(name, e))
        return self.spark.createDataFrame([], schema)

    def _adopt_if_legacy(self) -> None:
        """Public-read entry to adoption: the locked ops adopt as their
        first step, but an inspection call on a pre-r9 dir must not
        silently read an empty store just because no batch has run yet
        (the changelog promises old dirs open fine). Takes the writer
        lock only when there is something to adopt."""
        for name in (*_STORES, "band_hot"):
            root = self._path(name)
            if not os.path.isdir(root):
                continue
            legacy_files = any(
                n.endswith(".parquet") or n == "_files.json"
                for n in os.listdir(root)
            )
            unfinalized = os.path.isdir(os.path.join(root, "v1")) and (
                self.backend.read_pointer(root) == 0
            )
            if legacy_files or unfinalized or os.path.isdir(root + ".old"):
                with self._writer_lock("adopt"):
                    self._adopt_legacy()
                return

    def read_store(self, name: str) -> DataFrame:
        """Public, backend-aware snapshot of a store's committed
        content (operational inspection and tests; mirrors the tx
        processor's ``read_state``). Adopts a pre-r9 dir first.

        UNLOCKED reader: the returned frame is LAZY and resolves its
        files at action time — a concurrent ``compact()``/
        ``process_batch()`` can flip the epoch pointer and GC the
        directory it reads (``LocalPosixBackend`` removes immediately),
        failing the action. Run it to completion (or
        ``localCheckpoint``) before letting a writer proceed."""
        self._adopt_if_legacy()
        return self._load_store(name)

    def _count_files(self, path: str) -> int:
        """Advisory file count for the metrics gauges (backend listing;
        can run momentarily stale-LOW under list-after-write lag —
        never a correctness input)."""
        try:
            return sum(
                1 for n in self.backend.list_dir(path) if n.endswith(".parquet")
            )
        except OSError:
            return 0

    def store_stats(self) -> dict:
        """Operational snapshot of every store's backlog — the
        replication-slot-size analog of the reference's monitoring
        stack (postgres-replication-slots dashboard; BASELINE.md rows
        5-6): committed epoch, live data-file count, and total bytes
        per store, plus the accumulated per-batch append counters from
        ``metrics``. Driver-side listings + stats, no Spark jobs.

        Advisory gauges: taken WITHOUT the writer lock (safe to poll
        from a monitoring thread), so a concurrent compact can shift
        the numbers mid-walk, and list-after-write lag can read them
        momentarily stale — growth TRENDS are the signal (a store
        whose files/bytes climb across polls is outrunning its
        compact() cadence, exactly like a swelling replication slot)."""
        out: dict = {"stores": {}, **self.metrics.snapshot()}
        for name in (*_STORES, "band_hot"):
            root = self._path(name)
            epoch = self.backend.read_pointer(root)
            files = n_bytes = 0
            if epoch:
                path = os.path.join(root, f"v{epoch}")
                try:
                    names = self.backend.list_dir(path)
                except OSError:
                    names = []
                for n in names:
                    if not n.endswith(".parquet"):
                        continue
                    try:
                        n_bytes += self.backend.file_size(
                            os.path.join(path, n)
                        )
                        files += 1
                    except OSError:
                        continue  # compacted away mid-walk
            out["stores"][name] = {
                "epoch": epoch,
                "files": files,
                "bytes": n_bytes,
            }
        return out

    def _append_store(self, name: str, rows: DataFrame) -> None:
        self._write_layout()
        epoch, path = self._ensure_epoch(name)
        # one backend LIST per append, not two: the pre-append count is
        # the previous append's post-count when we have it (advisory
        # gauge only — a concurrent writer or a lagging listing skews
        # the delta, never a correctness input)
        key = (name, epoch)
        before = self._append_count_cache.get(key)
        if before is None:
            before = self._count_files(path)
        # lag-double hook: a DIRECT Spark write is invisible to the
        # backend, so the eventual-consistency double cannot open its
        # list-after-write window for it — tell it first (no-op on
        # real backends; see StateStorageBackend.note_spark_write)
        self.backend.note_spark_write(path)
        if not self._buckets(name):
            rows.write.mode("append").parquet(path)
        else:
            _, cols, _ = _STORES[name]
            self._ensure_table(name, epoch)
            (
                rows.write.mode("append")
                .bucketBy(self._buckets(name), *cols)
                # sorted buckets: after compact() leaves one file per
                # bucket, the sort-merge probe reads the store pre-sorted
                # and skips its per-batch O(store) sort entirely
                .sortBy(*cols)
                .option("path", path)
                .saveAsTable(self._table(name, epoch))
            )
        # under the lag double, note_spark_write above froze this dir's
        # listing pre-append, so the post-count can read stale-LOW (the
        # gauge is advisory — its docstring tolerates lag). Clamp to
        # the pre-count so the cached baseline never moves BACKWARD:
        # deltas then telescope correctly (a batch under-counted here
        # is picked up by the next batch's fresh pre-count) instead of
        # double-counting from a poisoned cache.
        after = max(self._count_files(path), before)
        # keep one entry per store (stale epochs pruned on the spot)
        self._append_count_cache = {
            k: v for k, v in self._append_count_cache.items() if k[0] != name
        }
        self._append_count_cache[key] = after
        self.metrics.observe_append(name, max(0, after - before))
        self.metrics.observe_epoch(name, epoch)

    # -- viral-cap membership counts -------------------------------------
    # The cap needs "how many canonical docs already share this band
    # key" for the BATCH's keys. Counting that by scanning the bands
    # store is O(store) per batch — a corpus-sized scan paid for a
    # guard that almost never fires (measured ~15 %/batch, SCALE_NOTES).
    # Amortized design, costing ZERO extra writes per batch (the bands
    # store's own append files ARE the per-batch increments):
    #
    #   * compact() summarizes the bands store into ``band_hot`` — the
    #     exact member count of every key shared by ≥2 canonicals (the
    #     only keys that can ever approach the cap; singleton keys, the
    #     overwhelming majority of a deduplicated store, are omitted) —
    #     plus ``_files.json``, the list of bands data files the
    #     summary covers;
    #   * per batch, store membership = band_hot (tiny) + the DELTA
    #     bands files (those not in ``_files.json``, i.e. appended
    #     since the last compact — O(appends since compact), never
    #     O(store));
    #   * a missing or stale summary (never compacted; crash between
    #     the bands rewrite and the summary swap; hot-bucket merges)
    #     falls back to counting ALL bands files — exact, slower,
    #     self-heals at the next compact().
    #
    # The counts live DRIVER-SIDE (plain dicts fed by pyarrow, zero
    # Spark stages): in-lineage variants measured 20-30 %/batch — every
    # formulation adds shuffle/broadcast stages to the probe job, and
    # at micro-batch sizes stage overhead dwarfs the tiny data. The
    # driver instead keeps
    #   _cap_hot   — band_hot's counts, reloaded when the manifest
    #                changes (one small pyarrow read per compact epoch)
    #   _cap_delta — per-key counts of bands files appended since the
    #                summary (each file pyarrow-read ONCE per process;
    #                per batch that is just the previous batch's own
    #                appends — O(batch), not O(store))
    #   _cap_store_viral — keys whose hot+delta total already reaches
    #                the cap, maintained incrementally at refresh
    # and the batch side rides the job the batch already runs: with the
    # cap on, ``enriched``'s checkpoint is LAZY and materialized by the
    # within-batch key-count collect (measured: same cost as the eager
    # checkpoint alone). Memory: _cap_delta is O(distinct keys appended
    # since the last compact) — the compaction cadence bounds it; the
    # cold refresh after a restart reads all since-compact files once.
    #
    # Accuracy: within ±1 member of exact. Omitted singleton keys
    # (band_hot keeps only n ≥ 2) understate by ≤1 — the cap fires one
    # member late, the safe direction: a spuriously SKIPPED key would
    # be a permanent false-admit, firing late only costs bounded probe
    # fan-out. A crash-replay whose retry straddles a compact boundary
    # can count one doc in both the summary and the delta (+1, fires
    # one member early) — the cap is a fan-out heuristic, not an
    # exactness contract, and ±1 at threshold 256 is immaterial; the
    # next compact() rebuild erases all drift. Within one compact
    # epoch a retry's duplicate rows cannot double-count: a cold
    # refresh dedups (band, doc) across all delta files, and in-process
    # appends are replay-protected upstream (sigs anti-join).
    def _bands_data_files(self) -> list[str]:
        """Best-effort LIST of the bands epoch dir (delta enumeration
        for the cap counts). Gated on the pointer, never on a
        LIST-backed dir_exists. Under list-after-write lag this can run
        stale-SHORT — a just-appended file missing means its docs are
        counted at a LATER refresh (once the listing catches up), so
        the cap fires late: the safe direction (firing late costs
        bounded probe fan-out; a spurious fire would be a permanent
        false admit). The one stale-HIGH path — a summary rebuild
        claiming coverage of fewer files than it aggregated — is closed
        by _rebuild_hot taking coverage from the frame's own
        inputFiles(), not from this listing."""
        if self._epoch("bands") == 0:
            return []
        path = self._data_path("bands")
        return sorted(
            n for n in self.backend.list_dir(path) if n.endswith(".parquet")
        )

    def _reset_cap_cache(self) -> None:
        self._cap_epoch: tuple | None = None
        self._cap_hot: dict[tuple[int, str], int] = {}
        self._cap_delta: dict[tuple[int, str], int] = {}
        self._cap_seen: set[str] = set()
        self._cap_store_viral: set[tuple[int, str]] = set()

    def _refresh_cap_counts(self) -> None:
        """Bring the driver-side membership counts up to date with the
        stores. Called under the writer lock, so the file set is stable
        for the whole batch."""
        import pyarrow.parquet as pq

        hot_path = self._data_path("band_hot")
        manifest_path = (
            os.path.join(hot_path, "_files.json") if hot_path else None
        )
        all_files = self._bands_data_files()
        covered: list[str] = []
        usable = False
        raw_manifest = (
            self.backend.read_file(manifest_path) if manifest_path else None
        )
        if raw_manifest is not None:
            covered = json.loads(raw_manifest)
            # a summary referencing files that no longer exist (crash
            # between the bands rewrite and the summary swap) is stale:
            # fall back to counting ALL files — exact, self-heals at
            # the next compact()
            usable = set(covered) <= set(all_files)
        epoch = tuple(sorted(covered)) if usable else ("<no-summary>",)
        if self._cap_seen - set(all_files):
            # a file we already counted VANISHED (e.g. a compact swapped
            # the bands dir but died before the summary swap, leaving the
            # epoch token unchanged at '<no-summary>'): retained delta
            # counts reference deleted files while the rewritten files
            # would be counted on top — stale-HIGH, spurious virality,
            # permanent false admits. Start cold: re-read all live files
            # with the global (key, doc) dedup.
            self._reset_cap_cache()
        if epoch != self._cap_epoch:
            # new compact epoch (or first refresh): reload the summary,
            # restart the delta from the files it covers
            self._reset_cap_cache()
            self._cap_epoch = epoch
            self._cap_seen = set(covered) if usable else set()
            if usable and os.path.isdir(hot_path):
                t = pq.read_table(hot_path, columns=["band_id", "band_key", "n"])
                for b, k, n in zip(*(c.to_pylist() for c in t.columns)):
                    self._cap_hot[(b, k)] = n
            cold = True
        else:
            cold = False
        new_files = [f for f in all_files if f not in self._cap_seen]
        if new_files:
            tables = [
                pq.read_table(
                    os.path.join(self._data_path("bands"), f),
                    columns=["band_id", "band_key", "doc_id"],
                )
                for f in new_files
            ]
            import pyarrow as pa

            rows = pa.concat_tables(tables)
            if cold:
                # restart path: a pre-crash retry may have appended the
                # same doc's bands twice across files — dedup exactly,
                # once, here (in-process appends can't duplicate: the
                # sigs anti-join replay-protects upstream)
                rows = rows.group_by(
                    ["band_id", "band_key", "doc_id"]
                ).aggregate([])
            counted = rows.group_by(["band_id", "band_key"]).aggregate(
                [("doc_id", "count")]
            )
            cols = [counted[c].to_pylist() for c in ("band_id", "band_key", "doc_id_count")]
            for b, k, n in zip(*cols):
                key = (b, k)
                total = self._cap_delta.get(key, 0) + n
                self._cap_delta[key] = total
                if self._cap_hot.get(key, 0) + total >= self.max_bucket_size:
                    self._cap_store_viral.add(key)
            self._cap_seen.update(new_files)
            if len(self._cap_delta) > self.cap_cache_max_keys:
                # bound driver memory between compacts: drop singleton
                # counts first (understate ≤1 each — the cap fires one
                # member late, the safe direction; a key that matters
                # re-crosses 2 quickly and re-enters). If collision keys
                # alone exceed the bound the store is overdue for
                # compact(); warn and shed the smallest counts — the cap
                # degrades to firing late, never to skipping early.
                self._cap_delta = {
                    k: n for k, n in self._cap_delta.items() if n >= 2
                }
                if len(self._cap_delta) > self.cap_cache_max_keys:
                    import warnings

                    warnings.warn(
                        "incremental-dedup viral-cap cache exceeds "
                        f"cap_cache_max_keys={self.cap_cache_max_keys} even "
                        "after singleton eviction — the store is overdue "
                        "for compact(); shedding the smallest counts (the "
                        "cap may fire late until the next compact)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    keep = sorted(
                        self._cap_delta.items(), key=lambda kv: -kv[1]
                    )[: self.cap_cache_max_keys]
                    self._cap_delta = dict(keep)
        if cold and self._cap_hot:
            cap = self.max_bucket_size
            for key, n in self._cap_hot.items():
                if n + self._cap_delta.get(key, 0) >= cap:
                    self._cap_store_viral.add(key)

    # -- the batch step -------------------------------------------------
    def process_batch(self, docs: DataFrame, batch_id: int) -> DataFrame:
        """Returns (doc_id, is_dup BOOLEAN, dup_of LONG, n_candidates)
        for every doc in the batch (replayed known ids excluded), and
        appends canonical docs' signatures/bands to the store.

        ``dup_of`` is the smallest matching doc_id — from the stored
        corpus if any, else from smaller-id batch peers. Within-batch
        duplicate GROUPS point at the group's canonical only when they
        match it directly (one hop); full transitive closure is the
        batch operator ``dedup_groups``' job, not the stream's.

        Holds the state dir's writer lock for the whole batch: running
        concurrently with :meth:`compact` can silently lose store rows
        (see :meth:`_writer_lock`), so the overlap raises instead.
        """
        with self._writer_lock("process_batch"):
            try:
                return self._process_batch_locked(docs, batch_id)
            except BaseException:
                # a failed batch may have appended bands without sigs;
                # its in-process retry would re-append the same docs and
                # the incremental count cache would read both file sets
                # (stale-HIGH — the unsafe direction). Dropping the
                # cache forces the next refresh cold, which re-reads all
                # since-compact files WITH the global (key, doc) dedup.
                self._reset_cap_cache()
                raise

    def _process_batch_locked(self, docs: DataFrame, batch_id: int) -> DataFrame:
        self._adopt_legacy()
        self._gc_epochs()
        self.metrics.observe_batch_start()
        sigs_store = self._load_store("sigs")
        bands_store = self._load_store("bands")

        # replay protection: a doc_id already folded into the store is
        # a re-delivery — reprocessing could only repeat the verdict.
        # With sigs_buckets the store side satisfies the anti-join's
        # distribution from its bucketing: only the batch side shuffles.
        fresh = docs.select(
            F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text")
        ).join(sigs_store.select("doc_id"), "doc_id", "left_anti")

        hs = shingle_base_hashes(word_shingles(F.col("text"), self.k))
        enriched = (
            fresh.select("doc_id", hs.alias("hs"))
            .withColumn("sig", minhash_signature(F.col("hs"), self.n_perms))
            .withColumn("keys", band_keys_from_hashes(F.col("hs")))
            .withColumn("n_sh", F.size("hs"))
            .drop("hs")
            # feeds probe, self-join, verify, and the store append.
            # localCheckpoint, not persist: the within-batch peer join is
            # a SELF-join on this frame, and self-join disambiguation
            # rewrites attribute ids so a cache lookup can miss — which
            # would re-shingle and re-sign the batch once per consumer
            # (same failure measured in dedup.connected_components).
            # LAZY when the cap is on: the cap's within-batch key-count
            # collect below is then the materializing action — one job
            # does both (measured: same cost as the eager checkpoint
            # alone); eager otherwise.
            .localCheckpoint(eager=self.max_bucket_size is None)
        )
        with_bands = enriched.filter(F.col("n_sh") > 0).select(
            "doc_id", "sig", F.posexplode("keys").alias("band_id", "band_key")
        )
        if self.max_bucket_size is not None:
            # viral-band cap over the UNION of store+batch membership: a
            # boilerplate key with n store members fans every future
            # batch's probe out n-fold (and a within-batch template key
            # n²-fold in the self-join). Store-side counts come from the
            # driver cache (band_hot summary + since-compact append
            # files — see _refresh_cap_counts; never a per-batch scan of
            # the corpus-sized bands store); batch-side counts ride the
            # checkpoint-materializing collect (bounded: only keys with
            # ≥2 batch members, ≤ |batch bands|/2 rows). A key is viral
            # iff store+batch total exceeds the cap:
            #   batch count ≥ 2 → exact check against the collected set;
            #   batch count = 1 → viral iff store total alone ≥ cap,
            #     which _cap_store_viral tracks incrementally.
            # Dropped from probe and self-join alike; near-dups still
            # pair via their other, selective bands (recall measured at
            # the batch family's cap: tools/probe_bucket_cap.py).
            self._refresh_cap_counts()
            cap = self.max_bucket_size
            base = lambda key: self._cap_hot.get(key, 0) + self._cap_delta.get(key, 0)  # noqa: E731
            viral = {
                (r["band_id"], r["band_key"])
                for r in (
                    with_bands.groupBy("band_id", "band_key")
                    .agg(F.count(F.lit(1)).alias("nb"))
                    .filter(F.col("nb") >= 2)
                    .collect()
                )
                if r["nb"] + base((r["band_id"], r["band_key"])) > cap
            }
            viral |= self._cap_store_viral
            if viral:
                viral_df = self.spark.createDataFrame(
                    sorted(viral), "band_id int, band_key string"
                )
                with_bands = with_bands.join(
                    F.broadcast(viral_df), ["band_id", "band_key"], "left_anti"
                )

        # candidates vs the stored corpus + within the batch itself
        hist = (
            with_bands.join(bands_store.withColumnRenamed("doc_id", "old_id"),
                            ["band_id", "band_key"])
            .select("doc_id", "old_id", "sig")
            .distinct()
            .join(sigs_store.select(F.col("doc_id").alias("old_id"),
                                    F.col("sig").alias("old_sig")), "old_id")
            .select("doc_id", "old_id",
                    estimated_jaccard(F.col("sig"), F.col("old_sig")).alias("j"))
        )
        peer = (
            with_bands.alias("a")
            .join(
                with_bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("old_id"),
                    F.col("a.sig").alias("sig"),
                    F.col("b.sig").alias("old_sig"))
            .distinct()
            .select("doc_id", "old_id",
                    estimated_jaccard(F.col("sig"), F.col("old_sig")).alias("j"))
        )
        matches = hist.unionByName(peer).filter(F.col("j") >= self.threshold)
        verdict = matches.groupBy("doc_id").agg(
            F.min("old_id").alias("dup_of"), F.count(F.lit(1)).alias("n_candidates")
        )
        report = (
            enriched.select("doc_id")
            .join(verdict, "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of",
                F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            )
            # MUST sever lineage before the store append: writing to
            # sigs/bands refreshes those paths and drops any cached plan
            # reading them — a lazily recomputed report would then
            # anti-join the batch's own canonicals away. Eager
            # localCheckpoint pins the pre-append result (and is the
            # output-before-state ordering cdc_stream uses).
            .localCheckpoint(eager=True)
        )

        canon = report.filter(~F.col("is_dup")).select("doc_id")
        if canon.isEmpty():
            # replay-only / all-dup / idle batch: nothing new to fold.
            # Skipping the appends matters operationally — a streaming
            # detector sees many idle micro-batches, and writing a
            # zero-row parquet file per store per batch bloats the file
            # count the next compaction has to chew through. isEmpty()
            # is a limit-1 probe over the already-checkpointed report.
            self.metrics.batches += 1
            return report
        new_sigs = enriched.join(canon, "doc_id").select("doc_id", "sig")
        new_bands = (
            enriched.join(canon, "doc_id")
            .filter(F.col("n_sh") > 0)
            .select("doc_id", F.posexplode("keys").alias("band_id", "band_key"))
            .select("band_id", "band_key", "doc_id")
        )
        # bands BEFORE sigs: replay protection keys on sigs, so a crash
        # between the appends must leave the doc absent from sigs (it
        # will be fully reprocessed; duplicate band rows from the retry
        # collapse in the probe's .distinct()). The reverse order would
        # leave a canonical in sigs but invisible to the probe index —
        # permanent recall loss for all its future duplicates.
        self._append_store("bands", new_bands)
        self._append_store("sigs", new_sigs)
        self.metrics.batches += 1
        # enriched is a checkpointed RDD; blocks free when the ref drops
        return report

    # -- maintenance ----------------------------------------------------
    def compact(
        self, target_partitions: int = 4, *, hot_bucket_threshold: int | None = None
    ) -> None:
        """Rewrite the stores into O(1) files each.

        Append-only parquet accumulates one file-set per batch; after N
        micro-batches the probe join opens O(N) small files. Periodic
        compaction (call it every ~100 batches, or from a maintenance
        job) restores O(1) file count. The rewrite is atomic per store:
        the new copy is FULLY written under the NEXT epoch dir before
        one backend pointer flip makes it live — a crash at any point
        leaves the committed epoch untouched (pre-flip garbage and the
        superseded epoch are GC'd by ``_gc_epochs`` at the next locked
        operation). At 100 TB this is the compaction pass of any
        LSM-ish table format, and the pointer flip is the same
        conditional-put commit the tx store uses — no directory
        renames, so the store hosts on object storage unchanged.

        ``hot_bucket_threshold`` (bucketed stores only) is the 100 TB
        refinement: rewrite ONLY buckets holding more than that many
        files, leaving cold buckets untouched — a full-store rewrite per
        ~100 batches is itself a scale event. Per-bucket rewrites append
        the merged file before deleting the inputs, so a crash mid-pass
        leaves duplicate rows at worst (collapsed by the probe's
        ``.distinct()`` and healed by the next full compact's
        ``dropDuplicates``), never missing rows.

        Holds the state dir's writer lock for the whole pass — an
        append racing the full rewrite would land in the epoch being
        superseded and be lost at the pointer flip (see
        :meth:`_writer_lock`), so the overlap raises instead.
        """
        with self._writer_lock("compact"):
            try:
                self._compact_locked(target_partitions, hot_bucket_threshold)
                self.metrics.compactions += 1
                for name in (*_STORES, "band_hot"):
                    self.metrics.observe_epoch(
                        name, self.backend.read_pointer(self._path(name))
                    )
            except BaseException:
                # a partial compact may have swapped a store dir without
                # reaching the summary swap — in the '<no-summary>' epoch
                # the token would NOT change, so a same-process refresh
                # would keep delta counts for deleted files AND re-count
                # their rewritten replacements (stale-HIGH, the unsafe
                # direction). Drop the cache; the next refresh goes cold
                # (mirrors process_batch's failure path; the vanished-
                # file check in _refresh_cap_counts is the cross-process
                # backstop for the same window).
                self._reset_cap_cache()
                raise
            finally:
                # any compaction (full OR hot-bucket, success or crash)
                # deletes/merges files in a live or fresh epoch: a
                # cached post-append file count would make the next
                # observe_append delta run against a stale-HIGH
                # baseline and undercount real appends
                self._append_count_cache.clear()

    def _compact_locked(
        self, target_partitions: int, hot_bucket_threshold: int | None
    ) -> None:
        self._adopt_legacy()
        self._gc_epochs()
        for name, (schema, cols, _) in _STORES.items():
            cur = self._epoch(name)
            if cur == 0:
                continue  # store never written
            root = self._path(name)
            cur_path = os.path.join(root, f"v{cur}")
            nxt = cur + 1
            nxt_path = os.path.join(root, f"v{nxt}")
            if self._buckets(name):
                if hot_bucket_threshold is not None:
                    self._compact_hot_buckets(name, schema, hot_bucket_threshold)
                    continue
                # full rewrite, crash-atomic: the re-bucketed copy is
                # durably complete under the NEXT epoch (its own table
                # name) before the pointer flips; _gc_epochs cleared
                # any garbage a previously crashed attempt left there
                nxt_table = self._table(name, nxt)
                # exclusive build claim FIRST (a second host compacting
                # the same store loses the conditional put and raises
                # instead of interleaving writes into this epoch dir),
                # THEN clear crash garbage: claiming before deleting
                # means a live remote builder's dir is never gutted
                # while its claim survives, and a crashed claim whose
                # dir never materialized (_gc_epochs only walks LISTED
                # epoch dirs) is taken over atomically
                self._acquire_build(nxt_path)
                self.spark.sql(f"DROP TABLE IF EXISTS {nxt_table}")
                self.backend.remove_tree(nxt_path)
                # the rewrite source is the store's own read path —
                # Spark's file enumeration, fresh on every backend
                # (a backend LIST here would run stale-SHORT under
                # list-after-write lag and silently drop just-appended
                # rows from the rewrite). The consumed set is pinned
                # from the frame's OWN inputFiles() snapshot (the
                # _rebuild_hot pattern): that is exactly what the
                # write consumes, and the straggler fold below diffs
                # the post-flip listing against it
                src = self._load_store(name)
                consumed = _data_file_names(src.inputFiles())
                self.backend.note_spark_write(nxt_path)  # lag-double hook
                (
                    src
                    .dropDuplicates()  # heal any append-retry duplicates
                    .write.mode("overwrite")
                    .bucketBy(self._buckets(name), *cols)
                    .sortBy(*cols)
                    .option("path", nxt_path)
                    .saveAsTable(nxt_table)
                )
                # the claim must still be ours right before the flip
                self.backend.validate_build(nxt_path, self._writer_token)
                self._write_consumed_manifest(nxt_path, cur, consumed)
                self.backend.commit_pointer(root, nxt)
                self.backend.release_build(nxt_path)
                # metadata-only drop: the external table keeps its
                # files; the epoch removal below reclaims them
                self.spark.sql(f"DROP TABLE IF EXISTS {self._table(name, cur)}")
                self._fold_stragglers(name, cur_path, consumed)
                # release-then-remove: the superseded dir can carry a
                # marker leaked by a crash between ITS commit and
                # release; once the dir is gone no listing surfaces it
                self.backend.release_build(cur_path)
                self.backend.remove_tree(cur_path)
                continue
            # claim-then-clear, same reasoning as the bucketed branch
            self._acquire_build(nxt_path)
            self.backend.remove_tree(nxt_path)
            frame = self._load_store(name)
            consumed = _data_file_names(frame.inputFiles())
            self.backend.note_spark_write(nxt_path)  # lag-double hook
            frame.dropDuplicates().repartition(target_partitions).write.mode(
                "overwrite"
            ).parquet(nxt_path)
            self.backend.validate_build(nxt_path, self._writer_token)
            self._write_consumed_manifest(nxt_path, cur, consumed)
            self.backend.commit_pointer(root, nxt)
            self.backend.release_build(nxt_path)
            self._fold_stragglers(name, cur_path, consumed)
            self.backend.release_build(cur_path)
            self.backend.remove_tree(cur_path)
        self._rebuild_hot()

    def _store_data_files(self, name: str, epoch_path: str) -> list[str]:
        """Sorted data-file basenames of a store epoch dir (backend
        listing; detector stores hold physical files on every backend
        — see _load_store)."""
        try:
            names = self.backend.list_dir(epoch_path)
        except OSError:
            return []
        return sorted(n for n in names if n.endswith(".parquet"))

    def _read_files(self, name: str, epoch_path: str, files: list[str]):
        """A store frame over EXACTLY the given data files (schema
        pinned; empty-safe). Bucket metadata is irrelevant here — the
        only caller rewrites through the bucketed writer, which
        shuffles on the bucket columns regardless of input layout."""
        schema = _STORES[name][0]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *(os.path.join(epoch_path, n) for n in files)
        )

    def _write_consumed_manifest(
        self, nxt_path: str, superseded_epoch: int, consumed: list[str]
    ) -> None:
        """Persist the rewrite's consumed file-set INSIDE the new epoch
        dir, before the pointer flip publishes it (underscore-prefixed:
        invisible to parquet readers, same pattern as band_hot's
        ``_files.json``). This closes the crash window the r10 fold
        left open: a death between ``commit_pointer`` and
        ``remove_tree`` hands the superseded dir to the NEXT
        ``_gc_epochs``, which can now re-run the straggler fold from
        this manifest instead of deleting unconsumed appends blind.
        Routed through ``backend.publish_file`` — the seam primitive
        for small single objects (atomic temp+replace locally; a real
        object-store backend PUTs it) — so the write is visible to the
        lag double's op accounting and lands wherever the backend's
        physical storage is, unlike a bare ``open()``."""
        self.backend.publish_file(
            os.path.join(nxt_path, "_consumed.json"),
            json.dumps(
                {"superseded_epoch": superseded_epoch, "consumed": consumed}
            ).encode(),
        )

    def _fold_stragglers_from_manifest(self, name: str, stray_epoch: int) -> None:
        """GC-time re-run of the straggler fold for a below-pointer
        epoch dir (crash-recovery path). Reads the consumed manifest
        the compaction persisted in the CURRENT epoch dir; folds only
        when the manifest names exactly this superseded epoch —
        otherwise (pre-manifest store, or a stray older than cur-1,
        unreachable by the normal protocol) it degrades to the r10
        behavior and the docstring's listing-lag caveat applies.
        Idempotent-with-duplicates: a crash between this fold and the
        dir removal re-folds the same files next GC; the duplicate
        rows are the store protocol's tolerated kind (collapsed by
        countDistinct / the next compact's dropDuplicates)."""
        root = self._path(name)
        cur = self.backend.read_pointer(root)
        # read through the backend's read_file seam — the symmetric
        # half of the publish_file that wrote it (r11 ADVICE: a raw
        # open() against a backend whose publish_file lands bytes
        # elsewhere silently degrades to blind removal)
        raw = self.backend.read_file(
            os.path.join(root, f"v{cur}", "_consumed.json")
        )
        if raw is None:
            return  # pre-manifest store: the documented r10 degrade
        try:
            manifest = json.loads(raw)
        except ValueError:
            return  # torn/corrupt manifest: degrade to blind removal
        # NOTE (r12 contract change): a NON-absence read error (e.g.
        # PermissionError — read_file maps only FileNotFoundError to
        # None) now PROPAGATES instead of degrading: aborting the GC
        # retains the superseded dir, and the fold retries at the next
        # pass — strictly safer than the pre-r12 blind removal, which
        # could delete a remote host's unconsumed appends.
        if manifest.get("superseded_epoch") != stray_epoch:
            return
        self._fold_stragglers(
            name, os.path.join(root, f"v{stray_epoch}"), manifest["consumed"]
        )

    def _fold_stragglers(
        self, name: str, old_path: str, consumed: list[str]
    ) -> None:
        """Detect-and-fold the append-vs-remote-compact race (the gap
        the r10 build markers deliberately left open — markers fence
        COMPACTS, but appends never touch the pointer or a marker):
        any data file present in the superseded epoch dir that the
        just-committed rewrite did not consume was appended
        concurrently by a second writer the advisory lock could not
        see (a remote host). Deleting the dir would silently lose
        those rows — permanent recall loss for every future duplicate
        of the affected docs. Instead, re-append their rows to the
        NEW epoch through the standard append path (the pointer
        already names it) and count the fold in
        ``metrics.folded_straggler_files`` — any nonzero value means
        the single-writer contract is being violated and the operator
        must intervene.

        Best-effort, not a guarantee: under list-after-write lag the
        post-flip listing can miss a just-landed straggler (closing
        that needs time-bound leases — documented in _writer_lock).
        Duplicate rows a fold could introduce are the store protocol's
        tolerated kind (band dups collapse in the cap's
        countDistinct / the probe's semantics; the next full compact's
        dropDuplicates heals both stores)."""
        consumed_set = set(consumed)
        extra = [
            n
            for n in self._store_data_files(name, old_path)
            if n not in consumed_set
        ]
        if not extra:
            return
        self._append_store(name, self._read_files(name, old_path, extra))
        self.metrics.observe_fold(name, len(extra))

    def _rebuild_hot(self) -> None:
        """Recompute the viral-cap summary exactly from the (just
        healed) bands store: the member count of every key with ≥2
        canonical members — tiny in a deduplicated store — plus the
        manifest of data files the summary covers, so the per-batch
        check reads only files appended later. countDistinct tolerates
        the duplicate rows hot-bucket compaction's append-before-delete
        may leave. Same epoch-pointer commit as the stores: summary +
        manifest are fully written under the next epoch, then one
        pointer flip publishes both together; a crash BEFORE the flip
        leaves the previous summary whose manifest no longer matches —
        the per-batch check detects that and falls back to a full
        recount (exact, self-healing)."""
        hot_root = self._path("band_hot")
        hot_cur = self.backend.read_pointer(hot_root)
        if self.max_bucket_size is None and hot_cur == 0:
            return  # cap never used on this store: skip the summary pass
        if self._epoch("bands") == 0:
            return
        store = self._load_store("bands")
        # Coverage = the files the aggregation below actually reads,
        # taken from the frame's OWN file enumeration (the writer lock
        # bars concurrent appends, so the two resolutions agree). The
        # backend listing would be wrong here: under list-after-write
        # lag it runs stale-SHORT right after a compaction rewrite, and
        # a summary covering FEWER files than it aggregated makes the
        # per-batch refresh delta-count those files on top of the
        # summary — double-counted members, spurious virality,
        # permanently skipped probes (the unsafe direction).
        files = _data_file_names(store.inputFiles())
        nxt = hot_cur + 1
        nxt_path = os.path.join(hot_root, f"v{nxt}")
        # claim-then-clear, same reasoning as _compact_locked
        self._acquire_build(nxt_path)
        self.backend.remove_tree(nxt_path)
        self.backend.note_spark_write(nxt_path)  # lag-double hook
        (
            store
            .groupBy("band_id", "band_key")
            .agg(F.countDistinct("doc_id").cast("long").alias("n"))
            .filter(F.col("n") >= 2)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(nxt_path)
        )
        # Spark/pyarrow readers skip underscore-prefixed files: the
        # manifest rides inside the epoch dir so one flip publishes
        # both. publish_file/read_file keep the write/read seam
        # symmetric across backends (r11 ADVICE).
        self.backend.publish_file(
            os.path.join(nxt_path, "_files.json"), json.dumps(files).encode()
        )
        self.backend.validate_build(nxt_path, self._writer_token)
        self.backend.commit_pointer(hot_root, nxt)
        self.backend.release_build(nxt_path)
        if hot_cur:
            old_hot = os.path.join(hot_root, f"v{hot_cur}")
            self.backend.release_build(old_hot)
            self.backend.remove_tree(old_hot)

    def _compact_hot_buckets(self, name: str, schema: str, threshold: int) -> None:
        """Merge every over-fragmented bucket's files, touching
        O(hot buckets) files and running ONE Spark job regardless of
        how many buckets are hot: all hot buckets' files are read in a
        single pass, repartitioned on the bucket-id expression (each
        bucket's rows in exactly one of up-to-#hot parallel tasks), and
        appended through the bucketed writer — one new file per hot
        bucket. Cold buckets' files are never opened.
        Append-before-delete makes the pass crash-safe at the cost of
        transient duplicates (see :meth:`compact`). (A per-hot-bucket
        job loop measured 2× slower at 14 hot buckets — job-launch
        overhead dominates the maintenance pass.)"""
        # epoch-gated, not LIST-gated (the pointer GET is the existence
        # witness). The listing below may itself be stale under
        # list-after-write lag: stale-SHORT skips a hot bucket this
        # pass (merged by a later one — safe); a stale view naming a
        # file a previous pass already deleted fails the merge read
        # LOUDLY (compact raises, cap cache resets, retry after the
        # window) — never silently.
        if self._epoch(name) == 0:
            return
        data_path = self._data_path(name)
        by_bucket: dict[int, list[str]] = {}
        for n in self.backend.list_dir(data_path):
            if not n.endswith(".parquet"):
                continue
            m = _BUCKET_ID_RE.search(n)
            if m:
                by_bucket.setdefault(int(m.group(1)), []).append(
                    os.path.join(data_path, n)
                )
        hot = {b: files for b, files in by_bucket.items() if len(files) > threshold}
        hot_files = [f for files in hot.values() for f in files]
        if not hot_files:
            return
        _, cols, _ = _STORES[name]
        # co-locate each bucket's rows in exactly one task WITHOUT a
        # single-task bottleneck: repartition on the bucket-id
        # expression (same murmur3+pmod the bucketed writer uses), so N
        # hot buckets merge across up-to-N parallel tasks and the write
        # still emits one file per hot bucket — a lone coalesce(1) here
        # would sort and write every hot byte through one task (OOM /
        # straggler at the store sizes this maintenance pass exists for)
        bucket_id = F.pmod(
            F.hash(*[F.col(c) for c in cols]), F.lit(self._buckets(name))
        )
        merged = (
            self.spark.read.schema(schema)
            .parquet(*hot_files)
            .dropDuplicates()
            .repartition(max(1, len(hot)), bucket_id)
        )
        self._append_store(name, merged)
        for f in hot_files:
            self.backend.remove_file(f)
        # the bucketed scan lists files at plan time; invalidate any
        # cached listing of the just-rewritten location
        if self.spark.catalog.tableExists(self._table(name)):
            self.spark.catalog.refreshTable(self._table(name))

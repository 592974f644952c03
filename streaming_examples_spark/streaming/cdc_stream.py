"""Streaming flagship pipeline: tx-consistent denormalization under
Structured Streaming.

The reference runs its operator chain per event (DataStreamV2Job.java:
61-139); the Spark-first execution strategy (SURVEY.md §3.2) is a
``foreachBatch`` loop: each micro-batch is a superset of zero or more
transactions — complete ones are applied in commit-LSN order through
``tx_denormalize``; incomplete ones (a micro-batch may split a
transaction, poc.md:343) carry over via a persisted state directory.

State layout (parquet, atomically swapped per batch):
    <state_dir>/order_state/_bucket=N/  latest order image per id,
                                        hash-bucketed by order key
    <state_dir>/line_state/_bucket=N/   latest line image per line id,
                                        hash-bucketed by ORDER key
    <state_dir>/carry_orders/  incomplete-tx order events
    <state_dir>/carry_lines/   incomplete-tx line events

The two big state tables are hash-bucketed on the order key and
maintained *incrementally*: a batch loads and rewrites only the
buckets its order keys hash into — per-batch I/O is O(touched
buckets), never O(total key space). ``line_state`` buckets by the
parent order key (not the line id) so that every existing line of a
touched order is colocated with the order's bucket — the as-of
reconstruction needs those lines even when the batch only updates the
order row. Carry tables are O(incomplete txs) and rewritten whole.
In production the same layout is a Delta/Iceberg MERGE target; the
bucket swap here is the plain-parquet equivalent of MERGE touching
only affected files.

Durability order per batch: emissions are materialized and written to
the sink BEFORE any state dir is swapped. A crash between the two
replays the batch against the old state and re-emits the same docs —
duplicate output, never lost output (AT_LEAST_ONCE, matching the
reference sink, DataStreamV2Job.java:102). ``applied_txs`` (replay/
redelivery dedup) retains the last ``applied_retention_batches``
batches — bounded state; a duplicate older than the horizon re-emits
(at-least-once) but cannot corrupt state, since tx application is
idempotent per commit_lsn.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.operators.txjoin import TxDenormResult, tx_denormalize
from streaming_examples_spark.streaming.state_backend import (
    LocalPosixBackend,
    StateStorageBackend,
    acquire_build,
)

_VERSION_DIR_RE = re.compile(r"v\d+")

# frame dirs the pre-versioned (r5 and earlier) layout kept at the
# state root; their presence without a CURRENT pointer means existing
# state a silent reset would destroy — refuse instead (_check_layout)
_LEGACY_FRAME_DIRS = (
    "order_state",
    "line_state",
    "carry_orders",
    "carry_lines",
    "carry_txs",
    "applied_txs",
)


class StateAdoptionError(RuntimeError):
    """A pre-r11 (sidecar-less) state version could not be adopted
    because a backend listing disagreed with a GET witness — the
    listing is stale (list-after-write lag). Raised INSTEAD of
    silently loading state as None/empty, the failure mode that bit
    twice before (r10 detector ``_load_store``, r11 tx
    ``_load_buckets``). Retryable: re-open the store once the old
    writer has been stopped for longer than the store's
    list-after-write horizon."""


class TxDenormBatchProcessor:
    """The ``foreachBatch`` body, also usable standalone for replaying
    a partitioned event log batch-by-batch (tests do exactly that)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        output_dir: str | None = None,
        *,
        n_buckets: int = 32,
        applied_retention_batches: int = 8,
        backend: StateStorageBackend | None = None,
        emission_sink=None,
        enforce_tx_order: bool = True,
        order_delete_gc_horizon_lsn=None,
    ):
        from streaming_examples_spark.streaming.monitoring import PipelineMetrics

        self.spark = spark
        self.state_dir = state_dir
        self.output_dir = output_dir
        self.n_buckets = n_buckets
        self.applied_retention_batches = applied_retention_batches
        # storage seam: every commit-protocol primitive (carry, pointer
        # flip, version GC) routes through here — see state_backend.py
        # for the object-store translation of each
        self.backend = backend if backend is not None else LocalPosixBackend()
        #: optional per-batch emission consumer ``(emissions_df,
        #: batch_id) -> None``, called in the SAME durability slot as
        #: the parquet sink — after materialization, BEFORE the state
        #: swap (crash between → replay re-emits: at-least-once, never
        #: lost; the reference's sink level, DataStreamV2Job.java:102).
        #: The Kafka upsert sink plugs in here:
        #:   lambda df, _: upsert_sink_batch(df, topic=..., key_col=
        #:   "order_key", ...)   (sources/kafka.py — tombstones as
        #: null values, KafkaChangelogJob.java:50-65)
        self.emission_sink = emission_sink
        #: enforce the tx-metadata delivery-order contract (see
        #: start_tx_denorm_stream's docstring): an incoming END whose
        #: commit LSN is ≤ the already-EMITTED high-watermark can no
        #: longer be emitted in commit order — the source delivered tx
        #: metadata out of order (impossible for the reference's
        #: single-partition tx topic, DataStreamV2Job.java:70-97; easy
        #: for a misconfigured multi-partition topic or an mtime-tied
        #: file source). True (default) raises; False counts the
        #: regression in metrics.tx_order_regressions and proceeds,
        #: emitting out of order — for operators who prefer lag over
        #: a halted pipeline. NOTE: with at-least-once redelivery, an
        #: END replayed LATER than applied_retention_batches is
        #: indistinguishable from a reordering source and trips this
        #: check — size the retention to the source's redelivery
        #: horizon.
        self.enforce_tx_order = enforce_tx_order
        #: GC dial for deleted-order markers (txjoin state retention):
        #: ``None`` (default) keeps them forever — reference parity; an
        #: int drops markers below that LSN at every state roll; a
        #: CALLABLE ``() -> int | None`` is consulted once per batch so
        #: an operator can feed the live replication-slot horizon
        #: (pg_replication_slots.restart_lsn) without restarting the
        #: stream. GC is LAZY per bucket: a marker drops when its
        #: bucket is next rewritten (i.e. touched by a batch) — a full
        #: sweep would break the O(touched buckets) per-batch I/O
        #: contract. See SCALE_NOTES "deleted-order markers".
        self.order_delete_gc_horizon_lsn = order_delete_gc_horizon_lsn
        # build-marker fencing identity (state_backend.claim_build):
        # the advisory writer lock is per-filesystem, so two HOSTS can
        # both hold it on an object store — the marker makes the
        # second builder of a version dir fail loudly instead of
        # interleaving writes into it
        from streaming_examples_spark.streaming.locks import owner_token

        self._writer_token = owner_token()
        self.metrics = PipelineMetrics()
        # previous batch's emissions cache, unpersisted at the next
        # batch's start (the caller may still read the CURRENT batch's
        # frame after process() returns, so same-batch unpersist races)
        self._prev_emissions: DataFrame | None = None
        # emissions schema from the last non-idle batch — lets the idle
        # fast path return a correctly-shaped empty frame jobs-free
        self._emissions_schema = None
        # memoized legacy-adoption synthesis, keyed by version: read
        # paths never WRITE the adopted sidecar (a reader must stay
        # read-only on a store it does not own), so without the memo a
        # long-lived reader would re-list the legacy version per read
        self._adopted_parts: dict[int, dict[str, list[str]]] = {}
        os.makedirs(state_dir, exist_ok=True)

    def _bucket_of(self, key) -> F.Column:
        return F.pmod(F.hash(key), F.lit(self.n_buckets))

    # -- versioned state root --------------------------------------------
    # Every batch's state frames live under ONE version dir
    # (``state_dir/v<N>/<frame>``) and the batch commits by atomically
    # replacing the ``CURRENT`` pointer file — the MANIFEST/CURRENT
    # pattern of LSM engines and table formats. One commit point means a
    # reader (and a crash-replay) always sees state that is ALL-old or
    # ALL-new. Per-frame swap schemes cannot give that: a crash between
    # two frame swaps mixes batches across frames, and some mixtures are
    # not merely stale but actively poisonous — e.g. pre-batch tx
    # metadata (an END) next to post-batch carry events manufactures a
    # permanently-incomplete tx WITH a commit LSN, which holds the
    # emission barrier forever.

    def _layout_path(self) -> str:
        return os.path.join(self.state_dir, "_layout.json")

    def _check_layout(self) -> None:
        """State hashed into N buckets read back by a processor declaring
        M buckets loads the WRONG buckets — `_load_buckets` selects the
        `_bucket=pmod(hash(key), M)` paths over dirs written at
        `pmod(hash(key), N)`, so touched keys silently see empty state
        and every emission reconstructs from batch events alone (no
        error, corrupt docs).
        The layout file written with the first commit makes a restart
        with a different n_buckets raise instead — same guard the
        incremental-dedup store carries for its bucket counts."""
        marker = os.path.join(self.state_dir, "_migration.json")
        if os.path.exists(marker):
            # tools/migrate_state.py writes this FIRST and removes it
            # LAST: its presence means a legacy-layout migration is in
            # progress or crashed mid-way — frames may be split between
            # the root and v1/, so neither layout is readable yet
            raise ValueError(
                f"tx state at {self.state_dir} has a migration marker "
                "(_migration.json): a legacy-layout migration is in progress "
                "or crashed part-way. Re-run tools/migrate_state.py on this "
                "directory to complete it, then restart the processor."
            )
        if not os.path.exists(self._layout_path()):
            if self._current_version() == 0:
                # no committed version — but a PRE-versioned (legacy
                # per-frame) layout also has no CURRENT pointer, and
                # treating it as fresh would silently ignore all its
                # state (carry events, applied txs) and restart from
                # empty — existing-but-unreadable state must raise
                legacy = [
                    d
                    for d in _LEGACY_FRAME_DIRS
                    if os.path.isdir(os.path.join(self.state_dir, d))
                ]
                if legacy:
                    raise ValueError(
                        f"tx state at {self.state_dir} holds legacy "
                        f"per-frame state dirs ({', '.join(legacy)}) but no "
                        "CURRENT pointer; reading it as a fresh store would "
                        "silently discard that state. Migrate: move the "
                        "frame dirs under a v1/ subdirectory, write the "
                        "version number '1' to a CURRENT file, and write "
                        '_layout.json ({"n_buckets": N}) with the bucket '
                        "count the store was built with — or rebuild from "
                        "the event log."
                    )
                return  # fresh state dir: layout written with first commit
            raise ValueError(
                f"tx state at {self.state_dir} has committed versions but no "
                "_layout.json; its bucket count cannot be validated and "
                "reading with a wrong n_buckets silently loads empty state. "
                "Write _layout.json with the store's true n_buckets, or "
                "rebuild the state dir."
            )
        with open(self._layout_path()) as fh:
            layout = json.load(fh)
        have = layout.get("n_buckets")
        if have != self.n_buckets:
            raise ValueError(
                f"tx state at {self.state_dir} was written with "
                f"n_buckets={have} but this processor declares "
                f"n_buckets={self.n_buckets}; a mismatched restart loads the "
                "wrong state buckets (silently empty touched keys, corrupt "
                "emissions). Pass the stored count or rebuild the state dir."
            )
        # pre-r8 layouts carry no backend key; they were all written by
        # the POSIX backend
        have_backend = layout.get("backend", "local-posix")
        if have_backend != self.backend.layout_id:
            raise ValueError(
                f"tx state at {self.state_dir} was committed by the "
                f"{have_backend!r} storage backend but this processor uses "
                f"{self.backend.layout_id!r}; the two encode the commit "
                "pointer differently, so a cross-backend reopen reads "
                "version 0 and the batch-start GC would delete the live "
                "versions as garbage. Reopen with the matching backend (or "
                "migrate the state explicitly)."
            )

    def _write_layout(self) -> None:
        if os.path.exists(self._layout_path()):
            return
        tmp = self._layout_path() + ".tmp"
        with open(tmp, "w") as fh:
            # backend identity sealed alongside the bucket count: the two
            # backends encode the commit pointer differently (CURRENT
            # file vs _pointer/gen-*), so a cross-backend reopen reads
            # version 0, treats live state as fresh, and the batch-start
            # GC would DELETE the other backend's committed versions as
            # garbage — the same silent-loss class as an n_buckets
            # mismatch, guarded the same way
            json.dump(
                {"n_buckets": self.n_buckets, "backend": self.backend.layout_id},
                fh,
            )
        os.replace(tmp, self._layout_path())

    def _current_version(self) -> int:
        # 0 = fresh state dir: v0 is the (absent) empty state
        return self.backend.read_pointer(self.state_dir)

    def _root(self, version: int | None = None) -> str:
        v = self._current_version() if version is None else version
        return os.path.join(self.state_dir, f"v{v}")

    def _frame_path(self, name: str, version: int | None = None) -> str:
        return os.path.join(self._root(version), name)

    def _gc_state_versions(self) -> None:
        """Drop every version dir except CURRENT's, plus stray pointer
        temps — the only garbage a crash can leave: a half-written
        NEXT version (crash before the pointer flip; the batch replays
        against the intact old version) or a fully-superseded OLD
        version (crash after the flip, before cleanup). Runs at batch
        start under the writer lock."""
        cur_n = self._current_version()
        cur = f"v{cur_n}"
        for entry in os.listdir(self.state_dir):
            full = os.path.join(self.state_dir, entry)
            m = _VERSION_DIR_RE.fullmatch(entry)
            if entry != cur and m and os.path.isdir(full):
                if int(entry[1:]) > cur_n:
                    # a version ABOVE the pointer is under construction
                    # or crashed garbage: CLAIM it before touching it —
                    # acquire_build raises on a live foreign builder's
                    # claim (a second HOST mid-batch, invisible to the
                    # advisory lock) and atomically takes over an
                    # abandoned same-host one, so the GC can never race
                    # a fresh claimer between a probe and the delete
                    acquire_build(self.backend, full, self._writer_token)
                    self.backend.remove_tree(full)
                    self.backend.release_build(full)
                else:
                    # BELOW the pointer: a committed, superseded dir —
                    # no live build possible; release-then-remove so a
                    # crash between the two cannot strand a marker on
                    # a dir no listing will ever surface again
                    self.backend.release_build(full)
                    self.backend.remove_tree(full)
            elif entry.startswith("CURRENT."):
                self.backend.remove_file(full)

    def _load(self, name: str) -> DataFrame | None:
        path = self._frame_path(name)
        if not os.path.exists(path):
            return None
        # a PARTITIONED write of zero rows leaves only _SUCCESS in the
        # dir (plain zero-row frames still write schema-bearing empty
        # part files, so this never triggers for them): such a dir is
        # a known-empty frame, not a read error — reachable via legacy
        # adoption of a pre-r11 store whose bucketed frame was emptied
        # (no parts → not in the adopted enumeration → lands here)
        names = os.listdir(path)
        if not any(
            n.endswith(".parquet") or n.startswith(("part-", "_bucket="))
            for n in names
        ):
            return None
        return self.spark.read.parquet(path)

    def _read_tx_hwm(self) -> int | None:
        """The committed emitted-commit-LSN high-watermark: a scalar
        sidecar inside the CURRENT version dir (written by _store_all
        before the pointer flip, so it commits atomically with the
        state it describes — a premature hwm would false-positive the
        order check on every crash replay). Driver-side open(): a GET,
        no Spark job, fresh under list-after-write lag."""
        raw = self.backend.read_file(os.path.join(self._root(), "_tx_hwm.json"))
        if raw is None:
            return None
        return json.loads(raw).get("hwm")

    def _read_parts_sidecar(self, version: int) -> tuple[dict, bool] | None:
        """The committed version's bucket-part enumeration sidecar
        (``_parts.json``), read through the backend's ``read_file``
        seam: a GET, fresh under list-after-write lag — which is the
        point: every later enumeration reads THIS instead of a
        lag-prone listing. Returns ``(frames, exact)`` where frames
        maps frame name → sorted part names:

        * format 2 (r12+): ``{"format": 2, "frames": {...}}`` — EXACT:
          every listed part exists (Spark-written parts enumerated
          from the writer's own scan-time file index, carried parts
          from the carry loop itself), so readers and the next carry
          need no existence probe at all.
        * format 1 (r11): a bare ``{frame: [parts]}`` map — a SUPERSET
          (touched ∪ carried; a touched bucket whose every key was
          deleted wrote no dir), so consumers must tolerate absent
          parts (``read_locations`` is empty-safe) or probe.

        ``None`` for version 0 or a pre-r11 version (no sidecar)."""
        if version <= 0:
            return None
        raw = self.backend.read_file(
            os.path.join(self._root(version), "_parts.json")
        )
        if raw is None:
            return None
        data = json.loads(raw)
        if data.get("format") == 2:
            return data["frames"], True
        return data, False

    def _written_parts(self, path: str) -> list[str]:
        """``_bucket=K`` partition dirs our OWN just-issued Spark write
        created under ``path`` — enumerated through Spark's scan-time
        file index (``DataFrame.inputFiles``), never a backend LIST.
        This is the one listing class the protocol's SCOPE note
        documents as consistent by contract: the store's listing
        guarantee to Spark itself, which every parquet-on-object-store
        deployment already requires (and S3/GCS/Azure give today); the
        eventual-consistency double accordingly does not lag it. The
        dir is the writer's pre-commit private output — no carried
        (manifest-only) entries can exist in it yet. Empty when the
        write produced no rows (zero-row frame → only ``_SUCCESS``,
        schema non-inferable). Only that exact failure maps to empty —
        anything else re-raises: mapping a real read error to [] would
        silently drop this frame's written parts from the committed
        enumeration (state loss at the next carry)."""
        from pyspark.errors import AnalysisException

        try:
            files = self.spark.read.parquet(path).inputFiles()
        except AnalysisException as e:
            if "UNABLE_TO_INFER_SCHEMA" in str(e) or "infer schema" in str(e):
                return []
            raise
        parts = {
            m.group(1)
            for f in files
            for m in [re.search(r"(_bucket=\d+)/", f)]
            if m is not None
        }
        return sorted(parts)

    def _adopt_legacy_parts(self, version: int) -> dict[str, list[str]]:
        """Synthesize the part enumeration for a committed PRE-r11
        version (no ``_parts.json``) — the one store state whose
        enumeration cannot come from a GET, because the legacy writer
        never published one. Adoption must therefore read backend
        listings, and every listing is cross-checked against a GET
        witness; any disagreement raises :class:`StateAdoptionError`
        instead of silently treating stale-absent as empty (the bug
        class that emptied state twice: r10 detector ``_load_store``,
        r11 tx ``_load_buckets``; reference contract: checkpoint
        restore never silently drops state,
        TxAwareTwoInputNonBroadcastJoinProcessOperator.java:100-160).

        Witnesses, in order:

        1. the committed POINTER (a GET) names this version, so its
           dir exists — a probe that says otherwise IS a stale
           listing: raise.
        2. every committed tx-store version physically contains BOTH
           bucketed frame dirs (a zero-row partitioned write still
           creates its dir), so a root listing missing ``order_state``
           or ``line_state`` is stale — this catches the stale-PARTIAL
           listing a crashed-then-retried build can freeze (the lag
           double keeps the OLDEST snapshot, which may be the crashed
           attempt's half-written frame set). Only the bucketed frames
           need the witness: PLAIN frames never read through this
           enumeration (``read_state`` resolves them via ``_load``'s
           direct GET), and requiring all six would wedge a
           legitimately-sparse migrated legacy store forever: raise.
        3. every frame dir the root listing names must itself probe
           present (manifest-GET fence first, then the LIST probe) —
           a miss is a stale per-dir view: raise.

        Under the lagged double these witnesses are complete: a stale
        root view either predates the version's ``prepare_dir``
        (probes ABSENT → witness 1) or froze a crashed attempt's
        partial tree (→ witness 2); frame-dir windows cannot outlive
        the root's (every frame mutation re-extends the root's
        window), and witness 3 backstops them anyway. On a real store
        the residual is a listing stale enough to fabricate a complete
        six-frame tree with different PART sets — operationally
        excluded by adopting only after the legacy writer has been
        stopped past the store's list-after-write horizon (the
        documented migration recipe).

        Read-only: the synthesis is memoized in-process but NOT
        published into the committed dir — a reader must not write a
        store it does not own. The owning writer's next commit writes
        a format-2 sidecar, closing adoption permanently."""
        cached = self._adopted_parts.get(version)
        if cached is not None:
            return cached
        root = self._root(version)
        if not self.backend.dir_exists(root):
            raise StateAdoptionError(
                f"adopting pre-r11 tx state at {self.state_dir}: the "
                f"committed pointer names version {version} but the "
                f"version dir probes absent — the backend listing is "
                "stale (list-after-write lag). Retry after the store's "
                "listing horizon; state was NOT silently loaded as empty."
            )
        listing = self.backend.list_dir(root)
        missing = [
            f for f in ("order_state", "line_state") if f not in listing
        ]
        if missing:
            raise StateAdoptionError(
                f"adopting pre-r11 tx state at {self.state_dir}: the "
                f"root listing of version {version} is missing frame "
                f"dirs {missing} that every committed version contains "
                "— the listing is stale or partial (list-after-write "
                "lag / frozen crashed-build view). Retry after the "
                "store's listing horizon; state was NOT silently "
                "loaded as empty."
            )
        frames: dict[str, list[str]] = {}
        for entry in listing:
            if entry.startswith(("_", ".")):
                continue  # scalar sidecars / internal files
            frame_path = os.path.join(root, entry)
            if not self.backend.dir_exists(frame_path):
                raise StateAdoptionError(
                    f"adopting pre-r11 tx state at {self.state_dir}: the "
                    f"root listing names frame {entry!r} but its dir "
                    "probes absent — a stale per-dir view "
                    "(list-after-write lag). Retry after the store's "
                    "listing horizon."
                )
            parts = [
                p
                for p in self.backend.list_dir(frame_path)
                if p.startswith("_bucket=")
            ]
            if parts:
                frames[entry] = sorted(parts)
        self._adopted_parts[version] = frames
        return frames

    def _parts_enumeration(self, version: int) -> tuple[dict, bool]:
        """The part enumeration for ``version``, from the sidecar (a
        GET) when one exists, else fail-loud legacy adoption — never a
        bare dir probe. ``(frames, exact)`` as `_read_parts_sidecar`;
        adoption synthesizes from listings that existed at adoption
        time, hence exact. Version 0 (no committed state) is empty."""
        if version <= 0:
            return {}, True
        sidecar = self._read_parts_sidecar(version)
        if sidecar is not None:
            return sidecar
        return self._adopt_legacy_parts(version), True

    def _load_buckets(self, name: str, buckets: list[int]) -> DataFrame | None:
        """Read only the listed hash buckets of a bucketed state table.

        Pruning is driver-side path selection (≤ n_buckets dirs
        resolved through ``backend.read_locations``), strictly stronger
        than a ``_bucket``-partition filter: untouched buckets are
        never even listed, and carried buckets with no local bytes
        (manifest backends) still resolve to their physical files."""
        path = self._frame_path(name)
        cur = self._current_version()
        if not buckets or cur == 0:
            return None
        # Existence is resolved from the committed POINTER plus the
        # version's ``_parts.json`` sidecar — both GETs — never from a
        # dir probe: the probe reads a listing that can lag the very
        # Spark write that created the dir. The r11 lag windows
        # (note_spark_write) caught exactly that here — state loaded as
        # None one batch after it was written, the same LIST-gated-read
        # class the detector's _load_store fixed in r10. A pre-r11
        # version (no sidecar) goes through fail-loud adoption
        # (_adopt_legacy_parts) — never the old silent dir probe.
        frames, _exact = self._parts_enumeration(cur)
        parts = frames.get(name)
        if parts is None:
            return None  # frame absent from the committed enumeration
        known = set(parts)
        want = [p for p in (f"_bucket={b}" for b in buckets) if p in known]
        locs: list[str] = []
        for part in want:
            locs.extend(self.backend.read_locations(os.path.join(path, part)))
        if not locs:
            return None  # none of the touched buckets holds state
        return self.spark.read.parquet(*locs)

    def read_state(self, name: str) -> DataFrame | None:
        """Committed view of one state frame (e.g. ``order_state``,
        ``applied_txs``), resolved through the storage backend — the
        only correct way to inspect state under a manifest backend,
        where a carried bucket has no local bytes at its logical path
        (a direct ``spark.read.parquet`` on the version dir would
        silently miss it). Returns None for an absent/empty frame."""
        path = self._frame_path(name)
        cur = self._current_version()
        if cur == 0:
            return self._load(name)
        # bucketed frames enumerate from the committed sidecar (a GET)
        # — same lag-immunity as _load_buckets; a pre-r11 version goes
        # through fail-loud adoption. A name outside the enumeration
        # is a PLAIN frame (Spark-written whole every batch, physical
        # tree == logical content): _load resolves it with a GET
        # (os.path.exists) + Spark's own scan — no backend listing on
        # any branch.
        frames, _exact = self._parts_enumeration(cur)
        if name not in frames:
            return self._load(name)
        # a bucketed frame enumerated with ZERO parts is known-empty
        # (a partitioned write of zero rows creates no part dirs —
        # only _SUCCESS — so the dir is not Spark-readable): None, not
        # a _load that would trip schema inference on the empty dir
        parts = list(frames[name])
        if not parts:
            return None
        # v1 superset contract: absent parts resolve to no locations
        # below (read_locations is empty-safe) — no dir probe needed
        locs: list[str] = []
        for part in parts:
            locs.extend(self.backend.read_locations(os.path.join(path, part)))
        if not locs:
            return None
        return self.spark.read.parquet(*locs)

    def _store_all(
        self,
        frames: dict[str, DataFrame],
        bucketed: dict[str, tuple[DataFrame, list[int]]] | None = None,
        scalars: dict[str, bytes] | None = None,
    ) -> None:
        """Write every new state frame under the NEXT version dir, then
        commit the batch with ONE atomic pointer replace.

        Crash anywhere BEFORE the flip: ``CURRENT`` still names the old
        version — the replay re-runs the batch against complete OLD
        state and the half-written new dir is GC'd. Crash AFTER the
        flip: state is completely NEW — the replay's applied-txs filter
        drops the batch, whose output already reached the sink (sink
        writes precede ``_store_all``; at-least-once). There is no
        window that mixes frames from different batches.

        The new frames' plans read the OLD version's files (lazy
        scans), which the new-dir writes never touch — no
        write-invalidates-read ordering to maintain.

        Bucketed frames write only their touched buckets' rows (a
        touched bucket whose every key was deleted simply has no dir in
        the new version); untouched bucket dirs are carried over via
        ``backend.carry_file`` — hardlinks locally (O(#files) metadata
        ops, zero data copy; copy fallback where links are refused), so
        per-batch write volume stays O(touched keys), not O(state).
        Every storage primitive of the protocol routes through
        ``self.backend`` (state_backend.py), whose docstrings carry the
        object-store translation: carry → manifest entry, pointer flip
        → conditional put — same single-commit design."""
        cur = self._current_version()
        new_root = self._root(cur + 1)
        # claim FIRST (conditional put; raises on a live foreign
        # builder — two hosts can hold the per-filesystem advisory
        # lock), THEN clear any crashed prior attempt's leftovers:
        # probing before claiming would let a fresh foreign claim land
        # in the gap and be blindly released (acquire_build docstring)
        acquire_build(self.backend, new_root, self._writer_token)
        self.backend.remove_tree(new_root)
        self.backend.prepare_dir(new_root)
        # scalar sidecars (e.g. the emitted-LSN high-watermark) ride the
        # same single commit point as the frames: written under the new
        # version BEFORE the pointer flip, visible only once it lands
        for name, data in (scalars or {}).items():
            self.backend.publish_file(os.path.join(new_root, name), data)
        for name, df in frames.items():
            self.backend.note_spark_write(os.path.join(new_root, name))
            df.write.mode("overwrite").parquet(os.path.join(new_root, name))
        prev_frames, prev_exact = self._parts_enumeration(cur)
        new_parts: dict[str, list[str]] = {}
        for name, (df, buckets) in (bucketed or {}).items():
            new_path = os.path.join(new_root, name)
            self.backend.note_spark_write(new_path)
            (
                df.withColumn("_bucket", self._bucket_of(F.col("order_key")))
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(new_path)
            )
            # EXACT written-part set, from the writer's own scan-time
            # file index (never a backend LIST; see _written_parts) —
            # a touched bucket whose every key was deleted wrote no
            # dir and is recorded as such, so the next batch's carry
            # needs no existence probe at all (r11 ADVICE: the
            # superset sidecar forced a lag-prone dir_exists skip).
            written = self._written_parts(new_path)
            old_path = self._frame_path(name, cur)
            touched = {f"_bucket={b}" for b in buckets}
            # Carry enumeration source: the previous version's part
            # enumeration — the _parts.json sidecar (a GET, immune to
            # list-after-write lag) or fail-loud legacy adoption for a
            # pre-r11 store; never a bare backend listing. Format-2
            # sidecars are EXACT (every listed part exists); the r11
            # format-1 superset needs the dir probe below for exactly
            # one transition batch, after which this commit's format-2
            # sidecar retires it.
            # Per-part FILE listings remain backend listings: carried
            # files are manifest-tracked (the manifest half of list_dir
            # is a GET — fresh); physical files were Spark-written one
            # full batch ago, the scan-time-enumeration contract the
            # SCOPE note documents (a production deployment puts this
            # layout behind a Delta/Iceberg commit log instead).
            carried = []
            for part in prev_frames.get(name, []):
                if not part.startswith("_bucket=") or part in touched:
                    continue
                src_dir = os.path.join(old_path, part)
                if not prev_exact and not self.backend.dir_exists(src_dir):
                    continue  # legitimately-empty part (v1 superset)
                self.backend.prepare_dir(os.path.join(new_path, part))
                for f in self.backend.list_dir(src_dir):
                    self.backend.carry_file(
                        os.path.join(src_dir, f), os.path.join(new_path, part, f)
                    )
                carried.append(part)
            new_parts[name] = sorted(set(written) | set(carried))
        # published UNCONDITIONALLY (r11 ADVICE: a version committed
        # without bucketed frames must still carry a sidecar — its
        # truthful enumeration is empty — or the next reader would
        # fall back to legacy adoption on a post-r11 store)
        self.backend.publish_file(
            os.path.join(new_root, "_parts.json"),
            json.dumps({"format": 2, "frames": new_parts}).encode(),
        )
        # bucket layout sealed before any version can commit: a restart
        # with a different n_buckets must raise, not read wrong buckets
        self._write_layout()
        # fencing re-validation: the build claim must still be ours —
        # a missing/foreign marker means another writer GC'd and
        # re-claimed this dir while we wrote; committing would publish
        # interleaved (mixed-batch) state
        self.backend.validate_build(new_root, self._writer_token)
        # THE commit point: atomic + durable pointer flip (backend
        # contract; locally a fsync'd temp + os.replace + dir fsync)
        self.backend.commit_pointer(self.state_dir, cur + 1)
        # the claim only fences construction; the committed dir is live
        self.backend.release_build(new_root)
        # post-commit cleanup; a crash here leaves garbage, GC'd next
        # batch. Release the superseded dir's marker first — it can
        # carry one leaked by a crash between ITS commit and release,
        # and once the dir is gone no listing resurfaces it
        self.backend.release_build(self._root(cur))
        self.backend.remove_tree(self._root(cur))

    def process(
        self,
        order_events: DataFrame,
        line_events: DataFrame,
        tx_events: DataFrame,
        batch_id: int = 0,
    ) -> DataFrame:
        """Apply one micro-batch; returns (and optionally writes) the
        emissions in commit-LSN order.

        Holds the state dir's advisory writer lock for the whole batch
        (``streaming/locks.py``): the versioned pointer-commit in
        ``_store_all`` is crash-safe for ONE writer, but a second
        stream accidentally pointed at the same state dir would race
        the pointer flip and GC the other's live version — CONCURRENT
        batches raise loudly instead. The lock is per-batch, so two
        streams strictly alternating batches would still interleave
        state without tripping it (a stream-lifetime lock can't
        distinguish that from the legitimate restart-with-new-processor
        flow in the same live process); stream-lifetime exclusion is
        the checkpoint dir's job — one checkpoint location per query —
        with this lock as the in-flight defense."""
        from streaming_examples_spark.streaming.locks import writer_lock

        with writer_lock(self.state_dir, f"tx_batch_{batch_id}"):
            return self._process_locked(
                order_events, line_events, tx_events, batch_id
            )

    def _process_locked(
        self,
        order_events: DataFrame,
        line_events: DataFrame,
        tx_events: DataFrame,
        batch_id: int,
    ) -> DataFrame:
        import time as _time

        _batch_t0 = _time.time()
        # free the PREVIOUS batch's emissions cache: it was kept alive
        # past its own batch so the caller could still read the
        # returned frame; by the next batch nothing references it, and
        # without this a long-running stream accumulates one
        # CacheManager entry per micro-batch
        if self._prev_emissions is not None:
            self._prev_emissions.unpersist()
            self._prev_emissions = None
        # validate the bucket layout, then drop any crash garbage
        # (half-written next version / superseded old version) BEFORE
        # reading state, under the same writer lock
        self._check_layout()
        self._gc_state_versions()
        # -- idle micro-batch fast path: no new events AND no new tx
        # metadata means nothing can change — carried txs cannot
        # complete without events, the barrier cannot move, nothing
        # can emit — so skip the whole pipeline AND the state-version
        # rewrite (replaying an idle batch is a no-op). A quiet stream
        # then costs three limit-1 probes per trigger instead of the
        # full multi-job batch (the same economics as the detector's
        # r10 idle-batch append skip). Requires one prior non-idle
        # batch in THIS processor instance (the emissions schema is
        # cached from it); a freshly restarted processor warms up
        # through the slow path, which handles empty inputs correctly.
        if (
            self._emissions_schema is not None
            and tx_events.isEmpty()
            and order_events.isEmpty()
            and line_events.isEmpty()
        ):
            empty = self.spark.createDataFrame([], self._emissions_schema)
            # the emission_sink contract is per-BATCH (sinks may advance
            # progress markers or commit a downstream tx per trigger),
            # so it still observes idle batches — with the same empty
            # frame the slow path would have handed it. Only the
            # output_dir parquet append is skipped: an empty append
            # carries no rows, and one zero-row file per idle trigger
            # bloats the directory a long-running quiet stream writes.
            if self.emission_sink is not None:
                self.emission_sink(empty, batch_id)
            self.metrics.observe_batch(0, _time.time() - _batch_t0, 0)
            return empty
        # no committed version yet = this batch is the initial load
        # (the snapshot phase, for the per-table RowsScanned counter)
        initial_load = self._current_version() == 0
        # tx metadata persists across batches (the reference keeps it in
        # broadcast state, CommitLsnFixer.java:75-89): a tx's END may
        # arrive batches before/after its data events. GC below drops
        # metadata of emitted txs (the :130-151 pruning heuristic, but
        # exact: we know which txs completed).
        carry_txs = self._load("carry_txs")
        tx_all = (
            tx_events.unionByName(carry_txs) if carry_txs is not None else tx_events
        ).dropDuplicates(["status", "id"])

        # at-least-once replay protection: a tx already applied must
        # never re-block the barrier nor re-emit — drop its metadata
        # AND its data events (the (txId, lsn) dedup of SURVEY §7.4).
        applied = self._load("applied_txs")
        if applied is not None:
            applied_b = F.broadcast(applied)
            tx_all = tx_all.join(
                applied_b,
                F.split(tx_all["id"], ":").getItem(0).cast("long") == applied["tx_id"],
                "left_anti",
            )
            order_events = order_events.join(
                applied_b,
                order_events["source.txId"] == applied["tx_id"],
                "left_anti",
            )
            line_events = line_events.join(
                applied_b,
                line_events["source.txId"] == applied["tx_id"],
                "left_anti",
            )

        # -- tx-metadata delivery-order intake check (the contract in
        # start_tx_denorm_stream's docstring, enforced): an END at or
        # below the emitted high-watermark can no longer emit in commit
        # order. Checked on THIS batch's arrivals only (tx_events,
        # filtered before anything joins in — the frame is tiny and
        # almost always empty, so the one bounded job stays cheap; the
        # earlier tx_all variant dragged the carry-union + dedup +
        # anti-join lineage into every batch for nothing):
        #   * carried ENDs cannot be offenders in enforcing mode — the
        #     barrier guarantees every emitted LSN is below every
        #     carried tx's LSN, so any offender is a fresh arrival;
        #   * at-least-once redelivery of APPLIED txs (within
        #     retention) is anti-joined away before the check;
        #   * each offending END counts once per ARRIVAL in lenient
        #     mode (a tolerated offender carried while its tx stays
        #     incomplete is not recounted; a redelivery is a new
        #     arrival and recounts);
        #   * the one uncovered edge: state carrying offenders a
        #     LENIENT run tolerated lets them emit out of order when
        #     they complete under a later enforcing restart — the
        #     check meters arrivals, and those arrived on the lenient
        #     run's watch.
        prev_hwm = self._read_tx_hwm()
        if prev_hwm is not None:
            _parts = F.split(F.col("id"), ":")
            fresh = tx_events.dropDuplicates(["status", "id"]).filter(
                (F.col("status") == "END")
                & (_parts.getItem(1).cast("long") <= prev_hwm)
            )
            if applied is not None:
                fresh = fresh.join(
                    F.broadcast(applied),
                    F.split(fresh["id"], ":").getItem(0).cast("long")
                    == applied["tx_id"],
                    "left_anti",
                )
            # bounded driver transfer (r10 ADVICE): a pathological batch
            # (e.g. a large tx-metadata replay after applied-retention
            # expiry) can make every END an offender — cap the sample
            # pulled for the message and count the rest distributed
            _OFFENDER_SAMPLE = 16
            offender_frame = fresh.select(
                _parts.getItem(0).cast("long").alias("tx_id"),
                _parts.getItem(1).cast("long").alias("commit_lsn"),
            )
            offenders = offender_frame.limit(_OFFENDER_SAMPLE).collect()
            if len(offenders) < _OFFENDER_SAMPLE:
                n_offenders = len(offenders)
            else:
                # ≥ sample size: count the rest distributed — against a
                # PERSISTED frame so the count never re-executes the
                # `fresh` lineage a second time (r11 ADVICE: the
                # pathological huge-offender batch this bounds is
                # exactly when a double recompute hurts most, and two
                # executions could in principle see different plans)
                offender_frame = offender_frame.persist()
                try:
                    n_offenders = offender_frame.count()
                finally:
                    offender_frame.unpersist()
            if offenders:
                more = (
                    f" (+{n_offenders - 1} more this batch)"
                    if n_offenders > 1
                    else ""
                )
                msg = (
                    f"tx-metadata delivery-order violation in batch "
                    f"{batch_id}: END of tx {offenders[0]['tx_id']} arrived "
                    f"with commit_lsn {offenders[0]['commit_lsn']} ≤ the "
                    f"already-emitted high-watermark {prev_hwm}{more}. "
                    "The transaction stream must arrive in commit order "
                    "(the reference consumes a single-partition topic); "
                    "either the source reorders tx metadata across "
                    "micro-batches, or an at-least-once redelivery "
                    "outlived applied_retention_batches="
                    f"{self.applied_retention_batches}."
                )
                if self.enforce_tx_order:
                    raise RuntimeError(msg)
                import warnings

                warnings.warn(msg)
                self.metrics.tx_order_regressions += n_offenders

        carry_orders = self._load("carry_orders")
        carry_lines = self._load("carry_lines")

        # -- touched buckets: the batch's order keys (orders keyed by
        # id, lines by parent order_id) plus carried-over events — only
        # these hash buckets of the state tables are read and rewritten
        # BOTH sides of a line re-point touch state: before.order_id's
        # bucket holds the stale row that must be loaded (so the as-of
        # "re-pointed line drops out" filter sees it) and rewritten
        keys = (
            order_events.select(
                F.coalesce(F.col("after.id"), F.col("before.id")).alias("key")
            )
            .unionByName(line_events.select(F.col("after.order_id").alias("key")))
            .unionByName(line_events.select(F.col("before.order_id").alias("key")))
        )
        for carry in (carry_orders, carry_lines):
            if carry is not None:
                keys = keys.unionByName(carry.select("key"))
        touched_buckets = sorted(
            r["b"]
            for r in keys.where(F.col("key").isNotNull())
            .select(self._bucket_of(F.col("key")).alias("b"))
            .distinct()
            .collect()  # bounded: ≤ n_buckets ints
        )

        gc_horizon = (
            self.order_delete_gc_horizon_lsn()
            if callable(self.order_delete_gc_horizon_lsn)
            else self.order_delete_gc_horizon_lsn
        )
        if gc_horizon is not None:
            # Safety guard on the GC dial: the provably-safe horizon is
            # the source's oldest-in-flight-transaction LSN
            # (pg_replication_slots.restart_lsn — SCALE_NOTES), which
            # is ≤ every in-flight LSN by definition. A horizon AHEAD
            # of an event/END still in flight this batch could trim a
            # delete marker those very events need (the tombstone
            # re-emission contract), so it is REFUSED, not clamped —
            # a wrong feed is an operator bug worth a halted stream.
            # Cost: one min-agg over micro-batch-sized frames, only on
            # the opt-in GC path (gc_horizon unset skips it entirely).
            lsn_pool = (
                order_events.select(
                    F.col("source.lsn").cast("long").alias("lsn")
                )
                .unionByName(
                    line_events.select(
                        F.col("source.lsn").cast("long").alias("lsn")
                    )
                )
                .unionByName(
                    tx_all.filter(F.col("status") == "END").select(
                        F.split(F.col("id"), ":")
                        .getItem(1)
                        .cast("long")
                        .alias("lsn")
                    )
                )
            )
            for carry in (carry_orders, carry_lines):
                if carry is not None:
                    lsn_pool = lsn_pool.unionByName(
                        carry.select(
                            F.col("event_lsn").cast("long").alias("lsn")
                        )
                    )
            inflight_floor = lsn_pool.agg(F.min("lsn")).first()[0]
            if inflight_floor is not None and gc_horizon > inflight_floor:
                raise ValueError(
                    f"order_delete_gc_horizon_lsn={gc_horizon} is ahead of "
                    f"the oldest in-flight LSN {inflight_floor} in batch "
                    f"{batch_id}: trimming delete markers above an "
                    "in-flight event can drop a tombstone a pending "
                    "transaction still needs. Feed the source's "
                    "oldest-in-flight horizon "
                    "(pg_replication_slots.restart_lsn) instead — it is "
                    "≤ every in-flight LSN by definition."
                )
        res: TxDenormResult = tx_denormalize(
            order_events,
            line_events,
            tx_all,
            order_state=self._load_buckets("order_state", touched_buckets),
            line_state=self._load_buckets("line_state", touched_buckets),
            carryover_orders=carry_orders,
            carryover_lines=carry_lines,
            # the stream's delivery contract is at-least-once (sink
            # before state swap): redelivery can duplicate events even
            # when no carryover frames exist, so the event-identity
            # dedup is always on here — batches are micro-batch sized,
            # the shuffle is bounded by batch width, not corpus width
            dedup_events=True,
            order_delete_gc_horizon_lsn=gc_horizon,
        )
        # emitted_txs feeds three consumers (the tx_keep anti-join, the
        # committed-tx metric, and new_applied in _store_all); it comes
        # pre-persisted from tx_denormalize so the full emission lineage
        # — which reads the PRE-swap state files — is evaluated a single
        # time per micro-batch; unpersisted below once the batch commits
        emitted_txs = res.emitted_txs
        emitted = emitted_txs.select(
            F.col("tx_id").cast("string").alias("_emitted_tx")
        )
        tx_keep = tx_all.join(
            emitted,
            F.split(tx_all["id"], ":").getItem(0) == emitted["_emitted_tx"],
            "left_anti",
        )
        # commit-order contract without a single-partition global sort:
        # range-partition on commit_lsn + in-partition sort — rows read
        # back in partition order ARE globally ordered, and the sort
        # parallelizes across reducers instead of one task
        emissions = (
            res.emissions.repartitionByRange("commit_lsn")
            .sortWithinPartitions("commit_lsn")
            .cache()
        )
        # track the cache the moment it exists: a failure anywhere below
        # leaves it registered, and the retry's start-of-batch unpersist
        # is the only hook that can reclaim it (the caller contract —
        # the returned frame stays readable until the NEXT batch — is
        # unaffected, since unpersist still happens only at that start)
        self._prev_emissions = emissions
        emissions.count()  # materialize before any state dir changes
        # monitoring (§6 metric catalog): events seen, source lag, backlog
        n_order_events, n_line_events = order_events.count(), line_events.count()
        n_events = n_order_events + n_line_events
        if initial_load:
            # snapshot-phase RowsScanned (per table): the first batch
            # over a fresh state dir is this engine's initial load —
            # the reference tracks the same counter per table through
            # its JMX snapshot metrics (jmx_exporter_config.yml:12-18).
            # batch_id dedupes an at-least-once RETRY of this batch
            # (crash after the counts, before the version commit).
            self.metrics.observe_initial_load(
                "orders", n_order_events, batch_id=batch_id
            )
            self.metrics.observe_initial_load(
                "lines", n_line_events, batch_id=batch_id
            )
        # committed-tx count MUST be taken before _store_all swaps the
        # state dirs: emitted_txs' lineage reads the pre-swap state
        # files, so a post-swap action would re-evaluate against the
        # wrong (or deleted) state — same ordering hazard as the sink
        n_committed = emitted_txs.count()
        # emitted-LSN high-watermark: max over the (already cached)
        # emissions, monotone across batches. Computed here — before
        # the sink/state writes — over the cached frame, so it costs
        # one short job on in-memory blocks, never a lineage re-read.
        batch_max_lsn = emissions.agg(F.max("commit_lsn")).first()[0]
        new_hwm = prev_hwm
        if batch_max_lsn is not None:
            new_hwm = batch_max_lsn if prev_hwm is None else max(prev_hwm, batch_max_lsn)
        self.metrics.total_events_seen += n_events
        max_ts = (
            order_events.select(F.max("ts_ms")).first()[0]
            if n_events
            else None
        )
        self.metrics.observe_event_time(max_ts)
        # -- sink BEFORE state swap: a crash in between replays the
        # batch against the old state and re-emits the same docs —
        # duplicate output, never lost output (AT_LEAST_ONCE). The
        # reverse order would record the txs as applied, filter them on
        # replay, and silently drop their emissions.
        if self.output_dir:
            (
                emissions.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(self.output_dir)
            )
        if self.emission_sink is not None:
            self.emission_sink(emissions, batch_id)
        new_applied = emitted_txs.withColumn(
            "applied_in_batch", F.lit(batch_id).cast("long")
        )
        if applied is not None:
            # bounded dedup state: drop txs applied more than
            # applied_retention_batches ago — older duplicates re-emit
            # (at-least-once) but cannot corrupt state (idempotent per
            # commit_lsn). Mirrors the reference's TTL'd dedup state.
            horizon = batch_id - self.applied_retention_batches
            applied_keep = applied.filter(F.col("applied_in_batch") >= horizon)
            new_applied = applied_keep.unionByName(new_applied).dropDuplicates(["tx_id"])
        self._store_all(
            {
                "carry_orders": res.carryover_orders,
                "carry_lines": res.carryover_lines,
                "carry_txs": tx_keep,
                "applied_txs": new_applied,
            },
            bucketed={
                "order_state": (res.order_state, touched_buckets),
                "line_state": (res.line_state, touched_buckets),
            },
            scalars={
                "_tx_hwm.json": json.dumps(
                    {"hwm": new_hwm, "batch_id": batch_id}
                ).encode()
            },
        )
        self.metrics.observe_backlog(
            self.spark.read.parquet(self._frame_path("carry_orders")).count()
            + self.spark.read.parquet(self._frame_path("carry_lines")).count()
        )
        # committed txs = txs that cleared the emission barrier this
        # batch (NumberOfCommittedTransactions analog)
        self.metrics.observe_batch(n_events, _time.time() - _batch_t0, n_committed)
        # new_applied was materialized by _store_all's parquet write;
        # nothing reads the operator's pinned frames after this point
        for frame in res.pinned:
            frame.unpersist()
        # emissions stays cached until the next batch starts (caller
        # may still read it); tracked above so that batch unpersists it
        self._emissions_schema = emissions.schema  # idle fast path's shape
        return emissions


def start_tx_denorm_stream(
    spark: SparkSession,
    order_stream: DataFrame,
    line_stream: DataFrame,
    tx_stream: DataFrame,
    *,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_seconds: float = 1.0,
    emission_sink=None,
    n_buckets: int = 32,
    backend=None,
    enforce_tx_order: bool = True,
    order_delete_gc_horizon_lsn=None,
):
    """Wire the three CDC streams (orders / order_lines / transaction
    metadata — the reference's three Kafka topics, DataStreamV2Job.
    java:70-97) into one driving query.

    Spark cannot foreachBatch three independent streams in lockstep,
    so the streams are unioned with a ``_stream`` tag (their schemas
    are reconciled to JSON strings) and split again inside the batch —
    one logical clock, one state, one emission order.

    Delivery-order contract (same as the reference's, which consumes
    a single-partition transaction topic: DataStreamV2Job.java:70-97):
    the TRANSACTION metadata stream must arrive in commit order. The
    barrier holds a completed tx until every EARLIER-known committed
    tx emits, but it cannot know about a tx whose BEGIN/END the source
    has not delivered yet — a source that reorders tx metadata across
    micro-batches (impossible for a Kafka partition, easy for a sloppy
    file-based test double) yields emissions in that reordered
    sequence. Data-event streams carry no such requirement (events are
    carried and re-ordered per tx).

    ENFORCED since r10: the processor checks every incoming END
    against the persisted emitted-LSN high-watermark and raises on a
    regression (``enforce_tx_order=False`` downgrades to a warning +
    the ``tx_order_regressions`` metric) — a broken source wiring
    fails loudly instead of silently emitting out of commit order.
    """
    tagged = (
        order_stream.select(F.lit("orders").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        .unionByName(
            line_stream.select(F.lit("order_lines").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        )
        .unionByName(
            tx_stream.select(F.lit("tx").alias("_stream"), F.to_json(F.struct("*")).alias("payload"))
        )
    )
    processor = TxDenormBatchProcessor(
        spark,
        state_dir,
        output_dir,
        n_buckets=n_buckets,
        backend=backend,
        emission_sink=emission_sink,
        enforce_tx_order=enforce_tx_order,
        order_delete_gc_horizon_lsn=order_delete_gc_horizon_lsn,
    )

    from streaming_examples_spark.model.envelope import (
        data_change_event_schema,
        transaction_event_schema,
    )
    from streaming_examples_spark.model.fixtures import LINE_ROW_SCHEMA, ORDER_ROW_SCHEMA

    def handle(batch: DataFrame, batch_id: int) -> None:
        orders = batch.filter(F.col("_stream") == "orders").select(
            F.from_json("payload", data_change_event_schema(ORDER_ROW_SCHEMA)).alias("e")
        ).select("e.*")
        lines = batch.filter(F.col("_stream") == "order_lines").select(
            F.from_json("payload", data_change_event_schema(LINE_ROW_SCHEMA)).alias("e")
        ).select("e.*")
        txs = batch.filter(F.col("_stream") == "tx").select(
            F.from_json("payload", transaction_event_schema()).alias("e")
        ).select("e.*")
        processor.process(orders, lines, txs, batch_id)

    return (
        tagged.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )

#!/usr/bin/env python3
"""Migrate a legacy (pre-versioned) tx state dir to the versioned
pointer-commit layout — the mechanical form of the manual steps the
processor's refusal message prescribes.

Legacy layout (r5 and earlier): frame dirs at the state root, no
CURRENT pointer. Target layout: frames under ``v1/``, ``CURRENT``
containing ``1``, and ``_layout.json`` sealing the bucket count the
store was built with (which CANNOT be inferred from the dirs — an
absent high bucket is indistinguishable from a smaller count, and a
wrong count silently loads empty state — hence the required
``--n-buckets``).

Crash-safe: a ``_migration.json`` marker is written FIRST and removed
LAST; while it exists the processor refuses to run (cdc_stream
``_check_layout``), and re-running this tool completes the migration
idempotently. The ``CURRENT`` pointer is written only after every
frame has moved and the layout is sealed.

Usage:
    python tools/migrate_state.py STATE_DIR --n-buckets N [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from streaming_examples_spark.streaming.cdc_stream import (  # noqa: E402
    _LEGACY_FRAME_DIRS,
)

MARKER = "_migration.json"


class MigrationError(SystemExit):
    def __init__(self, msg: str):
        super().__init__(f"migrate_state: {msg}")


def _validate_buckets(frame_dir: str, n_buckets: int) -> None:
    """A bucketed state frame must only hold ``_bucket=K`` dirs with
    K < n_buckets — a higher K proves the declared count is wrong."""
    for entry in os.listdir(frame_dir):
        if not entry.startswith("_bucket="):
            if entry.startswith(("_", ".")):
                continue  # _SUCCESS and friends
            raise MigrationError(
                f"{frame_dir} holds non-bucketed entry {entry!r}; this state "
                "was built before bucketed frames and cannot be migrated "
                "mechanically — rebuild it from the event log."
            )
        k = int(entry.split("=", 1)[1])
        if k >= n_buckets:
            raise MigrationError(
                f"{frame_dir} holds {entry} but --n-buckets={n_buckets}; the "
                "declared count is provably wrong (buckets are "
                "pmod(hash(key), n) < n). Pass the count the store was "
                "actually built with."
            )


def plan_migration(state_dir: str, n_buckets: int) -> list[tuple[str, ...]]:
    """Compute the migration steps; raises on anything that makes the
    directory un-migratable. Pure — performs no writes."""
    if not os.path.isdir(state_dir):
        raise MigrationError(f"{state_dir} is not a directory")
    # marker FIRST: a crash in the window between write-pointer and
    # remove-marker leaves BOTH a committed pointer and the marker —
    # the processor refuses while the marker exists and points here,
    # so treating the pointer as "nothing to migrate" would wedge the
    # dir permanently. With both present, the migration is complete
    # except for the marker: validate and emit only its removal.
    marker_path = os.path.join(state_dir, MARKER)
    resuming = os.path.exists(marker_path)
    if resuming:
        with open(marker_path) as fh:
            recorded = json.load(fh).get("n_buckets")
        if recorded != n_buckets:
            raise MigrationError(
                f"a crashed migration recorded n_buckets={recorded}; pass "
                f"the same value to resume (got {n_buckets})."
            )
    has_pointer = os.path.exists(os.path.join(state_dir, "CURRENT")) or os.path.isdir(
        os.path.join(state_dir, "_pointer")
    )
    if has_pointer:
        if not resuming:
            raise MigrationError(
                f"{state_dir} already has a committed version pointer — it is "
                "not a legacy layout; nothing to migrate."
            )
        layout_path = os.path.join(state_dir, "_layout.json")
        if not os.path.exists(layout_path):
            raise MigrationError(
                f"{state_dir} has a version pointer and a migration marker "
                "but no _layout.json — the pointer was not written by this "
                "tool's step order (layout precedes pointer); refusing to "
                "finalize an unrecognized state."
            )
        with open(layout_path) as fh:
            have = json.load(fh)
        if have.get("n_buckets") != n_buckets:
            raise MigrationError(
                f"{layout_path} seals n_buckets={have.get('n_buckets')} but "
                f"--n-buckets={n_buckets}; pass the sealed value to finalize."
            )
        for name in ("order_state", "line_state"):
            frame = os.path.join(state_dir, "v1", name)
            if os.path.isdir(frame):
                _validate_buckets(frame, n_buckets)
        return [("remove-marker", marker_path)]
    v1 = os.path.join(state_dir, "v1")
    pending = [
        d for d in _LEGACY_FRAME_DIRS if os.path.isdir(os.path.join(state_dir, d))
    ]
    if not pending and not resuming and not os.path.isdir(v1):
        raise MigrationError(
            f"{state_dir} holds no legacy frame dirs "
            f"({', '.join(_LEGACY_FRAME_DIRS)}); nothing to migrate."
        )
    for name in ("order_state", "line_state"):
        for base in (state_dir, v1):
            frame = os.path.join(base, name)
            if os.path.isdir(frame):
                _validate_buckets(frame, n_buckets)

    steps: list[tuple[str, ...]] = [("write-marker", marker_path)]
    steps.append(("mkdir", v1))
    for d in pending:
        steps.append(("move", os.path.join(state_dir, d), os.path.join(v1, d)))
    steps.append(("write-layout", os.path.join(state_dir, "_layout.json")))
    steps.append(("write-pointer", os.path.join(state_dir, "CURRENT")))
    steps.append(("remove-marker", marker_path))
    return steps


def migrate(state_dir: str, n_buckets: int, *, dry_run: bool = False) -> None:
    steps = plan_migration(state_dir, n_buckets)
    for step in steps:
        print(("PLAN " if dry_run else "") + " ".join(step))
        if dry_run:
            continue
        kind = step[0]
        if kind == "write-marker":
            with open(step[1], "w") as fh:
                json.dump({"n_buckets": n_buckets}, fh)
        elif kind == "mkdir":
            os.makedirs(step[1], exist_ok=True)
        elif kind == "move":
            os.rename(step[1], step[2])
        elif kind == "write-layout":
            layout = {"n_buckets": n_buckets}
            if os.path.exists(step[1]):
                with open(step[1]) as fh:
                    have = json.load(fh)
                if have != layout:
                    raise MigrationError(
                        f"{step[1]} already exists with {have}; refusing to "
                        f"overwrite with {layout}."
                    )
            tmp = step[1] + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(layout, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, step[1])
        elif kind == "write-pointer":
            tmp = step[1] + ".migrate"
            with open(tmp, "w") as fh:
                fh.write("1")
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, step[1])
        elif kind == "remove-marker":
            os.unlink(step[1])
    if dry_run:
        print("dry run: nothing written")
    else:
        print(f"migrated {state_dir} to versioned layout (v1, n_buckets={n_buckets})")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("state_dir")
    ap.add_argument(
        "--n-buckets",
        type=int,
        required=True,
        help="bucket count the store was built with (TxDenormBatchProcessor "
        "n_buckets; cannot be inferred from the dirs)",
    )
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    migrate(args.state_dir, args.n_buckets, dry_run=args.dry_run)


if __name__ == "__main__":
    main()

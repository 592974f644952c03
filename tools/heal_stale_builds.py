#!/usr/bin/env python3
"""Release stale build-claim markers in a state directory — the
scriptable, safe form of the dual-writer fence's documented manual
heal ("remove the marker once the host is known dead").

A host that dies mid-build leaves its ``v<N>.builder`` claim behind;
acquire_build refuses remote claims regardless of age (liveness is
unprovable from here), so every future build of that version wedges
with "dual-writer detected" until the claim is cleared. This tool
clears claims older than a threshold the OPERATOR chooses — pick one
longer than the longest possible batch/compaction plus cross-host
clock skew. Dry-run by default; pass --apply to release.

Works on both state layouts:
  - tx processor state dir   (v<N> version dirs at the root)
  - incremental-dedup state  (bands/ sigs/ band_hot/ store roots)

Runs under the state dir's advisory writer lock (role "heal") so no
same-filesystem writer is mid-build during the walk. See
state_backend.heal_stale_builds for the safety argument (a healed
live builder fails its commit-time validate_build; it cannot publish
interleaved state).

Usage:
    python tools/heal_stale_builds.py STATE_DIR --older-than 86400
    python tools/heal_stale_builds.py STATE_DIR --older-than 86400 --apply
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_examples_spark.streaming.locks import writer_lock  # noqa: E402
from streaming_examples_spark.streaming.state_backend import (  # noqa: E402
    LocalPosixBackend,
    ManifestBackend,
    heal_stale_builds,
)

_DETECTOR_STORES = ("bands", "sigs", "band_hot")


def marker_roots(state_dir: str) -> list[str]:
    """The dirs whose direct children can carry build claims: the
    state dir itself (tx version layout) plus any detector store
    roots nested under it."""
    roots = [state_dir]
    for name in _DETECTOR_STORES:
        sub = os.path.join(state_dir, name)
        if os.path.isdir(sub):
            roots.append(sub)
    return roots


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("state_dir")
    ap.add_argument(
        "--older-than",
        type=float,
        required=True,
        metavar="SECONDS",
        help="release claims older than this; must exceed the longest "
        "possible build plus cross-host clock skew",
    )
    ap.add_argument(
        "--apply",
        action="store_true",
        help="actually release (default: dry-run report only)",
    )
    ap.add_argument(
        "--backend", choices=("posix", "manifest"), default="posix"
    )
    args = ap.parse_args()

    backend = (
        ManifestBackend() if args.backend == "manifest" else LocalPosixBackend()
    )
    reports = []
    with writer_lock(args.state_dir, "heal"):
        for root in marker_roots(args.state_dir):
            reports.append(
                heal_stale_builds(
                    backend, root, args.older_than, dry_run=not args.apply
                )
            )
    print(json.dumps({"apply": args.apply, "reports": reports}, indent=2))
    healed = sum(len(r["healed"]) for r in reports)
    kept = sum(len(r["kept"]) for r in reports)
    print(
        f"{'released' if args.apply else 'WOULD release'} {healed} claim(s), "
        f"kept {kept}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

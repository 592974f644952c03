#!/usr/bin/env python3
"""Publish the ``_latest`` pointer-resolution hint for a pre-r12
manifest-layout state dir — the one-time adoption step that frees
generation resolution from the prefix listing.

Background: since r12, ``ManifestBackend`` resolves the committed
generation from the ``_pointer/_latest`` hint object (a GET) plus
forward exact-key GET probes; the prefix LISTING is only a hint
(state_backend.py ``_gen_candidates``). A store written exclusively by
pre-r12 code has generations but no ``_latest``, so its FIRST
resolution still rides the listing — under list-after-write lag that
read can come up stale. Running this tool from a host whose listing is
fresh (always true on POSIX; on an object store, any host once the
listing has settled) publishes the hint and closes that window for
every later read; the store's next commit would also do it, but only
AFTER one listing-resolved read.

Idempotent; refuses to regress an existing hint (the monotonic guard
is the backend's own). No-op with a notice for POSIX-layout stores
(their CURRENT pointer is a GET already) and for dirs with no
generations.

Usage:
    python tools/publish_pointer_hint.py STATE_DIR [STATE_DIR ...]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from streaming_examples_spark.streaming.state_backend import (  # noqa: E402
    ManifestBackend,
)


def publish_hint(state_dir: str) -> str:
    """Returns a one-line human-readable outcome (also printed by
    main); raises on a store this tool must not touch."""
    gen_dir = os.path.join(state_dir, "_pointer")
    if os.path.exists(os.path.join(state_dir, "CURRENT")):
        return f"{state_dir}: POSIX layout (CURRENT pointer is a GET) — no-op"
    if not os.path.isdir(gen_dir):
        return f"{state_dir}: no _pointer/ dir — nothing committed, no-op"
    be = ManifestBackend()
    # resolution here MAY ride the listing — that is this tool's whole
    # contract: run it where the listing is fresh
    gens = be._generations(gen_dir)
    if not gens:
        return f"{state_dir}: no generation objects — nothing committed, no-op"
    latest = gens[-1][0]
    before = be._read_hint(gen_dir)
    if before >= latest:
        return f"{state_dir}: hint already at gen-{before} (>= {latest}) — no-op"
    be._publish_hint(gen_dir, latest)
    return f"{state_dir}: published _latest = gen-{latest} (was {before or 'absent'})"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("state_dirs", nargs="+")
    args = ap.parse_args()
    for d in args.state_dirs:
        print(publish_hint(d))


if __name__ == "__main__":
    main()

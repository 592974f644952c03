"""Advisory single-writer locking for file-backed streaming state.

Both stateful processors keep their state as plain parquet under a
state dir and mutate it with read-rewrite-commit patterns
(``IncrementalNearDup``'s compaction, ``TxDenormBatchProcessor``'s
versioned pointer commit). Those patterns are crash-safe for ONE writer
but not for two: a second writer's append or swap landing inside the
first's temp-write-to-swap window is silently deleted with the old
copy. This module provides the mutual exclusion both use — the
operational contract is one writer per state dir (the stream OR its
maintenance job, never a second stream over the same dir).
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import time


def _pid_alive(pid) -> bool:
    """True unless the pid verifiably does not exist on THIS host.
    Permission errors (a live process we may not signal) and garbage
    pids err toward 'alive' — stealing a live owner's lock is the
    data-loss case the lock exists to prevent."""
    try:
        os.kill(int(pid), 0)
    except ProcessLookupError:
        return False
    except (PermissionError, ValueError, TypeError, OverflowError):
        return True
    return True


@contextlib.contextmanager
def writer_lock(state_dir: str, role: str):
    """Advisory single-writer lock on a file-backed state dir.

    Acquisition: the owner record {pid, host, role, ts} is written to
    a private temp file first, then the lock is claimed with
    ``os.link(tmp, lock)`` — atomic on POSIX, and the lock file is BORN
    with its owner content, so no crash window can leave an owner-less
    lock that auto-break could never clear.

    Stale break: a lock whose owner is a verifiably dead pid on THIS
    host is broken by atomically RENAMING it aside — of N racing
    breakers exactly one rename succeeds (the losers get
    FileNotFoundError and retry the claim) — then verifying the renamed
    content is still the stale owner we decided to break; if a live
    writer slipped in between the read and the rename, its lock is
    restored via the same atomic link and we refuse. Anything not
    provably dead raises loudly with the owner's identity — never steal
    a lock you cannot prove is dead. On a multi-host cluster the pid
    check cannot prove death, so a crashed remote owner needs a manual
    unlink (or the scheduler's own mutual exclusion — one maintenance
    job — with this lock as defense-in-depth).
    """
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, "_writer.lock")
    tmp = f"{path}.owner.{os.getpid()}.{time.time_ns()}"
    mine = json.dumps(
        {
            "pid": os.getpid(),
            "host": socket.gethostname(),
            "role": role,
            "ts": time.time(),
        }
    )
    with open(tmp, "w") as fh:
        fh.write(mine)
    acquired = False
    try:
        for _ in range(2):  # one stale-break, one retry
            try:
                os.link(tmp, path)  # atomic claim, born with content
                acquired = True
                break
            except FileExistsError:
                try:
                    with open(path) as fh:
                        raw = fh.read()
                except FileNotFoundError:
                    continue  # released between link and read: retry claim
                except OSError:
                    raw = ""
                try:
                    owner = json.loads(raw)
                except json.JSONDecodeError:
                    owner = {}
                if owner.get("host") == socket.gethostname() and not _pid_alive(
                    owner.get("pid")
                ):
                    aside = f"{path}.stale.{os.getpid()}.{time.time_ns()}"
                    try:
                        os.rename(path, aside)
                    except FileNotFoundError:
                        continue  # another writer broke it first; retry
                    with open(aside) as fh:
                        taken = fh.read()
                    if taken != raw:
                        # a LIVE writer replaced the stale lock between
                        # our read and the rename — restore it (atomic;
                        # a no-op if yet another writer claimed the path
                        # meanwhile) and refuse below
                        with contextlib.suppress(FileExistsError):
                            os.link(aside, path)
                        os.unlink(aside)
                        try:
                            owner = json.loads(taken)
                        except json.JSONDecodeError:
                            owner = {"raw": taken}
                    else:
                        os.unlink(aside)
                        continue
                raise RuntimeError(
                    f"state dir {state_dir} is locked by another writer "
                    f"({owner or 'unreadable lock'}); refusing to run {role} "
                    "concurrently — a concurrent rewrite/append race can "
                    "silently drop state rows. Stop the other writer (or "
                    "remove the lock file if its owner is known dead)."
                )
        if not acquired:
            raise RuntimeError(
                f"could not acquire {path}: another writer recreated the lock "
                "while a stale one was being broken"
            )
        yield
    finally:
        # release ONLY what we own: the claim was an os.link, so our
        # lock and our tmp are the same inode — if the path has been
        # replaced by another writer (a mis-fired stale break stole and
        # re-created it), unlinking here would delete THEIR live lock
        # and re-open the two-writer window. samefile == inode compare.
        if acquired:
            try:
                if os.path.exists(path) and os.path.samefile(tmp, path):
                    os.unlink(path)
            except OSError:
                pass
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)


def owner_token() -> str:
    """A per-acquisition writer identity for build-marker fencing
    (state_backend.claim_build): host + pid locate the writer, the
    random suffix distinguishes successive instances in one process.
    Mint one per processor/detector instance."""
    import uuid

    return f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:12]}"


def claim_reclaimable_under_writer_lock(token: str | None) -> bool:
    """May a writer HOLDING the state dir's advisory lock reclaim a
    build claim carrying this owner token?

    Same-host claims: yes — the advisory lock genuinely excludes on
    one filesystem, so while we hold it no same-host batch can be in
    flight; a same-host claim is necessarily an abandoned (crashed)
    build, whatever its pid says (the pid may even be OURS, from a
    previous processor instance in this process — the lock serialized
    its batches with ours).

    Remote-host claims: never — liveness of a remote writer cannot be
    proven from here, and reclaiming a LIVE builder's dir re-opens the
    interleaved-write window the marker fencing exists to close (the
    same rule as the writer lock's own stale break). Unparseable
    claims are treated as remote."""
    if not token:
        return True  # no claim — nothing to respect
    parts = token.split(":")
    return len(parts) >= 3 and parts[0] == socket.gethostname()

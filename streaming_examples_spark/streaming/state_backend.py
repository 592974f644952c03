"""Storage seam for the versioned tx state commit.

The pointer-commit protocol in ``cdc_stream._store_all`` (write all
frames under the NEXT version dir, carry untouched bucket files over,
flip one pointer atomically, GC superseded versions) is storage-
agnostic, but its primitives are not: the shipped implementation is
POSIX (hardlink carry, ``os.replace`` flip, directory fsync). This
module isolates those five primitives behind ``StateStorageBackend``
so a deployer can swap in an object-store backend without touching the
protocol. The translation each method documents is the one LSM engines
and table formats ship on S3/GCS:

  carry_file      → a manifest entry referencing the old object (no
                    byte copy; the "directory" becomes a manifest)
  commit_pointer  → a conditional put of the pointer object
                    (if-match on the previous generation/etag — the
                    atomicity primitive object stores actually offer)
  remove_tree     → a prefix delete (async-safe: readers resolve
                    through the pointer, never by listing)
  prepare_dir     → a no-op (object stores have no directories)
  remove_file     → a single-object delete

Only ``LocalPosixBackend`` is implemented here — the container has no
object store — but the crash-injection suite drives every primitive
through this seam, so a new backend inherits the protocol's tested
crash semantics and needs to supply only the five operations.

Reference parity: the reference delegates the equivalent durability to
Kafka-backed Flink checkpoints (streaming-examples
KafkaChangelogJob.java + Flink's state backend config); this engine
owns its state files, so it owns the commit protocol too.
"""

from __future__ import annotations

import errno
import os
import shutil

# errnos meaning "this filesystem cannot hardlink src→dst" (cross-
# device bind mounts, some network/container filesystems); anything
# else (ENOENT, EIO, injected test errors) must propagate
_LINK_UNSUPPORTED = {
    errno.EXDEV,
    errno.EPERM,
    errno.ENOTSUP,
    getattr(errno, "EOPNOTSUPP", errno.ENOTSUP),
    errno.EMLINK,
}


class StateStorageBackend:
    """Abstract storage primitives behind the versioned state commit.

    Implementations must guarantee exactly one property beyond the
    obvious semantics: ``commit_pointer`` is ATOMIC and DURABLE — a
    reader (or a crash-replay) sees either the old pointer or the new
    one, never a torn or lost write. Everything else in the protocol
    tolerates partial completion (crash garbage is GC'd by version).
    """

    def prepare_dir(self, path: str) -> None:
        raise NotImplementedError

    def carry_file(self, src: str, dst: str) -> None:
        """Make ``dst`` readable with ``src``'s bytes without copying
        them if the storage allows; copying is a legal fallback."""
        raise NotImplementedError

    def commit_pointer(self, state_dir: str, version: int) -> None:
        """Atomically and durably set ``state_dir``'s CURRENT pointer
        to ``version``. THE commit point of a batch."""
        raise NotImplementedError

    def read_pointer(self, state_dir: str) -> int:
        """Return the committed version, or 0 if none exists yet."""
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        raise NotImplementedError

    def remove_file(self, path: str) -> None:
        raise NotImplementedError


class LocalPosixBackend(StateStorageBackend):
    """The shipped backend: hardlink carry (copy fallback for
    filesystems that refuse links), fsync'd temp + ``os.replace``
    pointer flip, directory fsync for rename durability."""

    def prepare_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def carry_file(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except OSError as exc:
            if exc.errno not in _LINK_UNSUPPORTED:
                raise
            # correctness needs only that dst has src's bytes; the
            # link is the zero-copy fast path, not a requirement
            shutil.copy2(src, dst)

    def commit_pointer(self, state_dir: str, version: int) -> None:
        # durable temp first: fsync the CONTENT before the rename makes
        # it visible, so a power loss can't expose a torn pointer
        tmp = os.path.join(state_dir, f"CURRENT.{version}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(state_dir, "CURRENT"))
        # fsync the DIRECTORY so the rename itself is durable (some
        # filesystems would otherwise revert the flip on power loss
        # after process() already reported the batch committed)
        dirfd = os.open(state_dir, os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)

    def read_pointer(self, state_dir: str) -> int:
        try:
            with open(os.path.join(state_dir, "CURRENT")) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def remove_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def remove_file(self, path: str) -> None:
        try:
            os.unlink(path)
        except OSError:
            pass

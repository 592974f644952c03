"""Storage seam for the versioned tx state commit.

The pointer-commit protocol in ``cdc_stream._store_all`` (write all
frames under the NEXT version dir, carry untouched bucket files over,
flip one pointer atomically, GC superseded versions) is storage-
agnostic, but its primitives are not: the shipped implementation is
POSIX (hardlink carry, ``os.replace`` flip, directory fsync). This
module isolates those primitives behind ``StateStorageBackend``
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
  dir_exists/list_dir/read_locations → prefix listing + manifest
                    resolution (the logical namespace; see below)

Two implementations ship: ``LocalPosixBackend`` (hardlinks + rename
flip — the production local backend) and ``ManifestBackend``, a
test-double that enforces object-store constraints over a local
directory — NO hardlinks, NO directory renames: carry is a JSON
manifest entry referencing the original physical file, commit is a
conditional-put emulation (exclusive create of a monotonically
numbered generation object), and remove_tree is a DEFERRED prefix
delete that retains any file still referenced from the committed
version's manifests. The crash-injection suite runs parameterized
over both (tests/test_state_backend.py), which is what proves the
protocol itself — reads resolve through ``read_locations`` and carry
listings through ``list_dir``, never by assuming the physical tree is
the logical content.

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

    #: identity sealed into the state dir's _layout.json — the two
    #: backends encode the commit pointer differently, so a state dir
    #: must be reopened by the backend that committed it (cdc_stream
    #: validates this in _check_layout)
    layout_id: str = "abstract"

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
        """Logically delete the prefix ``path``. May defer physical
        deletion of bytes still referenced elsewhere (manifest carry);
        must be idempotent — the GC re-issues it every batch."""
        raise NotImplementedError

    def remove_file(self, path: str) -> None:
        raise NotImplementedError

    # -- logical namespace (reads + carry listings) ----------------------
    # The physical tree is NOT necessarily the logical content: under a
    # manifest backend a carried file has no local bytes at its logical
    # path. Everything in the commit protocol that enumerates or reads
    # state must come through these three, never through os.listdir /
    # spark.read on the logical dir.

    def dir_exists(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Logical entries of ``path``: physical names plus
        manifest-carried names, minus backend-internal files."""
        raise NotImplementedError

    def read_locations(self, path: str) -> list[str]:
        """Concrete locations a Spark reader can scan for the logical
        dir ``path`` — ``[path]`` when the physical tree IS the
        logical content; the dereferenced file list otherwise. Empty
        when the logical dir is absent or holds no data files."""
        raise NotImplementedError


class LocalPosixBackend(StateStorageBackend):
    """The shipped backend: hardlink carry (copy fallback for
    filesystems that refuse links), fsync'd temp + ``os.replace``
    pointer flip, directory fsync for rename durability."""

    layout_id = "local-posix"

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

    def dir_exists(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_dir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def read_locations(self, path: str) -> list[str]:
        return [path] if os.path.exists(path) else []


class ManifestBackend(StateStorageBackend):
    """Object-store semantics emulated over a local directory: the
    test-double that proves the commit protocol holds WITHOUT POSIX's
    two load-bearing conveniences. Forbidden here, by construction:

    - **hardlinks** — ``carry_file`` never touches the bytes; it
      appends ``{dst_name: physical_src}`` to the destination dir's
      ``_carry.json`` (the manifest pattern of S3/GCS table formats:
      the "directory" is a file list, a carried object is a reference
      to the original). Chains stay depth-1: carrying an
      already-carried file records the ORIGINAL physical path.
    - **renames** — ``commit_pointer`` emulates a conditional put:
      exclusive create of ``_pointer/gen-<g+1>`` (if-match on the
      previous generation; a concurrent committer loses with an error
      instead of last-writer-wins). ``read_pointer`` resolves the
      highest generation object.
    - **synchronous prefix delete** — ``remove_tree`` is DEFERRED: a
      file still referenced from the committed version's manifests
      survives (deleting it would destroy carried state — the POSIX
      backend never faces this because hardlinked bytes outlive their
      directory). Unreferenced files and manifests go immediately;
      retained files fall out on a later pass once the buckets
      referencing them are rewritten. Idempotent, like the
      orphan-file GC of any manifest table format.

    Reads resolve through ``read_locations`` (physical data files plus
    dereferenced manifest entries), which is exactly what forces the
    protocol to stop assuming the physical tree is the logical
    content."""

    MANIFEST = "_carry.json"
    layout_id = "manifest"

    # -- manifest helpers -------------------------------------------------
    def _manifest(self, dirpath: str) -> dict[str, str]:
        p = os.path.join(dirpath, self.MANIFEST)
        if not os.path.exists(p):
            return {}
        import json

        with open(p) as fh:
            return json.load(fh)

    def _write_manifest(self, dirpath: str, entries: dict[str, str]) -> None:
        import json

        p = os.path.join(dirpath, self.MANIFEST)
        with open(p, "w") as fh:
            json.dump(entries, fh)
            fh.flush()
            os.fsync(fh.fileno())

    def prepare_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def carry_file(self, src: str, dst: str) -> None:
        # dereference so reference chains never deepen: the manifest
        # entry always names a PHYSICAL file
        src_dir, src_name = os.path.split(src)
        physical = self._manifest(src_dir).get(src_name)
        if physical is None:
            if not os.path.exists(src):
                raise FileNotFoundError(src)
            physical = os.path.abspath(src)
        dst_dir, dst_name = os.path.split(dst)
        entries = self._manifest(dst_dir)
        entries[dst_name] = physical
        self._write_manifest(dst_dir, entries)

    def commit_pointer(self, state_dir: str, version: int) -> None:
        gen_dir = os.path.join(state_dir, "_pointer")
        os.makedirs(gen_dir, exist_ok=True)
        prev = self._generations(gen_dir)
        nxt = (prev[-1][0] + 1) if prev else 1
        target = os.path.join(gen_dir, f"gen-{nxt:012d}")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"pointer generation conflict at {target}: another writer "
                "committed concurrently (conditional put failed)"
            )
        try:
            os.write(fd, str(version).encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        dirfd = os.open(gen_dir, os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
        # superseded generations: plain object deletes, best-effort
        for g, name in prev:
            try:
                os.unlink(os.path.join(gen_dir, name))
            except OSError:
                pass

    @staticmethod
    def _generations(gen_dir: str) -> list[tuple[int, str]]:
        out = []
        try:
            names = os.listdir(gen_dir)
        except FileNotFoundError:
            return []
        for name in names:
            if name.startswith("gen-"):
                try:
                    out.append((int(name[4:]), name))
                except ValueError:
                    pass
        return sorted(out)

    def read_pointer(self, state_dir: str) -> int:
        gens = self._generations(os.path.join(state_dir, "_pointer"))
        if not gens:
            return 0
        with open(os.path.join(state_dir, "_pointer", gens[-1][1])) as fh:
            return int(fh.read().strip())

    def _live_refs(self, state_dir: str) -> set[str]:
        """Physical paths referenced by the COMMITTED version's
        manifests — the files a deferred delete must retain."""
        cur = self.read_pointer(state_dir)
        refs: set[str] = set()
        if cur == 0:
            return refs
        root = os.path.join(state_dir, f"v{cur}")
        for dirpath, _dirs, files in os.walk(root):
            if self.MANIFEST in files:
                refs.update(
                    os.path.realpath(p) for p in self._manifest(dirpath).values()
                )
        return refs

    def remove_tree(self, path: str) -> None:
        if not os.path.isdir(path):
            return
        # version dirs live directly under the state root; the root is
        # where the pointer (and thus the live-reference set) resolves
        state_dir = os.path.dirname(os.path.abspath(path))
        live = self._live_refs(state_dir)
        for dirpath, _dirs, files in os.walk(path, topdown=False):
            for f in files:
                full = os.path.join(dirpath, f)
                if os.path.realpath(full) in live:
                    continue  # deferred: still carried by the live version
                try:
                    os.unlink(full)
                except OSError:
                    pass
            try:
                os.rmdir(dirpath)  # only succeeds once truly empty
            except OSError:
                pass

    def remove_file(self, path: str) -> None:
        try:
            os.unlink(path)
        except OSError:
            pass

    def dir_exists(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_dir(self, path: str) -> list[str]:
        physical = [n for n in os.listdir(path) if n != self.MANIFEST]
        return sorted(set(physical) | set(self._manifest(path)))

    def read_locations(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        locs = [
            os.path.join(path, n)
            for n in os.listdir(path)
            if not n.startswith(("_", "."))
        ]
        locs.extend(self._manifest(path).values())
        return sorted(locs)

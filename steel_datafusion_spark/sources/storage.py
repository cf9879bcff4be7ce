"""Storage-atomicity seam: the three primitives every coordination
protocol in this repo actually relies on, behind an interface.

Every correctness claim in the manifest commit log
(``manifest.commit_version`` — write-complete-payload then atomic link
claim), the index lock (``locking.IndexLock`` — O_EXCL create, atomic
rename-aside, link put-back) and the swap recoveries reduces to three
filesystem guarantees:

- **exclusive create**: exactly one writer materializes a name
  (POSIX ``O_CREAT|O_EXCL``);
- **atomic rename**: a name moves in one step, destination overwritten
  (POSIX ``rename``);
- **link-claim**: a name is claimed with ALREADY-COMPLETE content, and
  the claim FAILS if the name exists (POSIX ``link`` → EEXIST).

These hold on a local filesystem and on NFS (close-to-open + the
documented atomicity of link/rename), which is the deployment the
managed warehouse itself assumes.  They do NOT hold on S3-class object
stores, where the equivalent contract is **conditional PUT**
(If-None-Match: * for exclusive create / claim) and rename does not
exist at all (copy+delete, non-atomic).  The honest production answers
there are the public ones: a real table format's commit service
(Delta's LogStore with conditional writes, Iceberg's catalog
compare-and-swap) or an external coordinator.

This module makes that dependency EXPLICIT and testable instead of
implicit in scattered ``os.`` calls:

- :class:`PosixBackend` — the default; thin wrappers over ``os``.
- :class:`MemoryBackend` — an in-memory fake implementing the SAME
  contract via a dict + a mutex (conditional-PUT semantics: exclusive
  create and link-claim fail on existing keys).  The protocol tests in
  ``tests/test_storage.py`` run the lock acquisition/steal state
  machine against it, proving the protocols depend only on the three
  primitives — porting to an object store means implementing THIS
  interface over conditional PUT, not re-deriving the protocols.

The POSIX modules (locking, manifest) keep calling ``os`` directly on
their hot paths — the seam documents and tests the contract; it does
not tax every commit with an indirection.  A cloud port swaps the
callers' primitive layer for a backend instance.

Reference note: the reference engine (/root/reference/src/main.rs) is
single-process with no shared mutable state — no coordination, no
storage contract; this supports surface the repo ADDS.
"""

from __future__ import annotations

import os
import threading

__all__ = ["StorageBackend", "PosixBackend", "MemoryBackend"]


class StorageBackend:
    """The minimal atomic-primitive contract (see module docstring).

    - ``create_exclusive(path, data) -> bool``: write ``data`` at
      ``path`` iff absent; False when the name exists.  (POSIX
      O_EXCL; S3 conditional PUT If-None-Match: *.)
    - ``link_claim(src, dst) -> bool``: claim ``dst`` with ``src``'s
      already-complete content iff ``dst`` absent; False otherwise.
      (POSIX link; S3 conditional PUT of the staged bytes.)
    - ``rename(src, dst) -> bool``: atomically move; destination
      replaced; False when ``src`` vanished.  (POSIX rename; object
      stores DO NOT have this — protocols needing it must be re-shaped
      to claim+delete there, which is why steal uses rename-ASIDE to a
      unique name, never rename-over.)
    - ``read(path) -> bytes | None``, ``unlink(path) -> bool``,
      ``exists(path) -> bool``.
    """

    def create_exclusive(self, path: str, data: bytes) -> bool:
        raise NotImplementedError

    def link_claim(self, src: str, dst: str) -> bool:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> bool:
        raise NotImplementedError

    def read(self, path: str) -> bytes | None:
        raise NotImplementedError

    def unlink(self, path: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError


class PosixBackend(StorageBackend):
    """The contract as the POSIX calls the repo's protocols use."""

    def create_exclusive(self, path: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        return True

    def link_claim(self, src: str, dst: str) -> bool:
        try:
            os.link(src, dst)
            return True
        except OSError:
            return False

    def rename(self, src: str, dst: str) -> bool:
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def read(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def unlink(self, path: str) -> bool:
        try:
            os.unlink(path)
            return True
        except OSError:
            return False

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class MemoryBackend(StorageBackend):
    """In-memory fake with conditional-PUT semantics — the contract an
    object-store port must provide.  A single mutex makes each
    primitive atomic (the store-side guarantee); the PROTOCOL races
    (read-then-rename windows, ABA put-backs) remain fully exercisable
    because they span multiple primitive calls."""

    def __init__(self):
        self._lock = threading.Lock()
        self._files: dict[str, bytes] = {}

    def create_exclusive(self, path: str, data: bytes) -> bool:
        with self._lock:
            if path in self._files:
                return False
            self._files[path] = bytes(data)
            return True

    def link_claim(self, src: str, dst: str) -> bool:
        with self._lock:
            if src not in self._files or dst in self._files:
                return False
            self._files[dst] = self._files[src]
            return True

    def rename(self, src: str, dst: str) -> bool:
        with self._lock:
            if src not in self._files:
                return False
            self._files[dst] = self._files.pop(src)
            return True

    def read(self, path: str) -> bytes | None:
        with self._lock:
            return self._files.get(path)

    def unlink(self, path: str) -> bool:
        with self._lock:
            return self._files.pop(path, None) is not None

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._files

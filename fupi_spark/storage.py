"""Storage abstraction for the table-metadata layer.

The reference's tables live on object stores (LanceDB over S3/MinIO/R2:
/root/reference/fupi/utils.py:16, /root/reference/searcher.py:378-399),
but round-1's commit protocol assumed POSIX: os.rename promotion,
O_CREAT|O_EXCL claims, os.listdir GC. Object stores have NO atomic
rename and no open-exclusive — so the protocol is re-expressed here
over a primitive set every object store offers:

- ``put(path, data)``             — atomic whole-object PUT (overwrite)
- ``put_if_absent(path, data)``   — conditional PUT (S3: If-None-Match:
                                    "*"; GCS: x-goog-if-generation-match
                                    0; Azure: If-None-Match) — atomic
                                    create-with-content, False if the
                                    object exists
- ``read / exists / mtime``       — GET / HEAD
- ``list(prefix)``                — LIST
- ``delete(path)``                — DELETE
- ``promote(local_file, path)``   — move a locally-staged file into the
                                    table namespace (upload or
                                    server-side copy + delete source);
                                    needs NO atomicity because
                                    visibility is manifest-driven: a
                                    data file does not exist to readers
                                    until a snapshot references it, and
                                    commits happen only after promote
                                    returns

Two implementations, both runnable in this sandbox:

- ``LocalStorage`` — POSIX fast path: promote is os.rename,
  put_if_absent is hardlink-from-temp (atomic create WITH content — an
  O_EXCL create followed by a write would expose a torn snapshot to
  readers; the hardlink publishes fully-written bytes or nothing).
- ``ObjectStoreStorage`` — S3-semantics emulation on a local directory:
  promote is copy+delete (never rename), put is write-temp + atomic
  whole-object replace (emulating PUT atomicity), put_if_absent is the
  same hardlink emulation of the conditional PUT. The commit-race and
  maintenance tests run against this implementation to prove the
  protocol needs nothing an object store cannot give (a real S3 impl
  swaps boto3 calls into this class; Spark itself reads/writes data
  files through its own hadoop-s3a layer, untouched here).
"""

from __future__ import annotations

import os
import shutil
import uuid


class Storage:
    """Filesystem-ish namespace rooted at ``root``; paths are relative."""

    #: True when promote() preserves inode identity (POSIX rename).
    atomic_rename = False

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    # -- helpers -----------------------------------------------------------
    def _abs(self, rel: str) -> str:
        return f"{self.root}/{rel}"

    def _tmp(self, rel: str) -> str:
        d = os.path.dirname(self._abs(rel))
        os.makedirs(d, exist_ok=True)
        return f"{d}/.tmp-{uuid.uuid4().hex}"

    # -- primitives --------------------------------------------------------
    def put(self, rel: str, data: bytes) -> None:
        """Atomic whole-object PUT (readers see old or new, never torn)."""
        tmp = self._tmp(rel)
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._abs(rel))  # emulates object-PUT atomicity

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        """Conditional PUT: create-with-content iff absent. The commit
        claim. Emulated with hardlink-from-temp (atomic on POSIX);
        a real S3 impl sends If-None-Match: "*"."""
        tmp = self._tmp(rel)
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._abs(rel))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as f:
            return f.read()

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._abs(rel))

    def mtime(self, rel: str) -> float:
        return os.path.getmtime(self._abs(rel))

    def size(self, rel: str) -> int:
        return os.path.getsize(self._abs(rel))

    def list(self, prefix: str) -> list[str]:
        """Relative paths of all objects under ``prefix`` (recursive,
        like an object-store LIST)."""
        base = self._abs(prefix).rstrip("/")
        if not os.path.isdir(base):
            return []
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                out.append(os.path.relpath(f"{dirpath}/{f}", self.root))
        return sorted(out)

    def delete(self, rel: str) -> None:
        try:
            os.remove(self._abs(rel))
        except FileNotFoundError:
            pass

    def delete_prefix(self, prefix: str) -> None:
        shutil.rmtree(self._abs(prefix), ignore_errors=True)

    def promote(self, local_file: str, rel: str) -> None:
        """Move a locally-staged file into the namespace (no atomicity
        contract — callers commit only after promote returns)."""
        raise NotImplementedError

    def ensure_dir(self, prefix: str) -> None:
        """Directory creation is a no-op on object stores; local
        filesystems need it before Spark writes there."""
        os.makedirs(self._abs(prefix), exist_ok=True)


class LocalStorage(Storage):
    """POSIX fast path."""

    atomic_rename = True

    def promote(self, local_file: str, rel: str) -> None:
        os.makedirs(os.path.dirname(self._abs(rel)), exist_ok=True)
        os.rename(local_file, self._abs(rel))


class ObjectStoreStorage(Storage):
    """S3-semantics emulation: promote copies bytes and deletes the
    source — never renames. Everything else inherits the PUT/LIST
    emulations from Storage."""

    atomic_rename = False

    def promote(self, local_file: str, rel: str) -> None:
        os.makedirs(os.path.dirname(self._abs(rel)), exist_ok=True)
        shutil.copyfile(local_file, self._abs(rel))
        os.unlink(local_file)

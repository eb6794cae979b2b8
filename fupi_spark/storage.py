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

    def promote_many(self, pairs: list[tuple[str, str]], max_workers: int = 16) -> None:
        """Promote a batch concurrently. A maintenance job promotes
        O(output files) objects; serially that is an O(files) driver
        stall — microseconds per rename locally, but a full network
        round-trip each on an object store, where 10^4 files at ~50 ms
        would cost minutes. Thread pool: promotes are independent
        (distinct destinations) and GIL-released (os.rename / boto3 I/O)."""
        if len(pairs) <= 1:
            for src, rel in pairs:
                self.promote(src, rel)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(max_workers, len(pairs))) as ex:
            list(ex.map(lambda p: self.promote(*p), pairs))

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


class S3Storage(Storage):
    """Real object-store backend over boto3 (guarded import — the same
    seam pattern as the ONNX/pysbd kernels: constructing this class
    requires boto3 + reachable credentials; nothing else in the engine
    imports it). Maps the Storage primitives 1:1 onto S3 calls:

    - put            → PutObject (atomic whole-object replace)
    - put_if_absent  → PutObject + ``IfNoneMatch="*"`` (the conditional
                       write S3 supports natively since 2024-08; a 412
                       PreconditionFailed / 409 means another committer
                       won the claim)
    - read/exists/mtime/size → GetObject / HeadObject
    - list           → ListObjectsV2, paginated
    - delete         → DeleteObject
    - promote        → upload_file + local unlink (no atomicity needed:
                       visibility is manifest-driven, commits happen
                       after promote returns)

    Reference parity: the reference's tables live on exactly this kind
    of store (/root/reference/fupi/utils.py:16 — S3/MinIO/R2 via
    storage options). Spark reads/writes data-file CONTENT through its
    own s3a layer; this class carries only metadata/commit traffic.
    Exercised by tests/test_storage.py against a real bucket when
    FUPI_S3_BUCKET (+ credentials) is set; the commit-protocol logic it
    relies on is proven against ObjectStoreStorage either way.
    """

    atomic_rename = False

    def __init__(self, bucket: str, prefix: str = "", client=None):
        import boto3  # guarded: only this constructor needs it

        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.client = client or boto3.client("s3")
        self.root = f"s3://{bucket}/{self.prefix}"

    def _key(self, rel: str) -> str:
        return f"{self.prefix}/{rel}" if self.prefix else rel

    def put(self, rel: str, data: bytes) -> None:
        self.client.put_object(Bucket=self.bucket, Key=self._key(rel), Body=data)

    @staticmethod
    def _err_info(e) -> tuple[int | None, str]:
        resp = getattr(e, "response", None) or {}
        status = resp.get("ResponseMetadata", {}).get("HTTPStatusCode")
        code = resp.get("Error", {}).get("Code", "")
        return status, code

    @classmethod
    def _is_missing(cls, e) -> bool:
        """True ONLY for a definitive not-found — a transient 403/500/
        throttle must NOT read as 'object missing' (expire/GC built on
        exists/mtime would misclassify live objects as absent)."""
        status, code = cls._err_info(e)
        return status == 404 or code in ("404", "NoSuchKey", "NotFound")

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        try:
            self.client.put_object(
                Bucket=self.bucket, Key=self._key(rel), Body=data, IfNoneMatch="*"
            )
            return True
        except self.client.exceptions.ClientError as e:
            # a LOST CLAIM is only a conditional-write conflict: S3
            # proper returns 412 PreconditionFailed; some
            # implementations return 409 ConditionalRequestConflict
            # during concurrent conditional writes. Anything else
            # (throttle, 5xx, auth) must surface, not read as 'lost'.
            status, code = self._err_info(e)
            if status in (409, 412) or code in (
                "PreconditionFailed",
                "ConditionalRequestConflict",
            ):
                return False
            raise

    def read(self, rel: str) -> bytes:
        return self.client.get_object(Bucket=self.bucket, Key=self._key(rel))[
            "Body"
        ].read()

    def _head(self, rel: str) -> dict:
        return self.client.head_object(Bucket=self.bucket, Key=self._key(rel))

    def exists(self, rel: str) -> bool:
        try:
            self._head(rel)
            return True
        except self.client.exceptions.ClientError as e:
            if self._is_missing(e):
                return False
            raise  # transient 403/500/throttle is NOT 'missing'

    def mtime(self, rel: str) -> float:
        try:
            return self._head(rel)["LastModified"].timestamp()
        except self.client.exceptions.ClientError as e:
            if self._is_missing(e):
                raise FileNotFoundError(rel)
            raise

    def size(self, rel: str) -> int:
        return int(self._head(rel)["ContentLength"])

    def list(self, prefix: str) -> list[str]:
        key_prefix = self._key(prefix.rstrip("/") + "/")
        out = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket, Prefix=key_prefix):
            for obj in page.get("Contents", []):
                k = obj["Key"]
                out.append(k[len(self.prefix) + 1 :] if self.prefix else k)
        return sorted(out)

    def delete(self, rel: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=self._key(rel))

    def delete_prefix(self, prefix: str) -> None:
        for rel in self.list(prefix):
            self.delete(rel)

    def promote(self, local_file: str, rel: str) -> None:
        self.client.upload_file(local_file, self.bucket, self._key(rel))
        os.unlink(local_file)

    def ensure_dir(self, prefix: str) -> None:
        pass  # object stores have no directories

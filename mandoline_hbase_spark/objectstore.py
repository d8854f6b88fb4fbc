"""Object-store conditional-put backend: the cluster form of the CAS seam.

The commit protocol (``storage.reserve_version_id`` /
``commit_version_row`` / ``retention_floor``) reduces every atomic claim
to a backend with four operations — put-if-absent, get, exists, delete —
plus an unconditional put and a prefix list. ``LocalFSCasBackend``
implements them with ``O_CREAT|O_EXCL`` name claims (single box);
``S3CasBackend`` here implements the same contract against the S3 API,
where the atomicity primitive is a conditional PUT with
``If-None-Match: *`` — the store answers 200 to exactly one concurrent
writer and ``412 Precondition Failed`` to every other. That is the
"many drivers, one bucket" form of the reference's ``check-and-put``
commit (hbase.clj:241-248): HBase's checkAndPut(row, family, qualifier,
expected=None, put) is precisely put-if-absent on a key.

S3 has supported ``If-None-Match: *`` on PutObject since 2024 (GCS:
``x-goog-if-generation-match: 0``; Azure Blob: ``If-None-Match: *`` —
all three satisfy this contract); conditional writes are also the
primitive Delta/Iceberg single-table commits use on object storage.

The adapter takes the CLIENT as a constructor argument instead of
importing an SDK: any object with the boto3 S3 client's method subset
(``put_object`` / ``get_object`` / ``head_object`` / ``delete_object``
/ ``list_objects_v2``) works, so a real ``boto3.client("s3")`` drops in
unchanged where boto3 exists, and the protocol is testable hermetically
with :class:`FakeS3Client` (full request/response semantics — 412 on a
lost conditional put, NoSuchKey/404 on misses, truncated listings with
continuation tokens — with cross-process atomicity, so the real-OS
multiprocess commit scenarios run through the adapter).
"""

from __future__ import annotations

import os
import posixpath

from mandoline_hbase_spark.errors import StorageError

__all__ = ["S3CasBackend", "FakeS3Client", "S3ClientError"]


def _error_code(exc: Exception) -> str:
    """The S3 error code of a client exception, duck-typed off the
    botocore ``ClientError`` shape (``exc.response["Error"]["Code"]``,
    with the HTTP status as fallback) so the adapter never imports an
    SDK. Unknown shapes map to "" and are re-raised by callers."""
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return ""
    code = str((resp.get("Error") or {}).get("Code") or "")
    if code:
        return code
    status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
    return str(status) if status is not None else ""


_PRECONDITION = {"PreconditionFailed", "412"}
_MISSING = {"NoSuchKey", "404", "NotFound"}


class S3CasBackend:
    """Conditional puts against an S3-compatible bucket.

    Filesystem-style paths under ``root`` (the prefix the backend is
    registered for with ``storage.register_cas_backend``) map to object
    keys ``key_prefix + relpath`` in ``bucket``; a path outside ``root``
    raises, because silently misrouting a claim would break the
    exactly-once commit.

    ``mirror_to_fs=True`` (default) keeps the write-through discipline
    of the in-memory fake: winning objects are mirrored to the local
    path AFTER the store awards the claim (a plain write, never a
    race), so directory-scanning readers (pyarrow/Spark parquet over
    the dataset dir) see committed rows; and a store MISS consults the
    filesystem, so objects that predate backend registration (committed
    version rows, the retention floor) cannot be re-won. On a real
    cluster whose readers resolve ``s3://`` URIs directly, pass
    ``mirror_to_fs=False`` — the bucket is then the only truth.
    """

    def __init__(
        self,
        bucket: str,
        client,
        root: str,
        key_prefix: str = "",
        mirror_to_fs: bool = True,
    ):
        from mandoline_hbase_spark.storage import LocalFSCasBackend

        self._bucket = bucket
        self._client = client
        self._root = os.path.abspath(root)
        self._key_prefix = key_prefix.strip("/")
        self._mirror = mirror_to_fs
        self._fs = LocalFSCasBackend()

    def _key(self, path: str) -> str:
        rel = os.path.relpath(os.path.abspath(path), self._root)
        if rel.startswith(".."):
            raise StorageError(
                f"path {path!r} is outside this backend's root {self._root!r}"
            )
        rel = "" if rel == "." else rel.replace(os.sep, "/")
        return posixpath.join(self._key_prefix, rel) if self._key_prefix else rel

    # -- the four CAS operations + put + list --------------------------------

    def put_if_absent(self, path: str, data: bytes) -> bool:
        if self._mirror and self._fs.exists(path) and not self._head(self._key(path)):
            # pre-registration object: an existing claim, not ours to re-win
            return False
        try:
            self._client.put_object(
                Bucket=self._bucket, Key=self._key(path), Body=data, IfNoneMatch="*"
            )
        except Exception as exc:
            if _error_code(exc) in _PRECONDITION:
                return False
            raise
        if self._mirror:
            self._fs.put(path, data)
        return True

    def put(self, path: str, data: bytes) -> None:
        self._client.put_object(Bucket=self._bucket, Key=self._key(path), Body=data)
        if self._mirror:
            self._fs.put(path, data)

    def get(self, path: str) -> bytes | None:
        try:
            resp = self._client.get_object(Bucket=self._bucket, Key=self._key(path))
        except Exception as exc:
            if _error_code(exc) in _MISSING:
                return self._fs.get(path) if self._mirror else None
            raise
        body = resp["Body"]
        return body.read() if hasattr(body, "read") else bytes(body)

    def _head_resp(self, key: str) -> dict | None:
        try:
            return self._client.head_object(Bucket=self._bucket, Key=key)
        except Exception as exc:
            if _error_code(exc) in _MISSING:
                return None
            raise

    def _head(self, key: str) -> bool:
        return self._head_resp(key) is not None

    def exists(self, path: str) -> bool:
        if self._head(self._key(path)):
            return True
        return self._mirror and self._fs.exists(path)

    def delete(self, path: str) -> None:
        self._client.delete_object(Bucket=self._bucket, Key=self._key(path))
        if self._mirror:
            self._fs.delete(path)

    def compare_and_delete(self, path: str, expected: bytes) -> bool:
        """Conditional DELETE: ``DeleteObject`` with ``If-Match`` on the
        ETag of ``expected``. The store — not this client — evaluates
        the precondition, which is what makes the lease's steal/release
        fenced on a real bucket: a rival's fresh lease has a different
        ETag and survives with a 412. 412 (mismatch) → False; 404 with
        a mirrored pre-registration object → the local conditional
        delete decides. True iff this call removed the object.

        DEPLOYMENT REQUIREMENTS (both verifiable up front, neither
        silently degradable): (1) the bucket must support ``If-Match``
        on DeleteObject — S3 directory buckets, GCS
        (``if-generation-match`` via interop), Azure Blob, MinIO do; a
        store that REJECTS the header surfaces here as a loud
        ``StorageError`` naming the gap (never an unconditional
        delete), and a store that silently IGNORES it would reopen the
        unfenced window — verify with a two-client probe before
        trusting steals. (2) the lease object's ETag must equal the MD5
        of its body: true for the single-part unencrypted PUTs this
        backend issues, NOT true under bucket-default SSE-KMS — there
        every compare fails 412, which is the SAFE failure (a lease is
        never deleted; stale-break wedges until the operator clears the
        lease key or moves the lease prefix off KMS)."""
        import hashlib

        etag = f'"{hashlib.md5(expected).hexdigest()}"'
        try:
            self._client.delete_object(
                Bucket=self._bucket, Key=self._key(path), IfMatch=etag
            )
        except Exception as exc:
            code = _error_code(exc)
            if code in _PRECONDITION:
                return False
            if code in _MISSING:
                return self._fs.compare_and_delete(path, expected) if self._mirror else False
            if code in ("NotImplemented", "InvalidRequest", "InvalidArgument", "501", "400"):
                raise StorageError(
                    f"bucket {self._bucket!r} rejected DeleteObject+If-Match "
                    f"({code}): this store cannot serve the lease's "
                    "conditional-delete leg — see "
                    "S3CasBackend.compare_and_delete's deployment notes"
                ) from exc
            raise
        if self._mirror:
            self._fs.delete(path)
        return True

    def mtime(self, path: str) -> float | None:
        """Bucket-side ``LastModified`` (epoch seconds) — ONE clock for
        every writer, so lease staleness does not compare the holder's
        wall clock against the breaker's. Falls back to the mirror for
        pre-registration objects."""
        resp = self._head_resp(self._key(path))
        if resp is not None:
            lm = resp.get("LastModified")
            if lm is None:
                return None
            return lm.timestamp() if hasattr(lm, "timestamp") else float(lm)
        return self._fs.mtime(path) if self._mirror else None

    def list_names(self, dir_path: str, name_prefix: str) -> list[str]:
        prefix = posixpath.join(self._key(dir_path), name_prefix)
        names: set[str] = set()
        token = None
        while True:
            kwargs = {"Bucket": self._bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self._client.list_objects_v2(**kwargs)
            for obj in resp.get("Contents") or []:
                tail = obj["Key"].rsplit("/", 1)[-1]
                if tail.startswith(name_prefix):
                    names.add(tail)
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        if self._mirror:
            names.update(self._fs.list_names(dir_path, name_prefix))
        return sorted(names)

    @classmethod
    def from_boto3(cls, bucket: str, root: str, key_prefix: str = "", **kwargs):
        """Construct over a real ``boto3.client("s3")`` where boto3 is
        installed (it is not baked into this environment — the client
        protocol is what the adapter depends on, not the SDK)."""
        try:
            import boto3  # type: ignore
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise StorageError(
                "boto3 is not installed; construct S3CasBackend with an "
                "explicit client implementing put_object/get_object/"
                "head_object/delete_object/list_objects_v2"
            ) from exc
        return cls(bucket, boto3.client("s3"), root, key_prefix, **kwargs)


class S3ClientError(Exception):
    """botocore.ClientError shape: carries ``.response`` with
    ``Error.Code`` + ``ResponseMetadata.HTTPStatusCode``."""

    def __init__(self, code: str, status: int, op: str):
        super().__init__(f"An error occurred ({code}) when calling {op}")
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    """Hermetic S3 client fake with REAL conditional-write semantics.

    State lives under ``store_dir`` (one file per object key), so the
    fake is shared across OS PROCESSES: concurrent committers in
    different interpreters exercise the full request/response protocol
    (``IfNoneMatch="*"`` → exactly one 200, losers get 412
    ``PreconditionFailed``; misses raise ``NoSuchKey``; listings
    truncate at ``page_size`` with continuation tokens like a 1000-key
    S3 page). The atomicity inside the fake store is an ``O_EXCL`` name
    claim — playing the role S3's internal compare-and-set plays — but
    everything ABOVE the wire surface (error mapping, pagination,
    retry-on-412) is exactly what a real bucket serves, which is what
    the adapter and the commit protocol are being tested against.
    """

    def __init__(self, store_dir: str, page_size: int = 1000):
        self._dir = os.path.abspath(store_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._page = int(page_size)

    def _obj_path(self, key: str) -> str:
        # keys are hex/word-safe in this engine; keep slashes as dirs
        p = os.path.join(self._dir, *key.split("/"))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def put_object(self, Bucket: str, Key: str, Body: bytes, IfNoneMatch: str | None = None):
        p = self._obj_path(Key)
        if IfNoneMatch == "*":
            import uuid

            tmp = os.path.join(os.path.dirname(p), f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "wb") as f:
                f.write(Body)
            try:
                os.link(tmp, p)
            except FileExistsError:
                raise S3ClientError("PreconditionFailed", 412, "PutObject")
            finally:
                os.unlink(tmp)
        else:
            import uuid

            tmp = os.path.join(os.path.dirname(p), f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "wb") as f:
                f.write(Body)
            os.replace(tmp, p)
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}

    def get_object(self, Bucket: str, Key: str):
        try:
            with open(self._obj_path(Key), "rb") as f:
                data = f.read()
        except FileNotFoundError:
            raise S3ClientError("NoSuchKey", 404, "GetObject")
        import io

        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket: str, Key: str):
        import datetime

        try:
            st = os.stat(self._obj_path(Key))
        except FileNotFoundError:
            raise S3ClientError("404", 404, "HeadObject")
        return {
            "ResponseMetadata": {"HTTPStatusCode": 200},
            "LastModified": datetime.datetime.fromtimestamp(
                st.st_mtime, datetime.timezone.utc
            ),
            "ContentLength": st.st_size,
        }

    def delete_object(self, Bucket: str, Key: str, IfMatch: str | None = None):
        p = self._obj_path(Key)
        if IfMatch is None:
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass  # S3 DeleteObject is 204 on missing keys
            return {"ResponseMetadata": {"HTTPStatusCode": 204}}
        # conditional DELETE: the precondition is evaluated IN THE STORE
        # against the object's ETag (hex MD5 for single-part puts), and
        # the compare+unlink pair is fenced exactly like S3's internal
        # compare-and-set — a concurrent re-claim between the breaker's
        # read and its delete answers 412, never removes the fresh object
        import hashlib

        from mandoline_hbase_spark.storage import _fenced_compare_unlink

        want = IfMatch.strip('"')
        outcome = _fenced_compare_unlink(
            p, lambda data: hashlib.md5(data).hexdigest() == want
        )
        if outcome == "missing":
            raise S3ClientError("NoSuchKey", 404, "DeleteObject")
        if outcome == "mismatch":
            raise S3ClientError("PreconditionFailed", 412, "DeleteObject")
        return {"ResponseMetadata": {"HTTPStatusCode": 204}}

    def list_objects_v2(
        self, Bucket: str, Prefix: str = "", ContinuationToken: str | None = None
    ):
        all_keys = []
        for root, _dirs, files in os.walk(self._dir):
            for f in files:
                if f.startswith(".tmp-"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), self._dir)
                key = rel.replace(os.sep, "/")
                if key.startswith(Prefix):
                    all_keys.append(key)
        all_keys.sort()
        start = 0
        if ContinuationToken:
            # token = last key served; resume strictly after it
            import bisect

            start = bisect.bisect_right(all_keys, ContinuationToken)
        page = all_keys[start : start + self._page]
        truncated = start + self._page < len(all_keys)
        resp: dict = {
            "Contents": [{"Key": k} for k in page],
            "KeyCount": len(page),
            "IsTruncated": truncated,
        }
        if truncated and page:
            resp["NextContinuationToken"] = page[-1]
        return resp

"""Low-level physical storage: append-only parquet log tables + a lock.

Each dataset is three directories of parquet files (``chunks``, ``indices``,
``versions``) — the Spark-native re-expression of the reference's three
HBase tables (hbase.clj:30-35). Writes are append-only file adds (the
log-structured-merge idea HBase itself uses); mutation semantics
(ref-count updates, index CAS) are expressed as log records resolved at
read time:

- ``chunks``:   ``chunk_id, ref_delta, data`` — ref-count = SUM(ref_delta)
  per id (merge-on-read; fixes the reference's non-atomic read-modify-write,
  hbase.clj:156-172); ``data`` is NULL on pure ref-delta records.
- ``indices``:  ``var_name, coord_id, coord, version_id, chunk_id, seq`` —
  current value of an index key = the max-``seq`` record for
  ``(var_name, coord_id, version_id)``.
- ``versions``: ``version_id, committed_at, metadata`` — the linear commit
  log (hbase.clj:26-28); a write is visible only after its version row
  lands (§3.2 of SURVEY.md).

Point reads (the real-time path, explicitly non-Spark per the project's
north star) use pyarrow dataset scans with pushed-down filters; analytic
reads load the same directories with ``spark.read.parquet``. At cluster
scale these directories live on object storage and the appends become
distributed Spark writes; the schemas and read resolution are unchanged.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string(), nullable=False),
        pa.field("ref_delta", pa.int64(), nullable=False),
        pa.field("data", pa.binary(), nullable=True),
    ]
)

INDICES_SCHEMA = pa.schema(
    [
        pa.field("var_name", pa.string(), nullable=False),
        pa.field("coord_id", pa.string(), nullable=False),
        pa.field("coord", pa.list_(pa.int64()), nullable=False),
        pa.field("version_id", pa.int64(), nullable=False),
        pa.field("chunk_id", pa.string(), nullable=True),
        pa.field("seq", pa.int64(), nullable=False),
    ]
)

VERSIONS_SCHEMA = pa.schema(
    [
        pa.field("version_id", pa.int64(), nullable=False),
        pa.field("committed_at", pa.timestamp("ms", tz="UTC"), nullable=False),
        pa.field("metadata", pa.string(), nullable=False),
    ]
)

TABLE_SCHEMAS = {"chunks": CHUNKS_SCHEMA, "indices": INDICES_SCHEMA, "versions": VERSIONS_SCHEMA}
TABLE_NAMES = ("chunks", "indices", "versions")

# Spark-side schemas for the same directories (explicit so empty tables read
# cleanly and so the scan never pays schema inference).
SPARK_DDL = {
    "chunks": "chunk_id string, ref_delta bigint, data binary",
    "indices": "var_name string, coord_id string, coord array<bigint>, version_id bigint, chunk_id string, seq bigint",
    "versions": "version_id bigint, committed_at timestamp, metadata string",
}


def append_rows(table_dir: str, schema: pa.Schema, rows: list[dict]) -> str:
    """Append one parquet file of ``rows`` to the log directory."""
    table = pa.Table.from_pylist(rows, schema=schema)
    path = os.path.join(table_dir, f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(table, path)
    return path


def append_table(table_dir: str, table: pa.Table) -> str:
    path = os.path.join(table_dir, f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(table, path)
    return path


def scan(table_dir: str, schema: pa.Schema, filter=None, columns=None) -> pa.Table:
    """Point/range read with pushed-down filter (the non-Spark path)."""
    dataset = pa_ds.dataset(table_dir, format="parquet", schema=schema)
    return dataset.to_table(filter=filter, columns=columns)


@contextmanager
def dataset_lock(dataset_dir: str, timeout_s: float = 30.0):
    """Cross-process/thread mutual exclusion for read-modify-write sections.

    The COMMIT itself no longer depends on this lock: version ids are
    claimed by conditional put (``reserve_version_id`` before distributed
    writes, ``commit_version_row`` at the commit point), which serializes
    committers on any storage with an if-none-match primitive. The lock
    remains for sections that must read-then-rewrite shared state
    atomically — slab updates (read base chunks, merge, write), index CAS
    (compare current value, then append — the reference's check-and-put,
    hbase.clj:241-245), and maintenance rewrites — where it is the
    local-mode stand-in for a coordinator lease or single-writer
    maintenance scheduling.
    """
    lock_path = os.path.join(dataset_dir, "_lock")
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(f"could not acquire dataset lock at {lock_path}")
            time.sleep(0.005)
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock_path)
        except FileNotFoundError:
            pass


# --- Conditional-put backends ------------------------------------------------
#
# Every claim in the commit protocol (version-id reservation markers, the
# commit-point version row, the retention floor) reduces to FOUR object
# operations: put-if-absent, get, exists, delete (+ an unconditional put
# and a prefix list; the lease additionally uses the conditional-DELETE
# leg ``compare_and_delete`` — If-Match — and store-side ``mtime`` for
# holder-clock-independent staleness). ``LocalFSCasBackend`` implements them with
# ``O_CREAT|O_EXCL``/``link(2)`` — the single-box form. An object-store
# deployment registers a backend implementing the same four calls with
# ``If-None-Match: *`` conditional PUTs (S3/GCS/ABS all support this) or
# a DynamoDB-style conditional write; NOTHING above this seam changes —
# reserve_version_id / commit_version_row / retention_floor are the only
# functions that touch it. ``InMemoryCasBackend`` is the reference fake
# for that contract: the atomicity decision lives in the store (a locked
# key set), not the filesystem, exactly as it would on a bucket.


def _fenced_compare_unlink(path: str, matches) -> str:
    """Conditional DELETE on the local filesystem: unlink ``path`` iff
    ``matches(content)``. Returns ``"deleted"`` / ``"mismatch"`` /
    ``"missing"``.

    Atomicity: rival conditional deleters serialize on an exclusive
    ``flock`` of the inode currently at the name; after acquiring, the
    name is re-checked to still reference the locked inode (a rival may
    have deleted it — and a writer re-claimed the name — while we
    waited). While the lock is held and the name still points at our
    inode, the name cannot change underneath us: conditional creates
    (``O_EXCL``/``link``) fail while the name is present, and rival
    conditional deleters block on the lock. The fence therefore holds
    against every CONDITIONAL mutator; an unconditional ``put``/
    ``delete`` on the same path is outside it (the lease protocol never
    issues one). Single-box semantics — advisory locks; do not trust
    over NFS."""
    import fcntl

    while True:
        try:
            fd = os.open(path, os.O_RDONLY)
        except FileNotFoundError:
            return "missing"
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            try:
                if os.stat(path).st_ino != os.fstat(fd).st_ino:
                    continue  # displaced while waiting: examine the new claim
            except FileNotFoundError:
                return "missing"
            with open(fd, "rb", closefd=False) as f:
                data = f.read()
            if not matches(data):
                return "mismatch"
            os.unlink(path)
            return "deleted"
        finally:
            os.close(fd)


class LocalFSCasBackend:
    """Conditional puts via the local filesystem's atomic name claims."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # EEXIST iff the name is already claimed
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def put(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def compare_and_delete(self, path: str, expected: bytes) -> bool:
        """Delete ``path`` iff its current content is exactly
        ``expected`` — the conditional-DELETE (``If-Match``) leg of the
        CAS contract, the seam the lease's steal/release paths fence
        on. True iff this call removed the object."""
        return _fenced_compare_unlink(path, lambda data: data == expected) == "deleted"

    def mtime(self, path: str) -> float | None:
        """Store-side last-modified time (epoch seconds), or None if
        absent. The filesystem's clock, not the writer's — lease
        staleness derives age from this so a holder with a skewed clock
        cannot look artificially old (or forever-fresh)."""
        try:
            return os.stat(path).st_mtime
        except FileNotFoundError:
            return None

    def list_names(self, dir_path: str, name_prefix: str) -> list[str]:
        try:
            return [f for f in os.listdir(dir_path) if f.startswith(name_prefix)]
        except FileNotFoundError:
            return []


class InMemoryCasBackend:
    """If-None-Match fake: conditional-put decisions happen in the store
    (a locked in-process key map), never via filesystem name races —
    the semantics of ``PUT If-None-Match: *`` against a bucket.

    ``write_through=True`` (default) mirrors winning objects onto the
    real filesystem so directory-scanning readers (pyarrow/Spark) see
    committed rows; the mirror happens only AFTER the store awarded the
    claim, so it is a plain write, never a race. In this mode the
    filesystem is also consulted on a store MISS: objects that predate
    ``register_cas_backend`` (committed version rows, the retention
    floor, reservation markers) are committed state, and a fake that
    cannot see them would let ``put_if_absent`` re-win an
    already-committed id and overwrite the real commit file. With
    ``write_through=False`` the store is the only truth (a blank
    bucket) — callers must register the backend before the dataset
    directory holds any objects.
    """

    def __init__(self, write_through: bool = True):
        import threading

        self._lock = threading.Lock()
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._write_through = write_through
        self._fs = LocalFSCasBackend()

    def put_if_absent(self, path: str, data: bytes) -> bool:
        import time

        with self._lock:
            if path in self._objects:
                return False
            if self._write_through and self._fs.exists(path):
                # pre-registration object: an existing claim, not ours to re-win
                return False
            self._objects[path] = data
            self._mtimes[path] = time.time()
        if self._write_through:
            self._fs.put(path, data)
        return True

    def put(self, path: str, data: bytes) -> None:
        import time

        with self._lock:
            self._objects[path] = data
            self._mtimes[path] = time.time()
        if self._write_through:
            self._fs.put(path, data)

    def get(self, path: str) -> bytes | None:
        with self._lock:
            if path in self._objects:
                return self._objects[path]
        return self._fs.get(path) if self._write_through else None

    def exists(self, path: str) -> bool:
        with self._lock:
            if path in self._objects:
                return True
        return self._write_through and self._fs.exists(path)

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(path, None)
            self._mtimes.pop(path, None)
        if self._write_through:
            self._fs.delete(path)

    def compare_and_delete(self, path: str, expected: bytes) -> bool:
        """Conditional DELETE: the compare and the removal happen under
        the store's lock in one step — the If-Match semantics a bucket
        serves. True iff this call removed the object."""
        with self._lock:
            if path in self._objects:
                if self._objects[path] != expected:
                    return False
                del self._objects[path]
                self._mtimes.pop(path, None)
                hit = True
            else:
                hit = False
        if hit:
            if self._write_through:
                self._fs.delete(path)  # mirror of a claim the store just settled
            return True
        # store miss: a pre-registration object may live on the mirror
        return self._write_through and self._fs.compare_and_delete(path, expected)

    def mtime(self, path: str) -> float | None:
        """Store-side last-modified time (the store's clock, not the
        writer's); falls back to the mirror for pre-registration
        objects."""
        with self._lock:
            if path in self._mtimes:
                return self._mtimes[path]
        return self._fs.mtime(path) if self._write_through else None

    def list_names(self, dir_path: str, name_prefix: str) -> list[str]:
        want = os.path.join(dir_path, name_prefix)
        with self._lock:
            names = {os.path.basename(p) for p in self._objects if p.startswith(want)}
        if self._write_through:
            names.update(self._fs.list_names(dir_path, name_prefix))
        return sorted(names)


_DEFAULT_CAS_BACKEND = LocalFSCasBackend()
_CAS_BACKENDS: list[tuple[str, object]] = []


def register_cas_backend(path_prefix: str, backend) -> None:
    """Route conditional-put operations for paths under ``path_prefix``
    through ``backend`` (longest prefix wins; default local FS)."""
    _CAS_BACKENDS.append((path_prefix, backend))
    _CAS_BACKENDS.sort(key=lambda kv: -len(kv[0]))


def unregister_cas_backend(path_prefix: str) -> None:
    _CAS_BACKENDS[:] = [kv for kv in _CAS_BACKENDS if kv[0] != path_prefix]


def cas_backend_for(path: str):
    for prefix, backend in _CAS_BACKENDS:
        if path.startswith(prefix):
            return backend
    return _DEFAULT_CAS_BACKEND


def commit_version_row(versions_dir: str, version_id: int, rows: list[dict]) -> bool:
    """Conditional append of THE version row — the commit point, made an
    atomic claim of ``version_id``.

    The serialized row is conditionally put onto ``commit-{id}.parquet``
    through the dataset's CAS backend (local FS: hard-link with EEXIST;
    object store: ``If-None-Match: *``), so exactly one committer can
    ever own a version id. Returns False on conflict; the caller
    re-reads the latest committed state, re-merges its metadata, and
    retries with a fresh id (optimistic commit), or raises if the id was
    reserved (a reserved id can only conflict through a protocol
    violation).
    """
    floor = retention_floor(versions_dir)
    if floor is not None and int(version_id) < floor:
        # a replay of a pruned id must NOT resurrect it (retention wrote
        # the floor marker when it dropped the id's row)
        return False
    table = pa.Table.from_pylist(rows, schema=VERSIONS_SCHEMA)
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink)
    final = os.path.join(versions_dir, f"commit-{int(version_id):020d}.parquet")
    return cas_backend_for(versions_dir).put_if_absent(final, sink.getvalue().to_pybytes())


def retention_floor(versions_dir: str) -> int | None:
    """Oldest version id retention has NOT pruned (None = never pruned).
    Written by maintenance.prune_versions; consulted by the commit and
    reservation claims so pruned ids can never be re-claimed."""
    data = cas_backend_for(versions_dir).get(os.path.join(versions_dir, ".pruned-floor"))
    if data is None:
        return None
    try:
        return int(data.decode().strip())
    except ValueError:
        return None


def set_retention_floor(versions_dir: str, floor: int) -> None:
    cas_backend_for(versions_dir).put(
        os.path.join(versions_dir, ".pruned-floor"), str(int(floor)).encode()
    )


def reservation_held(versions_dir: str, version_id: int) -> bool:
    """True while the ``.reserved-<id>`` marker exists. Committers of
    reserved ids check this immediately before the version-row claim: a
    missing marker means the failed-commit sweeper decided the job was
    dead and reclaimed its executor-written rows — committing would
    publish a version whose data is gone, so the caller must abort
    loudly instead."""
    return cas_backend_for(versions_dir).exists(
        os.path.join(versions_dir, f".reserved-{int(version_id)}")
    )


def committed_version_row(versions_dir: str, version_id: int):
    """The committed row for ``version_id`` if present (for idempotent
    replay detection), else None."""
    path = os.path.join(versions_dir, f"commit-{int(version_id):020d}.parquet")
    data = cas_backend_for(versions_dir).get(path)
    if data is None:
        return None
    return pq.read_table(pa.BufferReader(data)).to_pylist()[0]


def reserve_version_id(versions_dir: str, candidate: int) -> int:
    """Atomically claim a version id >= ``candidate`` for an in-flight commit.

    Creates an exclusive ``.reserved-<id>`` marker in the versions
    directory (dot-prefixed: ignored by both pyarrow dataset discovery and
    Spark's parquet reader). ``O_CREAT|O_EXCL`` is the local-mode form of
    an object store's if-none-match conditional put — the primitive a
    cluster deployment swaps in — so two concurrent reservers can never
    obtain the same id; the loser bumps to the next id and retries.

    Reserving up-front (rather than allocating inside the commit lock, as
    driver-side writes do) is what lets executors bake the version id into
    distributed index/chunk appends without holding any lock across the
    job. A crashed job leaves only the marker plus rows tagged with a
    version that never reaches the versions table — invisible to every
    read, reclaimed by ``maintenance.sweep_failed_commits``.
    """
    v = int(candidate)
    floor = retention_floor(versions_dir)
    if floor is not None:
        v = max(v, floor)
    backend = cas_backend_for(versions_dir)
    while True:
        marker = os.path.join(versions_dir, f".reserved-{v}")
        # payload = creation time, so sweep age checks go through the
        # backend's get() instead of os.stat on a local path (a pure
        # object-store backend has no local file to stat)
        if not backend.put_if_absent(marker, repr(time.time()).encode("ascii")):
            v += 1
            continue
        # The marker is the PRIMARY claim, but a commit racing on this id
        # may have put its commit object between our candidate read and
        # the marker claim (the two names are separate atomic
        # primitives). Since every committer now takes a marker BEFORE
        # the commit put (engine.write_version), seeing a commit object
        # here means the id is gone for good: release and bump.
        if backend.exists(os.path.join(versions_dir, f"commit-{v:020d}.parquet")):
            release_version_reservation(versions_dir, v)
            v += 1
            continue
        return v


def reservation_created_at(versions_dir: str, version_id: int) -> float | None:
    """Creation time (epoch seconds) of a ``.reserved-<id>`` marker, read
    through the CAS backend so it works on pure object-store backends.

    Returns None when the marker no longer exists. A legacy marker with
    an empty/unparseable payload falls back to ``os.stat`` mtime; if no
    local file exists either, returns ``+inf`` ("just created") so the
    sweeper PROTECTS unknown-age reservations instead of reclaiming rows
    a live job may still reference.
    """
    marker = os.path.join(versions_dir, f".reserved-{int(version_id)}")
    data = cas_backend_for(versions_dir).get(marker)
    if data is None:
        return None
    try:
        return float(data)
    except ValueError:
        pass
    try:
        return os.stat(marker).st_mtime
    except OSError:
        return float("inf")


def release_version_reservation(versions_dir: str, version_id: int) -> None:
    cas_backend_for(versions_dir).delete(
        os.path.join(versions_dir, f".reserved-{int(version_id)}")
    )


def reserved_version_ids(versions_dir: str) -> list[int]:
    """Ids of in-flight (reserved, uncommitted) versions."""
    out = []
    for f in cas_backend_for(versions_dir).list_names(versions_dir, ".reserved-"):
        try:
            out.append(int(f[len(".reserved-") :]))
        except ValueError:
            continue
    return out


_SEQ_STATE = {"last": 0}


def next_seq() -> int:
    """Strictly monotonic sequence number (process-local)."""
    now = time.time_ns()
    if now <= _SEQ_STATE["last"]:
        now = _SEQ_STATE["last"] + 1
    _SEQ_STATE["last"] = now
    return now

"""S3-style conditional-put adapter behind the CAS seam.

The reference's commit primitive is HBase check-and-put
(hbase.clj:241-248); the cluster form here is a conditional PUT with
``If-None-Match: *`` against a bucket. These tests drive the adapter
through the full request/response protocol of an S3-compatible store
(``FakeS3Client``: 412 on lost conditional puts, NoSuchKey on misses,
truncated listings with continuation tokens, cross-process atomicity)
— the commit-protocol and real-OS-multiprocess scenarios run with the
bucket as the only atomicity source.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mandoline_hbase_spark import storage
from mandoline_hbase_spark.engine import mk_schema
from mandoline_hbase_spark.errors import StorageError
from mandoline_hbase_spark.objectstore import FakeS3Client, S3CasBackend, S3ClientError


@pytest.fixture
def s3_env(tmp_path):
    """An S3CasBackend over a FakeS3Client, registered for tmp_path."""
    store = str(tmp_path / "_bucket")
    backend = S3CasBackend("test-bucket", FakeS3Client(store), root=str(tmp_path))
    storage.register_cas_backend(str(tmp_path), backend)
    yield backend
    storage.unregister_cas_backend(str(tmp_path))


def test_conditional_put_contract(tmp_path, s3_env):
    p = str(tmp_path / "commit-001")
    assert s3_env.put_if_absent(p, b"winner") is True
    assert s3_env.put_if_absent(p, b"loser") is False  # 412 -> False
    assert s3_env.get(p) == b"winner"
    assert s3_env.exists(p) is True
    s3_env.delete(p)
    assert s3_env.exists(p) is False and s3_env.get(p) is None
    # delete of a missing key is a no-op (S3 204), and the name reopens
    s3_env.delete(p)
    assert s3_env.put_if_absent(p, b"second-claim") is True


def test_listing_paginates_with_continuation_tokens(tmp_path):
    store = str(tmp_path / "_bucket")
    backend = S3CasBackend(
        "b", FakeS3Client(store, page_size=2), root=str(tmp_path), mirror_to_fs=False
    )
    vdir = str(tmp_path / "versions")
    os.makedirs(vdir)
    for i in range(7):
        assert backend.put_if_absent(os.path.join(vdir, f".reserved-{i}"), b"t")
    backend.put(os.path.join(vdir, "unrelated"), b"x")
    names = backend.list_names(vdir, ".reserved-")
    assert names == sorted(f".reserved-{i}" for i in range(7))


def test_path_outside_root_is_refused(tmp_path):
    backend = S3CasBackend(
        "b", FakeS3Client(str(tmp_path / "_bucket")), root=str(tmp_path / "root")
    )
    with pytest.raises(StorageError):
        backend.put_if_absent(str(tmp_path / "elsewhere" / "k"), b"x")


def test_error_shape_matches_botocore():
    err = S3ClientError("PreconditionFailed", 412, "PutObject")
    assert err.response["Error"]["Code"] == "PreconditionFailed"
    assert err.response["ResponseMetadata"]["HTTPStatusCode"] == 412


def test_pre_registration_objects_not_rewinnable(tmp_path):
    """Mirror mode: a commit file written before the backend was
    registered is committed state — the adapter must refuse to re-win
    it (the same corruption the in-memory fake guards against)."""
    pre = tmp_path / "commit-00000000000000000001.parquet"
    pre.write_bytes(b"committed-by-an-earlier-driver")
    backend = S3CasBackend(
        "b", FakeS3Client(str(tmp_path / "_bucket")), root=str(tmp_path)
    )
    assert backend.put_if_absent(str(pre), b"usurper") is False
    assert pre.read_bytes() == b"committed-by-an-earlier-driver"
    assert backend.exists(str(pre)) is True
    assert backend.get(str(pre)) == b"committed-by-an-earlier-driver"
    assert "commit-00000000000000000001.parquet" in backend.list_names(
        str(tmp_path), "commit-"
    )


def test_s3_backend_agrees_with_localfs_on_random_histories(tmp_path):
    """Property: the adapter (blank bucket, no mirror) and the local-FS
    backend produce identical outcomes for any operation history — the
    seam contract that lets the engine swap backends freely."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.tuples(
            st.sampled_from(["pia", "put", "get", "exists", "delete", "cad"]),
            st.integers(0, 4),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=30,
    )
    case = {"n": 0}

    @settings(max_examples=40, deadline=None)
    @given(history=ops)
    def check(history):
        case["n"] += 1
        base = tmp_path / f"case-{case['n']}"
        (base / "fs").mkdir(parents=True)
        (base / "root").mkdir()
        fs = storage.LocalFSCasBackend()
        s3 = S3CasBackend(
            "b", FakeS3Client(str(base / "_bucket")), root=str(base / "root"),
            mirror_to_fs=False,
        )
        fs_dir, s3_dir = str(base / "fs"), str(base / "root")
        for op, k, p in history:
            key_fs, key_s3 = f"{fs_dir}/k{k}", f"{s3_dir}/k{k}"
            payload = f"payload-{p}".encode()
            if op == "pia":
                assert fs.put_if_absent(key_fs, payload) == s3.put_if_absent(
                    key_s3, payload
                )
            elif op == "put":
                fs.put(key_fs, payload)
                s3.put(key_s3, payload)
            elif op == "get":
                assert fs.get(key_fs) == s3.get(key_s3)
            elif op == "exists":
                assert fs.exists(key_fs) == s3.exists(key_s3)
            elif op == "cad":
                assert fs.compare_and_delete(key_fs, payload) == s3.compare_and_delete(
                    key_s3, payload
                )
            else:
                fs.delete(key_fs)
                s3.delete(key_s3)
        assert {n for n in fs.list_names(fs_dir, "k")} == {
            n for n in s3.list_names(s3_dir, "k")
        }

    check()


def _cad_backends(tmp_path):
    """One of each shipped backend, each writing under its own subtree."""
    from mandoline_hbase_spark.storage import InMemoryCasBackend, LocalFSCasBackend

    roots = {}
    for name in ("fs", "mem", "memwt", "s3"):
        d = tmp_path / name
        d.mkdir()
        roots[name] = str(d)
    return [
        (LocalFSCasBackend(), roots["fs"]),
        (InMemoryCasBackend(write_through=False), roots["mem"]),
        (InMemoryCasBackend(write_through=True), roots["memwt"]),
        (
            S3CasBackend(
                "b", FakeS3Client(str(tmp_path / "_cadbucket")), root=roots["s3"]
            ),
            roots["s3"],
        ),
    ]


def test_compare_and_delete_contract_every_backend(tmp_path):
    """The conditional-DELETE leg of the CAS seam (VERDICT r6 #1):
    delete succeeds iff the stored content equals ``expected`` — a
    mismatching (fresh) object SURVIVES, a missing key answers False,
    and the name reopens for conditional claims after a hit."""
    for backend, root in _cad_backends(tmp_path):
        p = os.path.join(root, "lease-obj")
        label = type(backend).__name__
        assert backend.compare_and_delete(p, b"anything") is False, label  # missing
        assert backend.put_if_absent(p, b"mine") is True, label
        assert backend.compare_and_delete(p, b"not-mine") is False, label
        assert backend.get(p) == b"mine", label  # mismatch never deletes
        assert backend.compare_and_delete(p, b"mine") is True, label
        assert backend.get(p) is None, label
        assert backend.put_if_absent(p, b"second") is True, label  # name reopened


def test_mtime_is_store_side_and_none_when_missing(tmp_path):
    """Lease staleness derives age from the STORE's clock: every
    backend reports a just-written object as fresh (regardless of any
    holder-claimed timestamp in the payload) and None for a missing
    key."""
    import time as _time

    for backend, root in _cad_backends(tmp_path):
        p = os.path.join(root, "aged-obj")
        label = type(backend).__name__
        assert backend.mtime(p) is None, label
        before = _time.time()
        backend.put(p, b"payload-claiming-to-be-ancient")
        mt = backend.mtime(p)
        assert mt is not None and abs(mt - before) < 120, (label, mt, before)


def test_fake_s3_conditional_delete_wire_semantics(tmp_path):
    """DeleteObject+If-Match through the fake serves real bucket
    semantics: 412 PreconditionFailed on an ETag mismatch (object
    survives), 404 on a missing key, 204 + removal on a match."""
    import hashlib

    client = FakeS3Client(str(tmp_path / "_bucket"))
    client.put_object(Bucket="b", Key="k/lease", Body=b"fresh-rival")
    with pytest.raises(S3ClientError) as e:
        client.delete_object(
            Bucket="b", Key="k/lease", IfMatch=f'"{hashlib.md5(b"stale").hexdigest()}"'
        )
    assert e.value.response["Error"]["Code"] == "PreconditionFailed"
    assert client.get_object(Bucket="b", Key="k/lease")["Body"].read() == b"fresh-rival"
    with pytest.raises(S3ClientError) as e:
        client.delete_object(
            Bucket="b", Key="k/gone", IfMatch=f'"{hashlib.md5(b"x").hexdigest()}"'
        )
    assert e.value.response["Error"]["Code"] == "NoSuchKey"
    resp = client.delete_object(
        Bucket="b", Key="k/lease", IfMatch=f'"{hashlib.md5(b"fresh-rival").hexdigest()}"'
    )
    assert resp["ResponseMetadata"]["HTTPStatusCode"] == 204
    with pytest.raises(S3ClientError):
        client.get_object(Bucket="b", Key="k/lease")
    # head carries LastModified — the bucket-side clock mtime() reads
    client.put_object(Bucket="b", Key="k/ts", Body=b"x")
    lm = client.head_object(Bucket="b", Key="k/ts")["LastModified"]
    assert hasattr(lm, "timestamp")


def test_commit_protocol_through_adapter(tmp_path, s3_env):
    """reserve -> conditional version claim -> release, all through the
    S3 surface: ids claimed exactly once, losers retry past them."""
    schema = mk_schema({"root": "s3.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("ds")
    conn = schema.connect("ds")
    vdir = conn._dirs["versions"]
    row = [{"version_id": 7, "committed_at": 7, "metadata": json.dumps({"a": 1})}]
    assert storage.commit_version_row(vdir, 7, row) is True
    assert storage.commit_version_row(vdir, 7, row) is False
    assert json.loads(storage.committed_version_row(vdir, 7)["metadata"]) == {"a": 1}
    # reservations go through the bucket too
    v = storage.reserve_version_id(vdir, 7)
    assert v > 7  # bumped past the committed id
    assert v in storage.reserved_version_ids(vdir)
    assert storage.reservation_created_at(vdir, v) is not None
    storage.release_version_reservation(vdir, v)
    assert v not in storage.reserved_version_ids(vdir)


def test_engine_concurrent_writers_through_adapter(tmp_path, s3_env):
    """Eight driver threads through the FULL write path with the bucket
    as the only conditional-put source: unique version ids, exact
    read-back — 'many drivers, one bucket' end to end."""
    import threading

    schema = mk_schema({"root": "bucket.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("shared")
    results: dict[int, int] = {}
    errors: list[str] = []
    lock = threading.Lock()

    def driver(n: int):
        try:
            conn = schema.connect("shared")
            vid = conn.write_variable(
                f"v{n}", np.full((4, 4), float(n)), chunk_shape=(2, 2)
            )
            with lock:
                results[n] = vid
        except Exception as exc:  # pragma: no cover - diagnostic
            with lock:
                errors.append(f"{n}: {exc}")

    threads = [__import__("threading").Thread(target=driver, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(set(results.values())) == 8
    conn = schema.connect("shared")
    for n in range(8):
        assert (conn.read_variable(f"v{n}") == float(n)).all()
    assert len(conn.versions()) == 8


_WORKER = r"""
import json, sys
import numpy as np
from mandoline_hbase_spark import storage
from mandoline_hbase_spark.engine import mk_schema
from mandoline_hbase_spark.objectstore import FakeS3Client, S3CasBackend

base_path, store_dir, proc, n_updates = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
storage.register_cas_backend(
    base_path, S3CasBackend("mp-bucket", FakeS3Client(store_dir), root=base_path)
)
conn = mk_schema({"root": "mp.mandoline.io", "base_path": base_path}).connect("mp-ds")
out = []
for i in range(n_updates):
    value = proc * 1000.0 + i
    offset = ((proc * 4 + i * 4) % 16, (proc * 8 + i * 4) % 16)
    vid = conn.update_region("x", np.full((16, 16), value), offset)
    out.append({"version": vid, "offset": offset, "value": value})
print(json.dumps(out))
"""


def test_multiprocess_commits_through_s3_adapter(tmp_path):
    """The reference's disabled lots-of-processes scenario, with every
    version claim flowing through the S3 conditional-put surface in
    FOUR separate OS processes (shared state = the fake bucket's
    store): commits linearize, final state equals the version-order
    numpy replay."""
    store_dir = str(tmp_path / "_bucket")
    backend = S3CasBackend("mp-bucket", FakeS3Client(store_dir), root=str(tmp_path))
    storage.register_cas_backend(str(tmp_path), backend)
    try:
        schema = mk_schema({"root": "mp.mandoline.io", "base_path": str(tmp_path)})
        schema.create_dataset("mp-ds")
        conn = schema.connect("mp-ds")
        conn.create_variable("x", (32, 32), dtype="float64", chunk_shape=(8, 8), fill=0.0)

        env = {
            **os.environ,
            "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        }
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(tmp_path), store_dir, str(p), "3"],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=env,
                text=True,
            )
            for p in range(4)
        ]
        updates = []
        for p in procs:
            out, err = p.communicate(timeout=180)
            assert p.returncode == 0, err
            updates.extend(json.loads(out.strip().splitlines()[-1]))

        vids = [u["version"] for u in updates]
        assert len(vids) == 12 and len(set(vids)) == 12
        arr = np.zeros((32, 32))
        for u in sorted(updates, key=lambda u: u["version"]):
            (r, c) = u["offset"]
            arr[r : r + 16, c : c + 16] = u["value"]
        conn._version_cache = None
        assert np.array_equal(conn.read_variable("x"), arr)
        # the version rows really went through the bucket: the store
        # holds one object per committed id
        bucket_commits = [
            k for k in _bucket_keys(store_dir) if "/versions/commit-" in "/" + k
        ]
        assert len(bucket_commits) >= 12
    finally:
        storage.unregister_cas_backend(str(tmp_path))


def _bucket_keys(store_dir: str) -> list[str]:
    keys = []
    for root, _d, files in os.walk(store_dir):
        for f in files:
            keys.append(
                os.path.relpath(os.path.join(root, f), store_dir).replace(os.sep, "/")
            )
    return keys

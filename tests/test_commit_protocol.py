"""Conditional version-row commit (the cluster-safe CAS primitive).

The commit point is an atomic claim of the version id:
``storage.commit_version_row`` hard-links a temp parquet onto
``commit-{id}.parquet`` — EEXIST means another committer owns the id.
This is the local-filesystem form of an object store's if-none-match
conditional put (reference contract: check-and-put, hbase.clj:241-248);
``storage.dataset_lock`` remains only a local serialization aid for
read-modify-write sections, not the commit's correctness guard.
"""

from __future__ import annotations

import json

import pytest

from mandoline_hbase_spark import storage
from mandoline_hbase_spark.engine import mk_schema
from mandoline_hbase_spark.errors import CommitConflictError


@pytest.fixture(params=["localfs", "memory", "s3"])
def cas_env(request, tmp_path):
    """Run the protocol tests against all three conditional-put
    backends: local-FS name claims, the in-process If-None-Match fake
    (storage.InMemoryCasBackend), and the S3 adapter over a hermetic
    bucket fake (objectstore.S3CasBackend) — same contract, three
    different atomicity sources."""
    if request.param == "memory":
        storage.register_cas_backend(str(tmp_path), storage.InMemoryCasBackend())
        yield request.param
        storage.unregister_cas_backend(str(tmp_path))
    elif request.param == "s3":
        from mandoline_hbase_spark.objectstore import FakeS3Client, S3CasBackend

        backend = S3CasBackend(
            "cp-bucket", FakeS3Client(str(tmp_path / "_bucket")), root=str(tmp_path)
        )
        storage.register_cas_backend(str(tmp_path), backend)
        yield request.param
        storage.unregister_cas_backend(str(tmp_path))
    else:
        yield request.param


def _conn(tmp_path):
    schema = mk_schema({"root": "cp.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("cp-ds")
    return schema.connect("cp-ds")


def _row(v, meta):
    return {"version_id": v, "committed_at": v, "metadata": json.dumps(meta)}


def test_conditional_put_claims_id_exactly_once(tmp_path, cas_env):
    conn = _conn(tmp_path)
    vdir = conn._dirs["versions"]
    assert storage.commit_version_row(vdir, 77, [_row(77, {"a": 1})]) is True
    # second claim of the same id fails, committed row unchanged
    assert storage.commit_version_row(vdir, 77, [_row(77, {"a": 2})]) is False
    assert json.loads(storage.committed_version_row(vdir, 77)["metadata"]) == {"a": 1}


def test_write_version_allocation_retries_past_taken_ids(tmp_path, cas_env):
    conn = _conn(tmp_path)
    v1 = conn.write_version({"variables": {}})
    # squat on the next few candidate ids to force the retry loop
    vdir = conn._dirs["versions"]
    for v in range(v1 + 1, v1 + 4):
        assert storage.commit_version_row(vdir, v, [_row(v, {"squat": v})])
    conn._version_cache = None
    v2 = conn.write_version({"variables": {}})
    assert v2 > v1 + 3  # skipped every taken id, committed its own


def test_reserved_id_replay_is_idempotent(tmp_path, cas_env):
    conn = _conn(tmp_path)
    meta = {"version-id": 12345, "variables": {"x": {"kind": "t"}}}
    assert conn.write_version(meta) == 12345
    # replay of the identical commit (crash between commit and reservation
    # release) is absorbed as success
    assert conn.write_version(meta) == 12345
    assert len(conn.versions()) == 1


def test_reserved_id_conflict_with_different_payload_raises(tmp_path, cas_env):
    conn = _conn(tmp_path)
    conn.write_version({"version-id": 999, "variables": {"x": {"kind": "t"}}})
    with pytest.raises(CommitConflictError):
        conn.write_version({"version-id": 999, "variables": {"y": {"kind": "u"}}})


def test_reservation_markers_invisible_to_version_reads(tmp_path, cas_env):
    conn = _conn(tmp_path)
    v = conn._reserve_version()
    assert conn.latest_version_id() is None  # marker is not a version row
    assert v in storage.reserved_version_ids(conn._dirs["versions"])
    # a driver-side allocation can never hand out the reserved id
    assert conn.next_version_id() > v
    storage.release_version_reservation(conn._dirs["versions"], v)
    assert v not in storage.reserved_version_ids(conn._dirs["versions"])


def test_reserve_skips_concurrently_committed_id(store):
    """The marker and commit-file namespaces are unified: reserving an id
    whose commit file already exists must bump past it."""
    import os

    from mandoline_hbase_spark import storage

    vdir = store._dirs["versions"]
    n = store.next_version_id()
    # simulate a commit racing in between candidate computation and the
    # marker create
    ok = storage.commit_version_row(
        vdir, n, [{"version_id": n, "committed_at": n, "metadata": "{}"}]
    )
    assert ok
    got = storage.reserve_version_id(vdir, n)
    try:
        assert got > n
    finally:
        storage.release_version_reservation(vdir, got)


def test_swept_reservation_aborts_distributed_commit(spark, tmp_path):
    """If the failed-commit sweeper clears a live job's marker, the job
    must abort its commit loudly instead of publishing reclaimed data."""
    import numpy as np
    import pytest

    from mandoline_hbase_spark import storage
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.errors import CommitConflictError

    schema = mk_schema(
        {"root": "sweeprace.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("ds")
    conn = schema.connect("ds")

    real_next_seq = storage.next_seq

    def sweeping_next_seq():
        # the sweeper strikes right after the job reserved its id
        for rid in storage.reserved_version_ids(conn._dirs["versions"]):
            storage.release_version_reservation(conn._dirs["versions"], rid)
        return real_next_seq()

    df = spark.createDataFrame(
        [(i, j, float(i * 4 + j)) for i in range(2) for j in range(4)],
        "d0 long, d1 long, value double",
    )
    storage.next_seq = sweeping_next_seq
    try:
        with pytest.raises(CommitConflictError, match="swept"):
            conn.write_variable_from_df(df, "v", (2, 4), (2, 2))
    finally:
        storage.next_seq = real_next_seq
    assert conn.latest_version_id() is None  # nothing was published


def test_prune_preserves_commit_claims_and_floor(spark, tmp_path):
    """Retention must not void the exactly-once version-row claim: a
    replay of a RETAINED commit is still absorbed idempotently, and a
    replay of a PRUNED id is rejected, not resurrected."""
    import numpy as np
    import pytest

    from mandoline_hbase_spark import storage
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.errors import CommitConflictError

    schema = mk_schema(
        {"root": "prunefloor.example.com", "base_path": str(tmp_path)}, spark=spark
    )
    schema.create_dataset("ds")
    conn = schema.connect("ds")
    v1 = conn.write_variable("v", np.zeros((2, 2)), chunk_shape=(2, 2))
    v2 = conn.write_variable("v", np.ones((2, 2)), chunk_shape=(2, 2))
    kept_meta = conn.metadata(v2)

    conn.prune_versions(keep_last=1)
    assert storage.retention_floor(conn._dirs["versions"]) == v2

    # replay of the retained commit: identical metadata -> absorbed, and
    # the version listing must NOT grow a duplicate row
    n_before = len(conn.versions())
    assert conn.write_version(kept_meta) == v2
    assert len(conn.versions()) == n_before

    # replay of the pruned id: rejected
    pruned_meta = {**kept_meta, "version-id": v1}
    with pytest.raises(CommitConflictError, match="retention floor"):
        conn.write_version(pruned_meta)


def test_fake_backend_many_drivers_one_bucket(tmp_path):
    """Many concurrent committers against the If-None-Match fake: every
    version id is claimed exactly once and every driver eventually
    commits — the correctness of the protocol rests on the store's
    conditional put alone (the fake takes no filesystem name races)."""
    import threading

    storage.register_cas_backend(str(tmp_path), storage.InMemoryCasBackend())
    try:
        conn = _conn(tmp_path)
        vdir = conn._dirs["versions"]
        won: list[int] = []
        lock = threading.Lock()

        def driver(_n: int):
            v = storage.reserve_version_id(vdir, 1)
            assert storage.commit_version_row(vdir, v, [_row(v, {"d": _n})])
            storage.release_version_reservation(vdir, v)
            with lock:
                won.append(v)

        threads = [threading.Thread(target=driver, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(won) == sorted(set(won)) and len(won) == 16
        # committed rows visible to the directory-scanning reader too
        conn._version_cache = None
        assert len(conn.versions()) == 16
    finally:
        storage.unregister_cas_backend(str(tmp_path))


def test_fake_backend_full_engine_concurrent_writers(tmp_path):
    """Whole-engine concurrent commits over the If-None-Match fake: eight
    driver threads write variables through the full write path (chunks ->
    index rows -> reservation -> version claim); every commit must land
    with a unique version id and every variable read back exactly —
    the 'many drivers, one bucket' scenario end to end."""
    import threading

    import numpy as np

    storage.register_cas_backend(str(tmp_path), storage.InMemoryCasBackend())
    try:
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

        threads = [threading.Thread(target=driver, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(set(results.values())) == 8  # unique version ids
        conn = schema.connect("shared")
        for n in range(8):
            assert (conn.read_variable(f"v{n}") == float(n)).all()
        assert len(conn.versions()) == 8
    finally:
        storage.unregister_cas_backend(str(tmp_path))


def test_fake_backend_sees_pre_registration_objects(tmp_path):
    """Objects written before register_cas_backend (committed version
    rows, the retention floor, reservation markers) are committed state:
    a write-through fake must NOT re-win them (overwriting the real
    commit file) and must surface them through get/exists/list_names."""
    pre = tmp_path / "commit-00000000000000000001.parquet"
    pre.write_bytes(b"committed-by-an-earlier-driver")
    mem = storage.InMemoryCasBackend(write_through=True)
    # re-winning an already-committed id is the exact corruption ADVICE named
    assert mem.put_if_absent(str(pre), b"usurper") is False
    assert pre.read_bytes() == b"committed-by-an-earlier-driver"
    assert mem.exists(str(pre)) is True
    assert mem.get(str(pre)) == b"committed-by-an-earlier-driver"
    assert "commit-00000000000000000001.parquet" in mem.list_names(str(tmp_path), "commit-")
    # a blank-bucket fake (write_through=False) is pure in-memory truth
    blank = storage.InMemoryCasBackend(write_through=False)
    assert blank.exists(str(pre)) is False
    assert blank.put_if_absent("mem/other", b"x") is True


def test_cas_backends_agree_on_random_histories(tmp_path):
    """Property: the local-FS and If-None-Match fake backends produce
    identical outcomes for any operation history — the seam's contract
    (put-if-absent wins exactly once per key, delete reopens it, get
    returns the winner's bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ops = st.lists(
        st.tuples(
            st.sampled_from(["pia", "put", "get", "exists", "delete"]),
            st.integers(0, 4),  # key id
            st.integers(0, 3),  # payload id
        ),
        min_size=1,
        max_size=30,
    )

    case = {"n": 0}

    @settings(max_examples=60, deadline=None)
    @given(history=ops)
    def check(history):
        case["n"] += 1
        base = tmp_path / f"case-{case['n']}"
        base.mkdir()
        fs = storage.LocalFSCasBackend()
        mem = storage.InMemoryCasBackend(write_through=False)
        fs_dir = str(base / "fs")
        (base / "fs").mkdir()
        for op, k, p in history:
            key_fs = f"{fs_dir}/k{k}"
            key_mem = f"mem/k{k}"
            payload = f"payload-{p}".encode()
            if op == "pia":
                assert fs.put_if_absent(key_fs, payload) == mem.put_if_absent(
                    key_mem, payload
                )
            elif op == "put":
                fs.put(key_fs, payload)
                mem.put(key_mem, payload)
            elif op == "get":
                assert fs.get(key_fs) == mem.get(key_mem)
            elif op == "exists":
                assert fs.exists(key_fs) == mem.exists(key_mem)
            else:
                fs.delete(key_fs)
                mem.delete(key_mem)
        names_fs = {n[1:] for n in fs.list_names(fs_dir, "k")}
        names_mem = {n[1:] for n in mem.list_names("mem", "k")}
        assert names_fs == names_mem

    check()

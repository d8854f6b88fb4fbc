"""Multi-variable atomic commits: one version row makes every staged
variable visible together; cross-variable content dedup; failure
atomicity (no version row -> nothing visible)."""

from __future__ import annotations

import numpy as np
import pytest

from mandoline_hbase_spark.engine import mk_schema
from mandoline_hbase_spark.errors import InvalidArgumentError


@pytest.fixture()
def conn(tmp_path):
    schema = mk_schema({"root": "integration-testing.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("mv-ds")
    yield schema.connect("mv-ds")


def test_two_variables_one_version(conn):
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    b = np.ones(5, dtype=np.float64)
    v = conn.write_variables({"a": a, "b": b})
    assert len(conn.versions()) == 1
    meta = conn.metadata(v)
    assert set(meta["variables"]) == {"a", "b"}
    assert (conn.read_variable("a", version=v) == a).all()
    assert (conn.read_variable("b", version=v) == b).all()


def test_joint_update_is_snapshot_consistent(conn):
    a0, b0 = np.zeros((4, 4)), np.zeros((4, 4))
    v0 = conn.write_variables({"a": a0, "b": b0})
    a1, b1 = np.ones((4, 4)), np.full((4, 4), 2.0)
    v1 = conn.write_variables({"a": a1, "b": b1})
    # no version exists where a is new but b is old
    assert [int(x["version"]) for x in conn.versions()] == sorted(
        (v0, v1), reverse=True
    )
    assert (conn.read_variable("a", version=v0) == a0).all()
    assert (conn.read_variable("b", version=v0) == b0).all()
    assert (conn.read_variable("a", version=v1) == a1).all()
    assert (conn.read_variable("b", version=v1) == b1).all()


def test_cross_variable_content_dedup(conn):
    same = np.full((4, 4), 7.0)
    conn.write_variables({"a": same, "b": same.copy()}, chunk_shapes={"a": (4, 4), "b": (4, 4)})
    refs = conn.chunk_store()
    # identical bytes -> one content-addressed chunk, ref-count 2
    from mandoline_hbase_spark import codec

    data = codec.encode_chunk(same)
    h = codec.chunk_id_of(data)
    assert refs.chunk_refs(h) == 2


def test_empty_rejected(conn):
    with pytest.raises(InvalidArgumentError):
        conn.write_variables({})


def test_partial_visibility_never_happens(conn, monkeypatch):
    """Crash before the version row: neither variable becomes visible."""
    a = np.ones((2, 2))
    conn.write_variables({"seed": a})
    n_versions = len(conn.versions())

    import mandoline_hbase_spark.engine as eng

    def boom(meta):
        raise RuntimeError("injected crash before visibility point")

    monkeypatch.setattr(conn, "write_version", boom)
    with pytest.raises(RuntimeError):
        conn.write_variables({"x": a, "y": a})
    monkeypatch.undo()
    assert len(conn.versions()) == n_versions
    meta = conn.metadata(conn.latest_version_id())
    assert set(meta["variables"]) == {"seed"}, "crashed commit left no visible variable"

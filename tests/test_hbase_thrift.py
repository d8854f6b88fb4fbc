"""HappyBaseClient adapter: hermetic stub tests always run (the
translation layer — family prefixing, bytes codecs, Thrift1 checkAndPut
plumbing — needs no real cluster); the live contract exercise runs only
when ``happybase`` is installed AND ``HBASE_THRIFT_HOST`` names a
reachable Thrift1 server (VERDICT r7 #3)."""

from __future__ import annotations

import os

import pytest

from mandoline_hbase_spark.errors import (
    ChunkNotFoundError,
    DatasetNotFoundError,
)
from mandoline_hbase_spark.sources.hbase_live import mk_hbase_schema
from mandoline_hbase_spark.sources.hbase_thrift import HappyBaseClient


class Mutation:
    """Thrift1 ``Mutation`` stand-in; the adapter resolves this class
    from the raw client's own module (as it must with thriftpy2-generated
    bindings), which for the stub is THIS test module."""

    def __init__(self, isDelete=False, column=b"", value=b""):
        self.isDelete, self.column, self.value = isDelete, column, value


class _StubThriftClient:
    """The raw generated Thrift1 client surface the adapter touches."""

    def __init__(self, tables: dict):
        self._tables = tables

    def checkAndPut(self, table, row, column, expected, mput, attributes):
        cells = self._tables[table.decode()]
        if cells.setdefault(row, {}).get(column) != expected:
            return False  # expected None == "column must be absent"
        cells[row][mput.column] = mput.value
        return True


class _StubTable:
    """Lazy like happybase's Table: constructing a handle never checks
    existence; operations on a missing table raise server-side."""

    def __init__(self, tables: dict, name: str):
        self._tables, self._name = tables, name

    @property
    def _cells(self) -> dict:
        if self._name not in self._tables:
            raise IOError(f"table {self._name} does not exist")
        return self._tables[self._name]

    def put(self, row, data):
        self._cells.setdefault(row, {}).update(data)

    def row(self, row, columns=None):
        d = dict(self._cells.get(row, {}))
        if columns is not None:
            d = {c: v for c, v in d.items() if c in columns}
        return d

    def scan(self, row_start=None, row_stop=None):
        for row in sorted(self._cells):
            if row_start is not None and row < row_start:
                continue
            if row_stop is not None and row >= row_stop:
                continue
            if self._cells[row]:
                yield row, dict(self._cells[row])

    def delete(self, row):
        self._cells.pop(row, None)


class _StubHappyBaseConnection:
    """Implements exactly the happybase Connection surface the adapter
    consumes: tables()->list[bytes], create_table(name, families),
    delete_table(name, disable=), table(name), .client (raw Thrift1)."""

    def __init__(self):
        self._tables: dict[str, dict] = {}
        self.client = _StubThriftClient(self._tables)
        self.created_with: dict[str, dict] = {}

    def tables(self):
        return [n.encode() for n in sorted(self._tables)]

    def create_table(self, name, families):
        if name in self._tables:
            raise IOError(f"table {name} exists")
        self.created_with[name] = families
        self._tables[name] = {}

    def delete_table(self, name, disable=True):
        assert disable is True  # happybase requires disable before drop
        del self._tables[name]

    def table(self, name):
        return _StubTable(self._tables, name)


@pytest.fixture
def schema():
    conn = _StubHappyBaseConnection()
    s = mk_hbase_schema(
        {"root": "integration-testing.mandoline.io"}, HappyBaseClient(conn)
    )
    s._stub = conn  # let tests peek at raw bytes
    return s


def test_schema_lifecycle_through_the_adapter(schema):
    schema.create_dataset("ds1")
    stub = schema._stub
    # three tables, each created with the single D column family
    assert set(stub.created_with) == {
        f"io.mandoline.integration-testing.ds1.{r}"
        for r in ("chunks", "indices", "versions")
    }
    assert all(f == {"D": {}} for f in stub.created_with.values())
    assert schema.list_datasets() == ["ds1"]
    conn = schema.connect("ds1")
    assert conn.get_stats()["data-size"].endswith("ds1.chunks")
    with pytest.raises(DatasetNotFoundError):
        schema.connect("nope")
    schema.destroy_dataset("ds1")
    schema.destroy_dataset("ds1")  # idempotent through the adapter
    assert schema.list_datasets() == []


def test_chunk_rw_refs_and_family_prefixing(schema):
    schema.create_dataset("ds1")
    cs = schema.connect("ds1").chunk_store()
    cs.write_chunk("h1", 2, b"\x00payload\xff")
    assert cs.read_chunk("h1") == b"\x00payload\xff"
    assert cs.chunk_refs("h1") == 2
    cs.update_chunk_refs("h1", 3)  # rides the stub's checkAndPut
    assert cs.chunk_refs("h1") == 5
    with pytest.raises(ChunkNotFoundError):
        cs.read_chunk("missing")
    # the wire form really is family-prefixed byte qualifiers
    raw = schema._stub._tables["io.mandoline.integration-testing.ds1.chunks"]
    assert set(raw[b"h1"]) == {b"D:v", b"D:r"}
    assert raw[b"h1"][b"D:r"] == b"5"


def test_write_index_cas_and_versions_roundtrip(schema):
    schema.create_dataset("ds1")
    conn = schema.connect("ds1")
    conn.write_version({"version-id": 7, "note": "first"})
    conn.write_version({"version-id": 9, "note": "second"})
    assert [e["version"] for e in conn.versions()] == ["9", "7"]
    assert conn.metadata(7)["note"] == "first"

    idx = conn.index("var", {"version-id": 7})
    assert idx.write_index((0, 0), None, "aaa") is True
    assert idx.write_index((0, 0), None, "bbb") is False  # stale CAS loses
    assert idx.write_index((0, 0), "aaa", "bbb") is True
    assert idx.chunk_at((0, 0), 7) == "bbb"
    # the :k mirror landed (second put after the winning CAS)
    raw = schema._stub._tables["io.mandoline.integration-testing.ds1.indices"]
    key = "var|0/0|7"
    assert raw[key.encode()][b"D:k"] == key.encode()


def test_check_and_put_without_thrift_cas_is_a_loud_error(schema):
    """A Thrift binding that predates checkAndPut must fail loudly —
    never silently degrade the reference's CAS to get-then-put."""
    schema.create_dataset("ds1")
    schema._stub.client = object()  # raw client with no checkAndPut
    idx = schema.connect("ds1").index("v", {"version-id": 1})
    with pytest.raises(NotImplementedError, match="checkAndPut"):
        idx.write_index((0,), None, "h")


@pytest.mark.skipif(
    not os.environ.get("HBASE_THRIFT_HOST"),
    reason="set HBASE_THRIFT_HOST to run against a live Thrift1 server",
)
def test_live_contract_exercise():
    happybase = pytest.importorskip("happybase")
    client = HappyBaseClient(
        happybase.Connection(
            os.environ["HBASE_THRIFT_HOST"],
            port=int(os.environ.get("HBASE_THRIFT_PORT", "9090")),
        )
    )
    schema = mk_hbase_schema({"root": "live-testing.mandoline.io"}, client)
    schema.destroy_dataset("t0")  # idempotent cleanup from a prior run
    schema.create_dataset("t0")
    try:
        conn = schema.connect("t0")
        cs = conn.chunk_store()
        cs.write_chunk("h1", 1, b"live-bytes")
        assert cs.read_chunk("h1") == b"live-bytes"
        cs.update_chunk_refs("h1", 4)
        assert cs.chunk_refs("h1") == 5
        conn.write_version({"version-id": 1})
        idx = conn.index("v", {"version-id": 1})
        assert idx.write_index((0,), None, "aaa") is True
        assert idx.write_index((0,), None, "bbb") is False
        assert idx.chunk_at((0,)) == "aaa"
    finally:
        schema.destroy_dataset("t0")

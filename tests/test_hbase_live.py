"""Live HBase protocol layer (sources/hbase_live.py): the reference's
entire RPC surface (hbase.clj:1-373) exercised 1:1 against the
injectable file-backed client fake — schema lifecycle, chunk store
contracts, the write-index CAS, find-index resolution, version
listing — plus the Spark bulk round trip through the bridge layout."""

from __future__ import annotations

import json
import threading

import numpy as np
import pytest

from mandoline_hbase_spark.errors import (
    ChunkNotFoundError,
    ChunkRefNotFoundError,
    DatasetExistsError,
    DatasetNotFoundError,
    InvalidArgumentError,
    VersionNotFoundError,
)
from mandoline_hbase_spark.sources.hbase_live import (
    FakeHBaseClient,
    mk_hbase_schema,
)


@pytest.fixture
def schema(tmp_path):
    client = FakeHBaseClient(str(tmp_path / "hbase"))
    return mk_hbase_schema({"root": "integration-testing.mandoline.io"}, client)


def test_schema_lifecycle_and_table_names(schema, tmp_path):
    """create/list/connect/destroy with the reference's reversed-root
    table naming (hbase.clj:346-361, 302-330)."""
    assert schema.root_table == "io.mandoline.integration-testing"
    schema.create_dataset("ds1")
    schema.create_dataset("ds2")
    client = schema._client
    assert "io.mandoline.integration-testing.ds1.chunks" in client.tables()
    assert schema.list_datasets() == ["ds1", "ds2"]
    conn = schema.connect("ds1")
    assert conn.get_stats()["data-size"].endswith("ds1.chunks")
    with pytest.raises(DatasetNotFoundError, match="no-such"):
        schema.connect("no-such")
    with pytest.raises(DatasetExistsError):
        schema.create_dataset("ds1")
    with pytest.raises(InvalidArgumentError):
        schema.create_dataset("  ")
    schema.destroy_dataset("ds1")
    schema.destroy_dataset("ds1")  # idempotent (hbase.clj:82-89)
    assert schema.list_datasets() == ["ds2"]


def test_db_version_prefixes_root(tmp_path):
    client = FakeHBaseClient(str(tmp_path / "hb"))
    s = mk_hbase_schema({"root": "foo.bar.com", "db-version": "v2"}, client)
    assert s.root_table == "v2.com.bar.foo"


def test_chunk_store_contracts(schema):
    """read/write/refs/update with the reference's validation and
    error behavior (hbase.clj:97-172)."""
    schema.create_dataset("d")
    cs = schema.connect("d").chunk_store()
    with pytest.raises(ChunkNotFoundError):
        cs.read_chunk("nonexistent")
    with pytest.raises(ChunkRefNotFoundError):
        cs.chunk_refs("nonexistent")
    with pytest.raises(InvalidArgumentError):
        cs.read_chunk("")
    with pytest.raises(InvalidArgumentError):
        cs.write_chunk("h1", 1, b"")  # no remaining bytes
    with pytest.raises(InvalidArgumentError):
        cs.write_chunk("h1", "one", b"x")  # ref-count must be an integer
    cs.write_chunk("h1", 2, b"payload")
    assert cs.read_chunk("h1") == b"payload"
    assert cs.chunk_refs("h1") == 2
    cs.update_chunk_refs("h1", 3)
    assert cs.chunk_refs("h1") == 5
    cs.update_chunk_refs("h1", -4)
    assert cs.chunk_refs("h1") == 1
    with pytest.raises(ChunkRefNotFoundError):
        cs.update_chunk_refs("ghost", 1)


def test_update_chunk_refs_is_atomic_under_contention(schema):
    """The documented fidelity fix: the reference's get-then-put loses
    concurrent increments (hbase.clj:156-172); the check-and-put loop
    must not."""
    schema.create_dataset("d")
    cs = schema.connect("d").chunk_store()
    cs.write_chunk("h", 0, b"x")
    n, per = 8, 25
    barrier = threading.Barrier(n)

    def bump():
        barrier.wait()
        for _ in range(per):
            cs.update_chunk_refs("h", 1)

    ts = [threading.Thread(target=bump) for _ in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert cs.chunk_refs("h") == n * per  # every increment survived


def test_index_cas_and_resolution(schema):
    """write-index CAS (hbase.clj:231-248), chunk-at exact (2-arity,
    no fallback) and bound-version resolution (1-arity via
    find-index)."""
    schema.create_dataset("d")
    conn = schema.connect("d")
    idx5 = conn.index("var", {"version-id": 5})
    assert idx5.target()["var-name"] == "var"
    # first write: expected None wins; a repeat with wrong old loses
    assert idx5.write_index((0, 1), None, "hashA") is True
    assert idx5.write_index((0, 1), None, "hashB") is False  # occupied
    assert idx5.write_index((0, 1), "wrong", "hashB") is False  # CAS miss
    assert idx5.write_index((0, 1), "hashA", "hashB") is True  # CAS hit
    # 2-arity: exact version only, None on a miss (the reference's TODO)
    assert idx5.chunk_at((0, 1), 5) == "hashB"
    assert idx5.chunk_at((0, 1), 4) is None
    # 1-arity: newest <= own bound; a later version is invisible
    idx9 = conn.index("var", {"version-id": 9})
    assert idx9.write_index((0, 1), None, "hashC") is True
    assert idx5.chunk_at((0, 1)) == "hashB"  # bound 5 ignores version 9
    assert idx9.chunk_at((0, 1)) == "hashC"
    idx7 = conn.index("var", {"version-id": 7})
    assert idx7.chunk_at((0, 1)) == "hashB"  # latest <= 7 is version 5
    # scalar coordinate packs as "_" (coordinate->id, hbase.clj:176-179)
    assert idx5.write_index((), None, "hashS") is True
    assert idx5.chunk_at(()) == "hashS"


def test_concurrent_index_writers_exactly_one_wins(schema):
    """lots-of-overlaps shape (hbase_test.clj): N writers CAS the same
    coordinate from the same expected value — exactly one True."""
    schema.create_dataset("d")
    conn = schema.connect("d")
    idx = conn.index("v", {"version-id": 1})
    assert idx.write_index((3,), None, "base")
    barrier = threading.Barrier(6)
    wins = []

    def contend(i):
        barrier.wait()
        if idx.write_index((3,), "base", f"w{i}"):
            wins.append(i)

    ts = [threading.Thread(target=contend, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    assert idx.chunk_at((3,), 1) == f"w{wins[0]}"


def test_versions_listing_and_metadata(schema):
    """write-version / versions / metadata (hbase.clj:263-297):
    newest-first, limit, metadata projection, missing-version raise."""
    schema.create_dataset("d")
    conn = schema.connect("d")
    for vid in (1000, 1002, 1001):
        conn.write_version({"version-id": vid, "variables": {"x": {"v": vid}}})
    vs = conn.versions()
    assert [v["version"] for v in vs] == ["1002", "1001", "1000"]
    assert "metadata" not in vs[0]
    vs2 = conn.versions(limit=2, metadata=True)
    assert len(vs2) == 2 and vs2[0]["metadata"]["version-id"] == 1002
    assert conn.metadata(1001)["variables"]["x"]["v"] == 1001
    with pytest.raises(VersionNotFoundError):
        conn.metadata(9999)


def test_bulk_round_trip_through_spark(spark, tmp_path):
    """End to end: a real engine dataset exports via to_kv, bulk-loads
    into the fake HBase from the EXECUTORS, serves the protocol layer
    (chunk bytes by id, index resolution, version metadata), and scans
    back into from_kv with full array equality."""
    from mandoline_hbase_spark import codec
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.sources import hbase_bridge
    from mandoline_hbase_spark.sources.hbase_live import (
        load_kv_into_hbase,
        scan_hbase_kv,
    )

    eng_schema = mk_schema(
        {"root": "integration-testing.mandoline.io", "base_path": str(tmp_path / "src")}
    )
    eng_schema.create_dataset("ds")
    src = eng_schema.connect("ds")
    arr = np.arange(48, dtype=np.float64).reshape(6, 8)
    vid = src.write_variable("temp", arr, chunk_shape=(3, 4))

    store_dir = str(tmp_path / "hbase")
    kv = hbase_bridge.to_kv(src, spark, root="integration-testing.mandoline.io")
    load_kv_into_hbase(kv, lambda: FakeHBaseClient(store_dir))

    # the live protocol layer serves the loaded dataset
    client = FakeHBaseClient(store_dir)
    live = mk_hbase_schema({"root": "integration-testing.mandoline.io"}, client)
    assert live.list_datasets() == ["ds"]
    conn = live.connect("ds")
    assert [v["version"] for v in conn.versions()] == [str(vid)]
    meta = conn.metadata(vid)
    assert meta["variables"]["temp"]["shape"] == [6, 8]
    idx = conn.index("temp", meta)
    cs = conn.chunk_store()
    # every chunk resolves through find-index and reads back verbatim
    for coord in codec.iter_chunk_coords((6, 8), (3, 4)):
        cid = idx.chunk_at(coord)
        assert cid is not None
        assert cs.chunk_refs(cid) >= 1
        block = codec.decode_chunk(cs.read_chunk(cid), "float64", (3, 4))
        np.testing.assert_array_equal(block, codec.extract_block(arr, coord, (3, 4), 0.0))

    # distributed scan -> bridge import -> array equality
    tables = sorted(client.tables())
    kv_back = scan_hbase_kv(spark, lambda: FakeHBaseClient(store_dir), tables)
    dst_schema = mk_schema(
        {"root": "integration-testing.mandoline.io", "base_path": str(tmp_path / "dst")}
    )
    dst = hbase_bridge.from_kv(kv_back, dst_schema, "ds-back")
    np.testing.assert_array_equal(dst.read_variable("temp"), arr)


def test_bulk_load_round_trips_kv_exactly(spark, tmp_path):
    """scan_hbase_kv(load_kv_into_hbase(kv)) == kv, row for row — the
    bridge layout survives the store byte-identically."""
    from mandoline_hbase_spark.sources.hbase_live import (
        load_kv_into_hbase,
        scan_hbase_kv,
    )

    rows = [
        ("t.ds.chunks", "abc123", "v", bytearray(b"\x00\x01payload"), None),
        ("t.ds.chunks", "abc123", "r", None, 3),
        ("t.ds.indices", "var|0/1|5", "v", bytearray(b"abc123"), None),
        ("t.ds.versions", "5", "t", None, 5),
        ("t.ds.versions", "5", "v", bytearray(json.dumps({"version-id": 5}).encode()), None),
    ]
    kv = spark.createDataFrame(
        rows,
        "table string, rowkey string, qualifier string, value_bytes binary, value_long long",
    )
    store = str(tmp_path / "hb")
    client = FakeHBaseClient(store)
    for t in ("t.ds.chunks", "t.ds.indices", "t.ds.versions"):
        client.create_table(t)
    load_kv_into_hbase(kv, lambda: FakeHBaseClient(store))
    back = scan_hbase_kv(spark, lambda: FakeHBaseClient(store), sorted(client.tables()))
    want = {(r[0], r[1], r[2], bytes(r[3]) if r[3] is not None else None, r[4]) for r in rows}
    got = {
        (r["table"], r["rowkey"], r["qualifier"],
         bytes(r["value_bytes"]) if r["value_bytes"] is not None else None,
         r["value_long"])
        for r in back.collect()
    }
    assert got == want


def test_from_kv_ignores_the_k_mirror_cells(spark, tmp_path):
    """Code-review r7: a store populated through write_index carries
    the reference's ':k' rowkey-mirror cells (hbase.clj:237); the
    scan -> from_kv import must not ingest them as chunk ids (one bogus
    index record per key would make reads nondeterministic)."""
    from mandoline_hbase_spark import codec
    from mandoline_hbase_spark.engine import mk_schema
    from mandoline_hbase_spark.sources import hbase_bridge
    from mandoline_hbase_spark.sources.hbase_live import (
        load_kv_into_hbase,
        scan_hbase_kv,
    )

    store_dir = str(tmp_path / "hb")
    client = FakeHBaseClient(store_dir)
    live = mk_hbase_schema({"root": "integration-testing.mandoline.io"}, client)
    live.create_dataset("ds")
    conn = live.connect("ds")

    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    data = codec.encode_chunk(arr)
    cid = codec.chunk_id_of(data)
    conn.chunk_store().write_chunk(cid, 1, data)
    meta = {
        "version-id": 7,
        "variables": {"temp": {"dtype": "float64", "shape": [4, 4],
                               "chunk_shape": [4, 4], "fill": 0.0}},
    }
    idx = conn.index("temp", meta)
    assert idx.write_index((0, 0), None, cid) is True  # plants v AND k
    conn.write_version(meta)
    # the k mirror landed atomically with v (same checkAndPut Put)
    raw = client.table("io.mandoline.integration-testing.ds.indices").row("temp|0/0|7")
    assert raw["k"] == b"temp|0/0|7" and raw["v"] == cid.encode()

    kv = scan_hbase_kv(spark, lambda: FakeHBaseClient(store_dir), sorted(client.tables()))
    dst_schema = mk_schema(
        {"root": "integration-testing.mandoline.io", "base_path": str(tmp_path / "dst")}
    )
    dst = hbase_bridge.from_kv(kv, dst_schema, "ds-back")
    np.testing.assert_array_equal(dst.read_variable("temp"), arr)
    # exactly ONE index record imported per key (the k row was ignored)
    idx_rows = dst.spark_table("indices", spark).collect()
    assert len(idx_rows) == 1 and idx_rows[0]["chunk_id"] == cid


def test_fake_row_put_is_row_atomic_and_projected(tmp_path):
    """A multi-cell put is observed whole or not at all (write_chunk's
    v never without its r), and row(columns=) projects."""
    client = FakeHBaseClient(str(tmp_path / "hb"))
    client.create_table("t")
    t = client.table("t")
    t.put("rk", {"v": b"payload", "r": b"3"})
    assert t.row("rk", columns=["r"]) == {"r": b"3"}  # payload not fetched
    assert t.row("rk") == {"v": b"payload", "r": b"3"}
    # reads of a missing table stay empty, never raise
    missing = client.table("nope")
    assert missing.row("rk") == {} and missing.scan(None, None) == []

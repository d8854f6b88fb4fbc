"""Wire-level replay of the Thrift1 path (VERDICT r8 #6): the
HappyBaseClient adapter drives :mod:`sources.thrift1_wire`'s
dependency-free binary-protocol client against a SOCKET fake that
decodes real frames — so the encode/decode path, not just the
injectable-client seam, is pinned. Golden-byte assertions (hand-built
from the Thrift strict-binary spec + the public Hbase.thrift IDL,
independently of the writer under test) fail if mutation/checkAndPut
framing ever drifts."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from mandoline_hbase_spark.errors import ChunkNotFoundError, DatasetNotFoundError
from mandoline_hbase_spark.sources.hbase_live import mk_hbase_schema
from mandoline_hbase_spark.sources.hbase_thrift import HappyBaseClient
from mandoline_hbase_spark.sources import thrift1_wire as tw


# --------------------------------------------------------------------------
# The socket fake: a real listening socket serving Thrift1 strict-binary
# frames against an in-memory table store.
# --------------------------------------------------------------------------
class FakeThriftServer:
    def __init__(self, fragment: int = 0):
        # fragment > 0: adversarial socket conditions (VERDICT r9 #8) —
        # replies are written in `fragment`-byte send() calls (so frames
        # split across the client's recv boundaries) and requests are
        # read at most `fragment` bytes at a time (so the decoder sees
        # maximally fragmented arrival). 0 = normal whole-frame I/O.
        self.fragment = int(fragment)
        self._tables: dict[str, dict] = {}
        self._scanners: dict[int, list] = {}
        self._next_scanner = 0
        self.created_with: dict[str, list] = {}
        self.frames: list[tuple[str, bytes]] = []  # (method, raw request bytes)
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._srv.accept()
        rfile = conn.makefile("rb")
        try:
            while True:
                captured = bytearray()

                def read(n, _r=rfile, _c=captured):
                    if self.fragment:
                        n = min(n, self.fragment)
                    b = _r.read(n)
                    _c += b
                    return b

                r = tw.TBinaryReader(read)
                try:
                    name, mtype, seqid = r.message_begin()
                except (EOFError, OSError):
                    return
                args = r.value(tw.T_STRUCT)
                self.frames.append((name, bytes(captured)))
                w = tw.TBinaryWriter()
                w.message_begin(name, tw.MSG_REPLY, seqid)
                try:
                    self._dispatch(name, args, w)
                except IOError as exc:
                    # declared exception: field 1 struct {1: message}
                    w.field(tw.T_STRUCT, 1)
                    w.field(tw.T_STRING, 1)
                    w.string(str(exc).encode())
                    w.stop()
                w.stop()
                out = bytes(w.buf)
                if self.fragment:
                    for i in range(0, len(out), self.fragment):
                        conn.sendall(out[i : i + self.fragment])
                else:
                    conn.sendall(out)
        finally:
            conn.close()

    # -- protocol dispatch over the in-memory store -------------------
    def _cells(self, table: bytes) -> dict:
        name = table.decode()
        if name not in self._tables:
            raise IOError(f"table {name} does not exist")
        return self._tables[name]

    def _write_rows(self, w, rows):
        """list<TRowResult> into the success field."""
        w.field(tw.T_LIST, 0)
        w.list_begin(tw.T_STRUCT, len(rows))
        for row, cols in rows:
            w.field(tw.T_STRING, 1)
            w.string(row)
            w.field(tw.T_MAP, 2)
            w.map_begin(tw.T_STRING, tw.T_STRUCT, len(cols))
            for c, v in cols.items():
                w.string(c)
                w.field(tw.T_STRING, 1)  # TCell.value
                w.string(v)
                w.field(tw.T_I64, 2)  # TCell.timestamp
                w.i64(0)
                w.stop()
            w.stop()

    def _dispatch(self, name, args, w):
        get = lambda fid: args.get(fid, (None, None))[1]
        if name == "getTableNames":
            w.field(tw.T_LIST, 0)
            names = sorted(self._tables)
            w.list_begin(tw.T_STRING, len(names))
            for n in names:
                w.string(n.encode())
        elif name == "createTable":
            tname = get(1).decode()
            if tname in self._tables:
                raise IOError(f"table {tname} exists")
            self.created_with[tname] = get(2)
            self._tables[tname] = {}
        elif name == "disableTable":
            self._cells(get(1))
        elif name == "deleteTable":
            name_ = get(1).decode()
            self._cells(get(1))
            del self._tables[name_]
        elif name == "mutateRow":
            cells = self._cells(get(1))
            row = get(2)
            for m in get(3):
                assert not m[1][1], "adapter never sends delete mutations here"
                cells.setdefault(row, {})[m[2][1]] = m[3][1]
        elif name == "getRow":
            cells = self._cells(get(1))
            row = get(2)
            d = cells.get(row, {})
            self._write_rows(w, [(row, d)] if d else [])
        elif name == "getRowWithColumns":
            cells = self._cells(get(1))
            row, cols = get(2), set(get(3))
            d = {c: v for c, v in cells.get(row, {}).items() if c in cols}
            self._write_rows(w, [(row, d)] if d else [])
        elif name in ("scannerOpen", "scannerOpenWithStop"):
            cells = self._cells(get(1))
            start = get(2) or b""
            stop = get(3) if name == "scannerOpenWithStop" else None
            rows = [
                (r, dict(cells[r]))
                for r in sorted(cells)
                if r >= start and (stop is None or r < stop) and cells[r]
            ]
            self._next_scanner += 1
            self._scanners[self._next_scanner] = rows
            w.field(tw.T_I32, 0)
            w.i32(self._next_scanner)
        elif name == "scannerGetList":
            sid, n = get(1), get(2)
            batch, self._scanners[sid] = (
                self._scanners[sid][:n],
                self._scanners[sid][n:],
            )
            self._write_rows(w, batch)
        elif name == "scannerClose":
            self._scanners.pop(get(1), None)
        elif name == "deleteAllRow":
            self._cells(get(1)).pop(get(2), None)
        elif name == "checkAndPut":
            cells = self._cells(get(1))
            row, column, expected, mput = get(2), get(3), get(5), get(6)
            current = cells.get(row, {}).get(column)
            won = current == expected  # None == absent
            if won:
                cells.setdefault(row, {})[mput[2][1]] = mput[3][1]
            w.field(tw.T_BOOL, 0)
            w.boolean(won)
        else:
            raise AssertionError(f"unexpected thrift method {name}")


@pytest.fixture
def wired():
    server = FakeThriftServer()
    conn = tw.Thrift1WireConnection("127.0.0.1", server.port)
    schema = mk_hbase_schema(
        {"root": "wire-testing.mandoline.io"}, HappyBaseClient(conn)
    )
    schema._wire = conn  # let tests drive the raw wire table surface too
    yield schema, server
    conn.close()


# --------------------------------------------------------------------------
# End-to-end engine contract over REAL bytes
# --------------------------------------------------------------------------
def test_engine_contract_over_the_wire(wired):
    schema, server = wired
    schema.create_dataset("ds1")
    assert schema.list_datasets() == ["ds1"]
    conn = schema.connect("ds1")
    with pytest.raises(DatasetNotFoundError):
        schema.connect("nope")

    cs = conn.chunk_store()
    cs.write_chunk("h1", 2, b"\x00payload\xff")
    assert cs.read_chunk("h1") == b"\x00payload\xff"
    assert cs.chunk_refs("h1") == 2
    cs.update_chunk_refs("h1", 3)  # CAS over real checkAndPut frames
    assert cs.chunk_refs("h1") == 5
    with pytest.raises(ChunkNotFoundError):
        cs.read_chunk("missing")

    conn.write_version({"version-id": 7, "note": "first"})
    conn.write_version({"version-id": 9, "note": "second"})
    assert [e["version"] for e in conn.versions()] == ["9", "7"]
    assert conn.metadata(7)["note"] == "first"

    idx = conn.index("var", {"version-id": 7})
    assert idx.write_index((0, 0), None, "aaa") is True
    assert idx.write_index((0, 0), None, "bbb") is False  # stale CAS loses
    assert idx.write_index((0, 0), "aaa", "bbb") is True
    assert idx.chunk_at((0, 0), 7) == "bbb"

    # the server really holds family-prefixed byte qualifiers
    raw = server._tables["io.mandoline.wire-testing.ds1.chunks"]
    assert set(raw[b"h1"]) == {b"D:v", b"D:r"}
    assert raw[b"h1"][b"D:r"] == b"5"
    # the :k mirror landed via the post-CAS put
    idx_raw = server._tables["io.mandoline.wire-testing.ds1.indices"]
    assert idx_raw["var|0/0|7".encode()][b"D:k"] == b"var|0/0|7"

    # bounded scan + row delete ride the remaining two wire methods
    tbl = schema._wire.table("io.mandoline.wire-testing.ds1.versions")
    bounded = list(tbl.scan(row_start=b"\x00", row_stop=b"\xff"))
    assert bounded and all(isinstance(r, bytes) for r, _ in bounded)
    tbl.delete(bounded[0][0])
    assert len(list(tbl.scan(row_start=b"\x00", row_stop=b"\xff"))) == len(bounded) - 1

    schema.destroy_dataset("ds1")
    schema.destroy_dataset("ds1")  # idempotent over the wire
    assert schema.list_datasets() == []

    # every exchanged frame was a strict-binary CALL the server decoded
    methods = {m for m, _ in server.frames}
    assert {"createTable", "mutateRow", "checkAndPut", "getRowWithColumns",
            "scannerOpenWithStop", "deleteAllRow", "disableTable",
            "deleteTable"} <= methods


# --------------------------------------------------------------------------
# Golden bytes: hand-built from the spec, independent of TBinaryWriter
# --------------------------------------------------------------------------
def _g_str(b: bytes) -> bytes:
    return struct.pack(">i", len(b)) + b


def test_checkandput_frame_matches_spec_golden_bytes():
    """checkAndPut(1 table, 2 row, 3 column, [5 value omitted for a
    must-be-absent CAS], 6 Mutation{1 isDelete,2 column,3 value,
    4 writeToWAL}, 7 attributes) — the IDL's field-id gap at 4 and the
    omitted-null-means-absent convention are load-bearing for CAS
    correctness, so they are pinned as literal bytes."""
    frame = tw._encode_call(
        "checkAndPut",
        7,
        [
            (1, tw.T_STRING, b"tbl"),
            (2, tw.T_STRING, b"r1"),
            (3, tw.T_STRING, b"D:v"),
            (5, tw.T_STRING, None),  # null expected -> omitted field
            (6, tw.T_STRUCT, tw.Mutation(isDelete=False, column=b"D:v", value=b"x")),
            (7, tw.T_MAP, {}),
        ],
    )
    golden = (
        struct.pack(">I", 0x80010001)  # strict version | CALL
        + _g_str(b"checkAndPut")
        + struct.pack(">i", 7)  # seqid
        + b"\x0b" + struct.pack(">h", 1) + _g_str(b"tbl")
        + b"\x0b" + struct.pack(">h", 2) + _g_str(b"r1")
        + b"\x0b" + struct.pack(">h", 3) + _g_str(b"D:v")
        # field 4 does not exist in the IDL; field 5 omitted (null)
        + b"\x0c" + struct.pack(">h", 6)  # Mutation struct
        + b"\x02" + struct.pack(">h", 1) + b"\x00"  # isDelete=false
        + b"\x0b" + struct.pack(">h", 2) + _g_str(b"D:v")
        + b"\x0b" + struct.pack(">h", 3) + _g_str(b"x")
        + b"\x02" + struct.pack(">h", 4) + b"\x01"  # writeToWAL=true
        + b"\x00"  # Mutation stop
        + b"\x0d" + struct.pack(">h", 7) + b"\x0b\x0b" + struct.pack(">i", 0)
        + b"\x00"  # args stop
    )
    assert frame == golden


def test_mutaterow_frame_matches_spec_golden_bytes():
    frame = tw._encode_call(
        "mutateRow",
        1,
        [
            (1, tw.T_STRING, b"t"),
            (2, tw.T_STRING, b"r"),
            (3, tw.T_LIST, (tw.T_STRUCT, [tw.Mutation(column=b"D:q", value=b"v")])),
            (4, tw.T_MAP, {}),
        ],
    )
    golden = (
        struct.pack(">I", 0x80010001)
        + _g_str(b"mutateRow")
        + struct.pack(">i", 1)
        + b"\x0b" + struct.pack(">h", 1) + _g_str(b"t")
        + b"\x0b" + struct.pack(">h", 2) + _g_str(b"r")
        + b"\x0f" + struct.pack(">h", 3)  # list field
        + b"\x0c" + struct.pack(">i", 1)  # elem type STRUCT, size 1
        + b"\x02" + struct.pack(">h", 1) + b"\x00"
        + b"\x0b" + struct.pack(">h", 2) + _g_str(b"D:q")
        + b"\x0b" + struct.pack(">h", 3) + _g_str(b"v")
        + b"\x02" + struct.pack(">h", 4) + b"\x01"
        + b"\x00"
        + b"\x0d" + struct.pack(">h", 4) + b"\x0b\x0b" + struct.pack(">i", 0)
        + b"\x00"
    )
    assert frame == golden


def test_cas_expected_value_rides_field_five(wired):
    """A non-null expected value must be encoded as STRING field 5 —
    the update path of update_chunk_refs. Decode the captured frame
    with an independent cursor walk."""
    schema, server = wired
    schema.create_dataset("ds1")
    cs = schema.connect("ds1").chunk_store()
    cs.write_chunk("h1", 1, b"x")
    cs.update_chunk_refs("h1", 2)  # CAS: expected b"1" -> b"3"
    cap = [f for m, f in server.frames if m == "checkAndPut"]
    assert cap, "no checkAndPut frame captured"
    last = cap[-1]
    # independent parse: walk to field 5 and read its string value
    off = 4 + 4 + len(b"checkAndPut") + 4  # header + name + seqid
    found = {}
    while last[off] != 0:
        ftype = last[off]
        fid = struct.unpack(">h", last[off + 1 : off + 3])[0]
        off += 3
        if ftype == tw.T_STRING:
            n = struct.unpack(">i", last[off : off + 4])[0]
            found[fid] = last[off + 4 : off + 4 + n]
            off += 4 + n
        elif ftype == tw.T_STRUCT:  # skip the Mutation struct
            while last[off] != 0:
                st = last[off]
                off += 3
                if st == tw.T_STRING:
                    n = struct.unpack(">i", last[off : off + 4])[0]
                    off += 4 + n
                else:  # bool
                    off += 1
            off += 1
        elif ftype == tw.T_MAP:
            off += 2
            n = struct.unpack(">i", last[off : off + 4])[0]
            off += 4
            assert n == 0
        else:
            raise AssertionError(f"unexpected field type {ftype}")
    assert found[5] == b"1", found  # expected old refcount, as bytes


# --------------------------------------------------------------------------
# Adversarial socket conditions (VERDICT r9 #8): frames split across
# recv boundaries, requests arriving one byte at a time, and the
# scanner API's frames pinned as golden bytes.
# --------------------------------------------------------------------------
def test_engine_contract_survives_byte_fragmented_frames():
    """Every reply split into 1-byte sends and every request read one
    byte at a time: the decoder must behave identically to whole-frame
    I/O for the full engine contract — including the scan path
    (hbase.clj:187-193 semantics) and CAS."""
    server = FakeThriftServer(fragment=1)
    conn = tw.Thrift1WireConnection("127.0.0.1", server.port)
    try:
        schema = mk_hbase_schema(
            {"root": "frag-testing.mandoline.io"}, HappyBaseClient(conn)
        )
        schema.create_dataset("ds1")
        c = schema.connect("ds1")
        cs = c.chunk_store()
        cs.write_chunk("h1", 1, b"\x00pay\xffload")
        assert cs.read_chunk("h1") == b"\x00pay\xffload"
        cs.update_chunk_refs("h1", 3)
        assert cs.chunk_refs("h1") == 4
        with pytest.raises(ChunkNotFoundError):
            cs.read_chunk("missing")
        # scan path: multiple rows through scannerOpen/GetList/Close
        t = conn.table(
            [n for n in conn.tables() if n.endswith(b"chunks")][0].decode()
        )
        for i in range(5):
            t.put(f"row{i}".encode(), {b"D:v": f"val{i}".encode()})
        got = list(t.scan(row_start=b"row1", row_stop=b"row4"))
        assert [r for r, _ in got] == [b"row1", b"row2", b"row3"]
        assert got[0][1][b"D:v"] == b"val1"
        methods = {m for m, _ in server.frames}
        assert {"scannerOpenWithStop", "scannerGetList", "scannerClose"} <= methods
    finally:
        conn.close()


def test_scanner_open_with_stop_frame_matches_spec_golden_bytes():
    """scannerOpenWithStop(1 tableName, 2 startRow, 3 stopRow,
    4 columns, 5 attributes) -> ScannerID. The scan path the reference
    uses for range reads (hbase.clj:187-193), pinned as literal
    bytes."""
    frame = tw._encode_call(
        "scannerOpenWithStop",
        3,
        [
            (1, tw.T_STRING, b"tbl"),
            (2, tw.T_STRING, b"a"),
            (3, tw.T_STRING, b"z"),
            (4, tw.T_LIST, (tw.T_STRING, [b"D:v"])),
            (5, tw.T_MAP, {}),
        ],
    )
    golden = (
        struct.pack(">I", 0x80010001)
        + _g_str(b"scannerOpenWithStop")
        + struct.pack(">i", 3)
        + b"\x0b" + struct.pack(">h", 1) + _g_str(b"tbl")
        + b"\x0b" + struct.pack(">h", 2) + _g_str(b"a")
        + b"\x0b" + struct.pack(">h", 3) + _g_str(b"z")
        + b"\x0f" + struct.pack(">h", 4)         # list field 4
        + b"\x0b" + struct.pack(">i", 1)         # elem STRING, size 1
        + _g_str(b"D:v")
        + b"\x0d" + struct.pack(">h", 5) + b"\x0b\x0b" + struct.pack(">i", 0)
        + b"\x00"
    )
    assert frame == golden


def test_scanner_getlist_frame_and_reply_roundtrip_fragmented():
    """scannerGetList(1 id, 2 nbRows) golden bytes, and a hand-built
    list<TRowResult> REPLY decoded through a 1-byte-chunk reader — the
    decode side of the scan path under maximal fragmentation."""
    frame = tw._encode_call("scannerGetList", 9, [(1, tw.T_I32, 7), (2, tw.T_I32, 64)])
    golden = (
        struct.pack(">I", 0x80010001)
        + _g_str(b"scannerGetList")
        + struct.pack(">i", 9)
        + b"\x08" + struct.pack(">h", 1) + struct.pack(">i", 7)
        + b"\x08" + struct.pack(">h", 2) + struct.pack(">i", 64)
        + b"\x00"
    )
    assert frame == golden

    # hand-built reply: success field 0 = list<TRowResult> with one row
    # holding one column; TCell {1 value, 2 timestamp}
    reply = (
        struct.pack(">I", 0x80010002)  # strict version | REPLY
        + _g_str(b"scannerGetList")
        + struct.pack(">i", 9)
        + b"\x0f" + struct.pack(">h", 0)          # success list field
        + b"\x0c" + struct.pack(">i", 1)          # one TRowResult
        + b"\x0b" + struct.pack(">h", 1) + _g_str(b"row1")
        + b"\x0d" + struct.pack(">h", 2)          # columns map
        + b"\x0b\x0c" + struct.pack(">i", 1)      # string -> struct, 1 entry
        + _g_str(b"D:v")
        + b"\x0b" + struct.pack(">h", 1) + _g_str(b"val1")  # TCell.value
        + b"\x0a" + struct.pack(">h", 2) + struct.pack(">q", 123)  # ts
        + b"\x00"                                  # TCell stop
        + b"\x00"                                  # TRowResult stop
        + b"\x00"                                  # args stop
    )
    pos = 0

    def read1(n):
        nonlocal pos
        b = reply[pos : pos + min(n, 1)]  # never more than ONE byte
        pos += len(b)
        return b

    r = tw.TBinaryReader(read1)
    name, mtype, seqid = r.message_begin()
    assert (name, mtype, seqid) == ("scannerGetList", tw.MSG_REPLY, 9)
    result = r.value(tw.T_STRUCT)
    rows = result[0][1]
    assert len(rows) == 1
    row = rows[0]
    assert row[1][1] == b"row1"
    cell = row[2][1][b"D:v"]
    assert cell[1][1] == b"val1" and cell[2][1] == 123
    assert pos == len(reply)  # decoder consumed exactly one frame

"""Real-network HBase client adapter: happybase (Thrift1) -> the
``hbase_live`` client protocol.

The reference binds to a live cluster via clojure-hbase
(project.clj:11); :mod:`.hbase_live` re-expresses its protocol over an
injectable client, and this module supplies the missing ~50 lines of
glue so the layer can point at a real cluster::

    import happybase
    from mandoline_hbase_spark.sources.hbase_thrift import HappyBaseClient
    from mandoline_hbase_spark.sources.hbase_live import mk_hbase_schema

    client = HappyBaseClient(happybase.Connection("thrift-host"))
    schema = mk_hbase_schema({"root": "my.root.example.com"}, client)

The import of ``happybase`` is deferred to construction time (this
module imports cleanly without it) and only needed when no connection
object is injected — the adapter itself is a pure translation layer
over the happybase API surface, so tests exercise it against a stub
and :class:`.hbase_live.FakeHBaseClient` keeps carrying CI;
``tests/test_hbase_thrift.py`` additionally runs the live contract
exercise when ``happybase`` is installed AND ``HBASE_THRIFT_HOST`` is
set.

Protocol mapping (see hbase_live's module docstring for the contract):

- qualifiers: the engine speaks BARE qualifier strings (``"v"``,
  ``"r"``, ``"k"``, ``"t"``) within the single ``D`` column family
  (hbase.clj:93); happybase speaks ``b"D:v"`` — the adapter owns the
  prefixing in both directions.
- ``check_and_put``: happybase's public Table API has no CAS; HBase's
  Thrift1 service does (``checkAndPut``, null expected value = "column
  must be absent"), reachable through the connection's raw generated
  client. Adapters against a Thrift server/binding that predates it
  get a loud ``NotImplementedError`` naming the fix (enable Thrift1
  checkAndPut, or back the protocol with a Thrift2/REST client) — the
  engine must never fall back to an unfenced get-then-put where the
  reference rides a real checkAndPut (hbase.clj:241-248).
- ATOMICITY DELTA (documented, not hidden): Thrift1's checkAndPut
  carries exactly ONE mutation, so ``extra`` cells (write-index's
  ``:k`` mirror, hbase.clj:237) are applied in a second put AFTER a
  winning CAS rather than inside it. A crash between the two leaves
  ``v`` without its ``k`` mirror; that cell is cosmetic parity — it is
  derivable from the rowkey and no read path in this engine consumes
  it (``from_kv`` filters indices to qualifier ``v``) — so the window
  is benign here. Deployments that need the mirror transactional
  should use a Thrift2 client whose TPut spans columns.
"""

from __future__ import annotations

__all__ = ["HappyBaseClient"]


class HappyBaseClient:
    """``hbase_live`` client protocol over a happybase ``Connection``.

    Pass an existing happybase-API connection, or keyword arguments
    (``host=``, ``port=``, ...) to construct one — the ``happybase``
    import happens only on that constructing path, so environments
    without the package can still import and stub this adapter.
    """

    def __init__(self, connection=None, family: str = "D", **connect_kw):
        if connection is None:
            import happybase  # deferred: only the self-connecting path needs it

            connection = happybase.Connection(**connect_kw)
        self._conn = connection
        self._family = family

    # -- schema ops --------------------------------------------------
    def tables(self) -> list[str]:
        return [t.decode() if isinstance(t, bytes) else t for t in self._conn.tables()]

    def create_table(self, name: str) -> None:
        # one column family, the reference's :D (hbase.clj:93)
        self._conn.create_table(name, {self._family: dict()})

    def delete_table(self, name: str) -> None:
        if name not in self.tables():
            return  # idempotent, like the fake and hbase.clj:82-89
        self._conn.delete_table(name, disable=True)

    def table(self, name: str):
        return _HappyBaseTable(self._conn, name, self._family)


class _HappyBaseTable:
    def __init__(self, conn, name: str, family: str):
        self._conn = conn
        self._name = name
        self._table = conn.table(name)
        self._fam = family.encode()

    def _col(self, qualifier: str) -> bytes:
        return self._fam + b":" + qualifier.encode()

    def _strip(self, data: dict) -> dict:
        pre = len(self._fam) + 1
        return {k[pre:].decode(): v for k, v in data.items()}

    def put(self, row: str, data: dict) -> None:
        self._table.put(row.encode(), {self._col(q): v for q, v in data.items()})

    def row(self, row: str, columns=None) -> dict:
        cols = None if columns is None else [self._col(q) for q in columns]
        return self._strip(self._table.row(row.encode(), columns=cols))

    def scan(self, row_start=None, row_stop=None) -> list:
        return [
            (row.decode(), self._strip(data))
            for row, data in self._table.scan(
                row_start=None if row_start is None else row_start.encode(),
                row_stop=None if row_stop is None else row_stop.encode(),
            )
        ]

    def delete(self, row: str) -> None:
        self._table.delete(row.encode())

    def check_and_put(self, row, qualifier, expected, value, extra=None) -> bool:
        raw = getattr(self._conn, "client", None)
        cap = getattr(raw, "checkAndPut", None)
        if cap is None:
            raise NotImplementedError(
                "this Thrift1 server/binding exposes no checkAndPut; the "
                "engine's CAS (hbase.clj:241-248) cannot be emulated safely "
                "with get-then-put — enable Thrift1 checkAndPut or back "
                "hbase_live with a Thrift2/REST client"
            )
        mput = _thrift1_mutation(raw, self._col(qualifier), value)
        won = bool(
            cap(
                self._name.encode(),
                row.encode(),
                self._col(qualifier),
                expected,  # None -> Java null -> "column must be absent"
                mput,
                {},
            )
        )
        if won and extra:
            # see the module docstring's ATOMICITY DELTA note
            self.put(row, extra)
        return won


def _thrift1_mutation(raw_client, column: bytes, value: bytes):
    """Build a Thrift1 ``Mutation`` using the SAME generated bindings as
    the connection's raw client (thriftpy2 loads them per-connection;
    importing our own copy would build a type the server stub rejects)."""
    import sys

    mod = sys.modules.get(type(raw_client).__module__)
    mutation_cls = getattr(mod, "Mutation", None)
    if mutation_cls is None:  # happybase/thriftpy2 layout: Hbase_thrift module
        from Hbase_thrift import Mutation as mutation_cls  # type: ignore
    return mutation_cls(isDelete=False, column=column, value=value)

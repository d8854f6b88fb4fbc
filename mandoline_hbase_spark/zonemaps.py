"""Zone maps: per-chunk column statistics + conservative scan pruning.

Record-log chunks are opaque parquet blobs inside the chunk log, so the
format cannot lean on parquet row-group statistics for data skipping —
reading a footer would mean reading the blob. Instead every chunk write
appends a small sidecar row set to ``<dataset>/stats/``:

    (chunk_id, column, kind, vmin, vmax, nulls, nrows)

and the records reader prunes chunks whose statistics PROVE a pushed
filter matches nothing (``pushFilters``, Spark 4.1 Python Data Source).
This is exactly parquet's row-group min/max skipping lifted to the
chunk-log layout: a point lookup or range scan on a clustered key reads
O(matching chunks), not O(table).

Statistics are ADVISORY, never load-bearing for correctness:

- ``pushFilters`` returns every filter, so Spark re-evaluates them all
  post-scan; pruning can only remove chunks that provably contain no
  matching row.
- A chunk with no stats rows (pre-zonemap data, failed sidecar write)
  is simply never pruned.
- Orphan stats (chunks whose commit never landed) are keyed by
  chunk_id and never consulted, and content-addressing makes stats
  idempotent across chunk rewrites of identical bytes.

Only three comparable kinds are recorded: ``num`` (int/float/decimal),
``ts_us`` (timestamps as integer UTC epoch microseconds) and ``str``.
Everything else (arrays, structs, binary, bool) is left unpruned.

Kind names double as format versions: an earlier writer recorded
timestamps as epoch-seconds floats under kind ``ts``. Readers treat any
unrecognized kind — including legacy ``ts`` — as unparseable and keep
the chunk ('maybe'), so stale sidecars degrade to no-prune rather than
comparing microsecond filter values (~1e15) against second bounds
(~1e9) and wrongly pruning live chunks. Any future bound-format change
must likewise ship under a NEW kind name.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any, Iterable

STATS_SUBDIR = "stats"


# ---------------------------------------------------------------------------
# executor side: compute + append the sidecar
# ---------------------------------------------------------------------------


def stats_rows(chunk_id: str, pdf) -> list[dict]:
    """Per-column (kind, min, max, nulls) rows for one chunk's pandas
    frame. Values are serialized as strings; ``num``/``ts`` use repr of
    float so the driver can parse them back without pandas."""
    import numpy as np
    import pandas as pd

    out = []
    n = len(pdf)
    for col in pdf.columns:
        s = pdf[col]
        nulls = int(s.isna().sum())
        sv = s.dropna()
        # Spark treats float NaN as a real VALUE (equal to itself, greater
        # than every number, NOT NULL) while pandas isna() folds it into
        # the null count — and a float column conflates true nulls with
        # NaN irrecoverably. So for float dtypes any na might be a NaN
        # that satisfies a comparison: min/max rows keep the na count
        # (the reader stays 'maybe' on comparisons when nulls > 0), and
        # an all-na float column emits NO stats row at all instead of
        # 'allnull' (a chunk of NaNs matches `x IS NOT NULL` and
        # `x = double('NaN')` — pruning it would drop rows).
        floaty = pd.api.types.is_float_dtype(s)
        kind = None
        vmin = vmax = None
        if len(sv):
            if pd.api.types.is_bool_dtype(s):
                kind = None
            elif pd.api.types.is_datetime64_any_dtype(s):
                # integer microseconds, tz handled by pandas .value (UTC
                # epoch) — the same quantization _bloom_positions uses,
                # so a last-ulp float mismatch can never wrongly prune.
                # 'ts_us' (not legacy 'ts') so readers can tell this
                # bound format from the old epoch-seconds one.
                kind = "ts_us"
                vmin = repr(int(sv.min().value) // 1000)
                vmax = repr(int(sv.max().value) // 1000)
            elif pd.api.types.is_numeric_dtype(s):
                kind = "num"
                vmin = repr(float(sv.min()))
                vmax = repr(float(sv.max()))
            elif sv.map(lambda v: isinstance(v, str)).all():
                kind = "str"
                vmin = str(sv.min())
                vmax = str(sv.max())
        elif nulls == n and n > 0 and not floaty:
            kind = "allnull"
        if kind is None and not (nulls == n and n > 0 and not floaty):
            continue
        out.append(
            {
                "chunk_id": chunk_id,
                "column": str(col),
                "kind": kind or "allnull",
                "vmin": vmin,
                "vmax": vmax,
                "nulls": nulls,
                "nrows": n,
            }
        )
    return out


def write_stats(stats_dir: str, rows: list[dict]) -> None:
    """Append one sidecar parquet file (unique name, same discipline as
    chunk-log appends: blind write, no coordination needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        return
    os.makedirs(stats_dir, exist_ok=True)
    schema = pa.schema(
        [
            pa.field("chunk_id", pa.string(), nullable=False),
            pa.field("column", pa.string(), nullable=False),
            pa.field("kind", pa.string(), nullable=False),
            pa.field("vmin", pa.string(), nullable=True),
            pa.field("vmax", pa.string(), nullable=True),
            pa.field("nulls", pa.int64(), nullable=False),
            pa.field("nrows", pa.int64(), nullable=False),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    path = os.path.join(stats_dir, f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(table, path)


# ---------------------------------------------------------------------------
# driver side: load + prune
# ---------------------------------------------------------------------------


def load_stats(stats_dir: str, chunk_ids: list[str]) -> dict[str, dict[str, dict]]:
    """chunk_id -> column -> stats row, for the requested live chunks.
    Returns {} when the dataset has no sidecar (pre-zonemap data)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pa_ds

    if not chunk_ids or not os.path.isdir(stats_dir):
        return {}
    ds = pa_ds.dataset(stats_dir, format="parquet")
    t = ds.to_table(filter=pc.field("chunk_id").isin(chunk_ids))
    out: dict[str, dict[str, dict]] = {}
    for r in t.to_pylist():
        key = r["column"] + "#bloom" if r["kind"] == "bloom" else r["column"]
        out.setdefault(r["chunk_id"], {})[key] = r
    return out


def _norm_value(v: Any) -> tuple[str, Any] | None:
    """Canonical (kind, value). Timestamps normalize to INTEGER UTC
    microseconds — exact arithmetic on both writer and reader, matching
    the stats_rows/_bloom_positions quantization (a last-ulp float or a
    wall-clock-vs-UTC mismatch on a boundary must never wrongly prune)."""
    import datetime

    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return ("num", float(v))
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1))
    if isinstance(v, datetime.date):
        return ("ts", (v - datetime.date(1970, 1, 1)).days * 86_400_000_000)
    return None


# stats-sidecar kind -> the _norm_value kind its bounds compare against.
# Legacy / unknown kinds are absent: their bounds are unparseable and the
# reader stays 'maybe' (no-prune) instead of risking a wrong-prune.
_COMPARABLE_KINDS = {"num": "num", "ts_us": "ts", "str": "str"}


def _parse_bound(kind: str, raw: str | None) -> Any:
    if raw is None or kind not in _COMPARABLE_KINDS:
        return None
    return float(raw) if kind in ("num", "ts_us") else raw


def _may_match_one(stats: dict[str, dict], f: Any) -> bool:
    """False only when ``stats`` PROVES no row of the chunk satisfies
    ``f``; True means 'maybe' (including every unsupported shape)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        StringStartsWith,
    )

    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return True
    bloom = stats.get(attr[0] + "#bloom")
    if bloom is not None and not _bloom_may_match(bloom, f):
        return False  # bloom miss is definitive — works on ANY layout
    st = stats.get(attr[0])
    if st is None:
        return True
    kind = st["kind"]
    if kind == "allnull":
        # every comparison/prefix/IsNotNull filter needs a non-null row
        return isinstance(f, IsNull)
    if isinstance(f, IsNull):
        return st["nulls"] > 0
    if isinstance(f, IsNotNull):
        return st["nulls"] < st["nrows"]
    if kind == "num" and st["nulls"] > 0:
        # A float column's na count conflates true nulls with NaN, and a
        # NaN row satisfies comparisons under Spark semantics (NaN equals
        # itself and exceeds every number) — min/max over the non-na
        # values cannot disprove a match, so stay 'maybe'.
        return True
    lo, hi = _parse_bound(kind, st["vmin"]), _parse_bound(kind, st["vmax"])
    if lo is None or hi is None:
        # includes legacy/unknown kinds (e.g. pre-ts_us 'ts' sidecars),
        # whose bounds cannot be trusted against current filter values
        return True
    norm_kind = _COMPARABLE_KINDS[kind]
    if isinstance(f, StringStartsWith):
        if norm_kind != "str" or not isinstance(f.value, str):
            return True
        p = f.value
        # strings with prefix p all sort >= p; and if even vmin's p-length
        # prefix sorts above p, the whole chunk is past the prefix region
        return hi >= p and str(lo)[: len(p)] <= p
    if isinstance(f, In):
        vs = [_norm_value(v) for v in f.value]
        vs = [v for k, v in [x for x in vs if x is not None] if k == norm_kind]
        if not vs:
            return True
        return any(lo <= v <= hi for v in vs)
    nv = _norm_value(getattr(f, "value", None))
    if nv is None or nv[0] != norm_kind:
        return True
    v = nv[1]
    if kind == "num" and v != v:
        # NaN probe under Spark's total order (NaN = NaN, NaN above every
        # number). nulls == 0 here (the possible-NaN chunk guard above
        # already returned 'maybe'), so this chunk holds non-NaN rows
        # only: x < NaN / x <= NaN match them all; x = NaN, x > NaN,
        # x >= NaN provably match nothing.
        return isinstance(f, (LessThan, LessThanOrEqual))
    if isinstance(f, EqualTo):
        return lo <= v <= hi
    if isinstance(f, GreaterThan):
        return hi > v
    if isinstance(f, GreaterThanOrEqual):
        return hi >= v
    if isinstance(f, LessThan):
        return lo < v
    if isinstance(f, LessThanOrEqual):
        return lo <= v
    return True


def prune_chunks(
    entries: list[tuple],
    stats_by_chunk: dict[str, dict[str, dict]],
    filters: Iterable[Any],
) -> list[tuple]:
    """Keep the (coord, chunk_id) entries whose chunk may contain a
    matching row under the AND of ``filters``; chunks without stats are
    always kept."""
    filters = list(filters)
    if not filters or not stats_by_chunk:
        return entries
    kept = []
    for coord, cid in entries:
        st = stats_by_chunk.get(cid)
        if st is None or all(_may_match_one(st, f) for f in filters):
            kept.append((coord, cid))
    return kept


# ---------------------------------------------------------------------------
# bloom filters: equality skipping for UNclustered layouts
# ---------------------------------------------------------------------------
#
# Min/max ranges only prune when the layout is clustered on the filter
# column; a hash-scrambled ingest leaves every chunk spanning the whole
# domain. A small per-chunk bloom filter on chosen columns keeps point
# lookups O(matching chunks) regardless of layout (Delta/Iceberg-style
# bloom skipping). Stored in the SAME sidecar table as a second row per
# (chunk, column) with kind="bloom", the bitset base85-encoded in vmin.
# A bloom "miss" is definitive (no false negatives by construction), a
# "hit" is advisory — identical correctness contract to min/max.

BLOOM_BITS = 32768  # 4 KiB per (chunk, column)
BLOOM_HASHES = 7


def _bloom_positions(value, k: int = BLOOM_HASHES, m: int = BLOOM_BITS):
    """k deterministic bit positions for a NORMALIZED value (the
    _norm_value canonical form, so writer and reader agree even when
    Spark hands the reader a different-but-equal Python type)."""
    import hashlib

    nv = _norm_value(value)
    if nv is None:
        return None
    kind, v = nv
    if kind == "num" and v != v:
        # NaN: the writer's dropna() excluded NaN rows from the bitset,
        # so a bloom miss for NaN would be a FALSE negative — unsupported
        return None
    # ts values are already integer UTC microseconds from _norm_value
    # (exact on writer and reader; a float ulp here would be a
    # correctness bug, not a missed prune)
    payload = f"{kind}:{v!r}".encode()
    for seed in range(k):
        h = hashlib.blake2b(payload, digest_size=8, salt=seed.to_bytes(8, "little"))
        yield int.from_bytes(h.digest(), "little") % m


def bloom_bits(values, m: int = BLOOM_BITS) -> bytes:
    """Build the bitset over an iterable of raw (non-null) values."""
    bits = bytearray(m // 8)
    for v in values:
        pos = _bloom_positions(v, m=m)
        if pos is None:
            continue
        for p in pos:
            bits[p >> 3] |= 1 << (p & 7)
    return bytes(bits)


def bloom_might_contain(bits: bytes, value) -> bool:
    """False is definitive (the chunk cannot contain the value); True is
    'maybe'. Unsupported value types are always 'maybe'."""
    pos = _bloom_positions(value, m=len(bits) * 8)
    if pos is None:
        return True
    return all(bits[p >> 3] & (1 << (p & 7)) for p in pos)


def bloom_rows(chunk_id: str, pdf, bloom_columns) -> list[dict]:
    """Sidecar rows (kind="bloom") for the requested columns."""
    import base64

    out = []
    n = len(pdf)
    for col in bloom_columns:
        if col not in pdf.columns:
            continue
        s = pdf[col].dropna()
        out.append(
            {
                "chunk_id": chunk_id,
                "column": str(col),
                "kind": "bloom",
                "vmin": base64.b85encode(bloom_bits(s.tolist())).decode(),
                "vmax": None,
                "nulls": int(pdf[col].isna().sum()),
                "nrows": n,
            }
        )
    return out


def _bloom_may_match(bloom_row: dict, f) -> bool:
    import base64

    from pyspark.sql.datasource import EqualTo, In

    bits = base64.b85decode(bloom_row["vmin"])
    if isinstance(f, EqualTo):
        return bloom_might_contain(bits, f.value)
    if isinstance(f, In):
        return any(bloom_might_contain(bits, v) for v in f.value)
    return True

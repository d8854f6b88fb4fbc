"""Incremental materialized aggregates over the MVCC store.

``IncrementalVarStats`` maintains per-coordinate (per-chunk) statistics
for one variable as versions commit: each ``refresh`` decodes ONLY the
chunks whose coordinates were touched by versions newer than the
watermark, merges them into the persisted per-coord stats table, and
advances the watermark. Variable-level totals then roll up from the
per-coord grain without touching any chunk payload.

Why per-coord grain: under latest-≤-version semantics a rewritten chunk
REPLACES its old contribution, so sums/mins are not incrementally
maintainable at the variable grain — but they are trivially
maintainable as "replace this coord's row, re-roll-up". This is the
standard incremental-view-maintenance shape (delta = changed keys),
applied to the reference's chunk store.

Scale: refresh cost ∝ chunks touched since the watermark (the delta),
never variable size; the roll-up reads one row per coordinate. State
swaps atomically (write to tmp dir, directory swap — same protocol as
maintenance rewrites), so readers never see a half-merged table.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import functions as F

from mandoline_hbase_spark.errors import InvalidArgumentError

_STATS_SCHEMA = "coord_id string, n bigint, total double, vmin double, vmax double"


class IncrementalVarStats:
    def __init__(self, conn, var_name: str, state_dir: str, spark=None):
        self.conn = conn
        self.var_name = var_name
        self.state_dir = state_dir
        self.spark = spark or conn.spark
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _stats_dir(self) -> str:
        return os.path.join(self.state_dir, "coord_stats")

    @property
    def _watermark_path(self) -> str:
        return os.path.join(self.state_dir, "watermark.json")

    def _read_watermark(self) -> dict | None:
        """Missing OR unreadable watermark degrades to a full rebuild —
        a torn state file must never wedge refresh permanently."""
        try:
            with open(self._watermark_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except (json.JSONDecodeError, KeyError, ValueError, OSError):
            return None

    def watermark(self) -> int | None:
        data = self._read_watermark()
        return None if data is None else data.get("version")

    def _seen_committed(self) -> set[int] | None:
        """Version ids that were COMMITTED as of the last refresh. The
        delta is keyed on this set, not on ``version_id > watermark``:
        the reservation protocol commits ids out of order (a job that
        reserves early can commit after a later id has already landed),
        so an id-threshold delta would silently skip those rows."""
        data = self._read_watermark()
        if data is None:
            return None
        return set(int(v) for v in data.get("committed", []))

    def _decode_stats(self, joined, var_meta) -> Any:
        dtype = var_meta["dtype"]
        shape = tuple(var_meta["shape"])
        chunk_shape = tuple(var_meta["chunk_shape"])

        def stats(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = []
                for cid, coord, data in zip(pdf["coord_id"], pdf["coord"], pdf["data"]):
                    block = np.frombuffer(data, dtype=np.dtype(dtype)).reshape(
                        chunk_shape
                    )
                    # in-bounds mask: edge chunks carry fill padding past
                    # the variable shape, which must not count
                    sl = tuple(
                        slice(0, min(cs, s - int(c) * cs))
                        for c, cs, s in zip(coord, chunk_shape, shape)
                    )
                    vals = block[sl].reshape(-1).astype(np.float64)
                    if len(vals) == 0:
                        continue
                    rows.append(
                        {
                            "coord_id": cid,
                            "n": len(vals),
                            "total": float(vals.sum()),
                            "vmin": float(vals.min()),
                            "vmax": float(vals.max()),
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=["coord_id", "n", "total", "vmin", "vmax"]
                )

        return joined.mapInPandas(stats, schema=_STATS_SCHEMA)

    def refresh(self, version: int | None = None) -> dict:
        """Bring the materialized stats up to ``version`` (default
        latest). Returns a summary with the number of coordinate rows
        re-decoded (the delta size)."""
        conn = self.conn
        spark = self.spark
        bound, _meta, var_meta = conn._resolve_read(self.var_name, version)
        if len(var_meta["shape"]) == 0:
            raise InvalidArgumentError("scalar variables have no chunk grid to materialize")
        last = self.watermark()
        if last is not None and bound < last:
            raise InvalidArgumentError(
                f"cannot refresh backwards: watermark {last}, requested {bound}"
            )

        latest_map = conn.chunk_map_df(self.var_name, bound, spark)
        # keep only coords inside the CURRENT chunk grid: after a shrink,
        # stale coordinates still resolve (latest <= bound) but are outside
        # the variable's shape and must not contribute
        shape = var_meta["shape"]
        chunk_shape = var_meta["chunk_shape"]
        for d, (s, cs) in enumerate(zip(shape, chunk_shape)):
            n_chunks_d = -(-int(s) // int(cs))
            latest_map = latest_map.filter(F.col("coord")[d] < n_chunks_d)
        committed_now = sorted(
            int(v["version"]) for v in conn.versions() if int(v["version"]) <= bound
        )
        seen = self._seen_committed()
        if seen is not None:
            # delta = versions that COMMITTED since the last refresh (set
            # difference, not an id threshold: reserved-early ids commit
            # late and would slip under "> watermark")
            new_versions = [v for v in committed_now if v not in seen]
            if not new_versions:
                delta_map = None
            else:
                changed = (
                    conn.spark_table("indices", spark)
                    .filter(
                        (F.col("var_name") == self.var_name)
                        & F.col("version_id").isin(new_versions)
                    )
                    .select("coord_id")
                    .distinct()
                )
                delta_map = latest_map.join(changed, "coord_id", "left_semi")
        else:
            delta_map = latest_map  # first build: everything is the delta

        if delta_map is None:
            delta_rows = 0
        else:
            chunks = (
                conn.spark_table("chunks", spark)
                .filter(F.col("data").isNotNull())
                .dropDuplicates(["chunk_id"])
                .select("chunk_id", "data")
            )
            joined = delta_map.join(chunks, "chunk_id", "inner").select(
                "coord_id", "coord", "data"
            )
            # persist: the decode feeds the count, the anti-join AND the
            # merged write — without it the chunks are decoded three times
            fresh = self._decode_stats(joined, var_meta).persist()
            try:
                delta_rows = fresh.count()
                if last is not None and os.path.isdir(self._stats_dir):
                    old = spark.read.parquet(self._stats_dir)
                    # drop replaced coords AND coords no longer in the grid
                    # (shrink); keep everything else
                    valid = latest_map.select("coord_id")
                    kept = old.join(
                        fresh.select("coord_id"), "coord_id", "left_anti"
                    ).join(valid, "coord_id", "left_semi")
                    merged = kept.unionByName(fresh)
                else:
                    merged = fresh
                tmp = self._stats_dir + f".tmp-{uuid.uuid4().hex[:8]}"
                merged.write.mode("overwrite").parquet(tmp)
                live = self._stats_dir
                if os.path.isdir(live):
                    shutil.rmtree(live)
                os.replace(tmp, live)
            finally:
                fresh.unpersist()

        # atomic replace: a crash mid-write must leave the OLD watermark,
        # never a torn file (the module's state-swap contract)
        wm_tmp = self._watermark_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(wm_tmp, "w") as f:
            json.dump(
                {"version": int(bound), "var": self.var_name, "committed": committed_now},
                f,
            )
        os.replace(wm_tmp, self._watermark_path)
        return {
            "version": int(bound),
            "stats_rows": delta_rows,
            "incremental": last is not None,
        }

    def totals(self) -> dict:
        """Variable-level roll-up from the per-coord stats (no chunk IO)."""
        if not os.path.isdir(self._stats_dir):
            raise InvalidArgumentError("no materialized state; call refresh() first")
        row = (
            self.spark.read.parquet(self._stats_dir)
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
            .first()
        )
        return {
            "n": int(row["n"] or 0),
            "total": float(row["total"] or 0.0),
            "vmin": row["vmin"],
            "vmax": row["vmax"],
        }

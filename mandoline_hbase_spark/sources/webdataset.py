"""WebDataset-style tar-shard export/import — the multimodal training
delivery format.

Large multimodal training loaders stream tar shards whose members are
grouped by basename (``{key}.txt`` + ``{key}.json`` [+ ``{key}.bin``]),
the WebDataset convention. Export mirrors ``sources.jsonl``: rows are
assigned a shard by a stable hash of their id, each shard's rows land in
one task (``repartition(n, "shard")`` + ``applyInPandas`` per shard
group), and each task writes exactly one tar — executor-side IO, the
driver materializes only the k-row manifest.

Shards are byte-deterministic: members are sorted by key and tar
headers are normalized (mtime 0, fixed mode, no owner), so re-exports
of the same data produce identical files (verifiable by digest — the
manifest carries each shard's sha256).

At 100 TB: one shuffle (the shard repartition); shard count should
target 100 MB–1 GB per tar so loaders stream shards whole. The reader
is distributed too: ``binaryFile`` scan of the tars + ``mapInPandas``
member expansion, one task per shard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from mandoline_hbase_spark.sources.jsonl import shard_assignment

_MANIFEST_SCHEMA = "shard int, file string, n_members bigint, n_bytes bigint, sha256 string"


def export_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
    binary_col: str | None = None,
) -> DataFrame:
    """Write ``path/shard-%06d.tar`` WebDataset shards; returns the
    materialized manifest DataFrame (one row per shard).

    Each document becomes ``{key}.txt`` (utf-8 text) and ``{key}.json``
    (metadata from ``meta_cols``), plus ``{key}.bin`` when
    ``binary_col`` is given — ``key`` is the zero-padded id, so members
    group per-sample as WebDataset expects.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    os.makedirs(path, exist_ok=True)

    cols = [id_col, text_col, *meta_cols] + ([binary_col] if binary_col else [])
    sharded = shard_assignment(df.select(*cols), n_shards, id_col)

    # Self-contained closure: helpers defined inside so cloudpickle
    # serializes them by value (harness runs with a neutral cwd).
    def _write_shard(pdf):
        import hashlib
        import io
        import json
        import tarfile

        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        n_members = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:

            def add(name: str, payload: bytes) -> None:
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.mode = 0o644
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))

            for _, row in pdf.iterrows():
                key = f"{int(row[id_col]):012d}"
                add(f"{key}.txt", str(row[text_col]).encode("utf-8"))
                meta = {c: row[c] for c in meta_cols}
                meta[id_col] = int(row[id_col])
                add(
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True, default=str).encode("utf-8"),
                )
                if binary_col is not None and row[binary_col] is not None:
                    add(f"{key}.bin", bytes(row[binary_col]))
                n_members += 1
        blob = buf.getvalue()
        fname = f"shard-{shard:06d}.tar"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "file": fname,
                    "n_members": n_members,
                    "n_bytes": len(blob),
                    "sha256": hashlib.sha256(blob).hexdigest(),
                }
            ]
        )

    manifest = (
        sharded.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(_write_shard, schema=_MANIFEST_SCHEMA)
    )
    # materialize: the write happens inside the tasks; keep the manifest
    # tiny (k rows) and return it re-parallelized for further use
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Distributed read of a WebDataset export: one task per tar, members
    re-grouped by key into ``(shard, key, text, meta_json, bin)`` rows."""
    tars = spark.read.format("binaryFile").load(os.path.join(path, "*.tar"))

    def _expand(batches):
        import io
        import os as _os
        import tarfile

        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                fname = _os.path.basename(row["path"])
                shard = int(fname.split("-")[1].split(".")[0])
                with tarfile.open(fileobj=io.BytesIO(row["content"])) as tar:
                    samples = {}
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        samples.setdefault(key, {})[ext] = tar.extractfile(m).read()
                for key, parts in sorted(samples.items()):
                    out.append(
                        {
                            "shard": shard,
                            "key": key,
                            "text": parts.get("txt", b"").decode("utf-8"),
                            "meta_json": parts.get("json", b"").decode("utf-8"),
                            "bin": parts.get("bin"),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["shard", "key", "text", "meta_json", "bin"]
            )

    return tars.select("path", "content").mapInPandas(
        _expand, schema="shard int, key string, text string, meta_json string, bin binary"
    )

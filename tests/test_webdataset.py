"""WebDataset tar-shard sink: round trip, determinism, shard stability."""

from __future__ import annotations

import json
import os
import tarfile

from mandoline_hbase_spark.sources import webdataset
from mandoline_hbase_spark.sources.tables import load_table


def _docs(spark, n=40):
    return load_table(spark, "/root/testdata/sf0.001", "documents").limit(n)


def test_round_trip(spark, tmp_path):
    path = str(tmp_path / "wds")
    docs = _docs(spark)
    manifest = webdataset.export_webdataset(
        docs, path, n_shards=4, meta_cols=("lang", "source")
    )
    mrows = {r.shard: r for r in manifest.collect()}
    assert sum(r.n_members for r in mrows.values()) == docs.count()

    back = webdataset.read_webdataset(spark, path)
    got = {int(r.key): r for r in back.collect()}
    want = {r.doc_id: r for r in docs.collect()}
    assert set(got) == set(want)
    some = next(iter(got))
    assert got[some].text == want[some].text
    meta = json.loads(got[some].meta_json)
    assert meta["lang"] == want[some].lang and meta["source"] == want[some].source


def test_reexport_is_byte_identical(spark, tmp_path):
    docs = _docs(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r.shard: r.sha256 for r in webdataset.export_webdataset(docs, p1, 4).collect()}
    m2 = {r.shard: r.sha256 for r in webdataset.export_webdataset(docs, p2, 4).collect()}
    assert m1 == m2
    for f in os.listdir(p1):
        assert open(os.path.join(p1, f), "rb").read() == open(
            os.path.join(p2, f), "rb"
        ).read()


def test_members_grouped_and_sorted(spark, tmp_path):
    path = str(tmp_path / "wds")
    webdataset.export_webdataset(_docs(spark, 10), path, n_shards=2)
    for f in sorted(os.listdir(path)):
        with tarfile.open(os.path.join(path, f)) as tar:
            names = tar.getnames()
        # txt/json pairs adjacent, keys ascending
        keys = [n.rsplit(".", 1)[0] for n in names]
        assert keys == sorted(keys)
        for i in range(0, len(names), 2):
            assert names[i].endswith(".txt") and names[i + 1].endswith(".json")
            assert names[i].rsplit(".", 1)[0] == names[i + 1].rsplit(".", 1)[0]


def test_binary_column_round_trip(spark, tmp_path):
    path = str(tmp_path / "wds")
    rows = [(1, "hello", bytearray(b"\x00\x01\xff")), (2, "world", bytearray(b"abc"))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, payload binary")
    webdataset.export_webdataset(df, path, n_shards=1, binary_col="payload")
    back = {int(r.key): r for r in webdataset.read_webdataset(spark, path).collect()}
    assert bytes(back[1].bin) == b"\x00\x01\xff"
    assert bytes(back[2].bin) == b"abc"

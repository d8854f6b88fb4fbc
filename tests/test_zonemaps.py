"""Zone maps: sidecar stats round-trip, conservative pruning logic, and
end-to-end chunk skipping through the records reader's pushFilters."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNull,
    LessThanOrEqual,
    StringContains,
    StringStartsWith,
)

from mandoline_hbase_spark import zonemaps


def _stats(pdf, cid="c1"):
    rows = zonemaps.stats_rows(cid, pdf)
    return {r["column"]: r for r in rows}


def test_stats_rows_kinds():
    pdf = pd.DataFrame(
        {
            "i": [3, 1, 2],
            "f": [1.5, None, 2.5],
            "s": ["b", "a", "c"],
            "t": pd.to_datetime(["2020-01-02", "2020-01-01", "2020-01-03"]),
            "b": [True, False, True],
            "n": [None, None, None],
        }
    )
    st = _stats(pdf)
    assert st["i"]["kind"] == "num" and float(st["i"]["vmin"]) == 1.0
    assert st["f"]["nulls"] == 1 and float(st["f"]["vmax"]) == 2.5
    assert st["s"]["kind"] == "str" and st["s"]["vmin"] == "a" and st["s"]["vmax"] == "c"
    assert st["t"]["kind"] == "ts_us"
    # bounds are integer UTC microseconds (exact writer/reader arithmetic)
    assert int(st["t"]["vmin"]) == (
        datetime.datetime(2020, 1, 1) - datetime.datetime(1970, 1, 1)
    ) // datetime.timedelta(microseconds=1)
    assert "b" not in st  # bool: never pruned
    assert st["n"]["kind"] == "allnull"


def test_write_load_round_trip(tmp_path):
    pdf = pd.DataFrame({"x": [1, 5, 9]})
    zonemaps.write_stats(str(tmp_path / "stats"), zonemaps.stats_rows("abc", pdf))
    zonemaps.write_stats(str(tmp_path / "stats"), zonemaps.stats_rows("def", pdf * 10))
    loaded = zonemaps.load_stats(str(tmp_path / "stats"), ["abc", "def", "missing"])
    assert set(loaded) == {"abc", "def"}
    assert float(loaded["def"]["x"]["vmax"]) == 90.0
    assert zonemaps.load_stats(str(tmp_path / "nope"), ["abc"]) == {}


@pytest.mark.parametrize(
    "filt,expected",
    [
        (EqualTo(("x",), 5), True),
        (EqualTo(("x",), 11), False),
        (EqualTo(("x",), 0), False),
        (GreaterThan(("x",), 9), False),
        (GreaterThan(("x",), 8), True),
        (LessThanOrEqual(("x",), 0), False),
        (LessThanOrEqual(("x",), 1), True),
        (In(("x",), (0, 11)), False),
        (In(("x",), (0, 5)), True),
        (IsNull(("x",)), False),
        (EqualTo(("other",), 1), True),        # no stats for column -> keep
        (EqualTo(("x",), "str-typed"), True),  # kind mismatch -> keep
        (StringContains(("x",), "1"), True),   # unsupported shape -> keep
    ],
)
def test_numeric_pruning(filt, expected):
    st = _stats(pd.DataFrame({"x": [1, 5, 9]}))
    assert zonemaps._may_match_one(st, filt) is expected


@pytest.mark.parametrize(
    "filt,expected",
    [
        (StringStartsWith(("s",), "m"), True),
        (StringStartsWith(("s",), "z"), False),   # above vmax
        (StringStartsWith(("s",), "a"), False),   # below vmin's prefix region
        (EqualTo(("s",), "mm"), True),
        (EqualTo(("s",), "zz"), False),
    ],
)
def test_string_pruning(filt, expected):
    st = _stats(pd.DataFrame({"s": ["goose", "moose", "swan"]}))
    assert zonemaps._may_match_one(st, filt) is expected


def test_allnull_chunk_pruning():
    st = _stats(pd.DataFrame({"x": [None, None]}))
    assert zonemaps._may_match_one(st, EqualTo(("x",), 1)) is False
    assert zonemaps._may_match_one(st, IsNull(("x",))) is True


def test_legacy_ts_sidecar_never_prunes():
    """Pre-ts_us sidecars stored epoch-seconds floats under kind 'ts'.
    Their bounds are three orders of magnitude off the current
    microsecond filter values, so the reader must treat them as
    unparseable (keep the chunk) — never compare and wrong-prune."""
    t = datetime.datetime(2020, 1, 1)
    legacy = {
        "x": {
            "chunk_id": "c1",
            "column": "x",
            "kind": "ts",  # legacy epoch-seconds format
            "vmin": repr(t.timestamp()),
            "vmax": repr((t + datetime.timedelta(days=2)).timestamp()),
            "nulls": 0,
            "nrows": 3,
        }
    }
    # filter value inside the legacy chunk's real range: a naive
    # seconds-vs-microseconds compare would prove "no match" and drop rows
    probe = t + datetime.timedelta(days=1)
    for f in (
        EqualTo(("x",), probe),
        GreaterThan(("x",), probe),
        LessThanOrEqual(("x",), probe),
        In(("x",), (probe,)),
        StringStartsWith(("x",), "2020"),
    ):
        assert zonemaps._may_match_one(legacy, f) is True
    # null accounting is format-independent and still works on legacy rows
    assert zonemaps._may_match_one(legacy, IsNull(("x",))) is False
    # current-format rows on the same values still prune
    current = _stats(pd.DataFrame({"x": pd.to_datetime(["2020-01-01", "2020-01-03"])}))
    assert zonemaps._may_match_one(current, EqualTo(("x",), t + datetime.timedelta(days=30))) is False


def test_prune_chunks_keeps_statless():
    entries = [((0,), "a"), ((1,), "b")]
    stats = {"a": {"x": zonemaps.stats_rows("a", pd.DataFrame({"x": [1, 2]}))[0]}}
    kept = zonemaps.prune_chunks(entries, stats, [EqualTo(("x",), 99)])
    assert kept == [((1,), "b")]  # a provably excluded, statless b kept
    assert zonemaps.prune_chunks(entries, {}, [EqualTo(("x",), 99)]) == entries


# -- end to end through the data source --------------------------------------


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-zonemap-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    register(spark)
    yield spark


@pytest.fixture()
def store(tmp_path):
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema({"root": "integration-testing.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("zm-ds")
    yield schema.connect("zm-ds")


def _seed_clustered(ds_spark, store, n=400, chunks=4):
    df = ds_spark.createDataFrame(
        [(i, f"name-{i:04d}", float(i)) for i in range(n)],
        "id BIGINT, name STRING, score DOUBLE",
    )
    (
        df.repartitionByRange(chunks, "id")  # clustered layout: disjoint id ranges
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )


def test_reader_prunes_chunks_with_pushed_filters(ds_spark, store):
    # pruning lives on the OPT-IN reader subclass (filter_pruning=true):
    # the default reader declares no pushFilters so Spark's per-relation
    # read-plan cache can never serve filter-pruned partitions to a
    # filterless query
    from mandoline_hbase_spark.sources.datasource import MandolinePruningBatchReader

    _seed_clustered(ds_spark, store)
    opts = {"path": store.dataset_dir, "variable": "records"}
    full = MandolinePruningBatchReader(opts, "records")
    n_all = len(full.partitions())
    assert n_all == 4

    pruned = MandolinePruningBatchReader(opts, "records")
    leftover = list(pruned.pushFilters([EqualTo(("id",), 7)]))
    assert len(leftover) == 1, "all filters must still be evaluated by Spark"
    assert len(pruned.partitions()) == 1  # point lookup -> one chunk

    rng = MandolinePruningBatchReader(opts, "records")
    rng.pushFilters([GreaterThan(("id",), 150), LessThanOrEqual(("id",), 240)])
    assert 1 <= len(rng.partitions()) <= 2  # range scan -> the overlapping chunks


def test_e2e_filter_results_exact_with_pruning(ds_spark, store):
    _seed_clustered(ds_spark, store)
    df = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
    )
    got = df.filter("id = 7").collect()
    assert [(r.id, r.name) for r in got] == [(7, "name-0007")]
    # a filter zone maps cannot prune still returns exact results
    assert df.filter("name like '%0233'").count() == 1
    assert df.filter("id >= 390").count() == 10


def test_merge_rewrites_refresh_stats(ds_spark, store):
    from mandoline_hbase_spark.merge import merge_records
    from mandoline_hbase_spark.sources.datasource import _snapshot

    _seed_clustered(ds_spark, store, n=40, chunks=2)
    upd = ds_spark.createDataFrame(
        [(5, "x", 5000.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    merge_records(ds_spark, store.dataset_dir, upd, ["id"])
    _, _, entries = _snapshot(store.dataset_dir, "records", None)
    cids = [cid for _, cid in entries]
    stats = zonemaps.load_stats(
        store.dataset_dir + "/" + zonemaps.STATS_SUBDIR, cids
    )
    assert set(stats) == set(cids), "every live chunk (incl. rewritten) has stats"
    # the rewritten chunk's score range includes the new 5000.0
    assert any(float(s["score"]["vmax"]) == 5000.0 for s in stats.values())


# -- bloom filters ------------------------------------------------------------


def test_bloom_no_false_negatives():
    vals = [f"v{i}" for i in range(500)] + list(range(500))
    bits = zonemaps.bloom_bits(vals)
    assert all(zonemaps.bloom_might_contain(bits, v) for v in vals)


def test_bloom_prunes_absent_values():
    bits = zonemaps.bloom_bits(list(range(100)))
    misses = sum(
        0 if zonemaps.bloom_might_contain(bits, v) else 1 for v in range(10_000, 10_200)
    )
    assert misses > 190, "4KiB/7-hash bloom over 100 values must reject ~all absent keys"


def test_bloom_int_float_and_timestamp_parity():
    import pandas as pd

    ts = pd.to_datetime(["2024-03-01 12:00:00.123456"])
    bits_i = zonemaps.bloom_bits([7])
    assert zonemaps.bloom_might_contain(bits_i, 7.0), "int写 float查 must agree"
    bits_t = zonemaps.bloom_bits(ts.tolist())
    assert zonemaps.bloom_might_contain(
        bits_t, datetime.datetime(2024, 3, 1, 12, 0, 0, 123456)
    ), "pandas-written timestamp must match datetime filter value"


def test_bloom_skips_scrambled_layout(ds_spark, store):
    """The case min/max cannot touch: hash-scrambled ingest where every
    chunk spans the whole id range — blooms still prune point lookups."""
    from mandoline_hbase_spark.sources.datasource import MandolinePruningBatchReader

    df = ds_spark.createDataFrame(
        [(i, f"name-{i:04d}", float(i)) for i in range(400)],
        "id BIGINT, name STRING, score DOUBLE",
    )
    (
        df.repartition(4, "name")  # scrambled on id
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("bloom_columns", "id")
        .mode("append")
        .save()
    )
    opts = {"path": store.dataset_dir, "variable": "records"}
    point = MandolinePruningBatchReader(opts, "records")
    point.pushFilters([EqualTo(("id",), 123)])
    assert len(point.partitions()) == 1, "bloom miss is definitive on 3 of 4 chunks"

    # end to end stays exact
    out = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
        .filter("id = 123")
        .collect()
    )
    assert [(r.id, r.name) for r in out] == [(123, "name-0123")]


def test_timestamp_range_pruning_e2e(ds_spark, store):
    """Timestamp zone maps: a time-range filter prunes chunks of a
    time-clustered table, and the pandas-vs-datetime epoch normalization
    agrees end to end (results stay exact)."""
    import pyspark.sql.functions as SF

    df = ds_spark.range(400).select(
        SF.col("id"),
        SF.timestamp_seconds(SF.lit(1700000000) + SF.col("id") * 3600).alias("ts"),
    )
    (
        df.repartitionByRange(4, "ts")
        .write.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    from pyspark.sql.datasource import GreaterThanOrEqual
    import datetime

    cutoff = datetime.datetime.utcfromtimestamp(1700000000 + 399 * 3600)
    from mandoline_hbase_spark.sources.datasource import MandolinePruningBatchReader

    r = MandolinePruningBatchReader({"path": store.dataset_dir, "variable": "records"}, "records")
    r.pushFilters([GreaterThanOrEqual(("ts",), cutoff)])
    assert len(r.partitions()) == 1, "only the newest chunk can hold the cutoff hour"

    out = (
        ds_spark.read.format("mandoline")
        .option("path", store.dataset_dir)
        .option("variable", "records")
        .option("form", "records")
        .load()
        .filter(SF.col("ts") >= SF.lit(cutoff))
        .collect()
    )
    assert [r_.id for r_ in out] == [399]

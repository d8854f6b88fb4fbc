"""Model-based property test: random upsert/delete batches applied via
MERGE must equal a plain dict model — at the head AND at every
intermediate version via time travel (the MVCC contract under mutation)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mandoline_hbase_spark.merge import merge_records

SCHEMA = "id BIGINT, name STRING, score DOUBLE"

# a batch: {key: row-or-None}; None = delete that key
_batch = st.dictionaries(
    st.integers(min_value=0, max_value=14),
    st.one_of(
        st.none(),
        st.tuples(
            st.text(alphabet="abcxyz", min_size=0, max_size=4),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
    ),
    min_size=1,
    max_size=6,
)


@pytest.fixture(scope="module")
def ds_spark(tmp_path_factory):
    from mandoline_hbase_spark.session import get_spark
    from mandoline_hbase_spark.sources.datasource import register

    spark = get_spark(
        app_name="mandoline-merge-property-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    register(spark)
    yield spark


def _read_version(ds_spark, path, version=None):
    r = (
        ds_spark.read.format("mandoline")
        .option("path", path)
        .option("variable", "records")
        .option("form", "records")
    )
    if version is not None:
        r = r.option("version", version)
    return {row.id: (row.name, row.score) for row in r.load().collect()}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=st.lists(_batch, min_size=1, max_size=4))
def test_merge_matches_dict_model(ds_spark, tmp_path_factory, batches):
    from mandoline_hbase_spark.engine import mk_schema

    base = tmp_path_factory.mktemp("merge-prop")
    schema = mk_schema({"root": "integration-testing.mandoline.io", "base_path": str(base)})
    schema.create_dataset("prop-ds")
    conn = schema.connect("prop-ds")

    # seed
    seed = {i: (f"seed-{i}", float(i)) for i in range(0, 15, 3)}
    (
        ds_spark.createDataFrame([(k, n, s) for k, (n, s) in seed.items()], SCHEMA)
        .repartition(2)
        .write.format("mandoline")
        .option("path", conn.dataset_dir)
        .option("variable", "records")
        .mode("append")
        .save()
    )
    model = dict(seed)
    snapshots = [(int(conn.versions()[0]["version"]), dict(model))]

    for batch in batches:
        deletes = [k for k, v in batch.items() if v is None and k in model]
        upserts = {k: v for k, v in batch.items() if v is not None}
        if deletes:
            merge_records(
                ds_spark,
                conn.dataset_dir,
                ds_spark.createDataFrame([(k,) for k in deletes], "id BIGINT"),
                ["id"],
                when_matched="delete",
                insert_not_matched=False,
            )
            for k in deletes:
                model.pop(k, None)
        if upserts:
            merge_records(
                ds_spark,
                conn.dataset_dir,
                ds_spark.createDataFrame(
                    [(k, n, float(s)) for k, (n, s) in upserts.items()], SCHEMA
                ),
                ["id"],
            )
            for k, (n, s) in upserts.items():
                model[k] = (n, float(s))
        snapshots.append((int(conn.versions()[0]["version"]), dict(model)))

    # head matches the model
    assert _read_version(ds_spark, conn.dataset_dir) == model
    # every intermediate version still reads as it did when committed
    for version, snap in snapshots:
        assert _read_version(ds_spark, conn.dataset_dir, version) == snap

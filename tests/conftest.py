from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from mandoline_hbase_spark.session import get_spark

    spark = get_spark(
        app_name="mandoline-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/spark-warehouse"},
    )
    yield spark


@pytest.fixture()
def store(tmp_path):
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema({"root": "integration-testing.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("test-dataset")
    yield schema.connect("test-dataset")

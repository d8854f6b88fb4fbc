"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mandoline_hbase_spark.queries.catalog``;
this module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mandoline_hbase_spark.queries.catalog import QUERIES, driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-backed queries, least-previously-verified first.

    The driver adjudicates a bounded prefix of this dict in order; after
    rounds 1-2, 96 queries hold green hash-match rows, so round 3 leads
    with the 43 that never got one: the sql_surface family, the
    curation stragglers, the re-predicated TPC-H rows, and the former
    rows-only sketch/ANN queries now emitting exact-twin values plus
    in-plan contract claims. Since round 8 EVERY catalog query is
    oracle-backed: the last holdout (dedup_semantic_pairs_blas) now
    runs the BLAS gram matrix over integer micro-unit embeddings, so
    its pair set is order-independent and hash-exact against DuckDB.
    """
    return {name: q.fn for name, q in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query, same order as ``queries()``."""
    return {name: q.oracle for name, q in driver_queries().items()}

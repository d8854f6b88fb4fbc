"""Query catalog: every query the engine claims, paired with its oracle.

Each :class:`Query` bundles

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation
  (DataFrame API; Catalyst plans the physical strategy), and
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run over the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings), or ``None`` for queries whose
  semantics SQL cannot express (the driver then records a rows-only check).

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.

The registry is populated by the modules imported at the bottom of this
file; ``__spark_entry__.py``, ``bench.py`` and the tests all read it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, description=description, tags=tags)
        return fn

    return deco


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


# Populate the registry (import order defines catalog order).
from mandoline_hbase_spark.queries import relational  # noqa: E402,F401
from mandoline_hbase_spark.queries import relational_ext  # noqa: E402,F401
from mandoline_hbase_spark.queries import tpch_remaining  # noqa: E402,F401
from mandoline_hbase_spark.queries import events_analytics  # noqa: E402,F401
from mandoline_hbase_spark.queries import llmops  # noqa: E402,F401
from mandoline_hbase_spark.queries import curation_ext  # noqa: E402,F401

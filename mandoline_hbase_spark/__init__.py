"""mandoline_hbase_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``jmelching/mandoline-hbase`` (an HBase backend for Mandoline, The Climate
Corporation's versioned, chunked, N-dimensional array store) as an idiomatic
Apache Spark engine:

- **Storage layer** (``engine``, ``chunkstore``, ``index``, ``versions``):
  versioned datasets backed by three parquet-backed tables per dataset
  (``chunks``, ``chunk_index``, ``versions``) with content-addressed chunk
  dedup, compare-and-swap index commits, and latest-<=-version (MVCC
  snapshot) read resolution — the semantics of
  ``/root/reference/src/io/mandoline/backend/hbase.clj``.
- **Relational layer** (``queries``): a catalog of DataFrame/SQL queries
  over TPC-H-ish tables, each paired with an ANSI-SQL oracle.
- **LLM-data-pipeline operators** (``operators``): dedup (exact, MinHash
  LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search,
  text analysis, multimodal column plumbing.
- **Streaming** (``streaming``): Structured Streaming ingest committing
  one storage version per micro-batch.

Design stance: DataFrame-first, Catalyst-optimized; Python/driver code only
orchestrates commits (the metadata plane), all data-plane work is Spark jobs.
"""

from mandoline_hbase_spark.engine import Engine, mk_schema
from mandoline_hbase_spark.session import get_spark

__all__ = ["Engine", "mk_schema", "get_spark"]
__version__ = "0.1.0"

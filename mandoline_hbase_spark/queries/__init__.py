from mandoline_hbase_spark.queries.catalog import QUERIES, Query, oracle_sql_map, queries_map

__all__ = ["QUERIES", "Query", "queries_map", "oracle_sql_map"]

from mandoline_hbase_spark.sources.tables import TABLES, load_table, load_tables, register_views


def register_datasource(spark) -> None:
    """Register ``format("mandoline")`` on the session (lazy import so the
    pickle-by-value registration only happens when the source is used)."""
    from mandoline_hbase_spark.sources.datasource import register

    register(spark)


__all__ = ["TABLES", "load_table", "load_tables", "register_views", "register_datasource"]

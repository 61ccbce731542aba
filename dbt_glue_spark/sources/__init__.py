from dbt_glue_spark.sources.registry import TABLES, load_table, register_sources

__all__ = ["TABLES", "load_table", "register_sources"]

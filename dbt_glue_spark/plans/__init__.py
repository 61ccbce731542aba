from dbt_glue_spark.plans.catalog import QUERIES, ORACLES, QuerySpec

__all__ = ["QUERIES", "ORACLES", "QuerySpec"]

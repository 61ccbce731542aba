from dbt_glue_spark.operators.merge import merge_upsert
from dbt_glue_spark.operators.schema_evolution import diff_schemas, evolve

__all__ = ["merge_upsert", "diff_schemas", "evolve"]

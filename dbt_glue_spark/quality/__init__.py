from dbt_glue_spark.quality.tests import (
    accepted_values,
    not_null,
    relationships,
    unique,
)

__all__ = ["accepted_values", "not_null", "relationships", "unique"]

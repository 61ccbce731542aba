from dbt_glue_spark.materializations.snapshot import scd2_apply
from dbt_glue_spark.materializations.seed import infer_seed_df

__all__ = ["scd2_apply", "infer_seed_df"]

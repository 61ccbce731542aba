from dbt_glue_spark.extensions import dedup, similarity, text_analysis, multimodal

__all__ = ["dedup", "similarity", "text_analysis", "multimodal"]

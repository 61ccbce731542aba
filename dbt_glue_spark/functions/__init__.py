from dbt_glue_spark.functions.scalars import scd_hash
from dbt_glue_spark.functions.vectors import cosine_sim, dot, l2_norm
from dbt_glue_spark.functions.text import tokens, word_shingles, normalize_text

__all__ = [
    "scd_hash",
    "cosine_sim",
    "dot",
    "l2_norm",
    "tokens",
    "word_shingles",
    "normalize_text",
]

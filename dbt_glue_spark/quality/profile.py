"""Distributed column profiling — the "what's in this table" pass a
curation pipeline runs before designing filters (null rates, cardinality,
ranges). One job, one output row per profiled column.

Shape: a SINGLE aggregate computes every stat (count / non-null count /
exact COUNT(DISTINCT) / min / max per column), then the one-row result is
pivoted to rows via explode(array(struct…)) — driver never sees data, the
pivot is over a 1-row frame.

Scale note: exact multi-column COUNT(DISTINCT) makes Catalyst plan an
Expand (input replicated once per distinct-column) — fine for a handful of
profiled columns, deliberate here because exactness is what the oracle
gate checks. For wide tables at 100 TB profile in column batches, or use
extensions.sketches.hll_distinct / kmv_distinct for the cardinality leg
(constant-memory, one pass for ALL columns via unpivot-then-sketch).

The reference (aws-samples/dbt-glue) has no profiling surface — engine
extension in the dbt-utils/soda tradition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` (numeric/date/string all fine; min/max are cast to
    double so the output schema is stable — pass numeric columns when the
    range matters). Output: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per column."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def profile_oracle_sql(source: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_columns` (for parity gates)."""
    arms = "\n    UNION ALL ".join(
        f"""SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_value,
               CAST(MAX({c}) AS DOUBLE) AS max_value
        FROM {source}"""
        for c in cols
    )
    return arms

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


def key_skew(df: "DataFrame", key_col: str, top_k: int = 5) -> "DataFrame":
    """Join/aggregation-key skew audit: the distribution diagnostics you
    run BEFORE shuffling 100 TB on a key — hottest ``top_k`` keys with
    their row share and skew-vs-average ratio, plus global key stats.
    A skew_vs_avg of 1000 on the planned join key means one reducer gets
    1000× the average partition and the stage runs at the speed of that
    straggler; the fix (salting, AQE skew-join, broadcast) is chosen from
    exactly this table.

    100 TB shape: one partial-aggregated groupBy on the key (the same
    shuffle the planned join would pay, but emitting counts, not
    payload); the global top-k compiles to TakeOrderedAndProject
    (per-partition top-k, k-row driver merge — the ungrouped-KMV
    lesson, never a global window); stats are a 1-row broadcast.
    """
    from pyspark.sql import Window

    from dbt_glue_spark.functions.scalars import half_up_round

    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc(key_col)).limit(top_k)
    # rank assignment happens on the ≤ top_k surviving rows only
    w = Window.orderBy(F.desc("cnt"), F.asc(key_col))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(stats))
        .select(
            F.col("rk").cast("int").alias("rk"),
            F.col(key_col).cast("bigint").alias("key_value"),
            F.col("cnt").cast("bigint").alias("n_key_rows"),
            half_up_round(F.col("cnt") / F.col("n_rows"), 6).alias("row_share"),
            half_up_round(
                F.col("cnt") / (F.col("n_rows").cast("double") / F.col("n_keys")), 2
            ).alias("skew_vs_avg"),
            "n_keys",
            "n_rows",
        )
    )

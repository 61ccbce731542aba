"""UDF/UDTF surface queries (SURVEY.md §2.10).

The reference's UDF story is "ship Python to the cluster" (python models,
reference: dbt/adapters/glue/impl.py python_submission_helpers); in-process
the equivalent surface is Spark's own: Python UDTFs (one row → many rows
with arbitrary per-row logic), Arrow-batched grouped-agg pandas UDFs, and
mapInPandas (covered by extensions/multimodal). Each entry here pairs the
Python-side operator with a DuckDB oracle computing the same result
relationally — proving the UDF output is exactly what a pure-SQL engine
would produce.

Scale note: these are the SLOW path by design (serialization across the
JVM/Python boundary, Arrow-batched for the pandas forms). The catalog keeps
them to a scoped slice; the fast paths for the same jobs are the pure-
Catalyst queries (ext_text_stats, order_price_quantiles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_glue_spark.plans.catalog import register
from dbt_glue_spark.sources.registry import load_table


@register(
    "udtf_token_stats",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      FROM documents WHERE doc_id <= 20
    ),
    pos AS (
      SELECT doc_id, toks[i] AS tok, CAST(i - 1 AS INT) AS p
      FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    )
    SELECT doc_id, tok,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(p) AS INT) AS first_pos
    FROM pos GROUP BY doc_id, tok
    """,
    doc="Python UDTF (§2.10): one document row → one row per distinct "
    "token with (count, first position), via arbitrary per-row Python "
    "(a dict accumulation loop) invoked through SQL LATERAL. The oracle "
    "recomputes it relationally (posexplode + groupBy) — UDTF output "
    "must equal the pure-SQL answer. Scoped to 21 docs: row-at-a-time "
    "Python is the slow path; the scalable twin is ext_token_positions "
    "+ groupBy.",
)
def udtf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, n: bigint, first_pos: int")
    class TokenStats:
        def eval(self, text: str):
            if not text:
                # NULL/empty document → no token rows (the oracle's
                # generate_series over a NULL/empty list yields none);
                # re.split(None) would TypeError inside the worker
                return
            counts: dict[str, list[int]] = {}
            # re.ASCII pins \s to ASCII whitespace: Python's unicode \s
            # also splits on U+3000/NBSP, which neither Spark's (Java)
            # nor DuckDB's (RE2) \s does — the repo tokenization
            # contract is ASCII whitespace everywhere (unicode axis
            # divergence: 541 vs 400 rows on exotic-space documents)
            for pos, tok in enumerate(
                t for t in re.split(r"\s+", text, flags=re.ASCII) if t
            ):
                if tok in counts:
                    counts[tok][0] += 1
                else:
                    counts[tok] = [1, pos]
            for tok, (n, first_pos) in counts.items():
                yield tok, n, first_pos

    spark.udtf.register("token_stats", TokenStats)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.tok, s.n, s.first_pos "
        "FROM __udtf_docs d, LATERAL token_stats(d.text) s"
    )


@register(
    "udf_grouped_median",
    """
    SELECT o_orderpriority,
           CAST(MEDIAN(o_totalprice) AS DOUBLE) AS median_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Grouped-aggregate pandas UDF (§2.10): per-priority median order "
    "price via numpy over Arrow-transferred batches. numpy's even-count "
    "median (mean of the two middle doubles) matches DuckDB MEDIAN "
    "exactly — no summation, no rounding gap. The whole group must fit "
    "in one executor's memory (grouped-agg UDF contract): fine for "
    "|priorities|=5 groups of order rows at this SF; at 100 TB the same "
    "question is answered by percentile_approx or the exact two-pass "
    "order_price_quantiles query.",
)
def udf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def np_median(v: "pd.Series") -> "float":
        # NULL prices arrive as NaN; SQL MEDIAN ignores NULLs, and
        # np.median over a NaN-bearing array would poison the result
        arr = v.dropna().to_numpy()
        return float(np.median(arr)) if len(arr) else None

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg —
    # the row count rides along as a second pandas aggregate
    @pandas_udf("long")
    def np_count(v: "pd.Series") -> "int":
        return int(len(v))

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        np_median("o_totalprice").alias("median_price"),
        np_count("o_totalprice").alias("n_orders"),
    )

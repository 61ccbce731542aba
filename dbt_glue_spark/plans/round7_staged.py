"""Round-7 STAGED queries — built and parity-proven during round 6, but
deliberately NOT registered in the live catalog.

The live catalog is frozen at 214 entries until the driver's
CORRECTNESS_r06.json closes the last 31 never-driver-checked rows: the
driver samples a 50-query prefix of the rotation, and any new entry would
land in the never-checked tier and dilute that sample (catalog.py
`_interleaved`). These specs use the same :class:`QuerySpec` contract and
are exercised by tests/test_round7_staged.py with the exact DuckDB
compare, so promotion in round 7 is a one-line import in
``catalog._load_all`` plus moving the ``register`` calls — with parity
already proven.

Promotion checklist (round 7, AFTER CORRECTNESS_r06.json exists):
  1. move these @register_staged specs into plans/extension_queries.py
     (swap the decorator for the live ``register``), or import this
     module from catalog._load_all with register_staged aliased;
  2. add the three names to bench.py's headline set if desired;
  3. delete this docstring's checklist and re-run `pytest -m parity`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_glue_spark.extensions import sampling, text_analysis
from dbt_glue_spark.extensions.sampling import _PRIORITY_SPACE
from dbt_glue_spark.extensions.sketches import _duck_hash_int
from dbt_glue_spark.plans.catalog import QuerySpec
from dbt_glue_spark.sources.registry import load_table

_STAGED: dict[str, QuerySpec] = {}


def register_staged(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _STAGED[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def STAGED() -> dict[str, QuerySpec]:
    return dict(_STAGED)


_WS_K = 256
_WS_W = "GREATEST(COALESCE(CAST(n_chars AS BIGINT), 1), 1)"


@register_staged(
    "ext_weighted_sample",
    f"""
    WITH pri AS (
      SELECT doc_id,
             {_WS_W} AS weight,
             (({_duck_hash_int("'7:' || CAST(doc_id AS VARCHAR)")} + 1) * 1000)
               // {_WS_W} AS priority
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY priority, doc_id) AS rn FROM pri
    ),
    tau AS (
      SELECT MAX(CASE WHEN rn = {_WS_K + 1} THEN priority END) AS tq FROM ranked
    )
    SELECT doc_id, weight, priority,
           FLOOR((CASE WHEN tq IS NULL THEN CAST(weight AS DOUBLE)
                       ELSE GREATEST(CAST(weight AS DOUBLE),
                                     {float(_PRIORITY_SPACE)!r} / CAST(tq AS DOUBLE))
                  END) * 10000.0 + 0.5) / 10000.0 AS est_weight
    FROM ranked, tau
    WHERE rn <= {_WS_K}
    """,
    doc="Priority sampling (Duffield–Lund–Thorup 2007): 256-row "
    "weight-sensitive sample of documents by n_chars with the unbiased "
    "subset-sum estimator weight max(w, tau). Integer floor-division "
    "priorities (no pow/log on the oracle boundary); "
    "TakeOrderedAndProject top-k, no corpus shuffle.",
)
def ext_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.weighted_sample(docs, "doc_id", "n_chars", k=_WS_K, seed="7")


@register_staged(
    "ext_pmi_pairs",
    r"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS tok
      FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    ),
    pr AS (
      SELECT least(a.tok, b.tok) AS tok_a, greatest(a.tok, b.tok) AS tok_b
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3
      WHERE a.tok <> b.tok
    ),
    pairs AS (
      SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM pr GROUP BY tok_a, tok_b
    ),
    marg AS (
      SELECT tok, CAST(SUM(c_ab) AS BIGINT) AS m FROM (
        SELECT tok_a AS tok, c_ab FROM pairs
        UNION ALL
        SELECT tok_b AS tok, c_ab FROM pairs
      ) GROUP BY tok
    ),
    p AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS pt FROM pairs)
    SELECT tok_a, tok_b, c_ab, ma.m AS m_a, mb.m AS m_b,
           (((c_ab * 1000000) // ma.m) * pt) // mb.m AS pmi_q6
    FROM pairs
    JOIN marg ma ON ma.tok = tok_a
    JOIN marg mb ON mb.tok = tok_b, p
    WHERE c_ab >= 5
    ORDER BY pmi_q6 DESC, tok_a, tok_b LIMIT 50
    """,
    doc="Collocation mining: top-50 token pairs within a 3-token window by "
    "log-free pair-space PMI ratio (exact staged int64 floor divisions). "
    "Spark side generates pairs from the token array inside one codegen'd "
    "projection — no positional self-join, one map-side-combining groupBy.",
)
def ext_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return text_analysis.pmi_pairs(docs, "text", window=3, min_count=5, k=50)


@register_staged(
    "ext_zipf_buckets",
    r"""
    WITH tk AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY tok
    ),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
      FROM counts
    )
    SELECT CAST(LENGTH(CAST(rank AS VARCHAR)) AS INT) AS rank_decade,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences,
           CAST(MAX(freq) AS BIGINT) AS max_freq,
           CAST(MIN(freq) AS BIGINT) AS min_freq,
           CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_types
    FROM ranked GROUP BY rank_decade
    """,
    doc="Zipf corpus-shape audit: frequency spectrum by rank decade "
    "(types, mass, freq range, hapax count per decade) — all-integer, "
    "log-free. Spark's only global window runs over distinct frequency "
    "values, never the vocabulary.",
)
def ext_zipf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return text_analysis.zipf_rank_buckets(docs, "text")

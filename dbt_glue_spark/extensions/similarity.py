"""Similarity search over embedding columns (array<float>).

Driver-mandated extension (not in the reference). Two tiers:

- ``knn_bruteforce`` — exact top-k cosine. The query side is broadcast
  (small set of probe vectors); the corpus side streams through a single
  narrow scan — no shuffle of the corpus at all. This is the correct
  baseline even at 100 TB when |queries| is small: cost = one pass.
- ``knn_lsh`` / ``all_pairs_cosine(buckets>0)`` — random-hyperplane LSH:
  corpus and queries are bucketed by sign-pattern of projections onto
  deterministic pseudo-random hyperplanes; only same-bucket pairs are
  scored. Turns the corpus-side cross join into an equi-join Catalyst
  shuffles on the bucket key. Recall < 1.0 by construction; band multiple
  tables for higher recall.

All vector math is Catalyst higher-order functions in double precision
(functions/vectors.py) — no Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_glue_spark.functions.scalars import half_up_round
from dbt_glue_spark.functions.vectors import cosine_sim


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (pure function of
    (dim, plane_idx) — identical on every executor and every engine)."""
    # xorshift-free LCG so the oracle can reproduce it if ever needed
    vals = []
    state = 2654435761 * (plane_idx + 1) % (2**32)
    for _ in range(dim):
        state = (1103515245 * state + 12345) % (2**31)
        vals.append((state / float(2**31)) * 2.0 - 1.0)
    return vals


def sign_bucket(vec: Column, dim: int, planes: int) -> Column:
    """LSH bucket id: concatenated signs of <vec, hyperplane_i>."""
    bits = []
    for p in range(planes):
        hp = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        d = F.aggregate(
            F.zip_with(vec.cast("array<double>"), hp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast the (small) query set against the corpus scan; rank with a
    window partitioned by query id. Ties broken by neighbor id so results
    are total-ordered and engine-stable. Self-matches excluded.

    Returns (query_id, neighbor_id, sim) — sim half-up rounded so the
    DuckDB oracle (same formula) hashes identically.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", half_up_round(cosine_sim(F.col("__qv"), F.col("__cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    planes: int = 6,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket (query, corpus) pairs.

    The bucket equi-join replaces the broadcast cross join — this is the
    scale path when the query set itself is large (e.g. corpus-vs-corpus).
    2^planes buckets; expected candidate fraction 2^-planes per table pair.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        sign_bucket(F.col(vec_col), dim, planes).alias("__b"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        sign_bucket(F.col(vec_col), dim, planes).alias("__b"),
    )
    scored = (
        c.join(q, "__b")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", half_up_round(cosine_sim(F.col("__qv"), F.col("__cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def all_pairs_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    buckets: int = 0,
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold. buckets=0 → exact (self cross
    join, only viable for small/filtered inputs); buckets=p → LSH-bucketed
    equi-join (approximate, scale path).

    Returns (id_a, id_b, sim), id_a < id_b.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if buckets > 0:
        base = base.withColumn("__b", sign_bucket(F.col("v"), dim, buckets))
        cond = (F.col("a.__b") == F.col("b.__b")) & (F.col("a.id") < F.col("b.id"))
    else:
        cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, cond)
        .withColumn("sim", half_up_round(cosine_sim(F.col("a.v"), F.col("b.v")), round_digits))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sim")
    )

"""Distributed k-means over embedding columns — the clustering step of a
corpus curation pipeline (topic bucketing, diversity sampling, outlier
surfacing) expressed as pure DataFrame ops.

Iterative-algorithm discipline (same as dedup.dup_clusters): constant-size
plans via localCheckpoint per round, no vector data ever collected to the
driver. The per-round dataflow is

  assign:  vectors ⋈ broadcast(centroids)  (k rows — map-side, no shuffle)
           → argmin over squared L2 via a struct-min (deterministic
             tie-break on centroid id)
  update:  posexplode → groupBy (cluster, dim) decimal-mean → re-assemble
           with array_sort (one shuffle of |N|·d narrow rows)

All arithmetic is double with sequential array folds and decimal dimension
sums, so results are bit-reproducible run-to-run and layout-independent —
but k-means is NOT SQL-expressible in one query (arbitrary-depth
iteration), so the catalog entry is a rows-only check; correctness is
asserted by unit tests (blob separation, monotone inertia) instead of a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold → deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means; returns (id, cluster_id, sq_dist).

    Deterministic throughout: init takes the ``k`` lowest-id vectors as
    seed centroids (no RNG); assignment breaks distance ties on the lower
    centroid id; centroid means go through decimal so shuffle order can't
    perturb them. A cluster that loses all members drops out (k shrinks)
    rather than being re-seeded, keeping the algorithm a pure function of
    its input.

    100 TB plan: centroids are k rows — every assign round is a broadcast
    nested-loop over k, i.e. map-side linear scan; the only shuffle per
    round is the (cluster, dim) mean, whose output is k·d rows. Rounds are
    O(max_iter) scans — exactly Spark MLlib's dataflow, minus RNG.
    """
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # global window is intentional: numbering runs over the k-row seed
    # frame (already limited), never the corpus
    w = Window.orderBy("id")
    centroids = (
        vecs.orderBy("id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cid"), F.col("v").alias("c"))
        .localCheckpoint()
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = vecs.join(F.broadcast(cents)).select(
            "id", "v", F.struct(_sqdist(F.col("v"), F.col("c")).alias("d2"), F.col("cid").alias("cid")).alias("s")
        )
        return scored.groupBy("id").agg(
            F.min("s").alias("best"), F.first("v").alias("v")
        ).select(
            "id", "v",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.d2").alias("sq_dist"),
        )

    for _ in range(max_iter):
        assigned = assign(centroids)
        centroids = (
            assigned.select(F.col("cluster_id").alias("cid"), F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (F.sum(F.col("x").cast("decimal(28,12)")) / F.count("*"))
                .cast("double")
                .alias("m")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s.m).alias("c"))
            .localCheckpoint()
        )
    return assign(centroids).select(
        F.col("id").alias(id_col), "cluster_id", "sq_dist"
    )


def kmeans_inertia(assigned: DataFrame) -> float:
    """Total within-cluster squared distance (decimal-summed, exact)."""
    row = assigned.agg(
        F.sum(F.col("sq_dist").cast("decimal(28,12)")).cast("double").alias("i")
    ).collect()[0]
    return float(row.i)


def cluster_representatives(assigned: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Diversity sampling: the single member closest to its centroid per
    cluster (min sq_dist, id tie-break) — the "pick one exemplar per
    topic" step after k-means bucketing.

    One k-row aggregate over the assignment output: min-struct argmin, no
    window, no shuffle beyond the k-group agg.
    """
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(F.col("sq_dist"), F.col(id_col).alias("id"))
            ).alias("best")
        )
        .select(
            "cluster_id",
            F.col("best.id").alias(id_col),
            F.col("best.sq_dist").alias("sq_dist"),
        )
    )

"""Graph operators over edge DataFrames.

Connected components (dedup clustering) lives in extensions/dedup.py;
this module adds weighted PageRank — the importance-propagation primitive
for link-graph curation signals (site authority for crawl prioritization,
citation weight). Same iterative discipline as dup_clusters/kmeans:
localCheckpoint per round, constant-size plans, only O(1) driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 15,
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank over directed ``edges`` (src, dst[, weight]);
    returns (node, rank) with Σ rank = 1.

    Transition mass follows out-edge weight share; dangling nodes (no
    out-edges) redistribute uniformly — handled by renormalizing each
    round so the total stays 1 without materializing a dense dangling
    vector. Decimal rank sums keep the per-round aggregation independent
    of shuffle order, so results are bit-reproducible run-to-run.

    100 TB plan: per round one shuffle — contributions grouped by dst —
    partitioned on the node key; the edge relation (join on src) reuses
    the same partitioning across all rounds. Rank state is |V| narrow
    rows; nothing is ever collected.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col("src"), F.col("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # O(1) driver scalar, like the CC convergence count
    if n_nodes == 0:
        # empty edge relation → empty ranking (1/n seeding would divide
        # by zero); schema preserved for downstream unions/joins
        return nodes.select("node", F.lit(None).cast("double").alias("rank"))
    out_w = e.groupBy("src").agg(F.sum(F.col("w").cast("decimal(28,12)")).alias("ow"))
    # edge transition shares, fixed across rounds
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow").cast("double")).alias("share"))
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum(F.col("c").cast("decimal(28,12)")).cast("double").alias("inflow"))
        )
        raw = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                "rank"
            ),
        )
        # dangling mass renormalization: total < 1 iff some node has no
        # out-edges; scaling restores Σ rank = 1 (uniform redistribution)
        total = raw.agg(
            F.sum(F.col("rank").cast("decimal(28,12)")).cast("double").alias("t")
        )
        ranks = (
            raw.join(F.broadcast(total))
            .select("node", (F.col("rank") / F.col("t")).alias("rank"))
            .localCheckpoint()
        )
    return ranks

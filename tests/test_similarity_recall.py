"""ANN quality: IVF and LSH recall@5 against the exact brute-force answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_glue_spark.extensions import similarity
from dbt_glue_spark.sources.registry import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(similarity.knn_bruteforce(emb, q, k=5))
    ivf = _topk_sets(similarity.knn_ivf(emb, q, k=5, n_centroids=8, nprobe=3))
    recall = sum(len(exact[k] & ivf.get(k, set())) for k in exact) / (5 * len(exact))
    assert recall >= 0.5, f"IVF recall@5 too low: {recall}"
    # probing ALL cells must reproduce the exact answer
    full = _topk_sets(similarity.knn_ivf(emb, q, k=5, n_centroids=8, nprobe=8))
    assert full == exact


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(similarity.knn_bruteforce(emb, q, k=5))
    lsh = _topk_sets(similarity.knn_lsh(emb, q, k=5, planes=4, dim=64))
    hits = sum(len(exact[k] & lsh.get(k, set())) for k in exact)
    assert hits > 0  # same-bucket probing finds a nonzero share of true NNs

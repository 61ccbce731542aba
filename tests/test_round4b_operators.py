"""Unit tests for the round-4 continuation operators: DSIR importance
weights, CCNet LM buckets, n-gram duplication audit, JL random projection,
per-source data cards, and streaming KMV maintenance."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


TARGETISH = "the cat sat on the mat and the dog sat on the log "
JUNK = "zzq qqz xjw wjx vkp pkv zzq qqz "


def test_dsir_weights_prefer_target_like_docs(spark):
    from dbt_glue_spark.extensions.text_analysis import dsir_weights

    rows = (
        # target exemplars (is_target via lang='en')
        [(i, TARGETISH * 3, "en", "s") for i in range(5)]
        # raw docs: 10..14 target-like, 20..24 junk
        + [(10 + i, TARGETISH * 2, "xx", "s") for i in range(5)]
        + [(20 + i, JUNK * 2, "xx", "s") for i in range(5)]
    )
    out = dsir_weights(_docs(spark, rows), "lang = 'en'").collect()
    w = {r["doc_id"]: r["dsir_weight"] for r in out}
    # only raw docs are scored
    assert set(w) == {10, 11, 12, 13, 14, 20, 21, 22, 23, 24}
    assert min(w[i] for i in range(10, 15)) > max(w[i] for i in range(20, 25))


def test_dsir_weight_value_hand_check(spark):
    # one target doc and one raw doc sharing every bigram: each raw bucket
    # ratio is (ct+1)/(cr+1) scaled by C=(Tr+B)/(Tt+B) — with identical
    # texts ct==cr per bucket so every q6 is 10^6 and the weight is
    # exactly C (up to the 1e-6 quantization floor).
    from dbt_glue_spark.extensions.text_analysis import dsir_weights

    rows = [(1, "alpha beta gamma", "en", "s"), (2, "alpha beta gamma", "xx", "s")]
    out = dsir_weights(_docs(spark, rows), "lang = 'en'").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 2
    b = 1024
    c = (2 + b) / (2 + b)  # Tr = Tt = 2 bigram instances
    assert abs(out[0]["dsir_weight"] - c) < 1e-5


def test_lm_quality_buckets_thresholds(spark, sf_dir):
    from dbt_glue_spark.extensions.text_analysis import lm_quality_buckets
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = lm_quality_buckets(docs, by="lang")
    agg = (
        out.groupBy("lang", "ppl_bucket")
        .agg(F.count("*").alias("n"), F.min("avg_next_word_p").alias("lo"),
             F.max("avg_next_word_p").alias("hi"))
        .collect()
    )
    by_lang: dict[str, dict[str, tuple]] = {}
    for r in agg:
        by_lang.setdefault(r["lang"], {})[r["ppl_bucket"]] = (r["n"], r["lo"], r["hi"])
    for lang, buckets in by_lang.items():
        n = sum(v[0] for v in buckets.values())
        import math

        head = buckets.get("head", (0, None, None))
        assert head[0] == math.ceil(n / 3), (lang, buckets)
        # score ordering: every head score >= every tail score
        if "tail" in buckets and "head" in buckets:
            assert buckets["head"][1] >= buckets["tail"][2]


def test_ngram_dup_fraction_extremes(spark):
    from dbt_glue_spark.extensions.dedup import ngram_dup_fraction

    dup_text = "one two three four five six"
    rows = [
        (1, dup_text, "en", "s"),
        (2, dup_text, "en", "s"),  # exact copy: all shingles shared
        (3, "seven eight nine ten eleven twelve", "en", "s"),  # unique
    ]
    out = {r["doc_id"]: r for r in ngram_dup_fraction(_docs(spark, rows)).collect()}
    assert out[1]["dup_fraction"] == 1.0
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["dup_fraction"] == 0.0
    assert out[3]["n_shingles"] == 4  # 6 tokens -> 4 distinct 3-grams


def test_random_projection_linearity_and_determinism(spark):
    from dbt_glue_spark.extensions.similarity import random_project

    base = [float(i % 7) - 3.0 for i in range(64)]
    emb = spark.createDataFrame(
        [(1, base), (2, [2.0 * v for v in base]), (3, [-v for v in base])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in random_project(emb).collect()}
    for j in range(8):
        assert abs(rows[2][j] - 2.0 * rows[1][j]) < 1e-5  # proj(2v) = 2 proj(v)
        assert abs(rows[3][j] + rows[1][j]) < 1e-5  # proj(-v) = -proj(v)
    # layout-invariant: repartitioning changes nothing
    again = {
        r["vec_id"]: [r[f"p{j}"] for j in range(8)]
        for r in random_project(emb.repartition(3)).collect()
    }
    assert rows == again


def test_knn_projected_preserves_cluster_structure(spark):
    # JL guarantees distance preservation to ~1/sqrt(out_dim) distortion —
    # enough to keep SEPARATED clusters separated (the property real
    # pipelines rely on), not to resolve statistical near-ties between
    # isotropic random vectors (where top-k identity is meaningless; the
    # sf embeddings table is such data, so this test builds clustered
    # vectors where the projection MUST work).
    from dbt_glue_spark.extensions.similarity import knn_bruteforce, random_project

    centers = []
    for c in range(3):
        centers.append([5.0 if i % 3 == c else 0.0 for i in range(64)])
    rows = []
    vid = 0
    for c, ctr in enumerate(centers):
        for m in range(20):
            pert = [ctr[i] + 0.3 * (((vid * 31 + i * 7) % 11) - 5) / 5.0 for i in range(64)]
            rows.append((vid, c, pert))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, cluster long, embedding array<float>")
    proj = random_project(emb, as_array=True)
    approx = knn_bruteforce(proj, proj.filter(F.col("vec_id") < 9), vec_col="proj", k=5)
    cluster_of = {r["vec_id"]: r["cluster"] for r in emb.select("vec_id", "cluster").collect()}
    hits = [
        cluster_of[r["neighbor_id"]] == cluster_of[r["query_id"]]
        for r in approx.collect()
    ]
    assert sum(hits) / len(hits) >= 0.9, sum(hits) / len(hits)


def test_data_card_hand_check(spark):
    from dbt_glue_spark.extensions.audit import data_card

    rows = [
        (1, "Hello world!", "en", "a"),
        (2, "hello   world", "en", "a"),  # normalized dup of 1
        (3, "something else entirely", "fr", "a"),
        (4, "unique doc", "de", "b"),
    ]
    out = {r["source"]: r for r in data_card(_docs(spark, rows)).collect()}
    a = out["a"]
    assert a["n_docs"] == 3 and a["n_langs"] == 2 and a["n_dup_docs"] == 2
    assert a["top_lang"] == "en"
    assert abs(a["dup_fraction"] - 2 / 3) < 1e-5
    assert a["total_tokens"] == 2 + 2 + 3
    b = out["b"]
    assert b["n_dup_docs"] == 0 and b["dup_fraction"] == 0.0


def test_streaming_kmv_equals_batch(spark):
    # Set-merge semantics: the streamed ledger must yield the IDENTICAL
    # estimate as a one-shot batch build, including under re-delivered
    # (duplicated) rows across micro-batches.
    from dbt_glue_spark.extensions.sketches import (
        kmv_distinct,
        kmv_estimate_from_hashes,
    )
    from dbt_glue_spark.streaming.pipelines import kmv_stream_sink, read_ledger

    vals = [(i % 400,) for i in range(1200)]  # 400 distinct, heavy redelivery
    df = spark.createDataFrame(vals, "user_id long")
    stage = tempfile.mkdtemp(prefix="dgs_t_kmvsrc_")
    df.repartition(5).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    target = tempfile.mkdtemp(prefix="dgs_t_kmvtgt_")
    q = kmv_stream_sink(stream, spark, target, os.path.join(target, "ckpt"), "user_id")
    q.awaitTermination(300)
    ledger = read_ledger(spark, target)
    streamed = kmv_estimate_from_hashes(ledger).collect()[0]["approx_distinct"]
    batch = kmv_distinct(df, "user_id").collect()[0]["approx_distinct"]
    assert streamed == batch
    # 400 > k=256: the ledger must be capped at k rows, estimator engaged
    assert ledger.count() == 256


def test_source_overlap_hand_check(spark):
    from dbt_glue_spark.extensions.audit import source_overlap_matrix

    rows = [
        (1, "alpha beta gamma delta", "s1", "en"),
        (2, "alpha beta gamma epsilon", "s2", "en"),  # shares 'alpha beta gamma'
        (3, "zeta eta theta iota", "s3", "en"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    out = {(r["source_a"], r["source_b"]): r for r in source_overlap_matrix(df).collect()}
    # s1: {abg, bgd}; s2: {abg, bge}; shared = 1; jaccard = 1/3
    r = out[("s1", "s2")]
    assert r["n_shared"] == 1 and abs(r["jaccard"] - 1 / 3) < 1e-5
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_key_skew_hand_check(spark):
    from dbt_glue_spark.quality.profile import key_skew

    rows = [(7,)] * 60 + [(1,), (2,), (3,), (4,)] + [(5,)] * 6
    df = spark.createDataFrame(rows, "k long")
    out = key_skew(df, "k", top_k=2).collect()
    assert len(out) == 2
    top = out[0]
    # key_value is a string since r5 (bigint NULLed string join keys)
    assert top["rk"] == 1 and top["key_value"] == "7" and top["n_key_rows"] == 60
    assert abs(top["row_share"] - 60 / 70) < 1e-5
    # avg group size = 70/6; skew = 60/(70/6) = 5.142857 -> 5.14
    assert top["skew_vs_avg"] == 5.14
    assert out[1]["key_value"] == "5" and out[1]["n_key_rows"] == 6


def test_power_iteration_recovers_dominant_direction(spark):
    from dbt_glue_spark.extensions.clustering import power_iteration_pc1

    # points spread along one axis (dim 3) with small fixed noise in the
    # others: PC1 projections must be strictly monotone in the spread
    # coordinate (up to a global sign), and layout-invariant.
    rows = []
    for i in range(21):
        t = (i - 10) / 2.0
        vec = [0.01 * ((i * 7 + j) % 5 - 2) for j in range(64)]
        vec[3] = t
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["pc1_score"] for r in power_iteration_pc1(emb).collect()}
    scores = [out[i] for i in range(21)]
    diffs = [b - a for a, b in zip(scores, scores[1:])]
    assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs), scores
    again = {
        r["vec_id"]: r["pc1_score"]
        for r in power_iteration_pc1(emb.repartition(5)).collect()
    }
    assert out == again


def test_remove_dominant_direction_shrinks_norms(spark):
    from dbt_glue_spark.extensions.clustering import remove_dominant_direction

    # strongly anisotropic data: most energy along dim 3 → removal must
    # shrink every norm, and by a large factor for the on-axis points
    rows = []
    for i in range(21):
        t = (i - 10) / 2.0
        vec = [0.01 * ((i * 7 + j) % 5 - 2) for j in range(64)]
        vec[3] = t
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = remove_dominant_direction(emb).collect()
    assert len(out) == 21
    for r in out:
        assert r["resid_norm"] <= r["orig_norm"] + 1e-9
    # pythagoras: orig² ≈ resid² + score² (rounding slack)
    for r in out:
        lhs = r["orig_norm"] ** 2
        rhs = r["resid_norm"] ** 2 + r["pc1_score"] ** 2
        assert abs(lhs - rhs) < 1e-3, r
    total_o = sum(r["orig_norm"] ** 2 for r in out)
    total_r = sum(r["resid_norm"] ** 2 for r in out)
    assert total_r < 0.05 * total_o  # dominant direction held >95% energy


def test_hard_negatives_excludes_near_dup_of_positive(spark):
    from dbt_glue_spark.extensions.retrieval import hard_negatives

    pos = "spark window vector engine fast query plan optimizer columnar storage"
    near = pos + " extra"  # near-dup of the positive: high shingle overlap
    rows = [
        (1, pos + " " + pos + " " + pos, "en", "s"),          # strongest match → positive
        (2, near + " " + near, "en", "s"),                    # near-dup, must be excluded
        (3, "spark query engine " + "totally different words here " * 3, "en", "s"),
        (4, "window functions are great " + "unrelated filler text " * 3, "en", "s"),
        (5, "no relevant terms at all " * 4, "en", "s"),
    ]
    out = hard_negatives(_docs_src(spark, rows), ["spark", "window", "vector"], topk=5).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids          # the positive itself
    assert 2 not in ids          # near-dup excluded as false negative
    assert 3 in ids and 4 in ids # genuine hard negatives survive
    assert 5 not in ids          # no query terms -> not in BM25 top-k
    ranks = [r["neg_rank"] for r in sorted(out, key=lambda r: -r["bm25"])]
    assert ranks == list(range(1, len(out) + 1))


def _docs_src(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_pack_sequences_exact_boundaries(spark):
    from dbt_glue_spark.extensions.text_analysis import pack_sequences

    # doc lengths 3,4,5 in one source with seq_len=4:
    # stream offsets: d1 [0,3), d2 [3,7), d3 [7,12)
    # seq 0 = d1(3) + d2(1); seq 1 = d2(3) + d3(1); seq 2 = d3(4)
    rows = [
        (1, "a b c", "en", "s"),
        (2, "d e f g", "en", "s"),
        (3, "h i j k l", "en", "s"),
    ]
    out = pack_sequences(_docs_src(spark, rows), seq_len=4).collect()
    segs = {(r["seq_id"], r["doc_id"]): (r["pos_in_seq"], r["n_seg_tokens"]) for r in out}
    assert segs[(0, 1)] == (0, 3)
    assert segs[(0, 2)] == (3, 1)
    assert segs[(1, 2)] == (0, 3)
    assert segs[(1, 3)] == (3, 1)
    assert segs[(2, 3)] == (0, 4)
    # every sequence but the last holds exactly seq_len tokens
    per_seq: dict[int, int] = {}
    for (sid, _), (_, n) in segs.items():
        per_seq[sid] = per_seq.get(sid, 0) + n
    assert per_seq == {0: 4, 1: 4, 2: 4}


def test_pack_sequences_full_coverage_at_sf(spark, sf_dir):
    from dbt_glue_spark.extensions.text_analysis import pack_sequences
    from dbt_glue_spark.functions.text import tokens
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pack_sequences(docs, seq_len=512)
    # token conservation: segment tokens sum to total corpus tokens
    total_seg = out.agg(F.sum("n_seg_tokens")).collect()[0][0]
    total_tok = docs.select(F.size(tokens(F.col("text"))).alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    assert total_seg == total_tok
    # every non-final sequence per source is exactly full
    per_seq = out.groupBy("source", "seq_id").agg(F.sum("n_seg_tokens").alias("n"))
    last = per_seq.groupBy("source").agg(F.max("seq_id").alias("last_id"))
    nonfinal = per_seq.join(last, "source").filter(F.col("seq_id") < F.col("last_id"))
    bad = nonfinal.filter(F.col("n") != 512).count()
    assert bad == 0


def test_join_size_estimate_bounds(spark):
    from dbt_glue_spark.extensions.sketches import join_size_estimate

    # known multiplicities: key k appears k times in A and once in B for
    # k in 1..20 → true join size = sum(1..20) = 210
    a = spark.createDataFrame([(k,) for k in range(1, 21) for _ in range(k)], "k long")
    b = spark.createDataFrame([(k,) for k in range(1, 21)], "k long")
    r = join_size_estimate(a, "k", b, "k").collect()[0]
    assert r["true_join_size"] == 210
    # count-min inner product never underestimates, and with 20 keys in
    # 256 buckets collisions are rare → tight
    assert r["est_join_size"] >= 210
    assert r["est_join_size"] <= 210 * 2
    # disjoint key ranges → true 0, estimate stays an upper bound ≥ 0
    c = spark.createDataFrame([(k,) for k in range(100, 120)], "k long")
    r2 = join_size_estimate(a, "k", c, "k").collect()[0]
    assert r2["true_join_size"] == 0


def test_span_corruption_geometry_invariants(spark, sf_dir):
    from dbt_glue_spark.extensions.text_analysis import span_corruption_manifest
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = span_corruption_manifest(docs).collect()
    assert out
    total_tok = total_masked = 0
    for r in out:
        # identities the loader depends on
        assert r["input_len"] == r["n_tokens"] - r["n_masked"] + r["n_spans"]
        assert r["target_len"] == r["n_masked"] + r["n_spans"]
        assert 0 <= r["n_masked"] <= r["n_tokens"]
        # maximal runs: spans ≤ masked, and each span masks ≤ span_len+run
        assert r["n_spans"] <= r["n_masked"]
        total_tok += r["n_tokens"]
        total_masked += r["n_masked"]
    # corruption rate lands near 15% corpus-wide (md5-uniform starts)
    rate = total_masked / total_tok
    assert 0.10 < rate < 0.20, rate
    # determinism: identical re-run
    again = span_corruption_manifest(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_vocab_coverage_monotone_and_exact_on_small_vocab(spark):
    from dbt_glue_spark.extensions.text_analysis import vocab_coverage

    # 3-word vocabulary with skewed counts: a×6, b×3, c×1
    rows = [(1, "a a a b b c", "en", "s"), (2, "a a a b", "en", "s")]
    out = {r["k"]: r for r in vocab_coverage(_docs_src(spark, rows), ks=(1, 2, 10)).collect()}
    assert out[1]["n_vocab"] == 3
    assert abs(out[1]["coverage"] - 6 / 10) < 1e-6
    assert abs(out[2]["coverage"] - 9 / 10) < 1e-6
    assert out[10]["coverage"] == 1.0  # k beyond vocab -> full coverage


def test_pack_sequences_stable_under_append(spark):
    # append-only growth (new docs get higher ids) must never repack
    # existing sequences — the property that makes the manifest usable
    # incrementally across crawl snapshots.
    from dbt_glue_spark.extensions.text_analysis import pack_sequences

    base = [(i, "w " * (3 + i % 5), "en", "s") for i in range(1, 30)]
    grown = base + [(i, "x " * 4, "en", "s") for i in range(30, 40)]
    seg_a = {
        (r["seq_id"], r["doc_id"]): (r["pos_in_seq"], r["n_seg_tokens"])
        for r in pack_sequences(_docs_src(spark, base), seq_len=16).collect()
    }
    seg_b = {
        (r["seq_id"], r["doc_id"]): (r["pos_in_seq"], r["n_seg_tokens"])
        for r in pack_sequences(_docs_src(spark, grown), seq_len=16).collect()
    }
    for key, v in seg_a.items():
        if key[1] < 29:  # all but the stream's final doc are frozen
            assert seg_b[key] == v

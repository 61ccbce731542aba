"""Dirty-data oracle parity as a suite-native regression gate.

Round 5 ran the full DuckDB-parity harness against a pathological
dataset (NULLs, empty/whitespace strings, zeros, NULL/zero vectors,
unicode incl. surrogate pairs and decomposed combining marks, regex
metacharacters) and fixed 23 real cross-engine divergences. The full
sweep lives in ``tools/gen_pathological.py`` + ``tools/check_parity.py``;
this test pins the FIXED queries so a regression in any of those NULL /
unicode semantics fails the suite directly, without waiting for the
manual sweep.

The fixture mutates the sf0.001 driver testdata with the same generator
the tool uses (deterministic per (key, column) hash), so tool and test
can never drift apart.
"""

from __future__ import annotations

import math
import os
import sys

from pyspark.sql import functions as F

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_parity import duck_con  # noqa: E402 — the tool's own view setup
from gen_pathological import mutate  # noqa: E402

from dbt_glue_spark.plans.catalog import SPECS
from dbt_glue_spark.sources.registry import TABLES, load_table

# Promotion-gate / full-sweep module: deselected by default so the suite
# fits the driver's pytest window (r12 verdict item 3); `pytest -m slow` runs it.
pytestmark = pytest.mark.slow

# Every query that diverged (crashed or mismatched) on dirty data during
# the round-5 sweeps, minus the streaming sinks (each stages a ~20 s file
# stream; the full tool sweep still covers them).
REGRESSION_SET = [
    "array_agg_orders",
    "asof_join_forward_next_purchase",
    "collection_functions",
    "ext_ann_recall_audit",
    "ext_corpus_diff",
    "ext_curation_pipeline",
    "ext_data_card",
    "ext_doc_chunks",
    "ext_embedding_dim_audit",
    "ext_embedding_near_dup",
    "ext_kmeans_embeddings",
    "ext_knn_bruteforce",
    "ext_knn_ivf",
    "ext_knn_lsh",
    "ext_knn_projected",
    "ext_label_separation",
    "ext_pagerank_trade",
    "ext_quality_score",
    "ext_quality_top_per_source",
    "ext_text_stats",
    "funnel_conversion_timing",
    "json_extract_events",
    "mat_post_hook_audit",
    "scalar_functions",
    "string_functions",
    "udf_grouped_median",
    "udtf_token_stats",
    "window_rank_family",
]


@pytest.fixture(scope="module")
def dirty_sf(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_dirty"))
    for t in TABLES:
        mutate(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.fixture(scope="module")
def duck(dirty_sf):
    # reuse the parity tool's own view setup so tool and gate can't drift
    return duck_con(dirty_sf)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(v):
        return (0, "") if v is None else (1, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r))


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def test_dirty_data_parity_regression_set(spark, dirty_sf, duck):
    specs = SPECS()
    failures = []
    for name in REGRESSION_SET:
        spec = specs[name]
        try:
            sdf = spec.fn(spark, dirty_sf)
            srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
            cur = duck.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = _normalize(cur.fetchall(), dcols)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:140]}")
            continue
        if len(srows) != len(drows):
            failures.append(f"{name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        for sr, dr in zip(srows, drows):
            if len(sr) != len(dr) or not all(
                _values_equal(a, b) for a, b in zip(sr, dr)
            ):
                failures.append(f"{name}: value diff {sr} vs {dr}")
                break
    assert not failures, "\n".join(failures)


# Zero-variance / all-duplicate axis: the four queries that diverged on
# constant data (variance-normalized math), fixed round 5.
CONST_REGRESSION_SET = [
    "ext_correlation_matrix",   # Pearson r of a constant → NULL, not abort
    "ext_histogram_quantiles",  # width 0 → bucket 0, quantiles = the constant
    "ext_ndcg_bm25",            # empty relevance → dcg/idcg 0.0, ndcg 0.0
    "ext_average_precision",    # empty relevance → one (k, 0, 0.0) row
]


@pytest.fixture(scope="module")
def const_sf(spark, sf_dir, tmp_path_factory):
    from gen_pathological import mutate_const

    out = str(tmp_path_factory.mktemp("sf_const"))
    for t in TABLES:
        mutate_const(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


STREAMING_SET = [
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_activity_tracker",
    "streaming_incremental_append",
    "streaming_merge_upsert",
    "streaming_interval_join",
    "streaming_enrich",
    "streaming_countmin",
    "streaming_kmv_users",
    "streaming_drift_monitor",
    "streaming_quality_gate",
]


@pytest.mark.parity
@pytest.mark.parametrize(
    "variant",
    [
        "dirty",
        "const",
        "ts",
        "hot",
        "empty",
        "long",
        "textskew",
        "unicode",
        "dupheavy",
    ],
)
def test_streaming_pathological_axes(spark, sf_dir, tmp_path_factory, variant):
    """Pathological-axis × streaming cross-product (round-6, opt-in).

    Each of the 12 streaming pipelines stages a real file stream
    (~10-30 s), so the 72-run cross-product is parity-marked rather than
    suite-default. Round-6 baseline: all 72 green, zero divergences
    (SCALE.md "Round-6 streaming × pathological axes"). The empty axis
    is the streaming twin of tests/test_empty_input.py: a zero-row
    stream must start, drain, commit, and agree with the batch oracle
    on empty tables (watermarks with no data, ledgers with no batches).
    """
    from check_parity import run_parity
    from gen_pathological import (
        mutate_const,
        mutate_dupheavy,
        mutate_hot,
        mutate_long,
        mutate_textskew,
        mutate_ts,
        mutate_unicode,
    )

    fn = {
        "dirty": mutate,
        "const": mutate_const,
        "ts": mutate_ts,
        "hot": mutate_hot,
        "empty": lambda df: df.limit(0),
        "long": mutate_long,
        "textskew": mutate_textskew,
        "unicode": mutate_unicode,
        "dupheavy": mutate_dupheavy,
    }[variant]
    out = str(tmp_path_factory.mktemp(f"sf_stream_{variant}"))
    for t in TABLES:
        fn(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    failures = run_parity(out, only=STREAMING_SET, spark=spark)
    assert not failures, f"streaming {variant}-axis divergences: {failures}"


def test_constant_data_parity_regression_set(spark, const_sf):
    con = duck_con(const_sf)
    specs = SPECS()
    failures = []
    for name in CONST_REGRESSION_SET:
        spec = specs[name]
        try:
            sdf = spec.fn(spark, const_sf)
            srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = _normalize(cur.fetchall(), dcols)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:140]}")
            continue
        if len(srows) != len(drows):
            failures.append(f"{name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        for sr, dr in zip(srows, drows):
            if len(sr) != len(dr) or not all(
                _values_equal(a, b) for a, b in zip(sr, dr)
            ):
                failures.append(f"{name}: value diff {sr} vs {dr}")
                break
    assert not failures, "\n".join(failures)


LONG_TEXT_SET = [
    "ext_text_stats",
    "ext_token_count",
    "ext_quality_score",
    "ext_quality_filter",
    "ext_doc_chunks",
    "ext_cdc_chunks",
    "ext_paragraph_dedup",
    "ext_span_dedup",
    "ext_repetition_ratio",
    "ext_boilerplate_strip",
    "ext_pii_scan",
    "ext_pii_redact",
    "ext_exact_dedup",
    "ext_minhash_signatures",
    "ext_minhash_lsh_pairs",
    "ext_simhash",
    "ext_ngram_dup_fraction",
    "ext_lm_score",
    "ext_tfidf_top_terms",
    "ext_bm25_search",
    "ext_countmin_tokens",
    "ext_kmv_distinct_tokens",
    "ext_top_tokens",
    "udtf_token_stats",
    "ext_wordpiece_doc_stats",
    "ext_bpe_merges",
]


@pytest.mark.parity
def test_long_document_axis(spark, sf_dir, tmp_path_factory):
    """Per-row blowup axis (round-6, opt-in): ~1/3 of documents become
    64× repetitions of their own text (30-60 KB each) — the shape that
    flushes quadratic-in-length behavior in tokenize/shingle/chunk
    operators, invisible to every corpus-SIZE axis. Round-6 baseline:
    the FULL 214-query sweep passed on /tmp/sf_long (0 failures,
    including the O(len²)-per-candidate edit-distance verify); this
    pins the text-family subset so the axis re-runs in minutes."""
    from check_parity import run_parity
    from gen_pathological import mutate_long

    out = str(tmp_path_factory.mktemp("sf_long"))
    for t in TABLES:
        mutate_long(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    failures = run_parity(out, only=LONG_TEXT_SET, spark=spark)
    assert not failures, f"long-document-axis divergences: {failures}"


def test_hot_variant_keys_reference_existing_dimension_rows(spark, sf_dir):
    """Round-6 review fix: every hot FK value must EXIST in its
    referenced dimension. A dangling hot key (the original n_regionkey=7
    against region's fixed 0-4 domain) makes inner joins eliminate 90%
    of the fact side, so a skew probe on that join path measures row
    elimination instead of skew degradation."""
    from gen_pathological import _HOT_INT_KEYS

    fks = {
        "n_regionkey": ("region", "r_regionkey"),
        "c_nationkey": ("nation", "n_nationkey"),
        "s_nationkey": ("nation", "n_nationkey"),
        "o_custkey": ("customer", "c_custkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
        "l_partkey": ("part", "p_partkey"),
    }
    for col, (dim, dim_key) in fks.items():
        hot = _HOT_INT_KEYS[col]
        dim_keys = {
            r[0] for r in load_table(spark, sf_dir, dim).select(dim_key).collect()
        }
        assert hot in dim_keys, (
            f"hot value {hot} for {col} dangles: not in {dim}.{dim_key}"
        )


# Unicode-dominant axis (round 9): the 17 queries that diverged on
# multibyte text — JVM-vs-utf8proc lower() (İ U+0130 → stray U+0307,
# context-sensitive final sigma), byte-vs-codepoint levenshtein, and
# Python's unicode \s in the UDTF — all fixed via the symmetric fold
# contract (functions/text.fold_lower), normalize=True edit distance,
# and re.ASCII. See SCALE.md "Round-9 unicode axis".
UNICODE_REGRESSION_SET = [
    "ext_bm25_search",
    "ext_bpe_segmented_words",
    "ext_dsir_weights",
    "ext_edit_distance_verify",
    "ext_hard_negatives",
    "ext_lm_quality_buckets",
    "ext_lm_score",
    "ext_pmi_pairs",
    "ext_sorted_neighborhood",
    "ext_tfidf_top_terms",
    "ext_token_gini",
    "ext_vocab_coverage",
    "ext_vocab_growth",
    "ext_wordpiece_doc_stats",
    "ext_wordpiece_top_words",
    "ext_zipf_buckets",
    "udtf_token_stats",
]


@pytest.fixture(scope="module")
def unicode_sf(spark, sf_dir, tmp_path_factory):
    from gen_pathological import mutate_unicode

    out = str(tmp_path_factory.mktemp("sf_unicode"))
    for t in TABLES:
        mutate_unicode(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_unicode_parity_regression_set(spark, unicode_sf):
    specs = SPECS()
    con = duck_con(unicode_sf)
    failures = []
    try:
        for name in UNICODE_REGRESSION_SET:
            spec = specs[name]
            try:
                sdf = spec.fn(spark, unicode_sf)
                srows = _normalize(
                    [tuple(r) for r in sdf.collect()], sdf.columns
                )
                cur = con.execute(spec.oracle)
                dcols = [d[0] for d in cur.description]
                drows = _normalize(cur.fetchall(), dcols)
            except Exception as exc:  # noqa: BLE001
                failures.append(
                    f"{name}: {type(exc).__name__}: {str(exc)[:140]}"
                )
                continue
            if len(srows) != len(drows):
                failures.append(
                    f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
                )
                continue
            for sr, dr in zip(srows, drows):
                if len(sr) != len(dr) or not all(
                    _values_equal(a, b) for a, b in zip(sr, dr)
                ):
                    failures.append(f"{name}: value diff {sr} vs {dr}")
                    break
    finally:
        con.close()
    assert not failures, "\n".join(failures)


def test_fold_lower_primitive_contract(spark):
    """Pin the measured engine divergences the fold repairs: both
    engines' fold_lower must agree on the trap strings (and lower()
    alone must NOT, for İ and final sigma — if an engine upgrade makes
    raw lower() agree, this reminds us the fold can be retired)."""
    import duckdb

    from dbt_glue_spark.functions.text import fold_lower, fold_lower_sql

    traps = ["İstanbul", "ΣΟΦΟΣ", "ΑΣ", "İ", "weiß", "ǅungla", "日本語"]
    df = spark.createDataFrame([(t,) for t in traps], "s string")
    srows = {
        r.s: r.f
        for r in df.select("s", fold_lower(F.col("s")).alias("f")).collect()
    }
    con = duckdb.connect()
    try:
        for t in traps:
            dres = con.execute(
                f"SELECT {fold_lower_sql('?')}", [t]
            ).fetchone()[0]
            assert srows[t] == dres, (t, srows[t], dres)
        # raw lower() still diverges on the two known classes
        raw_spark = {
            r.s: r.l
            for r in df.select("s", F.lower("s").alias("l")).collect()
        }
        for t in ("İstanbul", "ΣΟΦΟΣ", "ΑΣ"):
            raw_duck = con.execute("SELECT lower(?)", [t]).fetchone()[0]
            assert raw_spark[t] != raw_duck, (
                f"raw lower() now agrees on {t!r} — fold may be retirable"
            )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Dupheavy axis (round 9, session 3): ~85 % of documents collapse onto
# five canonical near-dup texts — giant md5 groups, ONE giant connected
# component, quadratic pair-operator output. The full-catalog sweep runs
# via tools/check_parity.py /tmp/sf_dupheavy (246/246 green 2026-08-16);
# this suite pins the dedup-family subset plus the axis's structural
# contract so a regression can't hide between full sweeps.
# ---------------------------------------------------------------------------

DUPHEAVY_REGRESSION_SET = [
    "ext_exact_dedup",
    "ext_dedup_keep_one",
    "ext_dup_clusters",
    "ext_dup_cluster_sizes",
    "ext_minhash_lsh_capped",
    "ext_ngram_dup_fraction",
    "ext_simhash_pairs",
    "ext_span_dedup",
    "ext_paragraph_dedup",
    "ext_exact_substring_spans",
    "ext_sorted_neighborhood",
    "ext_containment_pairs",
    "ext_prefix_jaccard_join",
]


@pytest.fixture(scope="module")
def dupheavy_sf(spark, sf_dir, tmp_path_factory):
    from gen_pathological import mutate_dupheavy

    out = str(tmp_path_factory.mktemp("sf_dupheavy"))
    for t in TABLES:
        mutate_dupheavy(load_table(spark, sf_dir, t)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_dupheavy_parity_regression_set(spark, dupheavy_sf):
    specs = SPECS()
    con = duck_con(dupheavy_sf)
    failures = []
    try:
        for name in DUPHEAVY_REGRESSION_SET:
            spec = specs[name]
            try:
                sdf = spec.fn(spark, dupheavy_sf)
                srows = _normalize(
                    [tuple(r) for r in sdf.collect()], sdf.columns
                )
                cur = con.execute(spec.oracle)
                dcols = [d[0] for d in cur.description]
                drows = _normalize(cur.fetchall(), dcols)
            except Exception as exc:  # noqa: BLE001
                failures.append(
                    f"{name}: {type(exc).__name__}: {str(exc)[:140]}"
                )
                continue
            if len(srows) != len(drows):
                failures.append(
                    f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
                )
                continue
            for sr, dr in zip(srows, drows):
                if len(sr) != len(dr) or not all(
                    _values_equal(a, b) for a, b in zip(sr, dr)
                ):
                    failures.append(f"{name}: value diff {sr} vs {dr}")
                    break
    finally:
        con.close()
    assert not failures, "\n".join(failures)


def test_dupheavy_axis_structural_contract(spark, dupheavy_sf):
    """The axis must actually produce its advertised shape: (a) exact
    dedup sees a handful of giant hash groups holding most of the
    corpus, and (b) the near-dup graph has ONE giant connected component
    spanning (almost) all duplicated docs — the diameter that drives
    label-propagation rounds. Guards against a construction drift that
    would silently turn the axis benign."""
    from dbt_glue_spark.extensions.dedup import (
        dup_clusters,
        minhash_lsh_pairs,
        release_caches,
    )

    docs = load_table(spark, dupheavy_sf, "documents")
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    groups = (
        docs.filter(F.col("text").isNotNull())
        .groupBy(F.md5("text"))
        .count()
        .filter(F.col("count") >= 10)
        .collect()
    )
    assert len(groups) == 5, groups
    mass = sum(r["count"] for r in groups)
    assert mass >= int(0.75 * n_docs), (mass, n_docs)

    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    comps = dup_clusters(docs, pairs)
    sizes = comps.groupBy("cluster_id").count().orderBy(F.desc("count"))
    top = sizes.first()
    release_caches()
    # The capped default's chain policy guarantees CONNECTIVITY of every
    # exact-duplicate family: identical docs share all band buckets, so
    # the largest mirror family must come out as one component at least
    # its own size (before the round-9 star fix this was 1 — the drop
    # policy erased the entire duplicated mass from the pair stream).
    biggest_family = max(r["count"] for r in groups)
    assert top["count"] >= biggest_family, (top, biggest_family)

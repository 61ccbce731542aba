"""Round-3 additions: S8 symlink manifest, P6 statement sanitation."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.engine import Engine, Model, ModelConfig, sanitize_sql


@pytest.fixture()
def engine(spark):
    wh = tempfile.mkdtemp(prefix="dgs_r3_wh_")
    return Engine(spark, wh, schema="r3_test")


def test_sanitize_sql_strips_dbt_comment_header():
    # reference: gluedbapi/cursor.py:57-65 remove_comments_header
    sql = '/* {"app": "dbt", "dbt_version": "1.7"} */\nselect 1 as x'
    assert sanitize_sql(sql) == "select 1 as x"
    # no header → untouched
    assert sanitize_sql("select 1") == "select 1"
    # inline comment later in the statement is NOT a header
    assert sanitize_sql("select 1 /* keep */") == "select 1 /* keep */"


def test_sanitize_sql_pads_trailing_single_quote():
    # reference: gluedbapi/cursor.py:67-74 add_end_space_if_single_quote
    assert sanitize_sql("select * from t where c='foo'") == (
        "select * from t where c='foo' "
    )


def test_model_sql_with_dbt_header_runs(spark, engine):
    spark.range(3).createOrReplaceTempView("r3_src")
    m = Model(
        "with_header",
        sql="/* {\"app\": \"dbt\"} */\nselect id from {{ source('r3_src') }}",
        config=ModelConfig(materialized="table"),
    )
    engine.add(m)
    engine.run_model(m)
    assert engine.ref_df("with_header").count() == 3


def test_symlink_manifest_unpartitioned(spark, engine):
    m = Model("plain_t", sql="select 1 as a union all select 2", config=ModelConfig())
    engine.add(m)
    engine.run_model(m)
    parts = engine.generate_symlink_manifest("plain_t")
    assert list(parts) == [""]
    files = engine.ref_df("plain_t").inputFiles()
    assert sorted(parts[""]) == sorted(files)
    # manifest file exists beside the data and lists exactly those files
    from urllib.parse import urlparse

    root = os.path.dirname(urlparse(files[0]).path)
    mf = os.path.join(root, "_symlink_format_manifest", "manifest")
    assert os.path.exists(mf)
    assert sorted(open(mf).read().split()) == sorted(files)


def test_symlink_manifest_partitioned_and_rerun_replaces(spark, engine):
    df_sql = (
        "select id, case when id % 2 = 0 then 'a' else 'b' end as part "
        "from range(10)"
    )
    m = Model("part_t", sql=df_sql, config=ModelConfig(partition_by=["part"]))
    engine.add(m)
    engine.run_model(m)
    parts = engine.generate_symlink_manifest("part_t")
    assert set(parts) == {"part=a", "part=b"}
    for part, uris in parts.items():
        assert uris and all(part in u for u in uris)
    # rewrite → regenerate must replace, not accumulate stale entries
    engine.run_model(m)
    parts2 = engine.generate_symlink_manifest("part_t")
    assert set(parts2) == {"part=a", "part=b"}
    old_files = {u for us in parts.values() for u in us}
    new_files = {u for us in parts2.values() for u in us}
    assert old_files.isdisjoint(new_files)  # fresh generation's files


# ---- round-3 LLM-pipeline operators ---------------------------------------


def test_corpus_shuffle_is_repartition_proof(spark, sf_dir):
    from dbt_glue_spark.extensions.sampling import corpus_shuffle
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = corpus_shuffle(docs, "doc_id", seed=7, n_shards=4)
    b = corpus_shuffle(docs.repartition(13), "doc_id", seed=7, n_shards=4)
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    # positions are dense 1..n within each shard
    from pyspark.sql import functions as F

    per = a.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per.filter("mx <> n OR mn <> 1").count() == 0
    # a different seed produces a different permutation
    c = corpus_shuffle(docs, "doc_id", seed=8, n_shards=4)
    assert a.subtract(c).count() > 0


def test_quality_classifier_margin_bounds(spark, sf_dir):
    from dbt_glue_spark.extensions.text_analysis import quality_classifier
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = quality_classifier(docs)
    assert out.count() == docs.count()
    # mean of weights in [-0.5, 0.5) stays in that band
    assert out.filter("quality_margin < -0.5 OR quality_margin >= 0.5").count() == 0
    assert out.filter("keep <> (quality_margin > 0)").count() == 0


def test_mixture_weights_invariants(spark, sf_dir):
    from dbt_glue_spark.extensions.sampling import mixture_weights
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_weights(docs).collect()
    assert len(out) == docs.select("source").distinct().count()
    shares = sum(r.token_share for r in out)
    assert abs(shares - 1.0) < 1e-4  # rounding residue only
    assert max(r.mix_weight for r in out) == 1.0  # max-normalized
    # sqrt temperature upsamples small domains: weight ordering follows
    # token ordering but compressed toward 1
    by_tok = sorted(out, key=lambda r: r.n_tokens)
    ws = [r.mix_weight for r in by_tok]
    assert ws == sorted(ws)


def test_minhash_incremental_equals_batch(spark, sf_dir):
    # Two incremental batches against the carried ledger must surface
    # exactly the candidate pairs a single all-at-once banding finds.
    from dbt_glue_spark.extensions.dedup import (
        minhash_lsh_incremental,
        release_caches,
    )
    from dbt_glue_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    p1, led1 = minhash_lsh_incremental(b1, None)
    p2, led2 = minhash_lsh_incremental(b2, led1)
    incremental = p1.unionByName(p2).distinct()
    batch, _ = minhash_lsh_incremental(docs, None)
    assert incremental.subtract(batch).count() == 0
    assert batch.subtract(incremental).count() == 0
    assert led2.count() == docs.count() * 4  # 4 band rows per doc
    release_caches()


def test_sanitize_sql_properties():
    # Property sweep (no Spark): never raises, idempotent, and any
    # produced statement never ends in a bare single quote.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def prop(sql):
        out = sanitize_sql(sql)
        assert isinstance(out, str)
        assert not out.endswith("'")
        assert sanitize_sql(out) == out or out.endswith(" ")

    prop()


def test_span_dedup_short_docs_and_exact_copies(spark):
    from dbt_glue_spark.extensions.dedup import span_dedup

    rows = [
        (1, "alpha beta gamma"),                # < window → one span
        (2, "alpha beta gamma"),                # exact copy → fully dup
        (3, " ".join(f"w{i}" for i in range(70))),  # 3 spans (70/32)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in span_dedup(df).collect()}
    assert out[1].n_spans == 1 and out[1].n_dup_spans == 0
    assert out[2].n_spans == 1 and out[2].n_dup_spans == 1
    assert out[2].dup_span_ratio == 1.0
    assert out[3].n_spans == 3 and out[3].n_dup_spans == 0


def test_athena_manifest_auto_refreshes_on_write(spark, engine):
    import os
    from urllib.parse import urlparse

    m = Model(
        "auto_mani",
        sql="select 1 as a union all select 2",
        config=ModelConfig(athena_manifest=True),
    )
    engine.add(m)
    engine.run_model(m)
    files1 = engine.ref_df("auto_mani").inputFiles()
    root1 = os.path.dirname(urlparse(files1[0]).path)
    mf1 = os.path.join(root1, "_symlink_format_manifest", "manifest")
    assert os.path.exists(mf1)
    # rewrite → manifest regenerated beside the NEW generation
    engine.run_model(m)
    files2 = engine.ref_df("auto_mani").inputFiles()
    root2 = os.path.dirname(urlparse(files2[0]).path)
    assert root2 != root1
    mf2 = os.path.join(root2, "_symlink_format_manifest", "manifest")
    assert os.path.exists(mf2)
    assert sorted(open(mf2).read().split()) == sorted(files2)


def test_graph_selectors_ancestors_descendants(spark, engine):
    spark.range(3).createOrReplaceTempView("r3_g_src")
    engine.add(Model("g_base", sql="select id from {{ source('r3_g_src') }}"))
    engine.add(Model("g_mid", sql="select id from {{ ref('g_base') }}"))
    engine.add(Model("g_leaf", sql="select id from {{ ref('g_mid') }}"))
    engine.add(Model("g_other", sql="select id from {{ source('r3_g_src') }}"))
    # +g_mid builds g_base then g_mid, never g_leaf/g_other
    engine.run(select="+g_mid")
    assert engine.catalog.exists(engine.relation_for("g_mid"))
    assert engine.catalog.exists(engine.relation_for("g_base"))
    assert not engine.catalog.exists(engine.relation_for("g_leaf"))
    assert not engine.catalog.exists(engine.relation_for("g_other"))
    # g_mid+ adds descendants
    engine.run(select="g_mid+")
    assert engine.catalog.exists(engine.relation_for("g_leaf"))
    assert not engine.catalog.exists(engine.relation_for("g_other"))


def test_source_freshness_thresholds(spark):
    import tempfile

    eng = Engine(
        spark,
        tempfile.mkdtemp(prefix="dgs_fresh_"),
        schema="r3_fresh",
        now=lambda: "2024-02-01 00:00:00",
    )
    df = spark.sql(
        "select timestamp'2024-01-31 23:30:00' as loaded_at"
        " union all select timestamp'2024-01-30 00:00:00'"
    )
    r = eng.source_freshness(df, "loaded_at", warn_after_s=600, error_after_s=7200)
    assert r["status"] == "warn" and r["age_s"] == 1800.0
    r2 = eng.source_freshness(df, "loaded_at", warn_after_s=60, error_after_s=900)
    assert r2["status"] == "error"
    r3 = eng.source_freshness(df, "loaded_at", warn_after_s=3600, error_after_s=7200)
    assert r3["status"] == "pass"
    empty = spark.sql("select timestamp'2024-01-01' as loaded_at where false")
    assert eng.source_freshness(empty, "loaded_at", 1, 2)["status"] == "error"


def test_compile_resolves_refs_and_inlines_ephemeral(spark, engine):
    engine.add(
        Model(
            "c_eph",
            sql="select 1 as k",
            config=ModelConfig(materialized="ephemeral"),
        )
    )
    engine.add(Model("c_user", sql="select k from {{ ref('c_eph') }} t"))
    compiled = engine.compile("c_user")
    assert "{{" not in compiled
    assert "(select 1 as k) AS __ephemeral_c_eph" in compiled
    engine.add(Model("c_tbl", sql="select 2 as k"))
    engine.add(Model("c_user2", sql="select k from {{ ref('c_tbl') }}"))
    assert engine.relation_for("c_tbl").render() in engine.compile("c_user2")


def test_python_source_model_executes_with_dbt_context(spark, engine):
    spark.range(5).createOrReplaceTempView("r3_py_src")
    src = """
from pyspark.sql import functions as F

def model(dbt, session):
    base = dbt.source("r3_py_src")
    return base.filter(F.col("id") >= 2).withColumn("doubled", F.col("id") * 2)
"""
    m = Model("py_text", python_source=src, config=ModelConfig(materialized="table"))
    engine.add(m)
    engine.run_model(m)
    rows = {r.id: r.doubled for r in engine.ref_df("py_text").collect()}
    assert rows == {2: 4, 3: 6, 4: 8}
    bad = Model("py_bad", python_source="x = 1", config=ModelConfig())
    engine.add(bad)
    import pytest as _pt

    with _pt.raises(ValueError, match="must define model"):
        engine.run_model(bad)

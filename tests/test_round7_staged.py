"""Round-7 staged operators: parity-proven now, catalog-registered later.

The live catalog is frozen at 214 queries until CORRECTNESS_r06.json
exists (see plans/round7_staged.py docstring). These tests prove the
staged specs with the same exact DuckDB compare the live sweep uses, and
pin the freeze itself so an accidental registration can't dilute the
driver's 50-query rotation prefix mid-round.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.plans.round7_staged import STAGED
from tools.check_parity import duck_con, normalize, values_equal

STAGED_NAMES = sorted(STAGED())


def _exact_compare(spark, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    try:
        res = con.execute(spec.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    assert len(sn) == len(dn), (len(sn), len(dn))
    for r1, r2 in zip(sn, dn):
        assert all(values_equal(a, b) for a, b in zip(r1, r2)), (r1, r2)


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_oracle_parity(spark, sf_dir, name):
    _exact_compare(spark, sf_dir, STAGED()[name])


def test_catalog_freeze_holds_and_staged_not_registered():
    """The catalog must stay at exactly 214 entries (driver-rotation
    contract, VERDICT r5 item 2) and must not contain the staged names —
    registering them this round would push never-checked entries into the
    sampled prefix and crowd out the 31 rows the rotation is closing."""
    from dbt_glue_spark.plans.catalog import SPECS

    specs = SPECS()
    assert len(specs) == 214, len(specs)
    overlap = set(STAGED_NAMES) & set(specs)
    assert not overlap, overlap


def test_weighted_sample_layout_invariant(spark, sf_dir):
    """Priority sampling must be a pure function of the data: identical
    selected set and estimator under any physical partitioning."""
    from dbt_glue_spark.extensions.sampling import weighted_sample
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = sorted(tuple(r) for r in weighted_sample(docs, "doc_id", "n_chars", k=64).collect())
    b = sorted(
        tuple(r)
        for r in weighted_sample(
            docs.repartition(7), "doc_id", "n_chars", k=64
        ).collect()
    )
    assert a == b


def test_weighted_sample_estimator_contract(spark, sf_dir):
    """Sample size, est_weight ≥ weight (priority sampling's estimator is
    max(w, tau)), and the deterministic subset-sum estimate Σ est_weight
    lands near the true corpus weight (fixed data + fixed seed → this is
    a deterministic regression value, not a statistical flake)."""
    from dbt_glue_spark.extensions.sampling import weighted_sample
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = docs.count()
    k = 128
    rows = weighted_sample(docs, "doc_id", "n_chars", k=k).collect()
    assert len(rows) == min(k, n)
    assert all(r.est_weight >= r.weight for r in rows)
    true_total = docs.agg(
        F.sum(F.greatest(F.col("n_chars").cast("bigint"), F.lit(1)))
    ).collect()[0][0]
    est_total = sum(r.est_weight for r in rows)
    # DLT estimator is unbiased; at k=128 the realized deviation for this
    # fixed corpus+seed is a few percent — 25% is a loose deterministic band
    assert abs(est_total - true_total) / true_total < 0.25, (est_total, true_total)


def test_weighted_sample_small_corpus_no_tau(spark):
    """Corpora with ≤ k rows: every row returned, est_weight == weight."""
    from dbt_glue_spark.extensions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(5)], "id bigint, w bigint"
    )
    rows = weighted_sample(df, "id", "w", k=64).collect()
    assert len(rows) == 5
    assert all(r.est_weight == float(r.weight) for r in rows)


def test_pmi_pairs_hand_computed(spark):
    """Window-2 pair counts, marginals, and staged-floor-division scores
    verified against a hand computation on a 2-doc corpus."""
    from dbt_glue_spark.extensions.text_analysis import pmi_pairs

    df = spark.createDataFrame([("a b a",), ("b a c",)], "text string")
    rows = pmi_pairs(df, "text", window=2, min_count=1, k=10).collect()
    # doc1 [a,b,a]: gap1 (a,b),(a,b); gap2 (a,a) excluded
    # doc2 [b,a,c]: gap1 (a,b),(a,c); gap2 (b,c)
    # c_ab: (a,b)=3 (a,c)=1 (b,c)=1; P=5; m_a=4 m_b=4 m_c=2
    got = [(r.tok_a, r.tok_b, r.c_ab, r.m_a, r.m_b, r.pmi_q6) for r in rows]
    assert got == [
        ("a", "b", 3, 4, 4, ((3 * 1000000) // 4) * 5 // 4),
        ("a", "c", 1, 4, 2, ((1 * 1000000) // 4) * 5 // 2),
        ("b", "c", 1, 4, 2, ((1 * 1000000) // 4) * 5 // 2),
    ]


def test_zipf_buckets_reconcile(spark, sf_dir):
    """Decade rows must partition the vocabulary exactly: type and
    occurrence masses sum to the corpus totals, and a decade can never
    hold more types than it has ranks (9·10^(d-1))."""
    from dbt_glue_spark.extensions.text_analysis import zipf_rank_buckets
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    rows = zipf_rank_buckets(docs, "text").collect()
    toks = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok")
    )
    vocab = toks.select("tok").distinct().count()
    total = toks.count()
    assert sum(r.n_types for r in rows) == vocab
    assert sum(r.n_occurrences for r in rows) == total
    for r in rows:
        assert r.n_types <= 9 * 10 ** (r.rank_decade - 1)
        assert r.min_freq <= r.max_freq


def test_staged_plan_shapes(spark, sf_dir):
    """Scale-shape gates for the staged operators: top-k must plan as
    TakeOrderedAndProject (per-partition partial top-k, no global sort),
    and the only forced broadcasts are 1-row frames (tau / pair total) —
    never a vocabulary- or corpus-proportional side (the r5-verdict
    broadcast lesson, applied at authoring time)."""
    from dbt_glue_spark.extensions.sampling import weighted_sample
    from dbt_glue_spark.extensions.text_analysis import pmi_pairs
    from dbt_glue_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    ws_plan = (
        weighted_sample(docs.select("doc_id", "n_chars"), "doc_id", "n_chars", k=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in ws_plan
    pmi_plan = (
        pmi_pairs(docs.select("text"), "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in pmi_plan
    # source-level gate: the new operators force-broadcast only the 1-row
    # tau/totals aggregates (grep the authored code, not the plan, because
    # the planner legitimately broadcasts small sides at test scale)
    import inspect

    from dbt_glue_spark.extensions import sampling, text_analysis

    for src in (
        inspect.getsource(sampling.weighted_sample),
        inspect.getsource(text_analysis.pmi_pairs),
    ):
        hints = [ln for ln in src.splitlines() if "F.broadcast(" in ln]
        assert all("tau" in ln or "totals" in ln for ln in hints), hints

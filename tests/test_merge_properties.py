"""Property-based check of merge_upsert against an independent dict-model.

The reference has no property tests (SURVEY §5.1); we add one for the
operator with the trickiest semantics. Hypothesis generates random
target/source tables (overlapping keys, duplicate source keys when
precombine is on) and compares against a pure-Python MERGE model.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_glue_spark.operators.merge import merge_upsert

keys = st.integers(min_value=0, max_value=8)
vals = st.text(alphabet="abc", min_size=1, max_size=2)

rows = st.lists(st.tuples(keys, vals, vals), min_size=0, max_size=12)


def model_merge(tgt: list, src: list, update_cols: set | None) -> dict:
    """Dict model: last-write-wins per key within src (src has unique keys
    here), matched rows updated per update_cols, unmatched inserted."""
    t = {r[0]: r for r in tgt}
    out = dict(t)
    for r in src:
        k = r[0]
        if k in t and update_cols is not None:
            old = out[k]
            out[k] = (
                k,
                r[1] if "v1" in update_cols else old[1],
                r[2] if "v2" in update_cols else old[2],
            )
        else:
            out[k] = r
    return out


@pytest.mark.parametrize("update_cols", [None, {"v1"}])
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(tgt=rows, src=rows)
def test_merge_matches_model(spark, update_cols, tgt, src):
    # unique keys per side (dbt merge precondition); dedupe keeping last
    tgt = list({r[0]: r for r in tgt}.values())
    src = list({r[0]: r for r in src}.values())
    schema = "k int, v1 string, v2 string"
    tdf = spark.createDataFrame(tgt, schema) if tgt else spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(src, schema) if src else spark.createDataFrame([], schema)
    out = merge_upsert(
        tdf, sdf, ["k"], update_columns=sorted(update_cols) if update_cols else None
    )
    got = {r.k: (r.k, r.v1, r.v2) for r in out.collect()}
    assert got == model_merge(tgt, src, update_cols)


# ---- sampling / sketch properties ----------------------------------------


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    frac=st.floats(min_value=0.05, max_value=0.95),
    cutoff=st.integers(min_value=1, max_value=400),
)
def test_hash_sample_monotone_and_prefix_stable(spark, frac, cutoff):
    """Membership is a pure function of the key: a corpus subset samples to
    exactly the sample's subset, and a smaller fraction's sample is a
    subset of a larger fraction's (nested samples — what lets you publish
    1%/10%/100% dataset tiers that agree)."""
    from dbt_glue_spark.extensions.sampling import hash_sample

    df = spark.range(0, 400).withColumnRenamed("id", "k")
    full = {r.k for r in hash_sample(df, "k", frac).collect()}
    sub = {r.k for r in hash_sample(df.filter(f"k < {cutoff}"), "k", frac).collect()}
    assert sub == {k for k in full if k < cutoff}
    half = {r.k for r in hash_sample(df, "k", frac / 2).collect()}
    assert half <= full


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(min_value=1, max_value=200), dup=st.integers(min_value=1, max_value=3))
def test_kmv_exact_below_k_any_duplication(spark, n, dup):
    """KMV must report the exact distinct count whenever it's below k,
    regardless of how many duplicate rows carry each value."""
    from dbt_glue_spark.extensions.sketches import kmv_distinct

    rows = [(v,) for v in range(n) for _ in range(dup)]
    df = spark.createDataFrame(rows, "v bigint")
    [r] = kmv_distinct(df, "v", k=256).collect()
    assert r.approx_distinct == float(n)

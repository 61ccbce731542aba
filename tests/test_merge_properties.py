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

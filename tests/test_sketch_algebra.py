"""Hypothesis-randomized mergeability of the sketch family.

The 100 TB story for every sketch is the same algebraic property:
``build(A ∪ B) == merge(build(A), build(B))`` — shards sketch
independently, a coordinator folds, no pass over the union ever runs.
The fixed-example unit tests (tests/test_operators_unit.py) pin one
split each; these tests let hypothesis pick the data AND the split, so
any input- or partition-dependence in the merge algebra (a hash that
peeks at neighbors, a count that isn't linear, a top-k that isn't a
semilattice) is found rather than assumed away.

max_examples is kept small (each example runs real Spark jobs) and
deadline disabled (JVM warm-up would trip hypothesis's default).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# short lowercase words: collisions in 256 buckets are likely enough to
# exercise the collision path while keeping rows cheap
WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=40
)
SKETCH_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _tok_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "tok string")


@SKETCH_SETTINGS
@given(words=WORDS, split=st.integers(min_value=0, max_value=40))
def test_countmin_merge_linear_under_any_split(spark, words, split):
    """count-min is linear: cell-wise sum of the parts == build(whole),
    for ANY data and ANY split point (incl. empty parts)."""
    from dbt_glue_spark.extensions.sketches import countmin_build

    split = min(split, len(words))
    a, b = words[:split], words[split:]
    whole = countmin_build(_tok_df(spark, words), "tok")
    parts = []
    if a:
        parts.append(countmin_build(_tok_df(spark, a), "tok"))
    if b:
        parts.append(countmin_build(_tok_df(spark, b), "tok"))
    merged = parts[0]
    for p in parts[1:]:
        merged = (
            merged.unionAll(p)
            .groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


@SKETCH_SETTINGS
@given(words=WORDS, split=st.integers(min_value=0, max_value=40))
def test_kmv_topk_is_a_semilattice_under_any_split(spark, words, split):
    """KMV state (the k smallest hash fractions) merges by
    union-distinct + top-k: merging the parts' states must equal the
    whole's state — the exact fold the streaming KMV ledger performs."""
    from dbt_glue_spark.extensions.sketches import hash_fraction

    k = 8  # small k so the truncation path is exercised, not just pass-through

    def state(df):
        return (
            df.select(hash_fraction(F.col("tok")).alias("h"))
            .distinct()
            .orderBy(F.col("h").asc())
            .limit(k)
        )

    split = min(split, len(words))
    a, b = words[:split], words[split:]
    whole = sorted(r["h"] for r in state(_tok_df(spark, words)).collect())
    parts = [state(_tok_df(spark, p)) for p in (a, b) if p]
    merged_df = parts[0]
    for p in parts[1:]:
        merged_df = merged_df.unionByName(p)
    merged = sorted(
        r["h"]
        for r in merged_df.distinct().orderBy(F.col("h").asc()).limit(k).collect()
    )
    assert merged == whole


@SKETCH_SETTINGS
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=40),
)
def test_histogram_bucket_counts_additive_under_any_split(spark, values, split):
    """``value_histogram`` — the PRODUCT bucketing, fixed ``bucket_width``
    grid exactly as ``histogram_stream_sink`` builds it — merges by the
    sink's own fold (unionByName → groupBy(bucket) → sum(cnt)): for any
    data and any split, merging the parts' histograms must equal the
    histogram of the whole. Driving the real builder (not an inline
    re-derivation) is the point: an off-by-one in the bucket edges, the
    overflow clamp, or a non-linear count in ``value_histogram`` fails
    HERE, not only at 100 TB."""
    from dbt_glue_spark.extensions.audit import value_histogram

    width, n_buckets = 7, 8  # small grid: overflow clamp gets exercised

    def hist(vals):
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        return value_histogram(df, "x", width, n_buckets)

    split = min(split, len(values))
    a, b = values[:split], values[split:]
    whole = sorted(map(tuple, hist(values).collect()))
    parts = [hist(p) for p in (a, b) if p]
    merged = parts[0]
    for p in parts[1:]:
        # the exact streaming-ledger fold (histogram_stream_sink)
        merged = (
            merged.unionByName(p)
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    assert sorted(map(tuple, merged.collect())) == whole


@SKETCH_SETTINGS
@given(words=WORDS, split=st.integers(min_value=0, max_value=40))
def test_bloom_merge_is_bitwise_or_under_any_split(spark, words, split):
    """Bloom filters merge by bit-position union: probing any member
    word against the OR of the parts' filters must never produce a
    false negative, and the merged position set must equal the whole's."""
    from dbt_glue_spark.extensions.sketches import bloom_build

    split = min(split, len(words))
    a, b = words[:split], words[split:]
    whole = {tuple(r) for r in bloom_build(_tok_df(spark, words), "tok").collect()}
    merged: set = set()
    for p in (a, b):
        if p:
            merged |= {tuple(r) for r in bloom_build(_tok_df(spark, p), "tok").collect()}
    assert merged == whole

"""Layout-invariance of the dedup pair family.

On a 1000-executor cluster the physical layout of the corpus — file
splits, partition count, row order within partitions — is an accident of
ingestion, not a property of the data. Every dedup operator's answer
must therefore be a pure function of the corpus CONTENT: the same pairs
(and the same scores) whether the input arrives as 1 partition or 17,
hash-distributed or range-sorted. The sketch family already pins this
(tests/test_operators_unit.py); this module pins it for the pair
producers, whose band-bucket self-joins are the most layout-tempted
plans in the repo (a signature or band key derived from partition-local
state — zipWithIndex, monotonically_increasing_id, first() without
ordering — would pass single-layout correctness tests and silently
diverge under redistribution).

Reference parity context: dedup is a beyond-reference extension
(SURVEY.md §2 LLM-data-pipeline operators); the reference adapter
(/root/reference/dbt) has no dedup surface.
"""

from __future__ import annotations

import pytest

from dbt_glue_spark.extensions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from dbt_glue_spark.sources.registry import load_table

# Promotion-gate / full-sweep module: deselected by default so the suite
# fits the driver's pytest window (r12 verdict item 3); `pytest -m slow` runs it.
pytestmark = pytest.mark.slow


def _docs(spark, sf_dir):
    # small deterministic slice: enough docs to produce real candidate
    # pairs, few enough that the exact-Jaccard verify stays sub-second
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(120)
    )


def _layouts(df):
    """The same content under adversarial physical layouts."""
    return [
        df,
        df.repartition(17),                      # round-robin hash layout
        df.coalesce(1),                          # single partition
        df.repartition(5, "doc_id"),             # key-clustered layout
        df.orderBy(df.columns[0], ascending=False).repartition(3),  # reordered
    ]


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "fn",
    [
        lambda d: ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.3),
        lambda d: minhash_lsh_pairs(
            d, "text", "doc_id", n=3, num_hashes=8, bands=4, threshold=0.3
        ),
        lambda d: simhash_pairs(d, "text", "doc_id", bits=16, bands=4, max_hamming=3),
    ],
    ids=["ngram_jaccard", "minhash_lsh", "simhash"],
)
def test_pair_producers_are_layout_invariant(spark, sf_dir, fn):
    base = _docs(spark, sf_dir)
    expected = _rows(fn(base))
    # the slice genuinely exercises the operator: at least one candidate
    # pair must survive verification, else the test is vacuous
    assert expected, "fixture produced no pairs — threshold/slice too strict"
    for layout in _layouts(base)[1:]:
        assert _rows(fn(layout)) == expected


def test_exact_dedup_keeps_one_survivor_per_hash_under_any_layout(spark, sf_dir):
    base = _docs(spark, sf_dir)
    # exact_dedup keeps ONE representative per content hash; which row
    # wins is tie-broken deterministically (min id), so the full output —
    # not just the count — must be layout-invariant
    expected = _rows(exact_dedup(base, "text", "doc_id"))
    assert expected
    for layout in _layouts(base)[1:]:
        assert _rows(exact_dedup(layout, "text", "doc_id")) == expected

"""Text primitives for the dedup / text-analysis extension operators.

All expressions are built-in Catalyst functions (split/transform/sequence/
md5) — no Python UDFs — so tokenization and shingling of a 100 TB documents
table runs inside whole-stage codegen and scales linearly with input size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty tokens removed)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array.

    ``transform(sequence(0, size-n), i -> concat_ws(' ', tok[i..i+n-1]))``;
    docs shorter than ``n`` tokens yield an empty array (not NULL) so that
    downstream set arithmetic (Jaccard) is well-defined.
    """
    idx = F.when(F.size(tok) >= n, F.sequence(F.lit(0), F.size(tok) - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *[tok[i + j] for j in range(n)]))
    return F.array_distinct(grams)

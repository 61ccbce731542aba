"""Text primitives for the dedup / text-analysis extension operators.

All expressions are built-in Catalyst functions (split/transform/sequence/
md5) — no Python UDFs — so tokenization and shingling of a 100 TB documents
table runs inside whole-stage codegen and scales linearly with input size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize_once(df, text_col: str, keep: list[str], lower: bool = False):
    """Project ``keep`` columns plus a ``toks`` token array, with a
    projection barrier so the array is computed exactly once per row.

    Catalyst's CollapseProject inlines a projected expression into every
    downstream reference site; for an interpreted higher-order pipeline
    (filter ∘ split) referenced 5-7× per row that's a 5-7× slowdown
    (measured 8.6s → 1.5s on the sf0.1 documents shingle explode). A
    nondeterministic column in the projection blocks the collapse —
    CollapseProject refuses to merge through nondeterministic expressions —
    so ``toks`` materializes once. The marker column is dropped by
    downstream selects (column pruning removes it from the scan).
    """
    from pyspark.sql import functions as _F

    c = _F.lower(_F.col(text_col)) if lower else _F.col(text_col)
    return df.select(
        *keep, tokens(c).alias("toks"), _F.rand().alias("__once")
    )


# Cross-engine case-fold repair: JVM lower() follows Unicode
# SpecialCasing — lower('İ' U+0130) = 'i' + COMBINING DOT ABOVE (U+0307)
# and final sigma is context-sensitive (ΣΟΦΟΣ → σοφος) — while DuckDB's
# utf8proc lowercases per-codepoint (İ → 'i', Σ → 'σ' everywhere). These
# are the ONLY two divergence classes between the engines (measured,
# SCALE.md round-9 unicode axis), and both poison downstream
# tokenization: the stray U+0307 splits 'istanbul' into 'i'+'stanbul'
# under [a-z]+ extraction and turns one normalized token into two.
# Folding AFTER lower — delete U+0307, map ς → σ — is symmetric (both
# engines apply the same translate), so lower∘fold is engine-identical.
# The identical fragment is valid SQL in BOTH engines; oracles embed it
# via fold_lower_sql so the two sides cannot drift.
_FOLD_FROM = "ς̇"  # ς + combining dot above
_FOLD_TO = "σ"          # σ (U+0307 maps to nothing = deleted)


def fold_lower(col: Column) -> Column:
    """Engine-stable lowercase: lower() then fold the two JVM/utf8proc
    divergence classes (İ's stray U+0307, final sigma)."""
    return F.translate(F.lower(col), _FOLD_FROM, _FOLD_TO)


def fold_lower_sql(expr: str) -> str:
    """The same fold as :func:`fold_lower`, as a SQL fragment valid in
    both Spark SQL and DuckDB — use in F.expr sites and oracles alike."""
    return f"translate(lower({expr}), 'ς̇', 'σ')"


def normalize_text(col: Column) -> Column:
    """Lowercase (engine-stable fold), strip non-alphanumerics to
    spaces, collapse whitespace."""
    c = fold_lower(col)
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

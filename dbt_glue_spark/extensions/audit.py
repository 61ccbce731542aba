"""Corpus auditing operators: snapshot diff for incremental pipelines.

A training-data pipeline re-crawls and re-curates continuously; the audit
question "what changed between snapshot A and snapshot B" (how many docs
added / removed / edited, and where) gates whether a retrain is warranted
and feeds dataset documentation (datasheets/data cards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Row-level diff of two corpus snapshots by content hash.

    Returns one row per doc id present in either snapshot with
    ``status ∈ {added, removed, changed, unchanged}`` — added/removed by
    id presence, changed/unchanged by md5 over ``content_cols``.

    100 TB shape: each side reduces to (id, 16-byte md5) BEFORE the full
    outer join, so the shuffle carries hashes, never documents — the
    exact-dedup discipline applied to snapshot comparison. Cost = two
    scans + one hash-keyed join; with both snapshots bucketed by id the
    exchange disappears entirely.
    """
    h = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    ha = a.select(F.col(id_col), h.alias("__ha"))
    hb = b.select(F.col(id_col), h.alias("__hb"))
    joined = ha.join(hb, id_col, "full_outer")
    status = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") == F.col("__hb"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(id_col), status.alias("status"))

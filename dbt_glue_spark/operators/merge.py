"""MERGE upsert as a DataFrame composition.

The reference's merge strategy emits ``MERGE INTO tgt USING src ON
src.k = tgt.k [AND pred...] WHEN MATCHED UPDATE ... WHEN NOT MATCHED
INSERT ...`` and is gated to transactional formats
(reference: dbt/include/glue/macros/materializations/incremental/
strategies.sql:42-93; validate.sql:38-47). Delta/Iceberg jars are not
available in this environment, so the engine computes merge *semantics* as
a pure DataFrame plan that any sink can then write:

    result = src-updates ⟂ tgt-unmatched   (one outer-shuffle on the key)

On a cluster with Delta/Iceberg this function is swapped for native
``MERGE INTO`` by the incremental materializer (format_gating keeps the
same validation surface as the reference). The composed plan is still the
right scale shape: a single hash-partitioned join on the unique key, no
broadcast of the big side, AQE skew-handling applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    unique_key: list[str] | None,
    update_columns: list[str] | None = None,
    exclude_columns: list[str] | None = None,
    incremental_predicates: list[str] | None = None,
    dedup_source_on: str | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` with dbt-glue merge semantics.

    - ``unique_key=None`` → the reference emits ``ON FALSE`` (insert-only
      append, reference: strategies.sql:75-77) → plain unionByName.
    - matched rows: replaced by source values (``UPDATE SET *``), or only
      ``update_columns`` / all-but-``exclude_columns`` updated
      (reference: strategies.sql:50-58 merge_update_columns /
      merge_exclude_columns).
    - ``incremental_predicates``: extra SQL predicates over ``tgt.``/``src.``
      aliased columns ANDed into the match condition (reference:
      strategies.sql:42-47); a target row that key-matches but fails the
      predicate is kept AND the source row is still inserted (MERGE
      not-matched semantics).
    - ``dedup_source_on``: latest-wins tiebreak column (Hudi precombine
      semantics, reference: dbt/adapters/glue/impl.py:970) applied to the
      source before merging.
    """
    if unique_key is None or not unique_key:
        return target.unionByName(source)

    if dedup_source_on is not None:
        w = Window.partitionBy(*unique_key).orderBy(F.desc(dedup_source_on))
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    tgt = target.alias("tgt")
    src = source.alias("src")
    cond = F.lit(True)
    for k in unique_key:
        cond = cond & (F.col(f"tgt.{k}").eqNullSafe(F.col(f"src.{k}")))
    for pred in incremental_predicates or []:
        cond = cond & F.expr(pred)

    out_cols = target.columns

    # Rows of target that no source row matches (full MERGE condition).
    tgt_keep = tgt.join(src, cond, "left_anti")

    if update_columns is None and exclude_columns:
        update_columns = [c for c in source.columns if c not in set(exclude_columns)]

    if update_columns is None:
        # UPDATE SET * : matched target rows are fully replaced → source
        # rows (matched or not) all surface as-is.
        merged_src = src.select(*[F.col(f"src.{c}").alias(c) for c in out_cols])
    else:
        # Partial update: matched rows take update_columns from src, the
        # rest from tgt; unmatched src rows are inserted whole.
        upd = set(update_columns) - set(unique_key)
        if dedup_source_on is None:
            # MERGE cardinality rule: >1 source row matching one target row
            # is an error (ANSI/Delta raise; silently fanning out duplicates
            # is worse). Enforced in-plan — a per-key count window on the
            # small source side plus assert_true on matched rows — so it
            # costs no extra job and fires lazily at execution, like a
            # native MERGE would. Callers that expect duplicates opt out
            # with dedup_source_on (precombine semantics).
            wcnt = Window.partitionBy(*unique_key)
            src_guard = (
                source.withColumn("__src_cnt", F.count(F.lit(1)).over(wcnt)).alias("src")
            )
            guard = F.coalesce(
                F.assert_true(
                    F.col("src.__src_cnt") == F.lit(1),
                    F.lit(
                        "MERGE cardinality violation: multiple source rows match "
                        "one target row; pass dedup_source_on to pick a winner"
                    ),
                ).cast("boolean"),
                F.lit(True),
            )
        else:
            src_guard, guard = src, F.lit(True)
        matched = tgt.join(src_guard, cond, "inner").filter(guard).select(
            *[
                (F.col(f"src.{c}") if c in upd else F.col(f"tgt.{c}")).alias(c)
                for c in out_cols
            ]
        )
        unmatched_src = src.join(tgt, cond, "left_anti").select(
            *[F.col(f"src.{c}").alias(c) for c in out_cols]
        )
        merged_src = matched.unionByName(unmatched_src)

    return tgt_keep.select(*out_cols).unionByName(merged_src)

"""Temporal joins Spark lacks natively: as-of join and banded range join.

Not present in the reference (SURVEY.md §2.3: "as-of joins, interval/range
joins — candidates for our extension layer only"); standard in the
training-data/feature-store toolbox, so the engine ships them.

Both are built to avoid the naive O(|L|·|R|) theta join:

- ``asof_join``: union both sides, one window pass per key — the sort-merge
  formulation. Exactly one hash-partition shuffle on the key; state is one
  row per partition during the window scan. Survives 100 TB as long as a
  single key's timeline fits a partition (salt keys hotter than that).
- ``range_join``: equi-join on coarse time buckets (left rows exploded to
  every bucket their band overlaps) + exact residual filter. Work scales
  with band/bucket ratio, not |L|·|R|; Catalyst sees a plain equi-join so
  AQE/skew handling applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` timestamp,
    optionally per ``by`` key — pandas ``merge_asof`` semantics.

    ``right_cols`` are the right-side payload columns to carry (default:
    all non-key, non-ts columns), emitted as ``{col}{suffix}`` plus
    ``{on}{suffix}`` for the matched timestamp. If multiple right rows
    share one timestamp within a key, pre-deduplicate the right side —
    ties are otherwise resolved arbitrarily.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    payload = [on, *right_cols]

    # The union formulation requires the shared key/ts columns to agree in
    # type; a mismatch would otherwise be silently null-cast below.
    for c in (on, *by):
        lt, rt = left.schema[c].dataType, right.schema[c].dataType
        if lt != rt:
            raise TypeError(
                f"asof_join: column '{c}' type mismatch — left {lt.simpleString()}"
                f" vs right {rt.simpleString()}; cast the sides to agree"
            )

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast("struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload
        ) + ">").alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in by and c != on
          else F.col(c) for c in left.columns],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    unioned = l.unionByName(r)

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.asc(on), F.asc("__side"))
    elif direction == "forward":
        w = Window.partitionBy(*by).orderBy(F.desc(on), F.asc("__side"))
    else:
        raise ValueError(f"unknown direction {direction}")
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = F.last("__r", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col(f"__m.{on}").alias(f"{on}{suffix}"),
            *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_expr: str,
    upper_expr: str,
    bucket_seconds: int = 86400,
    extra_on: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Band join: right rows whose ``right_ts`` ∈ [left.lower, left.upper].

    ``lower_expr``/``upper_expr`` are SQL expressions over left columns
    (e.g. ``"ts - INTERVAL 7 DAYS"``, ``"ts"``). Left rows are exploded to
    each coarse ``bucket_seconds`` bucket the band overlaps; the bucket
    equi-join bounds the candidate set, then the exact predicate filters.
    ``extra_on`` adds equality pairs (left_col, right_col) into the bucket
    join key. Pick ``bucket_seconds`` ≈ the typical band width: left-side
    fan-out is ceil(band/bucket)+1 rows.
    """
    extra_on = extra_on or []
    l = (
        left.withColumn("__lo", F.expr(lower_expr))
        .withColumn("__hi", F.expr(upper_expr))
        .withColumn(
            "__bucket",
            # unix_timestamp (not cast-to-long): resolves on TIMESTAMP and
            # TIMESTAMP_NTZ alike — NTZ forbids a direct BIGINT cast.
            F.explode(
                F.sequence(
                    F.expr(f"unix_timestamp(__lo) div {bucket_seconds}"),
                    F.expr(f"unix_timestamp(__hi) div {bucket_seconds}"),
                )
            ),
        )
    )
    r = right.withColumn(
        "__bucket", F.expr(f"unix_timestamp({right_ts}) div {bucket_seconds}")
    )
    cond = F.col("l.__bucket") == F.col("r.__bucket")
    for lc, rc in extra_on:
        cond = cond & (F.col(f"l.{lc}") == F.col(f"r.{rc}"))
    joined = (
        l.alias("l")
        .join(r.alias("r"), cond)
        .filter(
            (F.col(f"r.{right_ts}") >= F.col("l.__lo"))
            & (F.col(f"r.{right_ts}") <= F.col("l.__hi"))
        )
    )
    keep_l = [F.col(f"l.{c}").alias(c) for c in left.columns]
    keep_r = [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"{c}_r")
        for c in right.columns
    ]
    return joined.select(*keep_l, *keep_r)

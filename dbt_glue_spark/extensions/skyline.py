"""Pareto-frontier (skyline) selection: rows not strictly dominated on
two maximize-dimensions.

The multi-objective filter a curation pipeline runs before trade-off
decisions — "documents no other document beats on BOTH quality and
freshness", "orders no other order beats on both value and recency".
A row p is dominated iff some q has q.x ≥ p.x AND q.y ≥ p.y with strict
inequality in at least one dimension; exact duplicates (both dims equal)
never dominate each other, so tied frontier points all survive.

No arithmetic crosses the oracle boundary — the operator is pure
comparisons and max() order statistics. The y dimension accepts any
orderable type (doubles, timestamps, strings); the x dimension must be
NUMERIC because the distributed prefix-max scan range-buckets on it
(validated at call time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def check_numeric(df: DataFrame, col: str, op: str) -> None:
    """Raise a descriptive TypeError unless ``col`` is numeric — the
    shared guard for every operator whose distributed prefix scan
    range-buckets on a column (equi-width arithmetic needs subtraction
    and division; timestamps/strings fail deep in the plan otherwise)."""
    from pyspark.sql.types import NumericType

    t = df.schema[col].dataType
    if not isinstance(t, NumericType):
        raise TypeError(
            f"{op} range-buckets on {col!r}, which must be numeric "
            f"(got {t.simpleString()}); pre-map it to a numeric key "
            "(e.g. epoch seconds) first"
        )


def equi_width_bucket(col: Column, mn: Column, mx: Column, n_buckets: int) -> Column:
    """Equi-width bucket id in [0, n_buckets) from a 1-row min/max frame
    — the shared first level of the distributed prefix scans (skyline,
    KS CDF): a single IEEE multiply+divide, identical in any engine; a
    degenerate mn == mx range collapses to bucket 0."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.least(
                F.floor((col - mn) / (mx - mn) * F.lit(float(n_buckets))),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """All rows of ``df`` on the 2-D Pareto frontier (maximize both
    ``x_col`` and ``y_col``), original columns preserved.

    Semantics reduce to a prefix-max scan: group rows by x (within an
    x-group only the max-y rows can survive — any lower y is dominated by
    the group's own max), then an x-group survives iff every STRICTLY
    greater x-group has a smaller ymax. The naive scan is a global window
    over distinct x — a corpus-sized single-partition sort at 100 TB — so
    this implementation distributes the prefix-max the classic two-level
    way:

    1. bucket x-groups into ``n_buckets`` equi-width ranges (1-row min/max
       broadcast; a single IEEE multiply+divide, bucket ids identical in
       any engine);
    2. per-bucket ymax → an ``n_buckets``-row frame whose strictly-higher-
       bucket prefix-max (the only global window — over ≤ n_buckets rows)
       seeds each bucket;
    3. within each bucket a window PARTITIONED BY BUCKET (parallel,
       bucket-bounded) finishes the scan: an x-group survives iff
       greatest(seed, within-bucket prefix-max) < its ymax.

    Survivoring x-groups then semi-join the original rows on
    (x, y == group ymax). Total cost: two narrow aggregations, one
    bounded window family, one equi-join — no global sort anywhere.

    Ordering contract: callers sort the result (frontier membership is a
    set).

    NULL contract: rows with NULL in either coordinate are excluded from
    the frontier — an unknown coordinate can neither dominate nor claim
    non-dominance. This is an explicit pre-filter, not an artifact of the
    join semantics (matching interval_islands' documented NULL handling).
    """
    check_numeric(df, x_col, "pareto_frontier_2d")
    x, y = F.col(x_col), F.col(y_col)
    pts = df.filter(x.isNotNull() & y.isNotNull())
    xg = pts.groupBy(x_col).agg(F.max(y).alias("__ymax"))
    stats = pts.agg(F.min(x).alias("__mn"), F.max(x).alias("__mx"))
    b = equi_width_bucket(x, F.col("__mn"), F.col("__mx"), n_buckets)
    bucketed = xg.crossJoin(F.broadcast(stats)).select(
        x_col, "__ymax", b.alias("__b")
    )
    # n_buckets-row frame: the one cross-bucket window runs here, never
    # over the x-groups themselves
    wb = Window.orderBy(F.desc("__b")).rowsBetween(Window.unboundedPreceding, -1)
    seeds = (
        bucketed.groupBy("__b")
        .agg(F.max("__ymax").alias("__bm"))
        .select("__b", F.max("__bm").over(wb).alias("__seed"))
    )
    wg = (
        Window.partitionBy("__b")
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips NULLs (first row of the first bucket has neither a
    # seed nor a prefix), so __thr is NULL only when nothing precedes
    marked = bucketed.join(F.broadcast(seeds), "__b").select(
        x_col,
        "__ymax",
        F.greatest(F.col("__seed"), F.max("__ymax").over(wg)).alias("__thr"),
    )
    frontier = marked.filter(
        F.col("__thr").isNull() | (F.col("__thr") < F.col("__ymax"))
    ).select(F.col(x_col).alias("__fx"), F.col("__ymax"))
    return df.join(
        frontier,
        (df[x_col] == frontier["__fx"]) & (df[y_col] == frontier["__ymax"]),
        "left_semi",
    )

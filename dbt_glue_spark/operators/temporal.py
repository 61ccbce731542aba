"""Temporal operators Spark lacks natively: as-of join, banded range
join, point-in-time join, and gaps-and-islands interval union.

Not present in the reference (SURVEY.md §2.3: "as-of joins, interval/range
joins — candidates for our extension layer only"); standard in the
training-data/feature-store toolbox, so the engine ships them.
``interval_islands`` is the non-join member: per-key interval merging
via a prefix-max window (see its docstring for the scale shape).

The joins are built to avoid the naive O(|L|·|R|) theta join:

- ``asof_join``: union both sides, one window pass per key — the sort-merge
  formulation. Exactly one hash-partition shuffle on the key; state is one
  row per partition during the window scan. Survives 100 TB as long as a
  single key's timeline fits a partition; for keys hotter than that use
  ``asof_join_bucketed`` (same semantics, (key, time-bucket) partitions
  with a carried row per bucket — no whole-timeline partition ever).
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

    NULL semantics follow the SQL equi-join, not Spark's window
    grouping: a right row with a NULL ``by`` key or NULL timestamp can
    never be anyone's match, and a left row with a NULL key/timestamp
    matches nothing (NULL payload). Without this, partitionBy groups the
    NULL keys together and they happily match EACH OTHER — a silent
    divergence from what the same join written in SQL would produce.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    payload = [on, *right_cols]

    for c in (on, *by):
        right = right.filter(F.col(c).isNotNull())

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

    # nulls FIRST in scan order (both directions): a NULL-ts left row then
    # precedes every right row and accumulates no payload → NULL match
    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.asc_nulls_first(on), F.asc("__side"))
    elif direction == "forward":
        w = Window.partitionBy(*by).orderBy(F.desc_nulls_first(on), F.asc("__side"))
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_matched",
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """Scale-path as-of join: bounded window partitions via time buckets.

    ``asof_join``'s one-window-per-key plan needs a key's whole timeline
    to fit a single partition — fine for user-keyed event streams, wrong
    for a hot key owning billions of rows (the documented watch item).
    This formulation is the segmented scan: the heavy window partitions
    by (key, time-bucket) so no partition exceeds ~one bucket of rows,
    and cross-bucket state collapses to ONE carried row per (key,
    bucket), computed on the bucket-summary frame — |non-empty buckets|
    rows per key, metadata-sized next to the data — then injected into
    each bucket's partition as a synthetic first row.

    Exactly ``asof_join``'s semantics (pandas merge_asof backward /
    forward, ties arbitrary under duplicate right timestamps); the
    equivalence property test in tests/test_operators_unit.py pins it.
    Pick ``bucket_seconds`` so one bucket of one key fits an executor
    partition; at 100 TB that replaces "salt and pray" for hot keys.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    payload = [on, *right_cols]
    for c in (on, *by):
        lt, rt = left.schema[c].dataType, right.schema[c].dataType
        if lt != rt:
            raise TypeError(
                f"asof_join_bucketed: column '{c}' type mismatch — left "
                f"{lt.simpleString()} vs right {rt.simpleString()}"
            )
    backward = direction == "backward"
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction}")

    # SQL equi-join NULL semantics (same contract as asof_join): NULL
    # key/ts right rows never match; they would otherwise bucket into
    # the NULL partition and match NULL-key left rows
    for c in (on, *by):
        right = right.filter(F.col(c).isNotNull())

    # numeric timeline: works for TIMESTAMP (epoch seconds w/ fraction)
    # and plain numeric ``on`` columns alike
    def ts_num(col: Column) -> Column:
        return col.cast("double")

    bucket_of = F.floor(ts_num(F.col(on)) / F.lit(float(bucket_seconds)))
    pay_t = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload
    ) + ">"

    rb = right.withColumn("__b", bucket_of)
    pick = F.max_by if backward else F.min_by
    # one row per (key, bucket): the bucket's boundary-row payload — the
    # only right-side state later buckets (earlier, for forward) can need
    summ = rb.groupBy(*by, "__b").agg(
        pick(F.struct(*[F.col(c) for c in payload]), ts_num(F.col(on))).alias(
            "__p"
        )
    )
    lb = left.withColumn("__b", bucket_of)
    # bucket spine: every (key, bucket) either side touches, so carried
    # values propagate through buckets with no left (or no right) rows
    spine = (
        lb.select(*by, "__b").distinct()
        .unionByName(summ.select(*by, "__b"))
        .distinct()
    )
    # nulls-first in both directions: the NULL bucket (NULL-ts left rows)
    # must never receive carried payload from real buckets
    order = F.asc_nulls_first("__b") if backward else F.desc_nulls_first("__b")
    wc = (
        Window.partitionBy(*by)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(summ, [*by, "__b"], "left")
        .withColumn("__p", F.last("__p", ignorenulls=True).over(wc))
        .filter(F.col("__p").isNotNull())
    )

    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        if c not in by and c != on
        else F.col(c)
        for c in left.columns
    ]
    l = lb.select(
        *[F.col(c) for c in left.columns], "__b",
        F.lit(1).alias("__side"), F.lit(1).alias("__real"),
        F.lit(None).cast(pay_t).alias("__r"),
    )
    r = rb.select(
        *null_left, "__b",
        F.lit(0).alias("__side"), F.lit(1).alias("__real"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    # carried rows sort before every real row of their bucket (__real=0)
    c_rows = carry.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in by
            else F.col(c)
            for c in left.columns
        ],
        "__b",
        F.lit(0).alias("__side"), F.lit(0).alias("__real"),
        F.col("__p").alias("__r"),
    )
    unioned = l.unionByName(r).unionByName(c_rows)
    t_ord = F.asc_nulls_first(on) if backward else F.desc_nulls_first(on)
    w = (
        Window.partitionBy(*by, "__b")
        .orderBy(F.asc("__real"), t_ord, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col(f"__m.{on}").alias(f"{on}{suffix}"),
            *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


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


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "dbt_valid_from",
    valid_to: str = "dbt_valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join of a fact stream against an SCD2 dimension: each
    fact row joins the dimension VERSION that was valid at the fact's own
    timestamp (``valid_from ≤ ts < valid_to``, open versions have NULL
    ``valid_to``). This is feature-store temporal correctness: joining
    "current" dimension values into historical facts leaks the future
    into training features; the PIT join reconstructs what was knowable
    at event time.

    The SCD2 invariant (versions of one key never overlap) guarantees at
    most one match per fact row, so ``inner``/``left`` joins never fan
    out.

    The result carries ONE column per business key —
    ``coalesce(facts.k, dim.k)`` — so the joined frame is directly usable
    by name (two copies would make any downstream select/groupBy raise
    AMBIGUOUS_REFERENCE). Coalescing rather than dropping the dim side
    keeps the key populated for unmatched dim rows under
    ``how='right'/'full'``, where the fact-side copy is NULL.

    100 TB shape: this is an EQUI-join on the business key with the
    validity window as a residual filter — Catalyst plans a hash join
    keyed on ``keys`` (broadcast when the dim fits), NOT a range join:
    the per-key version count is small (dim history), so the residual
    scan per probe is a handful of rows. Contrast ``range_join``, which
    exists for the no-equi-key case.
    """
    cond = None
    for k in keys:
        c = facts[k] == dim[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (facts[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[ts_col] < dim[valid_to]))
    )
    joined = facts.join(dim, cond, how)
    key_cols = [F.coalesce(facts[k], dim[k]).alias(k) for k in keys]
    fact_cols = [facts[c] for c in facts.columns if c not in keys]
    dim_cols = [dim[c] for c in dim.columns if c not in keys]
    return joined.select(*key_cols, *fact_cols, *dim_cols)


def interval_islands(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key into maximal
    "islands" (interval union — the gaps-and-islands primitive): the
    busy-period view behind utilization, SLA coverage, and composable
    downtime math. Distinct from sessionization: inputs are true
    [start, end] INTERVALS that overlap, not point events with a gap
    rule.

    Island detection is the standard prefix-max scan: per key, ordered
    by (start, end), an interval opens a new island iff its start is
    strictly after the running max of all earlier ends; the island id is
    the running count of such opens. Rows with a NULL key, start, or end
    are dropped (no position without bounds; engines disagree on NULL
    ordering); an end before its start is clamped to the start
    (zero-length interval) rather than poisoning the running max.

    100 TB shape: two windows, both PARTITIONED BY KEY (parallel across
    keys, state bounded by a key's own intervals) — never a global sort.
    Pure comparisons and max/count aggregates: engine-exact for
    timestamps, dates, and numerics alike.

    Output: key, island_start, island_end, n_intervals (bigint) — one
    row per island.
    """
    s, e = F.col(start_col), F.col(end_col)
    clean = df.filter(
        F.col(key_col).isNotNull() & s.isNotNull() & e.isNotNull()
    ).select(key_col, s.alias("__s"), F.greatest(s, e).alias("__e"))
    w = Window.partitionBy(key_col).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opened = clean.select(
        key_col,
        "__s",
        "__e",
        F.when(prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1)
        .otherwise(0)
        .alias("__new"),
    )
    island = F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        opened.select(key_col, "__s", "__e", island.alias("__island"))
        .groupBy(key_col, "__island")
        .agg(
            F.min("__s").alias("island_start"),
            F.max("__e").alias("island_end"),
            F.count("*").cast("bigint").alias("n_intervals"),
        )
        .drop("__island")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    bucket_width: int = 16,
    max_buckets_per_interval: int = 65536,
) -> DataFrame:
    """Keyless interval-overlap join: every (left, right) pair of
    CLOSED intervals with ``l_start <= r_end AND r_start <= l_end`` —
    the temporal-join shape with NO equi-key (campaign windows ×
    shipment spans, maintenance windows × sessions) that a plain SQL
    inequality join executes as a nested-loop band scan.

    ``left_cols``/``right_cols`` are (id, start, end) column names;
    bounds must already be integers on a shared axis (epoch days/
    seconds/micros). NULL-bounded rows are dropped; end < start clamps
    to start (the interval_islands convention).

    100 TB shape: each interval explodes to the ``bucket_width``-wide
    epoch buckets it covers (ceil(len/width)+1 rows — size the width
    near the MEDIAN interval length so the blow-up is a small constant),
    the join is a bucket EQUI-join (hash, never nested-loop), and each
    overlapping pair survives from exactly ONE bucket — the bucket of
    the later start, which both sides provably cover — so no distinct
    pass over the pair set is needed. Long outliers cost their own
    bucket count only; a hot bucket splits under AQE like any hash key.

    Exactness: bucket ids via floor(x / width) on doubles — exact for
    |x| < 2⁵² (any epoch-day or epoch-second axis; for micros beyond
    2⁵² pre-divide the axis), negative axes floor correctly.

    Blow-up guard: one extreme-length interval (bad data, or an
    epoch-micros axis joined with the default ``bucket_width=16``)
    would otherwise explode to a multi-billion-element bucket sequence
    and OOM its executor. Any row spanning more than
    ``max_buckets_per_interval`` buckets fails the job with an explicit
    error naming the offending span — raise the cap (or widen
    ``bucket_width`` toward the median interval length) deliberately,
    never silently.

    The two id column names must differ (both appear in the output);
    equal names would alias both sides to one name and break any
    downstream select — rejected up front.

    Output: (<left id>, <right id>, overlap_start, overlap_end) — one
    row per overlapping pair, bounds as bigint.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1: {bucket_width}")
    if max_buckets_per_interval < 1:
        raise ValueError(
            f"max_buckets_per_interval must be >= 1: {max_buckets_per_interval}"
        )
    lid, ls, le = left_cols
    rid, rs, re_ = right_cols
    if lid == rid:
        raise ValueError(
            "left and right id columns are both named "
            f"{lid!r}: the output carries both — rename one side "
            "(e.g. .withColumnRenamed) so the pair columns stay selectable"
        )

    def clean(df: DataFrame, idc: str, sc: str, ec: str, tag: str) -> DataFrame:
        s, e = F.col(sc).cast("bigint"), F.col(ec).cast("bigint")
        return df.filter(s.isNotNull() & e.isNotNull()).select(
            F.col(idc).alias(f"{tag}id"),
            s.alias(f"{tag}s"),
            F.greatest(s, e).alias(f"{tag}e"),
        )

    w = float(bucket_width)

    def buckets(sc: str, ec: str):
        # executor-side blow-up guard: the sequence end routes through a
        # raise_error branch so Catalyst cannot prune the check, and a
        # pathological span fails loudly instead of materializing
        # billions of bucket rows
        b0, b1 = F.floor(F.col(sc) / w), F.floor(F.col(ec) / w)
        checked_end = F.when(
            b1 - b0 >= F.lit(int(max_buckets_per_interval)),
            F.raise_error(
                F.format_string(
                    "interval_overlap_join: interval [%s, %s] spans more "
                    "than max_buckets_per_interval=%s buckets of width %s"
                    " — widen bucket_width or raise the cap explicitly",
                    F.col(sc),
                    F.col(ec),
                    F.lit(str(max_buckets_per_interval)),
                    F.lit(str(bucket_width)),
                )
            ).cast("bigint"),
        ).otherwise(b1)
        return F.explode(F.sequence(b0, checked_end))

    L = clean(left, lid, ls, le, "__l").withColumn(
        "__bk", buckets("__ls", "__le")
    )
    R = clean(right, rid, rs, re_, "__r").withColumn(
        "__bk", buckets("__rs", "__re")
    )
    first_common = F.greatest(
        F.floor(F.col("__ls") / w), F.floor(F.col("__rs") / w)
    )
    return (
        L.join(R, "__bk")
        .filter(
            (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
            & (F.col("__bk") == first_common)
        )
        .select(
            F.col("__lid").alias(lid),
            F.col("__rid").alias(rid),
            F.greatest("__ls", "__rs").cast("bigint").alias("overlap_start"),
            F.least("__le", "__re").cast("bigint").alias("overlap_end"),
        )
    )

"""Skew-handling join/aggregation helpers.

AQE's skew-join handles most runtime skew (session default on); these
helpers cover the cases AQE can't re-plan: a broadcast-ineligible join
where one side has a handful of pathological hot keys, and high-cardinality
aggregations whose partial-agg hash tables thrash on hot groups.

- ``salted_join``: left rows get a random salt in [0, salt); right rows are
  replicated ``salt`` times with each salt value; join key becomes
  (key, salt). A hot left key's rows spread across ``salt`` partitions
  instead of one. Replication cost: |right| × salt — use when right is the
  small-but-not-broadcastable side.
- ``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on key
  — explicit map-side combine for algebraic aggregates whose partial state
  is large (e.g. collect-like) or whose hot keys overwhelm one reducer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with salted keys to spread hot left-side keys.

    Semantics-preserving for inner/left joins on equality keys (each left
    row matches the single replicated right row with its salt). The salt
    column is internal and dropped from the result.
    """
    l = left.withColumn("__salt", (F.rand() * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial: list[Column],
    final: Callable[[DataFrame], list[Column]],
    salt: int = 32,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt).agg(partial) then
    groupBy(keys).agg(final(partial_df)).

    ``partial`` aggregates must be algebraic (sum/count/min/max-style);
    ``final`` receives the partial frame and returns the re-aggregation
    columns (e.g. sum of partial sums).
    """
    salted = df.withColumn("__salt", (F.rand() * salt).cast("int"))
    part = salted.groupBy(*keys, "__salt").agg(*partial)
    return part.groupBy(*keys).agg(*final(part))

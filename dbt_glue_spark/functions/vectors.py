"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Everything here compiles to Catalyst higher-order functions (``zip_with`` +
``aggregate``), so the hot path of similarity search stays inside
whole-stage codegen: no Python UDF, no serialization. At 100 TB the cost is
the join strategy (see extensions/similarity.py), not these expressions.

Summation is sequential left-to-right over the array, which makes the
result deterministic (stable oracle comparisons) — unlike a parallel
reduction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns, computed in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; NULL if either norm is 0."""
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, dot(a, b) / n)

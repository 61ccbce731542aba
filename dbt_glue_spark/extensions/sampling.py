"""Deterministic sampling operators for training-data curation.

`df.sample()` is seed-dependent *per partition layout*: the same seed gives
different rows after a repartition, an AQE re-plan, or a file split change —
useless for reproducible dataset releases. These operators derive the
sampling decision from a content hash instead, so the sample is a pure
function of the data: stable across runs, partitionings, engines (the
DuckDB oracle reproduces it bit-for-bit), and incremental loads (a doc's
in/out decision never changes as the corpus grows).

Scale shape: both operators are stateless projections + filters (hash
sample) or one bounded-output window (stratified top-fraction) — no
collect, no global sort, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_glue_spark.extensions.sketches import hash_fraction as _hash_frac


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose md5(key) falls in the first ``fraction`` of hash
    space. Deterministic, repartition-proof, and consistent across
    incremental loads (membership depends only on the key's bytes).
    """
    return df.filter(_hash_frac(F.col(key_col)) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fraction: float,
) -> DataFrame:
    """Exact per-stratum fraction: rank rows inside each stratum by hash of
    the key and keep the first ceil(fraction × |stratum|).

    Unlike ``hash_sample`` (binomial per stratum), the per-group sample
    size is exact — the guarantee dataset-balance work needs (e.g. equal
    language representation). One window shuffle on the strata key; the
    hash ordering keeps the choice deterministic and unique-key tie-broken.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_frac(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    cw = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(cw))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
) -> DataFrame:
    """Deterministic three-way split: adds a ``split`` column
    ('train'/'val'/'test') from the md5 hash fraction of ``key_col``.

    Content-hash membership means the assignment is a pure function of the
    key — stable across runs, engines, partitionings, and corpus growth
    (adding documents never reassigns existing ones), which is exactly what
    leakage-free ML splits require. Narrow projection, no shuffle.
    """
    assert val_fraction + test_fraction < 1.0
    frac = _hash_frac(F.col(key_col))
    train_hi = 1.0 - val_fraction - test_fraction
    return df.withColumn(
        "split",
        F.when(frac < F.lit(train_hi), F.lit("train"))
        .when(frac < F.lit(train_hi + val_fraction), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Data-mixture sampling: keep each group at its own rate — the
    "target mixture" step of training-set assembly (downsample the crawl,
    keep curated sources whole). Same content-hash membership as
    ``hash_sample``, so a document's in/out decision is a pure function of
    its key and its group's rate: stable across runs, partitionings, and
    corpus growth, and composable with incremental loads. Groups absent
    from ``rates`` get ``default_rate`` (0.0 = drop).

    Stateless projection + filter — no shuffle, scan-bounded at any scale.
    """
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.filter(_hash_frac(F.col(key_col)) < rate)

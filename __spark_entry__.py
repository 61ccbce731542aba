"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``dbt_glue_spark.plans`` (one entry per implemented operator from
SURVEY.md §2 plus the extension operators), each paired with a DuckDB
oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_glue_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402


def _tune(spark: SparkSession) -> SparkSession:
    """Apply the engine's session conf to a driver-provided session."""
    from dbt_glue_spark.session import _DEFAULT_CONF

    for k, v in _DEFAULT_CONF.items():
        if k.startswith("spark.sql."):  # runtime-settable subset
            try:
                spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 — static confs on a live session
                pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _tune(spark)
    fn = QUERIES()["flagship_revenue_by_nation"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = QUERIES()
    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_tune(spark), sf_dir))
        for name, fn in qs.items()
    }


def oracle_sql() -> dict[str, str]:
    return ORACLES()

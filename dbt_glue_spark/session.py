"""SparkSession factory with scale-ready defaults.

The reference ships every statement to a remote Glue Spark cluster
(reference: dbt/adapters/glue/gluedbapi/connection.py:396-491); our engine
runs Spark in-process. The confs below are the ones the reference relies on
implicitly plus the ones a 100 TB deployment needs from day one:

- ``spark.sql.sources.partitionOverwriteMode=dynamic`` — the reference gets
  the same effect via ``set hive.exec.dynamic.partition.mode=nonstrict``
  before every INSERT OVERWRITE (reference:
  dbt/include/glue/macros/materializations/incremental/strategies.sql:14);
  without it a partitioned INSERT OVERWRITE truncates the whole table.
- AQE on (+ skew-join handling) so shuffle partitioning re-plans at runtime;
  at 100 TB this is what absorbs skewed merge/join keys.
- Arrow execution for any pandas interchange (the reference's ``use_arrow``
  results channel, reference: connection.py:448-484, collapses to
  ``df.toPandas()`` in-process).
- Session timezone pinned to UTC so timestamp semantics are stable across
  driver/executors and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] test harness; on a real cluster the same
# settings scale: shuffle.partitions is a floor that AQE coalesces down from,
# and at 100 TB you raise it (e.g. 2000-8000) rather than rewrite code.
_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # Read parquet TIMESTAMP(NANOS) as bigint ns (sources/registry.py
    # converts back to timestamp_micros); vectorized reader errors otherwise.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Plain-parquet tables + overwrite materializations: skip _SUCCESS files
    "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "dbt_glue_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster
    pass None with a pre-configured spark-submit and the builder inherits it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if warehouse_dir:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

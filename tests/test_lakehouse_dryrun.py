"""Golden-SQL evidence for the jar-gated lakehouse substitution point.

The environment has no Delta/Iceberg jars, so native execution cannot
run — these tests pin (a) the exact session conf each format's session
would get and (b) the exact statements `_write_swap`'s substitution
executes, so the S5/S7 design is verified as text rather than trusted
as prose. Reference shapes: strategies.sql:42-93 (MERGE), Delta
impl.py:795-879 / Iceberg adapters.sql:162-174 (create/replace).
"""

from __future__ import annotations

import tempfile

import pytest

from dbt_glue_spark.engine import Engine, Model, ModelConfig
from dbt_glue_spark.operators.lakehouse_sql import (
    create_or_replace_sql,
    merge_into_sql,
)
from dbt_glue_spark.session import _LAKEHOUSE_CONF, build_conf


def test_lakehouse_conf_golden():
    assert _LAKEHOUSE_CONF["delta"] == {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }
    assert _LAKEHOUSE_CONF["iceberg"] == {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        "spark.sql.catalog.spark_catalog": (
            "org.apache.iceberg.spark.SparkSessionCatalog"
        ),
        "spark.sql.catalog.spark_catalog.type": "hive",
    }
    # without the jars, build_conf must NOT light the extensions up
    with pytest.warns(UserWarning, match="not installed"):
        conf = build_conf(lakehouse="delta")
    assert "spark.sql.extensions" not in conf


def test_merge_into_sql_golden_upsert():
    sql = merge_into_sql(
        "db.orders", "db.orders__dbt_tmp", ["o_orderkey", "o_totalprice"],
        ["o_orderkey"],
    )
    assert sql == (
        "MERGE INTO db.orders AS DBT_INTERNAL_DEST\n"
        "USING db.orders__dbt_tmp AS DBT_INTERNAL_SOURCE\n"
        "ON DBT_INTERNAL_SOURCE.o_orderkey = DBT_INTERNAL_DEST.o_orderkey\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) "
        "VALUES (DBT_INTERNAL_SOURCE.o_orderkey, DBT_INTERNAL_SOURCE.o_totalprice)"
    )


def test_merge_into_sql_no_key_is_on_false():
    # strategies.sql:75-77: no unique key → ON FALSE → insert-only
    sql = merge_into_sql("t", "s", ["a"], None)
    assert "ON FALSE" in sql


def test_merge_into_sql_update_columns_and_predicates():
    sql = merge_into_sql(
        "t", "s", ["k", "v", "w"], ["k"],
        update_columns=["v"],
        incremental_predicates=["DBT_INTERNAL_DEST.w > 0"],
    )
    assert (
        "ON DBT_INTERNAL_SOURCE.k = DBT_INTERNAL_DEST.k "
        "AND DBT_INTERNAL_DEST.w > 0" in sql
    )
    assert "UPDATE SET v = DBT_INTERNAL_SOURCE.v\n" in sql
    # exclude_columns resolves against dest columns when no explicit list
    sql2 = merge_into_sql("t", "s", ["k", "v", "w"], ["k"], exclude_columns=["w"])
    assert "UPDATE SET k = DBT_INTERNAL_SOURCE.k, v = DBT_INTERNAL_SOURCE.v" in sql2


def test_create_or_replace_sql_golden():
    sql = create_or_replace_sql(
        "db.t", "select 1 as a", "iceberg",
        partition_by=["a"], location="/lake/db/t",
        tblproperties={"write.format.default": "parquet"},
    )
    assert sql == (
        "CREATE OR REPLACE TABLE db.t\n"
        "USING iceberg\n"
        "PARTITIONED BY (a)\n"
        "LOCATION '/lake/db/t'\n"
        "TBLPROPERTIES ('write.format.default' = 'parquet')\n"
        "AS\nselect 1 as a"
    )


def test_engine_dry_run_merge_and_table(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="dgs_lh_"), schema="lh_test")
    spark.range(5).selectExpr("id as k", "id * 2 as v").createOrReplaceTempView(
        "lh_src"
    )
    eng.add(
        Model(
            "inc_m",
            sql="select k, v from {{ source('lh_src') }}",
            config=ModelConfig(
                materialized="incremental",
                incremental_strategy="merge",
                unique_key="k",
                file_format="delta",
            ),
        )
    )
    out = eng.lakehouse_dry_run("inc_m", "delta")
    assert out["conf"] == _LAKEHOUSE_CONF["delta"]
    assert out["statements"][0].startswith(
        "CREATE OR REPLACE TEMPORARY VIEW lh_test.inc_m__dbt_tmp AS"
    )
    assert out["statements"][1] == (
        "MERGE INTO lh_test.inc_m AS DBT_INTERNAL_DEST\n"
        "USING lh_test.inc_m__dbt_tmp AS DBT_INTERNAL_SOURCE\n"
        "ON DBT_INTERNAL_SOURCE.k = DBT_INTERNAL_DEST.k\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT (k, v) "
        "VALUES (DBT_INTERNAL_SOURCE.k, DBT_INTERNAL_SOURCE.v)"
    )
    eng.add(
        Model(
            "tbl_m",
            sql="select k from {{ source('lh_src') }}",
            config=ModelConfig(materialized="table", partition_by=["k"]),
        )
    )
    out2 = eng.lakehouse_dry_run("tbl_m", "iceberg")
    stmt = out2["statements"][0]
    assert stmt.startswith("CREATE OR REPLACE TABLE lh_test.tbl_m\nUSING iceberg")
    assert "PARTITIONED BY (k)" in stmt
    with pytest.raises(ValueError):
        eng.lakehouse_dry_run("tbl_m", "hudi_nope")

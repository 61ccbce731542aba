"""Round-3 additions: S8 symlink manifest, P6 statement sanitation."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.engine import Engine, Model, ModelConfig, sanitize_sql


@pytest.fixture()
def engine(spark):
    wh = tempfile.mkdtemp(prefix="dgs_r3_wh_")
    return Engine(spark, wh, schema="r3_test")


def test_sanitize_sql_strips_dbt_comment_header():
    # reference: gluedbapi/cursor.py:57-65 remove_comments_header
    sql = '/* {"app": "dbt", "dbt_version": "1.7"} */\nselect 1 as x'
    assert sanitize_sql(sql) == "select 1 as x"
    # no header → untouched
    assert sanitize_sql("select 1") == "select 1"
    # inline comment later in the statement is NOT a header
    assert sanitize_sql("select 1 /* keep */") == "select 1 /* keep */"


def test_sanitize_sql_pads_trailing_single_quote():
    # reference: gluedbapi/cursor.py:67-74 add_end_space_if_single_quote
    assert sanitize_sql("select * from t where c='foo'") == (
        "select * from t where c='foo' "
    )


def test_model_sql_with_dbt_header_runs(spark, engine):
    spark.range(3).createOrReplaceTempView("r3_src")
    m = Model(
        "with_header",
        sql="/* {\"app\": \"dbt\"} */\nselect id from {{ source('r3_src') }}",
        config=ModelConfig(materialized="table"),
    )
    engine.add(m)
    engine.run_model(m)
    assert engine.ref_df("with_header").count() == 3


def test_symlink_manifest_unpartitioned(spark, engine):
    m = Model("plain_t", sql="select 1 as a union all select 2", config=ModelConfig())
    engine.add(m)
    engine.run_model(m)
    parts = engine.generate_symlink_manifest("plain_t")
    assert list(parts) == [""]
    files = engine.ref_df("plain_t").inputFiles()
    assert sorted(parts[""]) == sorted(files)
    # manifest file exists beside the data and lists exactly those files
    from urllib.parse import urlparse

    root = os.path.dirname(urlparse(files[0]).path)
    mf = os.path.join(root, "_symlink_format_manifest", "manifest")
    assert os.path.exists(mf)
    assert sorted(open(mf).read().split()) == sorted(files)


def test_symlink_manifest_partitioned_and_rerun_replaces(spark, engine):
    df_sql = (
        "select id, case when id % 2 = 0 then 'a' else 'b' end as part "
        "from range(10)"
    )
    m = Model("part_t", sql=df_sql, config=ModelConfig(partition_by=["part"]))
    engine.add(m)
    engine.run_model(m)
    parts = engine.generate_symlink_manifest("part_t")
    assert set(parts) == {"part=a", "part=b"}
    for part, uris in parts.items():
        assert uris and all(part in u for u in uris)
    # rewrite → regenerate must replace, not accumulate stale entries
    engine.run_model(m)
    parts2 = engine.generate_symlink_manifest("part_t")
    assert set(parts2) == {"part=a", "part=b"}
    old_files = {u for us in parts.values() for u in us}
    new_files = {u for us in parts2.values() for u in us}
    assert old_files.isdisjoint(new_files)  # fresh generation's files

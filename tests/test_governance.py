"""Governance operators: catalog extraction, secured views, vacuum."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.engine import Engine, Model, ModelConfig
from dbt_glue_spark.operators.governance import (
    catalog_info,
    create_secured_view,
    vacuum_versions,
)

CSV = "id,region,secret,balance\n1,eu,a,10\n2,us,b,20\n3,eu,c,30\n"


@pytest.fixture()
def engine(spark, warehouse):
    schema = f"g_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    yield eng
    eng.catalog.drop_schema(schema)


def test_catalog_info_shape(engine, spark):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    engine.add(
        Model(
            "v",
            sql="select id from {{ ref('acct') }}",
            config=ModelConfig(materialized="view"),
        )
    )
    engine.run()
    docs = engine.docs()
    assert docs.columns == [
        "table_database", "table_schema", "table_name", "table_type",
        "table_comment", "column_name", "column_index", "column_type",
        "column_comment", "stats",
    ]
    rows = {(r.table_name, r.column_name): r for r in docs.collect()}
    assert rows[("acct", "id")].column_type == "bigint"
    assert rows[("acct", "balance")].column_type == "bigint"
    assert rows[("v", "id")].table_type == "view"
    assert rows[("acct", "id")].table_type == "table"


def test_secured_view_row_and_column_filters(engine, spark):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    engine.run()
    src = engine.relation_for("acct").render()
    sec = f"{engine.schema}.acct_secured"
    create_secured_view(
        spark, src, sec, row_filter="region = 'eu'", excluded_column_names=["secret"]
    )
    out = spark.table(sec)
    assert set(out.columns) == {"id", "region", "balance"}
    assert out.count() == 2
    # include-list variant
    create_secured_view(spark, src, sec, column_names=["id", "balance"])
    assert set(spark.table(sec).columns) == {"id", "balance"}
    with pytest.raises(ValueError, match="exclusive"):
        create_secured_view(
            spark, src, sec, column_names=["id"], excluded_column_names=["secret"]
        )


def test_vacuum_keeps_current_version(engine, spark, warehouse):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    m = Model(
        "t",
        sql="select * from {{ ref('acct') }}",
        config=ModelConfig(materialized="table"),  # auto_vacuum on by default
    )
    engine.add(m)
    engine.run()
    engine.run_model(m)  # second rewrite → supersedes the first version
    schema_dir = os.path.join(warehouse, engine.schema)
    vers = [d for d in os.listdir(schema_dir) if d.startswith("t__v")]
    assert len(vers) == 1  # auto-vacuum kept only the live generation
    assert engine.ref_df("t").count() == 3  # table still readable

    # manual vacuum API: disable auto, accumulate, then vacuum keep=1
    m.config.auto_vacuum = False
    engine.run_model(m)
    engine.run_model(m)
    vers = [d for d in os.listdir(schema_dir) if d.startswith("t__v")]
    assert len(vers) == 3
    deleted = vacuum_versions(warehouse, engine.schema, "t", keep=1)
    assert len(deleted) == 2
    assert engine.ref_df("t").count() == 3


def test_show_create_tblproperties_comments(engine, spark):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    engine.run()
    rel = engine.relation_for("acct")
    # D12/D16: table properties incl. docs comment
    engine.catalog.set_tblproperties(rel, {"comment": "account table", "team": "de"})
    ddl = engine.catalog.show_create(rel)
    assert "acct" in ddl
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {rel.render()}").collect()
    }
    assert props.get("team") == "de"
    # 'comment' routes to the catalog comment (D16), not a plain property
    assert spark.catalog.getTable(rel.render()).description == "account table"
    # D9: add columns
    from pyspark.sql.types import StringType, StructField, StructType

    engine.catalog.add_columns(rel, StructType([StructField("note", StringType())]))
    assert "note" in [f.name for f in engine.catalog.columns(rel).fields]


def test_full_refresh_rebuilds(engine):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_fr",
        sql="select id from {{ ref('acct') }}",
        config=ModelConfig(materialized="incremental", incremental_strategy="append"),
    )
    engine.add(inc)
    engine.run(["acct", "inc_fr"])
    engine.run_model(inc)  # append again → 6 rows
    assert engine.ref_df("inc_fr").count() == 6
    inc.config.full_refresh = True
    engine.run_model(inc)  # rebuild from scratch → 3
    assert engine.ref_df("inc_fr").count() == 3


def test_compact_merges_small_files(spark, warehouse):
    import uuid

    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("orders",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "frag",
            sql="select /*+ REPARTITION(40) */ o_orderkey, o_totalprice from orders",
            config=ModelConfig(),
        )
    )
    try:
        eng.run()
        before = eng.ref_df("frag").count()
        stats = eng.compact("frag")
        assert stats["files_before"] >= 40
        assert stats["files_after"] <= 2
        assert eng.ref_df("frag").count() == before
    finally:
        eng.catalog.drop_schema(schema)


def test_compact_sort_by_gives_disjoint_file_ranges(spark, warehouse):
    import uuid
    from urllib.parse import urlparse

    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("orders",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "clustered",
            sql="select /*+ REPARTITION(20) */ o_orderkey, o_totalprice from orders",
            config=ModelConfig(),
        )
    )
    try:
        eng.run()
        before = eng.ref_df("clustered").count()
        stats = eng.compact(
            "clustered", target_file_bytes=16 * 1024, sort_by=["o_orderkey"]
        )
        assert stats["files_after"] >= 2  # multiple files so skipping matters
        assert eng.ref_df("clustered").count() == before
        # range clustering: per-file key ranges must not overlap — this is
        # exactly what parquet min/max stats use to skip whole files
        ranges = []
        for uri in eng.ref_df("clustered").inputFiles():
            path = urlparse(uri).path or uri
            fdf = spark.read.parquet(path)
            lohi = fdf.agg(
                F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
            ).collect()[0]
            ranges.append((lohi.lo, lohi.hi))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, ranges
    finally:
        eng.catalog.drop_schema(schema)


def test_time_travel_reads_previous_generation(spark, warehouse):
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("nation",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "snap_t",
            sql="select n_nationkey, n_name from nation where n_nationkey < 5",
            config=ModelConfig(auto_vacuum=False),
        )
    )
    try:
        eng.run()
        v1 = eng.versions("snap_t")[0]
        m = eng.models["snap_t"]
        m.sql = "select n_nationkey, n_name from nation where n_nationkey < 10"
        eng.run_model(m)  # table CTAS rewrite → new generation
        vs = eng.versions("snap_t")
        assert len(vs) == 2 and vs[0] > v1
        # catalog tracks newest; time travel reads the retained old one
        assert eng.ref_df("snap_t").count() == 10
        assert eng.read_version("snap_t", v1).count() == 5
        with pytest.raises(KeyError):
            eng.read_version("snap_t", 123)
    finally:
        eng.catalog.drop_schema(schema)


def test_analyze_populates_cbo_statistics(spark, warehouse):
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("nation",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(Model("stats_t", sql="select * from nation", config=ModelConfig()))
    try:
        eng.run()
        rel = eng.relation_for("stats_t")
        eng.catalog.analyze(rel, columns=["n_nationkey"])
        detail = spark.sql(f"DESCRIBE EXTENDED {rel.render()}").collect()
        stats_line = " ".join(r.data_type for r in detail if r.col_name == "Statistics")
        assert "rows" in stats_line, detail
        coldesc = spark.sql(
            f"DESCRIBE EXTENDED {rel.render()} n_nationkey"
        ).collect()
        info = {r.info_name: r.info_value for r in coldesc}
        assert info.get("distinct_count") not in (None, "NULL"), info
    finally:
        eng.catalog.drop_schema(schema)


def test_delete_rows_rewrites_without_matches(spark, warehouse):
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("customer",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "gdpr_t",
            sql="select c_custkey, c_name, c_mktsegment from customer",
            config=ModelConfig(),
        )
    )
    try:
        eng.run()
        total = eng.ref_df("gdpr_t").count()
        seg = eng.ref_df("gdpr_t").filter(F.col("c_mktsegment") == "BUILDING").count()
        assert seg > 0
        deleted = eng.delete_rows("gdpr_t", "c_mktsegment = 'BUILDING'")
        assert deleted == seg
        after = eng.ref_df("gdpr_t")
        assert after.count() == total - seg
        assert after.filter(F.col("c_mktsegment") == "BUILDING").count() == 0
        # NULL-safety: predicate rows with NULL evaluate false → kept
        deleted2 = eng.delete_rows("gdpr_t", "c_mktsegment = 'NOPE'")
        assert deleted2 == 0
        # NULL predicate rows must be KEPT (SQL DELETE semantics):
        # NULLIF makes the predicate NULL for every 'AUTOMOBILE' row
        kept_before = eng.ref_df("gdpr_t").count()
        deleted3 = eng.delete_rows(
            "gdpr_t", "NULLIF(c_mktsegment, 'AUTOMOBILE') = 'NOPE'"
        )
        assert deleted3 == 0 and eng.ref_df("gdpr_t").count() == kept_before
    finally:
        eng.catalog.drop_schema(schema)


def test_secured_view_column_masking(engine, spark):
    engine.add(Model("acct", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    engine.run()
    src = engine.relation_for("acct").render()
    sec = f"{engine.schema}.acct_masked"
    create_secured_view(
        spark, src, sec,
        excluded_column_names=["balance"],
        masked_columns={"secret": "sha2(secret, 256)"},
    )
    out = spark.table(sec)
    assert set(out.columns) == {"id", "region", "secret"}
    vals = {r.id: r.secret for r in out.collect()}
    assert all(len(v) == 64 for v in vals.values())  # sha2 hex, not raw
    assert "a" not in vals.values()
    with pytest.raises(ValueError, match="masked columns not in view"):
        create_secured_view(spark, src, sec, masked_columns={"nope": "1"})


def test_update_rows_case_semantics(spark, warehouse):
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("nation",))
    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "upd_t",
            sql="select n_nationkey, n_name, n_regionkey from nation",
            config=ModelConfig(),
        )
    )
    try:
        eng.run()
        n = eng.update_rows(
            "upd_t",
            set={"n_name": "concat(n_name, '_X')", "n_regionkey": "n_regionkey + 100"},
            predicate="n_nationkey < 3",
        )
        assert n == 3
        rows = {r.n_nationkey: r for r in eng.ref_df("upd_t").collect()}
        assert rows[0].n_name.endswith("_X") and rows[0].n_regionkey >= 100
        assert not rows[5].n_name.endswith("_X")  # untouched
        with pytest.raises(ValueError, match="unknown columns"):
            eng.update_rows("upd_t", set={"nope": "1"}, predicate="true")
    finally:
        eng.catalog.drop_schema(schema)

"""Materialization engine tests — the standard dbt adapter-suite scenarios
(reference: tests/functional/adapter/test_basic.py, test_iceberg.py) run
against the in-process engine: seed → view → table → incremental
(append / insert_overwrite / merge) → snapshot, asserting the reference's
row-count invariants (base=10, added=20, incremental→30, snapshot 10→20)
from FIXTURES.md §1-2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_glue_spark.engine import Engine, Model, ModelConfig

BASE_CSV = "id,first_name,last_name,email,gender,ip_address\n" + "\n".join(
    f"{i},Name{i},Last{i},n{i}@x.org,{'Male' if i % 2 else 'Female'},10.0.0.{i}"
    for i in range(1, 11)
)
ADDED_CSV = "id,first_name,last_name,email,gender,ip_address\n" + "\n".join(
    f"{i},Name{i},Last{i},n{i}@x.org,{'Male' if i % 2 else 'Female'},10.0.0.{i}"
    for i in range(1, 31)
)


@pytest.fixture()
def engine(spark, warehouse):
    import uuid

    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    yield eng
    eng.catalog.drop_schema(schema)


def test_seed_view_table_roundtrip(engine):
    engine.add(Model("base", seed_csv=BASE_CSV, config=ModelConfig(materialized="seed")))
    engine.add(
        Model(
            "v_base",
            sql="select id, email from {{ ref('base') }} where id <= 5",
            config=ModelConfig(materialized="view"),
        )
    )
    engine.add(
        Model(
            "t_base",
            sql="select * from {{ ref('v_base') }}",
            config=ModelConfig(materialized="table"),
        )
    )
    engine.run()
    assert engine.ref_df("base").count() == 10
    assert engine.ref_df("v_base").count() == 5
    assert engine.ref_df("t_base").count() == 5
    # seed type inference: id is bigint (agate Number-integral → bigint)
    assert dict(engine.ref_df("base").dtypes)["id"] == "bigint"


def test_ephemeral_inlining(engine):
    engine.add(Model("base", seed_csv=BASE_CSV, config=ModelConfig(materialized="seed")))
    engine.add(
        Model(
            "eph",
            sql="select id from {{ ref('base') }} where id > 3",
            config=ModelConfig(materialized="ephemeral"),
        )
    )
    engine.add(
        Model(
            "final",
            sql="select count(*) as n from {{ ref('eph') }}",
            config=ModelConfig(materialized="table"),
        )
    )
    engine.run()
    assert engine.ref_df("final").collect()[0].n == 7
    # ephemeral model itself is never cataloged
    assert not engine.catalog.exists(engine.relation_for("eph"))


def test_incremental_append_high_water_mark(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc",
        sql="select * from {{ ref('added') }} where id <= 10",
        config=ModelConfig(materialized="incremental", incremental_strategy="append"),
    )
    engine.add(inc)
    engine.run(["added", "inc"])
    assert engine.ref_df("inc").count() == 10
    # second run: high-water-mark batch (reference README.md:528-534 shape)
    inc.sql = (
        "select * from {{ ref('added') }} "
        "where id > (select max(id) from {{ this }})"
    )
    engine.run_model(inc)
    assert engine.ref_df("inc").count() == 30
    # idempotent re-run: empty batch appends nothing
    engine.run_model(inc)
    assert engine.ref_df("inc").count() == 30


def test_incremental_insert_overwrite_partitions(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_po",
        sql="select id, email, id % 3 as part from {{ ref('added') }} where id <= 20",
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="insert_overwrite",
            partition_by=["part"],
        ),
    )
    engine.add(inc)
    engine.run(["added", "inc_po"])
    assert engine.ref_df("inc_po").count() == 20
    # overwrite ONLY partition 0 with a single row; partitions 1,2 intact
    inc.sql = (
        "select id, email, id % 3 as part from {{ ref('added') }} "
        "where id = 30 and id % 3 = 0"
    )
    engine.run_model(inc)
    out = engine.ref_df("inc_po")
    assert out.filter("part = 0").count() == 1  # replaced
    assert out.filter("part != 0").count() == 14  # untouched (ids 1..20 w/ part!=0)


def test_incremental_merge_upsert(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_m",
        sql="select id, email, 'v1' as ver from {{ ref('added') }} where id <= 10",
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="merge",
            unique_key=["id"],
        ),
    )
    engine.add(inc)
    engine.run(["added", "inc_m"])
    # run 2: update ids 6-10, insert 11-15 (reference merge invariants,
    # test_iceberg.py:565-585 10/20/30 pattern condensed)
    inc.sql = (
        "select id, email, 'v2' as ver from {{ ref('added') }} "
        "where id between 6 and 15"
    )
    engine.run_model(inc)
    out = engine.ref_df("inc_m")
    assert out.count() == 15
    assert out.filter("ver = 'v2'").count() == 10
    assert out.filter("ver = 'v1'").count() == 5


def test_incremental_merge_update_columns(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_mc",
        sql="select id, email, 'a' as c1, 'a' as c2 from {{ ref('added') }} where id <= 5",
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="merge",
            unique_key=["id"],
            merge_update_columns=["c1"],
        ),
    )
    engine.add(inc)
    engine.run(["added", "inc_mc"])
    inc.sql = "select id, email, 'b' as c1, 'b' as c2 from {{ ref('added') }} where id <= 5"
    engine.run_model(inc)
    rows = engine.ref_df("inc_mc").filter("id <= 5").collect()
    assert all(r.c1 == "b" and r.c2 == "a" for r in rows)  # only c1 updated


def test_merge_format_gating(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_gate",
        sql="select id from {{ ref('added') }}",
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="merge",
            unique_key=["id"],
            require_transactional_merge=True,  # reference validate.sql:38-47
        ),
    )
    engine.add(inc)
    engine.run(["added"])
    # validation is upfront (validate.sql runs before the create-vs-merge
    # decision), so even the first run rejects merge-on-parquet
    with pytest.raises(ValueError, match="merge strategy requires"):
        engine.run_model(inc)


def test_schema_evolution_append_new_columns(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    inc = Model(
        "inc_se",
        sql="select id, email from {{ ref('added') }} where id <= 10",
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="merge",
            unique_key=["id"],
            on_schema_change="append_new_columns",
        ),
    )
    engine.add(inc)
    engine.run(["added", "inc_se"])
    # evolved batch adds `phone` (FIXTURES.md §3 shape)
    inc.sql = (
        "select id, email, '555' as phone from {{ ref('added') }} "
        "where id between 6 and 12"
    )
    engine.run_model(inc)
    out = engine.ref_df("inc_se")
    assert out.count() == 12
    assert "phone" in out.columns
    assert out.filter("phone is null").count() == 5  # ids 1-5 backfilled NULL
    # ignore mode drops the new column instead
    inc2 = Model(
        "inc_se2",
        sql="select id, email from {{ ref('added') }} where id <= 3",
        config=ModelConfig(
            materialized="incremental", incremental_strategy="append",
            on_schema_change="ignore",
        ),
    )
    engine.add(inc2)
    engine.run(["inc_se2"])
    inc2.sql = "select id, email, 'x' as extra from {{ ref('added') }} where id = 4"
    engine.run_model(inc2)
    assert "extra" not in engine.ref_df("inc_se2").columns


def test_snapshot_check_strategy(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    ts = {"t": "2024-01-01 00:00:00"}
    eng_now = lambda: ts["t"]  # noqa: E731
    engine._now = eng_now
    snap = Model(
        "snap",
        sql="select id, email, gender from {{ ref('added') }} where id <= 10",
        config=ModelConfig(materialized="snapshot", unique_key=["id"], strategy="check"),
    )
    engine.add(snap)
    engine.run(["added", "snap"])
    assert engine.ref_df("snap").count() == 10  # first snapshot = 10 rows
    # run 2: id<=20 (10 new), id 1-3 changed email
    ts["t"] = "2024-02-01 00:00:00"
    snap.sql = (
        "select id, case when id <= 3 then 'new@x.org' else email end as email, "
        "gender from {{ ref('added') }} where id <= 20"
    )
    engine.run_model(snap)
    out = engine.ref_df("snap")
    assert out.count() == 23  # 10 + 10 new + 3 new versions
    assert out.filter("dbt_valid_to is not null").count() == 3
    assert out.filter("dbt_valid_to is null").count() == 20
    cols = set(out.columns)
    assert {"dbt_scd_id", "dbt_valid_from", "dbt_valid_to", "dbt_updated_at"} <= cols


def test_snapshot_timestamp_strategy(engine):
    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    snap = Model(
        "snap_ts",
        sql=(
            "select id, email, timestamp '2024-01-01 00:00:00' as updated_at "
            "from {{ ref('added') }} where id <= 5"
        ),
        config=ModelConfig(
            materialized="snapshot",
            unique_key=["id"],
            strategy="timestamp",
            updated_at="updated_at",
        ),
    )
    engine.add(snap)
    engine.run(["added", "snap_ts"])
    # bump updated_at for ids 1-2 only → exactly 2 closed + 2 new versions
    snap.sql = (
        "select id, email, case when id <= 2 then timestamp '2024-03-01 00:00:00' "
        "else timestamp '2024-01-01 00:00:00' end as updated_at "
        "from {{ ref('added') }} where id <= 5"
    )
    engine.run_model(snap)
    out = engine.ref_df("snap_ts")
    assert out.count() == 7
    assert out.filter("dbt_valid_to is not null").count() == 2


def test_python_model_and_catalog_ops(engine, spark):
    def my_model(dbt, spark_):
        base = dbt.ref("added")
        return base.groupBy("gender").agg(F.count("*").alias("n"))

    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    engine.add(Model("py_agg", fn=my_model, config=ModelConfig(materialized="table")))
    engine.run()
    assert engine.ref_df("py_agg").count() == 2
    # catalog facade: rename (native, vs the reference's copy-hack impl.py:192-217)
    rel = engine.relation_for("py_agg")
    dst = engine.relation_for("py_agg_renamed")
    engine.catalog.rename(rel, dst)
    assert engine.catalog.exists(dst) and not engine.catalog.exists(rel)
    assert engine.catalog.relation_type(dst) == "table"
    engine.catalog.drop(dst)
    assert not engine.catalog.exists(dst)


def test_execute_script_and_fetch(engine, spark):
    engine.add(Model("base", seed_csv=BASE_CSV, config=ModelConfig(materialized="seed")))
    engine.run()
    rel = engine.relation_for("base").render()
    # dbt_next_query multi-statement protocol (connection.py:417-427)
    out = engine.execute_script(
        f"""
        create or replace temporary view _s1 as select id from {rel} where id <= 4
        dbt_next_query
        select count(*) as n from _s1
        """
    )
    assert out.collect()[0].n == 4
    # results channel shape (SqlWrapper2: rowcount/results/description)
    payload = engine.fetch(out)
    assert payload["rowcount"] == 1
    assert payload["results"][0]["n"] == 4
    assert payload["description"] == [("n", "bigint")]


def test_run_tests_loop(engine):
    from dbt_glue_spark.engine import run_tests

    engine.add(Model("base", seed_csv=BASE_CSV, config=ModelConfig(materialized="seed")))
    engine.add(
        Model(
            "kids",
            sql="select id + 20 as id, id as parent_id from {{ ref('base') }}",
            config=ModelConfig(materialized="table"),
        )
    )
    engine.run()
    res = run_tests(
        engine,
        "base",
        [
            ("unique", {"column": "id"}),
            ("not_null", {"column": "email"}),
            ("accepted_values", {"column": "gender", "values": ["Male", "Female"]}),
        ],
    )
    assert all(v == 0 for v in res.values())
    res2 = run_tests(
        engine,
        "kids",
        [("relationships", {"column": "parent_id", "to": "base", "field": "id"})],
    )
    assert res2["relationships:parent_id"] == 0
    # violation: accepted_values missing one category
    res3 = run_tests(
        engine, "base", [("accepted_values", {"column": "gender", "values": ["Male"]})]
    )
    assert res3["accepted_values:gender"] == 1


def test_python_model_incremental_merge(engine):
    state = {"hi": 4}

    def py_inc(dbt, spark_):
        base = dbt.ref("added")
        if dbt.is_incremental():
            return base.filter(F.col("id") <= 8).select(
                "id", F.lit("new").alias("tag")
            )
        return base.filter(F.col("id") <= state["hi"]).select(
            "id", F.lit("old").alias("tag")
        )

    engine.add(Model("added", seed_csv=ADDED_CSV, config=ModelConfig(materialized="seed")))
    m = Model(
        "py_inc",
        fn=py_inc,
        config=ModelConfig(
            materialized="incremental", incremental_strategy="merge", unique_key=["id"]
        ),
    )
    engine.add(m)
    engine.run(["added", "py_inc"])
    assert engine.ref_df("py_inc").count() == 4
    engine.run_model(m)  # incremental run: ids 1-8 tagged new, merged
    out = engine.ref_df("py_inc")
    assert out.count() == 8
    assert out.filter("tag = 'new'").count() == 8


def test_parallel_dag_execution(engine):
    engine.add(Model("base", seed_csv=BASE_CSV, config=ModelConfig(materialized="seed")))
    for i in range(4):  # four independent children of base
        engine.add(
            Model(
                f"child_{i}",
                sql=f"select id, id * {i + 1} as v from {{{{ ref('base') }}}}",
                config=ModelConfig(materialized="table"),
            )
        )
    engine.add(
        Model(
            "summary",
            sql="select (select count(*) from {{ ref('child_0') }})"
            " + (select count(*) from {{ ref('child_3') }}) as total",
            config=ModelConfig(materialized="table"),
        )
    )
    engine.run(threads=4)
    for i in range(4):
        assert engine.ref_df(f"child_{i}").count() == 10
    assert engine.ref_df("summary").collect()[0].total == 20


def test_schema_test_runner(engine):
    engine.add(
        Model(
            "base",
            seed_csv=BASE_CSV,
            config=ModelConfig(materialized="seed"),
            tests={
                "id": ["unique", "not_null"],
                "gender": [{"accepted_values": {"values": ["Male", "Female"]}}],
            },
        )
    )
    engine.add(
        Model(
            "dupes",
            sql="select id % 3 as grp, email from {{ ref('base') }}",
            config=ModelConfig(materialized="table"),
            tests={
                "grp": ["unique"],  # must fail: 10 rows, 3 groups
                "email": [{"relationships": {"to": "base", "field": "email"}}],
            },
        )
    )
    engine.run()
    report = {(r.model, r.column, r.test): (r.n_failures, r.passed) for r in engine.test().collect()}
    assert report[("base", "id", "unique")] == (0, True)
    assert report[("base", "id", "not_null")] == (0, True)
    assert report[("base", "gender", "accepted_values")] == (0, True)
    assert report[("dupes", "email", "relationships")] == (0, True)
    n_fail, passed = report[("dupes", "grp", "unique")]
    assert not passed and n_fail == 3  # all three groups are duplicated


def test_backfill_microbatch_idempotent(engine, spark):
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001", ("events",))
    engine.add(
        Model(
            "daily_events",
            sql=(
                "select event_id, user_id, cast(ts as date) as day, value "
                "from events "
                "where cast(ts as date) >= cast({{ batch_start }} as date) "
                "and cast(ts as date) < cast({{ batch_end }} as date)"
            ),
            config=ModelConfig(
                materialized="incremental",
                incremental_strategy="insert_overwrite",
                partition_by=["day"],
            ),
        )
    )
    ran = engine.backfill("daily_events", "2024-01-01", "2024-01-07", batch_days=2)
    assert ran == [
        ("2024-01-01", "2024-01-03"),
        ("2024-01-03", "2024-01-05"),
        ("2024-01-05", "2024-01-07"),
    ]
    expected = (
        spark.table("events")
        .filter("cast(ts as date) >= '2024-01-01' and cast(ts as date) < '2024-01-07'")
        .count()
    )
    assert engine.ref_df("daily_events").count() == expected
    # re-running one period must not duplicate (its partitions overwrite)
    engine.backfill("daily_events", "2024-01-03", "2024-01-05", batch_days=2)
    assert engine.ref_df("daily_events").count() == expected


def test_pre_and_post_hooks_run_with_resolution(spark, warehouse):
    import uuid

    from dbt_glue_spark.engine import Engine, Model, ModelConfig

    schema = f"t_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(
        Model(
            "audit",
            seed_csv="event,target\nboot,none\n",
            config=ModelConfig(materialized="seed"),
        )
    )
    eng.add(
        Model(
            "hooked",
            sql="select 1 as x",
            config=ModelConfig(),
            pre_hook=[
                "insert into {{ ref('audit') }} values ('pre', 'none')"
            ],
            post_hook=[
                "insert into {{ ref('audit') }} select 'post', '{{ this }}'",
                "alter table {{ this }} set tblproperties ('hooked' = 'yes')",
            ],
        )
    )
    try:
        eng.run()
        audit = {r.event: r.target for r in eng.ref_df("audit").collect()}
        assert set(audit) == {"boot", "pre", "post"}
        # {{ this }} resolved to the fully-qualified relation inside the hook
        assert audit["post"] == eng.relation_for("hooked").render()
        props = {
            r.key: r.value
            for r in spark.sql(
                f"SHOW TBLPROPERTIES {eng.relation_for('hooked').render()}"
            ).collect()
        }
        assert props.get("hooked") == "yes"
    finally:
        eng.catalog.drop_schema(schema)

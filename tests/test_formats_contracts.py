"""File-format coverage (S2: csv/json/orc sinks) + contract enforcement (T4)."""

from __future__ import annotations

import uuid

import pytest

from dbt_glue_spark.engine import Engine, Model, ModelConfig

CSV = "id,name,val\n1,a,1.5\n2,b,2.5\n3,c,3.5\n"


@pytest.fixture()
def engine(spark, warehouse):
    schema = f"f_{uuid.uuid4().hex[:8]}"
    eng = Engine(spark, warehouse, schema=schema)
    eng.add(Model("base", seed_csv=CSV, config=ModelConfig(materialized="seed")))
    yield eng
    eng.catalog.drop_schema(schema)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_table_formats(engine, fmt):
    engine.add(
        Model(
            f"t_{fmt}",
            sql="select id, name from {{ ref('base') }}",
            config=ModelConfig(materialized="table", file_format=fmt),
        )
    )
    engine.run()
    out = engine.ref_df(f"t_{fmt}")
    assert out.count() == 3
    assert set(out.columns) == {"id", "name"}


def test_invalid_format_rejected(engine):
    engine.add(
        Model(
            "bad",
            sql="select 1 as x",
            config=ModelConfig(materialized="table", file_format="avro2"),
        )
    )
    with pytest.raises(ValueError, match="invalid file_format"):
        engine.run(["bad"])


def test_contract_enforced(engine):
    ok = Model(
        "c_ok",
        sql="select id, name from {{ ref('base') }}",
        config=ModelConfig(
            materialized="table", contract={"id": "bigint", "name": "string"}
        ),
    )
    engine.add(ok)
    engine.run(["base", "c_ok"])
    assert engine.ref_df("c_ok").count() == 3

    bad_type = Model(
        "c_badtype",
        sql="select cast(id as string) as id, name from {{ ref('base') }}",
        config=ModelConfig(
            materialized="table", contract={"id": "bigint", "name": "string"}
        ),
    )
    engine.add(bad_type)
    with pytest.raises(ValueError, match="contract violation.*id"):
        engine.run_model(bad_type)

    undeclared = Model(
        "c_extra",
        sql="select id, name, val from {{ ref('base') }}",
        config=ModelConfig(
            materialized="table", contract={"id": "bigint", "name": "string"}
        ),
    )
    engine.add(undeclared)
    with pytest.raises(ValueError, match="undeclared column val"):
        engine.run_model(undeclared)

    # outer-constructor comparison: decimal(10,2) satisfies "decimal"
    param = Model(
        "c_param",
        sql="select cast(val as decimal(10,2)) as val from {{ ref('base') }}",
        config=ModelConfig(materialized="table", contract={"val": "decimal"}),
    )
    engine.add(param)
    engine.run_model(param)
    assert engine.ref_df("c_param").count() == 3

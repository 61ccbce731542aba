"""Schema evolution: diff + apply, mirroring dbt's on_schema_change modes.

Reference semantics (dbt/include/glue/macros/materializations/incremental/
incremental.sql:71-89 driving dbt-core process_schema_changes, plus
ALTER TABLE ADD COLUMNS at adapters.sql:15-46; drop column is rejected by
the reference per-format):

- ignore            → write with target's columns; new source cols dropped
- fail              → raise on any mismatch
- append_new_columns→ add source-only columns to target (backfilled NULL)
- sync_all_columns  → add source-only columns AND drop target-only columns

In-process we diff ``df.schema`` directly instead of staging a physical
temp table + DESCRIBE like the reference must (incremental.sql:71-80).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


class SchemaChangeError(Exception):
    pass


@dataclass
class SchemaDiff:
    source_only: list[StructField] = field(default_factory=list)
    target_only: list[StructField] = field(default_factory=list)
    type_changed: list[tuple[StructField, StructField]] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not (self.source_only or self.target_only or self.type_changed)


def diff_schemas(source: StructType, target: StructType) -> SchemaDiff:
    s = {f.name: f for f in source.fields}
    t = {f.name: f for f in target.fields}
    d = SchemaDiff()
    d.source_only = [f for n, f in s.items() if n not in t]
    d.target_only = [f for n, f in t.items() if n not in s]
    d.type_changed = [
        (s[n], t[n]) for n in s.keys() & t.keys() if s[n].dataType != t[n].dataType
    ]
    return d


def evolve(
    source_df: DataFrame,
    target_df: DataFrame,
    on_schema_change: str = "ignore",
) -> tuple[DataFrame, DataFrame, StructType]:
    """Reconcile source and target frames per ``on_schema_change``.

    Returns (source', target', final_schema) with both frames projected to
    the same column list, new columns NULL-backfilled on whichever side
    lacks them.
    """
    diff = diff_schemas(source_df.schema, target_df.schema)
    if on_schema_change == "fail":
        if not diff.empty:
            raise SchemaChangeError(
                f"schema changed: +{[f.name for f in diff.source_only]} "
                f"-{[f.name for f in diff.target_only]} "
                f"retyped {[f[0].name for f in diff.type_changed]}"
            )
        final = target_df.schema
    elif on_schema_change == "ignore":
        final = target_df.schema
    elif on_schema_change == "append_new_columns":
        final = StructType(list(target_df.schema.fields) + diff.source_only)
    elif on_schema_change == "sync_all_columns":
        keep = [f for f in target_df.schema.fields if f.name in
                {x.name for x in source_df.schema.fields}]
        final = StructType(keep + diff.source_only)
    else:
        raise ValueError(f"unknown on_schema_change: {on_schema_change}")

    def project(df: DataFrame) -> DataFrame:
        have = set(df.columns)
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in final.fields
        ]
        return df.select(*cols)

    return project(source_df), project(target_df), final

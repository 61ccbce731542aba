"""Materialization-semantics queries for the correctness gate.

Each entry drives REAL engine code (operators/merge.py, materializations/
snapshot.py, engine.py incremental paths, materializations/seed.py) on
deterministic inputs derived from the synthetic tables, and pairs it with a
DuckDB oracle that independently states the expected semantics in SQL.
Timestamps are fixed literals (the engine's ``as_of``/``now`` injection
points) so SCD2 output is replayable.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_glue_spark.materializations.seed import infer_seed_df
from dbt_glue_spark.materializations.snapshot import scd2_apply
from dbt_glue_spark.operators.merge import merge_upsert
from dbt_glue_spark.plans.catalog import register
from dbt_glue_spark.sources.registry import load_table

TS1, TS2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


def _orders_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 != 0)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )


def _orders_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            (
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(2,1)")
            )
            .cast("double")
            .alias("price"),
            F.lit("U").alias("status"),
        )
    )


_MERGE_CTES = """
    WITH tgt AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 <> 0
    ), src AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
                  AS DOUBLE) AS price,
             'U' AS status
      FROM orders WHERE o_orderkey % 2 = 0
    )
"""


@register(
    "mat_merge_upsert",
    _MERGE_CTES
    + """
    SELECT o_orderkey, price, status FROM src
    UNION ALL
    SELECT t.o_orderkey, t.price, t.status FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
    """,
    doc="MERGE semantics, UPDATE SET * + INSERT (reference: strategies.sql:"
    "42-93) via operators.merge.merge_upsert: matched target rows replaced "
    "by source, unmatched kept, new keys inserted. One key-shuffle join.",
)
def mat_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_upsert(
        _orders_target(spark, sf_dir),
        _orders_source(spark, sf_dir),
        unique_key=["o_orderkey"],
    )


@register(
    "mat_merge_update_columns",
    _MERGE_CTES
    + """
    SELECT t.o_orderkey,
           COALESCE(s.price, t.price) AS price,
           t.status
    FROM tgt t LEFT JOIN src s USING (o_orderkey)
    UNION ALL
    SELECT s.o_orderkey, s.price, s.status FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
    """,
    doc="merge_update_columns (reference: strategies.sql:50-58): matched "
    "rows update ONLY the listed columns; unmatched source rows insert whole.",
)
def mat_merge_update_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_upsert(
        _orders_target(spark, sf_dir),
        _orders_source(spark, sf_dir),
        unique_key=["o_orderkey"],
        update_columns=["price"],
    )


@register(
    "mat_merge_insert_only",
    _MERGE_CTES
    + """
    SELECT o_orderkey, price, status FROM tgt
    UNION ALL
    SELECT o_orderkey, price, status FROM src
    """,
    doc="No unique_key → the reference emits ON FALSE (insert-only merge, "
    "strategies.sql:75-77): every source row appends.",
)
def mat_merge_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_upsert(
        _orders_target(spark, sf_dir), _orders_source(spark, sf_dir), unique_key=None
    )


def _cust_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("bal"), "c_mktsegment")
    )


def _cust_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keys ≤110, drop %17==0 (hard deletes), bump bal +100 on %10==0
    return (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") <= 110) & (F.col("c_custkey") % 17 != 0))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal").cast("double") + 100.0)
            .otherwise(F.col("c_acctbal").cast("double"))
            .alias("bal"),
            "c_mktsegment",
        )
    )


@register(
    "mat_scd2_snapshot_check",
    f"""
    WITH v1 AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment
      FROM customer WHERE c_custkey <= 100
    ), v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN CAST(c_acctbal AS DOUBLE) + 100.0
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal,
             c_mktsegment
      FROM customer WHERE c_custkey <= 110 AND c_custkey % 17 <> 0
    ), changed AS (
      SELECT v1.c_custkey FROM v1 JOIN v2 USING (c_custkey)
      WHERE v1.bal IS DISTINCT FROM v2.bal
         OR v1.c_mktsegment IS DISTINCT FROM v2.c_mktsegment
    )
    -- v1 rows: closed iff changed; deletions stay open (dbt default)
    SELECT v1.c_custkey, v1.bal, v1.c_mktsegment,
           TIMESTAMP '{TS1}' AS dbt_valid_from,
           CASE WHEN c.c_custkey IS NOT NULL THEN TIMESTAMP '{TS2}' END AS dbt_valid_to,
           MD5(COALESCE(CAST(v1.c_custkey AS VARCHAR), '') || '|' ||
               COALESCE(CAST(TIMESTAMP '{TS1}' AS VARCHAR), '')) AS dbt_scd_id
    FROM v1 LEFT JOIN changed c USING (c_custkey)
    UNION ALL
    -- new versions of changed keys + brand-new keys, open from TS2
    SELECT v2.c_custkey, v2.bal, v2.c_mktsegment,
           TIMESTAMP '{TS2}', NULL,
           MD5(COALESCE(CAST(v2.c_custkey AS VARCHAR), '') || '|' ||
               COALESCE(CAST(TIMESTAMP '{TS2}' AS VARCHAR), ''))
    FROM v2
    WHERE v2.c_custkey IN (SELECT c_custkey FROM changed)
       OR v2.c_custkey NOT IN (SELECT c_custkey FROM v1)
    """,
    doc="SCD2 snapshot, check strategy over two deterministic source "
    "versions (reference: snapshot.sql:99-226): changed rows close+reopen, "
    "new keys insert, hard deletes stay open. Exercises "
    "materializations.snapshot.scd2_apply end-to-end incl. md5 scd_id "
    "(snapshot.sql:1-6).",
)
def mat_scd2_snapshot_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1 = _cust_v1(spark, sf_dir)
    v2 = _cust_v2(spark, sf_dir)
    snap1 = scd2_apply(None, v1, ["c_custkey"], TS1, strategy="check")
    snap2 = scd2_apply(snap1, v2, ["c_custkey"], TS2, strategy="check")
    return snap2.select(
        "c_custkey", "bal", "c_mktsegment", "dbt_valid_from", "dbt_valid_to", "dbt_scd_id"
    )


@register(
    "mat_insert_overwrite_partitions",
    """
    SELECT o_orderkey,
           CAST(MONTH(o_orderdate) AS INT) AS mon,
           CASE WHEN MONTH(o_orderdate) IN (1, 2, 3) THEN 'new' ELSE 'old' END AS tag
    FROM orders
    """,
    doc="Dynamic partition overwrite end-to-end through the Engine "
    "(reference: strategies.sql:1-19 + partitionOverwriteMode=dynamic): "
    "run1 writes all months tagged old; run2 overwrites ONLY months 1-3 "
    "with tag new; other partitions must survive untouched. File-backed: "
    "real external parquet table under a temp warehouse.",
)
def mat_insert_overwrite_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, sf_dir, ("orders",))
    wh = tempfile.mkdtemp(prefix="dgs_q_wh_")
    eng = Engine(spark, wh, schema=f"q_{uuid.uuid4().hex[:8]}")
    m = Model(
        "orders_part",
        sql=(
            "select o_orderkey, cast(month(o_orderdate) as int) as mon, "
            "'old' as tag from orders"
        ),
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="insert_overwrite",
            partition_by=["mon"],
        ),
    )
    eng.add(m)
    eng.run_model(m)
    m.sql = (
        "select o_orderkey, cast(month(o_orderdate) as int) as mon, "
        "'new' as tag from orders where month(o_orderdate) in (1, 2, 3)"
    )
    eng.run_model(m)
    # project partition column order back to logical order
    return eng.ref_df("orders_part").select("o_orderkey", "mon", "tag")


@register(
    "mat_backfill_partitions",
    """
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-05'
      AND CAST(ts AS DATE) < DATE '2024-01-11'
    GROUP BY 1, 2
    """,
    doc="Engine.backfill end-to-end (dbt microbatch over insert_overwrite, "
    "reference: strategies.sql:1-19 per-partition replace): the table is "
    "first created with deliberately WRONG values (value*2) over the "
    "window, then backfilled 2024-01-05 → 2024-01-11 in 2-day batches — "
    "the oracle matches only if every batch replaced exactly its own "
    "date partitions. Each period is independently retryable; reload cost "
    "is proportional to the window, never the table.",
)
def mat_backfill_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, sf_dir, ("events",))
    wh = tempfile.mkdtemp(prefix="dgs_q_wh_")
    eng = Engine(spark, wh, schema=f"q_{uuid.uuid4().hex[:8]}")
    agg = (
        "select cast(ts as date) as event_date, event_type, "
        "cast(count(*) as bigint) as n_events, "
        "cast(sum(cast(value as decimal(18,4))){mult} as double) as total_value "
        "from events "
        "where cast(ts as date) >= date {{{{ batch_start }}}} "
        "and cast(ts as date) < date {{{{ batch_end }}}} "
        "group by 1, 2"
    )
    m = Model(
        "events_daily",
        sql=agg.format(mult=" * 2")
        .replace("{{ batch_start }}", "'2024-01-05'")
        .replace("{{ batch_end }}", "'2024-01-11'"),
        config=ModelConfig(
            materialized="incremental",
            incremental_strategy="insert_overwrite",
            partition_by=["event_date"],
        ),
    )
    eng.add(m)
    eng.run_model(m)  # seed the window with stale (doubled) values
    m.sql = agg.format(mult="")
    eng.backfill("events_daily", "2024-01-05", "2024-01-11", batch_days=2)
    return eng.ref_df("events_daily").select(
        "event_date", "event_type", "n_events", "total_value"
    )


@register(
    "mat_post_hook_audit",
    """
    SELECT 'ord_sum' AS model_name,
           -- distinct-subquery, not COUNT(DISTINCT): the audited model is
           -- a GROUP BY, and GROUP BY keeps a NULL group while
           -- COUNT(DISTINCT) drops it — the audit must count group rows
           CAST((SELECT COUNT(*) FROM
                 (SELECT DISTINCT o_orderstatus FROM orders) d) AS BIGINT)
             AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS total_orders
    FROM orders
    """,
    doc="pre/post hook execution under the oracle (dbt on-run hooks; "
    "reference inherits them from dbt-core and runs them through the same "
    "cursor as model SQL): the post_hook audits the just-built model via "
    "{{ this }} resolution — the audit row matches only if the hook ran "
    "AFTER the materialization with the model's own relation bound.",
)
def mat_post_hook_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from dbt_glue_spark.engine import Engine, Model, ModelConfig
    from dbt_glue_spark.sources.registry import register_sources

    register_sources(spark, sf_dir, ("orders",))
    wh = _tf.mkdtemp(prefix="dgs_q_wh_")
    eng = Engine(spark, wh, schema=f"q_{uuid.uuid4().hex[:8]}")
    m = Model(
        "ord_sum",
        sql=(
            "select o_orderstatus, cast(count(*) as bigint) as n "
            "from orders group by o_orderstatus"
        ),
        config=ModelConfig(materialized="table"),
        post_hook=[
            "create or replace temporary view ord_sum_audit as "
            "select 'ord_sum' as model_name, "
            "cast(count(*) as bigint) as n_rows, "
            "cast(sum(n) as bigint) as total_orders from {{ this }}"
        ],
    )
    eng.add(m)
    eng.run_model(m)
    return spark.table("ord_sum_audit")


_SEED_CSV = """id,name,score,joined,seen_at,active,code
1,alice,3.5,2024-01-01,2024-01-01 10:00:00,true,007
2,bob,4.25,2024-02-03,2024-02-03 11:30:00,false,12
3,,5.0,2024-03-05,2024-03-05 12:45:00,true,
"""


@register(
    "mat_seed_typed",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'alice', CAST(3.5 AS DOUBLE), DATE '2024-01-01',
       TIMESTAMP '2024-01-01 10:00:00', TRUE, '7'),
      (2, 'bob', 4.25, DATE '2024-02-03', TIMESTAMP '2024-02-03 11:30:00', FALSE, '12'),
      (3, NULL, 5.0, DATE '2024-03-05', TIMESTAMP '2024-03-05 12:45:00', TRUE, NULL)
    ) AS t(id, name, score, joined, seen_at, active, code)
    """,
    doc="Seed type inference (reference agate mapping impl.py:91-110: "
    "integral→bigint, decimals→double, Date→date, DateTime→timestamp) plus "
    "column_types cast-back (impl.py:674-690): `code` column forced to "
    "string via override after integral sniffing ('007'→7→'7').",
)
def mat_seed_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return infer_seed_df(spark, _SEED_CSV, column_types={"code": "string"})


@register(
    "mat_merge_precombine",
    _MERGE_CTES.replace("), src AS (", """), src_v AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2))
                  AS DOUBLE) AS price,
             'U1' AS status, 1 AS ver
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
                  AS DOUBLE) AS price,
             'U2' AS status, 2 AS ver
      FROM orders WHERE o_orderkey % 2 = 0
    ), src AS (
      SELECT o_orderkey, price, status FROM src_v WHERE ver = 2
    ), _unused AS (""")
    + """
    SELECT o_orderkey, price, status FROM src
    UNION ALL
    SELECT t.o_orderkey, t.price, t.status FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
    """,
    doc="Hudi precombine semantics (reference: dbt/adapters/glue/"
    "impl.py:970 precombine_key + hudi upsert): duplicate source keys "
    "deduplicated latest-wins on the version column before merging — "
    "merge_upsert(dedup_source_on='ver').",
)
def mat_merge_precombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    v1 = base.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("1.05").cast("decimal(3,2)"))
        .cast("double")
        .alias("price"),
        F.lit("U1").alias("status"),
        F.lit(1).alias("ver"),
    )
    v2 = base.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("1.1").cast("decimal(2,1)"))
        .cast("double")
        .alias("price"),
        F.lit("U2").alias("status"),
        F.lit(2).alias("ver"),
    )
    return merge_upsert(
        _orders_target(spark, sf_dir),
        v1.unionByName(v2),
        unique_key=["o_orderkey"],
        dedup_source_on="ver",
    )


@register(
    "mat_merge_predicates",
    _MERGE_CTES
    + """
    -- MERGE ... ON key AND tgt.status = 'F': target rows that key-match
    -- but fail the predicate stay, AND the source row still inserts
    SELECT t.o_orderkey, t.price, t.status FROM tgt t
    WHERE NOT EXISTS (SELECT 1 FROM src s
                      WHERE s.o_orderkey = t.o_orderkey AND t.status = 'F')
    UNION ALL
    SELECT o_orderkey, price, status FROM src
    """,
    doc="incremental_predicates (reference: strategies.sql:42-47, "
    "incremental.sql:22): extra predicate ANDed into the MERGE ON clause — "
    "only 'F'-status target rows are updatable; non-matching target rows "
    "survive and the source row inserts (standard MERGE not-matched path).",
)
def mat_merge_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_upsert(
        _orders_target(spark, sf_dir),
        _orders_source(spark, sf_dir),
        unique_key=["o_orderkey"],
        incremental_predicates=["tgt.status = 'F'"],
    )


@register(
    "mat_scd2_snapshot_timestamp",
    f"""
    WITH v1 AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
             TIMESTAMP '{TS1}' AS updated_at
      FROM customer WHERE c_custkey <= 100
    ), v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN CAST(c_acctbal AS DOUBLE) + 100.0
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal,
             CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '{TS2}'
                  ELSE TIMESTAMP '{TS1}' END AS updated_at
      FROM customer WHERE c_custkey <= 110 AND c_custkey % 17 <> 0
    ), bumped AS (
      SELECT v2.c_custkey FROM v2 JOIN v1 USING (c_custkey)
      WHERE v2.updated_at > TIMESTAMP '{TS1}'
    )
    -- v1 rows: closed iff the source advanced updated_at; deletions open
    SELECT v1.c_custkey, v1.bal, v1.updated_at,
           TIMESTAMP '{TS1}' AS dbt_valid_from,
           CASE WHEN b.c_custkey IS NOT NULL THEN TIMESTAMP '{TS2}' END
             AS dbt_valid_to,
           MD5(COALESCE(CAST(v1.c_custkey AS VARCHAR), '') || '|' ||
               COALESCE(CAST(TIMESTAMP '{TS1}' AS VARCHAR), '')) AS dbt_scd_id
    FROM v1 LEFT JOIN bumped b USING (c_custkey)
    UNION ALL
    -- new versions of bumped keys + inserts (valid_from = their updated_at)
    SELECT v2.c_custkey, v2.bal, v2.updated_at,
           v2.updated_at, CAST(NULL AS TIMESTAMP),
           MD5(COALESCE(CAST(v2.c_custkey AS VARCHAR), '') || '|' ||
               COALESCE(CAST(v2.updated_at AS VARCHAR), ''))
    FROM v2
    WHERE v2.c_custkey IN (SELECT c_custkey FROM bumped)
       OR v2.c_custkey NOT IN (SELECT c_custkey FROM v1)
    """,
    doc="SCD2 snapshot, timestamp strategy (the reference's other "
    "strategy, snapshot.sql:99-226): a row changes only when the source's "
    "updated_at advances past the open row's dbt_updated_at — same-value "
    "rewrites with a stale timestamp do NOT create versions (the key "
    "behavioral difference from check). valid_from of new versions and "
    "inserts is the source updated_at, not the run time.",
)
def mat_scd2_snapshot_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("double")
    v1 = customer.filter(F.col("c_custkey") <= 100).select(
        "c_custkey",
        bal.alias("bal"),
        F.lit(TS1).cast("timestamp").alias("updated_at"),
    )
    bump = F.col("c_custkey") % 10 == 0
    v2 = (
        customer.filter((F.col("c_custkey") <= 110) & (F.col("c_custkey") % 17 != 0))
        .select(
            "c_custkey",
            F.when(bump, bal + 100.0).otherwise(bal).alias("bal"),
            F.when(bump, F.lit(TS2)).otherwise(F.lit(TS1)).cast("timestamp").alias(
                "updated_at"
            ),
        )
    )
    snap1 = scd2_apply(
        None, v1, ["c_custkey"], TS1, strategy="timestamp", updated_at="updated_at"
    )
    snap2 = scd2_apply(
        snap1, v2, ["c_custkey"], TS2, strategy="timestamp", updated_at="updated_at"
    )
    return snap2.select(
        "c_custkey", "bal", "updated_at", "dbt_valid_from", "dbt_valid_to", "dbt_scd_id"
    )


_SCD2_SNAP_CTES = f"""
    v1 AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment
      FROM customer WHERE c_custkey <= 100
    ), v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN CAST(c_acctbal AS DOUBLE) + 100.0
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal,
             c_mktsegment
      FROM customer WHERE c_custkey <= 110 AND c_custkey % 17 <> 0
    ), changed AS (
      SELECT v1.c_custkey FROM v1 JOIN v2 USING (c_custkey)
      WHERE v1.bal IS DISTINCT FROM v2.bal
         OR v1.c_mktsegment IS DISTINCT FROM v2.c_mktsegment
    ), snap AS (
      SELECT v1.c_custkey, v1.bal, v1.c_mktsegment,
             TIMESTAMP '{TS1}' AS dbt_valid_from,
             CASE WHEN c.c_custkey IS NOT NULL THEN TIMESTAMP '{TS2}' END
               AS dbt_valid_to
      FROM v1 LEFT JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT v2.c_custkey, v2.bal, v2.c_mktsegment, TIMESTAMP '{TS2}', NULL
      FROM v2
      WHERE v2.c_custkey IN (SELECT c_custkey FROM changed)
         OR v2.c_custkey NOT IN (SELECT c_custkey FROM v1)
    )
"""


@register(
    "mat_scd2_pit_join",
    f"""
    WITH {_SCD2_SNAP_CTES},
    facts AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 2 = 0
                  THEN TIMESTAMP '2024-01-15 12:00:00'
                  ELSE TIMESTAMP '2024-02-15 12:00:00' END AS event_ts,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_custkey <= 110
    )
    SELECT f.o_orderkey, f.o_custkey, f.event_ts, f.price,
           s.bal, s.c_mktsegment, s.dbt_valid_from
    FROM facts f JOIN snap s
      ON s.c_custkey = f.o_custkey
     AND f.event_ts >= s.dbt_valid_from
     AND (s.dbt_valid_to IS NULL OR f.event_ts < s.dbt_valid_to)
    """,
    doc="Point-in-time join (operators/temporal.pit_join): each order "
    "joins the SCD2 customer VERSION valid at its own event time — "
    "feature-store temporal correctness (joining current dim values into "
    "historical facts leaks the future into training features). "
    "Mid-January facts must see v1 balances, mid-February facts the "
    "reopened v2 versions (and still-open v1 rows for hard-deleted "
    "keys). Hash join on the business key with the validity window as a "
    "residual filter — never a range join, since the equi-key exists. "
    "The snapshot itself is built by scd2_apply, the oracle rebuilds it "
    "declaratively.",
)
def mat_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.temporal import pit_join

    v1 = _cust_v1(spark, sf_dir)
    v2 = _cust_v2(spark, sf_dir)
    snap1 = scd2_apply(None, v1, ["c_custkey"], TS1, strategy="check")
    snap2 = scd2_apply(snap1, v2, ["c_custkey"], TS2, strategy="check")
    dim = snap2.select(
        F.col("c_custkey").alias("cust_k"),
        "bal",
        "c_mktsegment",
        "dbt_valid_from",
        "dbt_valid_to",
    )
    facts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 110)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.lit("2024-01-15 12:00:00").cast("timestamp"),
            )
            .otherwise(F.lit("2024-02-15 12:00:00").cast("timestamp"))
            .alias("event_ts"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    joined = pit_join(
        facts,
        dim.withColumnRenamed("cust_k", "o_custkey"),
        ["o_custkey"],
        "event_ts",
    )
    # pit_join drops the dim-side key copy, so plain names are unambiguous
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "event_ts",
        "price",
        "bal",
        "c_mktsegment",
        "dbt_valid_from",
    )

"""Relational query set — exercises SURVEY.md §2.1-2.8 operator inventory.

The reference passes user SQL through to Spark verbatim (reference:
dbt/include/glue/macros/adapters.sql:148-192 embeds model SELECT bodies in
CTAS), so its queryable surface is the Spark SQL dialect; these queries
cover that surface with idiomatic DataFrame plans: broadcast dimension
joins, partial aggregation, semi/anti joins, window functions, rollup, set
ops, scalar/JSON functions, and scalar subqueries.

Scale annotations on each query describe the 100 TB plan shape (what gets
broadcast, what shuffles, what prunes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_glue_spark.plans.catalog import register
from dbt_glue_spark.sources.registry import load_table


def dsum(col: Column, scale: int = 6) -> Column:
    """Exact associative sum: double → decimal sum → double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _osum(expr: str, scale: int = 6) -> str:
    """Oracle-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# --------------------------------------------------------------------------
# Joins + aggregation core
# --------------------------------------------------------------------------


@register(
    "flagship_revenue_by_nation",
    f"""
    SELECT n_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Flagship: 4-way join + agg (SURVEY §7.1 step 2). 100 TB plan: "
    "nation broadcast; lineitem⋈orders shuffle on orderkey; partial aggs.",
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity', 2)} AS sum_qty,
           {_osum('l_extendedprice', 2)} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter-agg; pushdown of l_shipdate to parquet;"
    " 100 TB: pure map-side partial agg, tiny shuffle (|groups| ~ 4).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            (dsum(F.col("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_forecast",
    f"""
    SELECT {_osum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: multi-predicate scan → global agg. All four "
    "predicates push to the parquet reader (PushedFilters).",
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "top_orders",
    f"""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: filtered join + top-k. Spark compiles the "
    "orderBy+limit to TakeOrderedAndProject (no global sort at scale).",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "order_priority_count",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS → left-semi join, then count. The semi join "
    "shuffles only (orderkey) pairs, never full rows.",
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join + double aggregation. COUNT(col) "
    "null-skipping semantics exercised on the unmatched side.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "supplier_nation_revenue",
    f"""
    SELECT n_name, s_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name, s_name
    """,
    doc="TPC-H Q5 family: fact ⋈ three dims, all dims broadcast; region "
    "filter prunes before the broadcast, so the fact scan is the only big IO.",
)
def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        lineitem.join(F.broadcast(dims), lineitem.l_suppkey == dims.s_suppkey)
        .groupBy("n_name", "s_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "part_type_stats",
    """
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(MAX(p_size) AS INT) AS max_size
    FROM part
    GROUP BY p_type
    """,
    doc="Min/max/avg/count per group; single partial+final hash agg.",
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count("*").alias("n_parts"),
        F.min("p_retailprice").cast("double").alias("min_price"),
        F.max("p_retailprice").cast("double").alias("max_price"),
        (dsum(F.col("p_retailprice"), 2) / F.count("*")).alias("avg_price"),
        F.max("p_size").cast("int").alias("max_size"),
    )


@register(
    "having_filter",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    doc="GROUP BY + HAVING (post-aggregation filter).",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "region_nation_rollup",
    f"""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {_osum('c_acctbal', 2)} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total); Spark "
    "expands grouping sets in a single shuffle.",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal"), 2).alias("total_balance"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS INT) AS rk
      FROM orders
    ) t
    WHERE rk <= 3
    """,
    doc="Top-N per group via row_number window; single hash-partition "
    "shuffle on the partition key, sort within partitions.",
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey <= 200
    """,
    doc="Running sum window; decimal accumulation keeps the prefix sums "
    "bit-identical across engines.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@register(
    "window_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day',
             LAG(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             CAST(o_orderdate AS DATE)
           ) AS BIGINT) AS days_since_prev
    FROM orders
    WHERE o_custkey <= 100
    """,
    doc="LAG + date arithmetic: inter-order gap per customer.",
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).cast("bigint").alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Set operations, semi/anti/full joins, subqueries
# --------------------------------------------------------------------------


@register(
    "setop_nations",
    """
    SELECT CAST(n AS INT) AS nationkey, op FROM (
      SELECT n, 'union' AS op FROM (
        SELECT c_nationkey AS n FROM customer UNION SELECT s_nationkey FROM supplier) u
      UNION ALL
      SELECT n, 'intersect' AS op FROM (
        SELECT c_nationkey AS n FROM customer INTERSECT SELECT s_nationkey FROM supplier) i
      UNION ALL
      SELECT n, 'except' AS op FROM (
        SELECT c_nationkey AS n FROM customer EXCEPT SELECT s_nationkey FROM supplier) e
    ) t
    """,
    doc="UNION / INTERSECT / EXCEPT distinct set semantics in one result.",
)
def setop_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    supplier = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    u = customer.union(supplier).distinct().withColumn("op", F.lit("union"))
    i = customer.intersect(supplier).withColumn("op", F.lit("intersect"))
    e = customer.subtract(supplier).withColumn("op", F.lit("except"))
    return (
        u.unionByName(i).unionByName(e).select(F.col("n").cast("int").alias("nationkey"), "op")
    )


@register(
    "anti_customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join — the relationships-test shape (reference: "
    "dbt/include/glue/macros/generic_test_sql/relationships.sql:1-19).",
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "full_outer_nation_presence",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
    USING (nk)
    """,
    doc="FULL OUTER join of two aggregates; agg-before-join keeps the "
    "shuffle small (pre-aggregated sides).",
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).cast("bigint").alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).cast("bigint").alias("n_supp"),
        )
    )


@register(
    "scalar_subquery_filter",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_big
    FROM lineitem
    WHERE l_quantity > 1.5 * (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                                     / COUNT(*) FROM lineitem)
    GROUP BY l_returnflag
    """,
    doc="Scalar subquery in predicate (the reference's high-water-mark "
    "pattern, reference: README.md:528-534). Spark plans it as a broadcast "
    "one-row subquery, no driver round-trip.",
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    avg_qty = lineitem.agg(
        (dsum(F.col("l_quantity"), 2) / F.count("*")).alias("avg_q")
    )
    return (
        lineitem.join(F.broadcast(avg_qty))
        .filter(F.col("l_quantity") > 1.5 * F.col("avg_q"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_big"))
    )


@register(
    "in_subquery_orders",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    GROUP BY o_orderstatus
    """,
    doc="IN-subquery → left-semi join on the filtered build side.",
)
def in_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        orders.join(rich, orders.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "cross_join_region_pairs",
    """
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
    doc="Explicit cross join (reference enables crossJoin per statement, "
    "reference: dbt/adapters/glue/gluedbapi/connection.py:429).",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    a, b = region.alias("a"), region.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("r1"), F.col("b.r_name").alias("r2"))
    )


# --------------------------------------------------------------------------
# Scalar / JSON / date functions; events table
# --------------------------------------------------------------------------


@register(
    "scalar_functions",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           UPPER(SUBSTRING(o_orderpriority, 1, 1)) AS prio_code,
           CONCAT(COALESCE(o_orderstatus, ''), '-',
                  COALESCE(o_orderpriority, '')) AS status_prio,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CAST(LENGTH(o_orderpriority) AS INT) AS prio_len
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="Scalar function surface (SURVEY §2.8 F8): date extraction, string "
    "ops, CASE. All whole-stage-codegen expressions.",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
        # explicit COALESCE, not concat_ws: concat_ws silently DROPS null
        # operands (no separator), DuckDB CONCAT keeps the separator —
        # pinning '' for NULL makes both engines emit 'x-', '-y', '-'
        F.concat(
            F.coalesce("o_orderstatus", F.lit("")),
            F.lit("-"),
            F.coalesce("o_orderpriority", F.lit("")),
        ).alias("status_prio"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
    )


@register(
    "json_extract_events",
    """
    SELECT event_type,
           CAST(SUM(CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k') END
                         AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="JSON extraction from string props (SURVEY §2.8 F8 "
    "get_json_object); JVM-side json path, no UDF. The oracle gates on "
    "json_valid: Spark's get_json_object returns NULL for ANY malformed "
    "payload (blank, whitespace, arbitrary text) while DuckDB's "
    "json_extract_string raises Malformed JSON — the guard pins both "
    "engines to NULL.",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "events_hourly",
    f"""
    SELECT DATE_TRUNC('hour', ts) AS hour_ts, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {_osum('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling-window batch aggregation over the events table (hourly "
    "buckets via date_trunc). The streaming twin lives in streaming/.",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), 4).alias("total_value"))
    )


@register(
    "events_incremental_batch",
    """
    WITH hwm AS (
      SELECT MAX(ts) AS max_ts FROM events
      WHERE event_id <= (SELECT MAX(event_id) // 2 FROM events)
    )
    SELECT event_id, ts, user_id, event_type
    FROM events, hwm
    WHERE ts > hwm.max_ts
    """,
    doc="The reference's incremental high-water-mark pattern (reference: "
    "README.md:528-541): new-rows batch = ts > max(ts in target).",
)
def events_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    half = events.agg(F.expr("max(event_id) div 2").alias("half"))
    hwm = (
        events.join(F.broadcast(half))
        .filter(F.col("event_id") <= F.col("half"))
        .agg(F.max("ts").alias("max_ts"))
    )
    return (
        events.join(F.broadcast(hwm))
        .filter(F.col("ts") > F.col("max_ts"))
        .select("event_id", "ts", "user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Temporal joins (extension operators beyond the reference — SURVEY §2.3)
# --------------------------------------------------------------------------


@register(
    "asof_join_clicks_purchases",
    """
    WITH clicks AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
      FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(MAX(event_id) AS BIGINT) AS p_event
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.ts, c.user_id,
           p.ts AS ts_matched, p.p_event AS p_event_matched
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join (operators/temporal.py): for each click, the latest "
    "purchase at-or-before it per user. Union+window sort-merge plan: one "
    "key shuffle, no range explosion — DuckDB's native ASOF JOIN is the "
    "oracle.",
)
def asof_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event"))
    )
    return asof_join(clicks, purch, on="ts", by="user_id", right_cols=["p_event"])


@register(
    "asof_join_forward_next_purchase",
    """
    WITH signups AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
      FROM events WHERE event_type = 'signup'
    ), purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(MAX(event_id) AS BIGINT) AS p_event
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT s.event_id, s.ts, s.user_id,
           p.ts AS ts_matched, p.p_event AS p_event_matched
    FROM signups s ASOF LEFT JOIN purch p
      ON s.user_id = p.user_id AND s.ts <= p.ts
    """,
    doc="Forward as-of join (operators/temporal.py direction='forward'): "
    "each signup matched to the user's EARLIEST purchase at-or-after it — "
    "time-to-first-conversion shape. Same union+window sort-merge plan as "
    "backward, descending scan; DuckDB forward ASOF JOIN is the oracle.",
)
def asof_join_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "ts", "user_id"
    )
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event"))
    )
    return asof_join(
        signups, purch, on="ts", by="user_id", right_cols=["p_event"],
        direction="forward",
    )


@register(
    "asof_join_bucketed_clicks",
    """
    WITH clicks AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
      FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(MAX(event_id) AS BIGINT) AS p_event
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.ts, c.user_id,
           p.ts AS ts_matched, p.p_event AS p_event_matched
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="Scale-path as-of join (operators/temporal.asof_join_bucketed): "
    "same click→latest-prior-purchase semantics as asof_join_clicks_"
    "purchases and the same DuckDB ASOF oracle, but the heavy window "
    "partitions by (key, 6h-bucket) with one carried row per bucket "
    "computed on the metadata-sized bucket-summary frame — no key's "
    "whole timeline ever has to fit one partition, closing the hot-key "
    "watch item on the plain formulation.",
)
def asof_join_bucketed_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.temporal import asof_join_bucketed

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event"))
    )
    return asof_join_bucketed(
        clicks, purch, on="ts", by="user_id", right_cols=["p_event"],
        bucket_seconds=6 * 3600.0,
    )


@register(
    "range_join_signup_purchases",
    """
    SELECT s.event_id, CAST(COUNT(*) AS BIGINT) AS n_purchases_3d
    FROM events s JOIN events p
      ON p.user_id = s.user_id AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(s.ts AS TIMESTAMP) + INTERVAL 3 DAY
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id
    """,
    doc="Banded range join (operators/temporal.py): purchases within 3 days "
    "after each signup, bucket-join + residual filter (no theta-join "
    "explosion); DuckDB IEJoin is the oracle.",
)
def range_join_signup_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.temporal import range_join

    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "ts", "user_id"
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("user_id").alias("p_user")
    )
    joined = range_join(
        signups,
        purch,
        left_ts="ts",
        right_ts="p_ts",
        lower_expr="ts",
        upper_expr="ts + INTERVAL 3 DAYS",
        bucket_seconds=86400,
        extra_on=[("user_id", "p_user")],
    )
    return joined.groupBy("event_id").agg(F.count("*").alias("n_purchases_3d"))


@register(
    "sessionize_events_batch",
    """
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                       - epoch(LAG(CAST(ts AS TIMESTAMP)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                       OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="Batch sessionization (30-min gap) via lag + cumulative-sum window "
    "— the batch twin of streaming/pipelines.sessionize_stream. One key "
    "shuffle; session assignment is a linear scan per user timeline.",
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast-to-long: legal on TIMESTAMP_NTZ inputs too.
    new_sess = F.when(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag(F.col("ts")).over(w)) > 1800)
        | F.lag("ts").over(w).isNull(),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        events.select("user_id", "ts", "event_id")
        .withColumn("new_sess", new_sess)
        .withColumn("session_seq", F.sum("new_sess").over(wsum).cast("bigint"))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "order_price_quantiles",
    """
    SELECT o_orderstatus,
           FLOOR(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) * 10000 + 0.5)
             / 10000 AS median_price,
           FLOOR(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) * 10000 + 0.5)
             / 10000 AS p90_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (Spark percentile() ≡ "
    "DuckDB quantile_cont). Exact percentile sorts per group — at 100 TB "
    "prefer approx_percentile (t-digest) unless exactness is required.",
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        half_up_round(F.expr("percentile(cast(o_totalprice as double), 0.5)"), 4).alias(
            "median_price"
        ),
        half_up_round(F.expr("percentile(cast(o_totalprice as double), 0.9)"), 4).alias(
            "p90_price"
        ),
        F.count("*").alias("n"),
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           REPLACE(p_type, ' ', '_') AS type_snake,
           UPPER(p_brand) AS brand_upper,
           array_to_string(list_reverse(string_split_regex(p_brand, '')), '')
             AS brand_rev,
           SUBSTRING(p_name, 1, 12) AS name_prefix,
           CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
           CAST(LENGTH(TRIM(p_name)) AS INT) AS name_len
    FROM part WHERE p_partkey <= 500
    """,
    doc="String function surface (SURVEY §2.8 F8): pad/replace/case/"
    "reverse/substr/search/trim — all codegen expressions. The oracle "
    "reverses via split('')+list_reverse, NOT DuckDB's reverse(): "
    "DuckDB reverses GRAPHEME CLUSTERS (combining marks travel with "
    "their base) while Spark reverses CODE POINTS — the semantics are "
    "pinned to Spark's, and the divergence only surfaces on decomposed "
    "Unicode (caught by the round-5 unicode parity axis).",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.upper("p_brand").alias("brand_upper"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.length(F.trim("p_name")).cast("int").alias("name_len"),
    )


@register(
    "null_semantics",
    """
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et
      FROM events
    )
    SELECT COALESCE(et, 'unknown') AS et_filled,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(v) AS BIGINT) AS n_nonnull_v,
           CAST(COUNT(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null_v,
           CAST(COUNT(DISTINCT et) AS BIGINT) AS n_distinct_et
    FROM t GROUP BY COALESCE(et, 'unknown')
    """,
    doc="NULL semantics: null-skipping COUNT(col), FILTER clause, COALESCE "
    "group keys, DISTINCT-with-null.",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_id",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")).alias("v"),
        F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("event_type")).alias("et"),
    )
    return t.groupBy(F.coalesce("et", F.lit("unknown")).alias("et_filled")).agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_nonnull_v"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null_v"),
        F.countDistinct("et").alias("n_distinct_et"),
    )


@register(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 MONTH AS DATE)
             AS quarter_later,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_epoch95
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="Date arithmetic surface: day offsets, month intervals (clamped "
    "end-of-month), last_day, day difference.",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("quarter_later"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_epoch95"
        ),
    )


@register(
    "returned_items_by_customer",
    f"""
    SELECT c_custkey, c_name, n_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS lost_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-items revenue per customer, top 20. "
    "returnflag filter pushes to the scan; nation broadcast.",
)
def returned_items_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "large_volume_orders",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM orders JOIN (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ) big ON o_orderkey = big.l_orderkey
    """,
    doc="TPC-H Q18 shape: orders whose lineitem quantity sum exceeds a "
    "threshold — agg-then-join keeps the join input pre-aggregated "
    "(1 row/order), not row-level.",
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "total_qty",
    )


@register(
    "top_customer_per_nation",
    """
    SELECT n_name, c.c_custkey, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    JOIN (SELECT c_nationkey, MAX(c_acctbal) AS mb
          FROM customer GROUP BY c_nationkey) m
      ON c.c_nationkey = m.c_nationkey AND c.c_acctbal = m.mb
    JOIN nation ON c.c_nationkey = n_nationkey
    """,
    doc="Correlated-max shape (TPC-H Q2 family): the per-group argmax via "
    "agg + semi join on (key, max) — equivalent to a window but the "
    "pre-aggregated build side broadcasts.",
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    maxes = customer.groupBy("c_nationkey").agg(F.max("c_acctbal").alias("max_bal"))
    return (
        customer.join(
            F.broadcast(maxes),
            (customer.c_nationkey == maxes.c_nationkey)
            & (customer.c_acctbal == maxes.max_bal),
            "left_semi",
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name", "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
    )


@register(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (all 4 combinations) — single-shuffle expansion "
    "like ROLLUP.",
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


@register(
    "brand_revenue",
    f"""
    SELECT p_brand,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact ⋈ part dimension (broadcast) + agg — part-side join coverage.",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "monthly_revenue_trend",
    f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {_osum('o_totalprice', 2)} AS revenue,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active_customers
    FROM orders
    GROUP BY 1
    """,
    doc="Monthly revenue trend: date_trunc bucketing + distinct-count.",
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("revenue"),
        F.countDistinct("o_custkey").alias("n_active_customers"),
    )


@register(
    "clicks_no_purchase_user_days",
    """
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events e
    WHERE event_type = 'click'
      AND NOT EXISTS (SELECT 1 FROM events p
                      WHERE p.user_id = e.user_id
                        AND CAST(p.ts AS DATE) = CAST(e.ts AS DATE)
                        AND p.event_type = 'purchase')
    """,
    doc="EXISTS + NOT EXISTS at the (user, day) grain: days a user clicked "
    "but never purchased (semi ∘ anti join composition on a composite key).",
)
def clicks_no_purchase_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    clicker_days = (
        events.filter(F.col("event_type") == "click").select("user_id", day).distinct()
    )
    purchase_days = events.filter(F.col("event_type") == "purchase").select(
        "user_id", day
    )
    return clicker_days.join(purchase_days, ["user_id", "day"], "left_anti")


@register(
    "skew_two_phase_agg",
    f"""
    SELECT l_returnflag,
           {_osum('l_extendedprice', 2)} AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="operators/skew.two_phase_agg under the correctness gate: salted "
    "partial decimal sums re-aggregated — random salt, deterministic "
    "result (decimal addition is associative), equal to the plain groupBy.",
)
def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.skew import two_phase_agg

    lineitem = load_table(spark, sf_dir, "lineitem")
    return two_phase_agg(
        lineitem,
        ["l_returnflag"],
        partial=[
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ps"),
            F.count("*").alias("pc"),
        ],
        final=lambda part: [
            F.sum("ps").cast("double").alias("total_price"),
            F.sum("pc").cast("bigint").alias("n"),
        ],
    )


@register(
    "skew_salted_join",
    f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           {_osum('l_quantity', 2)} AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    doc="operators/skew.salted_join under the correctness gate: hot-key "
    "spreading is semantics-preserving, so the salted fact⋈orders join "
    "aggregates to exactly the plain-join result.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.operators.skew import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(lineitem, orders, ["l_orderkey"], salt=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lineitems"),
        dsum(F.col("l_quantity"), 2).alias("total_qty"),
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
    GROUP BY o_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: unshipped-revenue top-10 for one market segment. "
    "Segment filter pushes into the customer scan; the cross-table date "
    "predicate evaluates post-join; top-k = TakeOrderedAndProject (no "
    "global sort at any scale). Unique o_orderkey tie-break keeps the "
    "limit boundary deterministic.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q7_nation_volume",
    f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           {_osum('l_extendedprice * (1 - l_discount)')} AS volume
    FROM lineitem
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: cross-border trade volume by (supplier nation, "
    "customer nation, ship year). Two independent dimension chains off the "
    "fact — supplier-side and order→customer-side — both broadcast; only "
    "the fact⋈orders equi-join shuffles. Output is bounded by "
    "|nation|² × years regardless of fact size.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT FLOOR(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE)
                   * 1e6 + 0.5) / 1e6 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="TPC-H Q14 shape: promo revenue share. Conditional aggregation — "
    "one pass, two accumulators, no second join or self-union. Both sums "
    "are exact decimals; the single double division is rounded half-up to "
    "6 digits on both engines (catalog float-determinism rule).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    agg = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey).agg(
        F.sum(promo.cast("decimal(18,6)")).cast("double").alias("p"),
        F.sum(rev.cast("decimal(18,6)")).cast("double").alias("t"),
    )
    return agg.select(
        (F.floor(100.0 * F.col("p") / F.col("t") * 1e6 + 0.5) / 1e6).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q16_supplier_diversity",
    """
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 25
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: distinct supplier count per (brand, type) for "
    "large parts. COUNT(DISTINCT) expands to a two-level aggregate "
    "(partial distinct per partition, then final) — no row explosion; "
    "p_size predicate prunes the broadcast build side before the join.",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS small_qty_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    WHERE l_quantity < 0.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: revenue of below-half-average-quantity lineitems "
    "per part. The correlated AVG subquery is decorrelated into a per-part "
    "aggregate joined back to the fact — the aggregate is |part|-sized "
    "(dimension-scale), so it broadcasts; the fact table is scanned twice "
    "but never shuffled on a wide key. AVG over the driver's uniform "
    "quantity grid is exact in binary floating point on both engines.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(F.broadcast(per_part), lineitem.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("small_qty_revenue"),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "grouping_sets_orders",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_osum('o_totalprice', 2)} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (completes the multi-dimensional agg "
    "family next to ROLLUP and CUBE): one Expand + one aggregate — each "
    "input row fans out once per set, so cost is |sets| × scan, never one "
    "scan per set.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="PIVOT (long→wide): order counts per priority pivoted on status. "
    "Spark's pivot with an explicit value list compiles to one aggregate "
    "with conditional accumulators — same cost as the GROUP BY, no "
    "second pass. (Omitting the value list would trigger a distinct-scan "
    "first; never do that at scale.)",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    )


@register(
    "window_trailing_30d_revenue",
    f"""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
    doc="RANGE-frame window (vs the ROWS frames elsewhere): per-customer "
    "trailing-30-day revenue. The frame is defined by event-time distance, "
    "so peers at equal timestamps aggregate together regardless of row "
    "order — deterministic without a tie-break. One shuffle on o_custkey.",
)
def window_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d"),
    )


@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS price_quartile,
           FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) / 1000000 AS cume,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_orderpriority NULLS LAST)
                AS BIGINT)
             AS prio_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC NULLS LAST, o_orderkey)
    LIMIT 1000000
    """,
    doc="Ranking-function family: ntile quartiles, percent_rank, "
    "cume_dist, dense_rank. All evaluate in one pass per window after a "
    "single o_orderstatus shuffle+sort; the unique o_orderkey tie-break "
    "makes every rank deterministic (cume_dist/dense_rank are "
    "peer-based and need none). NULL placement is pinned NULLS LAST on "
    "both sides — Spark defaults ASC to NULLS FIRST, DuckDB to NULLS "
    "LAST, so an unpinned ordering silently diverges on NULL sort keys.",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc_nulls_last("o_totalprice"), F.asc("o_orderkey")
    )
    wd = Window.partitionBy("o_orderstatus").orderBy(
        F.asc_nulls_last("o_orderpriority")
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
        F.dense_rank().over(wd).cast("bigint").alias("prio_dense_rank"),
    )


@register(
    "collection_functions",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      FROM documents WHERE doc_id <= 20
    ),
    w AS (
      SELECT doc_id, toks,
             list_distinct(toks[1:10]) AS a1,
             list_distinct(toks[6:15]) AS a2,
             toks[1:10] AS first10
      FROM tok
    )
    SELECT doc_id,
           CAST(len(list_intersect(a1, a2)) AS INT) AS n_inter,
           CAST(len(list_distinct(list_concat(a1, a2))) AS INT) AS n_union,
           CAST(len(list_filter(a1, t -> NOT list_contains(a2, t))) AS INT) AS n_except,
           CAST(len(list_filter(first10, t -> t = toks[1])) AS INT) AS first_tok_count,
           CAST(len(list_distinct(first10)) AS INT) AS n_map_keys,
           CAST(2 * len(first10) AS INT) AS doubled_total
    FROM w
    """,
    doc="Collection + map function surface (§2.8): array_intersect/union/"
    "except, map_from_arrays + element_at + map_keys + transform_values — "
    "the oracle reproduces the same scalars with DuckDB list functions. "
    "All per-row narrow expressions inside codegen; no shuffle.",
)
def collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    toks = tokens(F.col("text"))
    staged = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.array_distinct(F.slice(toks, 1, 10)).alias("a1"),
        F.array_distinct(F.slice(toks, 6, 10)).alias("a2"),
        F.slice(toks, 1, 10).alias("first10"),
    )
    # per-row token-frequency map over the first 10 tokens, then consumed
    # via element_at / map_keys / transform_values + aggregate
    freq = F.map_from_arrays(
        F.col("a1"),
        F.transform(
            F.col("a1"),
            lambda t: F.size(F.filter(F.col("first10"), lambda x: x == t)),
        ),
    )
    doubled = F.transform_values(freq, lambda k, v: v * 2)
    return staged.select(
        "doc_id",
        F.size(F.array_intersect("a1", "a2")).cast("int").alias("n_inter"),
        F.size(F.array_union("a1", "a2")).cast("int").alias("n_union"),
        F.size(F.array_except("a1", "a2")).cast("int").alias("n_except"),
        # empty-doc defense: toks[0] under ANSI raises INVALID_ARRAY_INDEX
        # on a 0-element array → F.get (NULL); try_element_at tolerates
        # the NULL key; the explicit 0 for empty-but-non-NULL docs mirrors
        # the oracle's len(list_filter([])) = 0 (NULL text stays NULL)
        F.when(
            F.col("toks").isNotNull() & (F.size("toks") == 0), F.lit(0)
        )
        .otherwise(F.try_element_at(freq, F.get(F.col("toks"), 0)))
        .cast("int")
        .alias("first_tok_count"),
        F.size(F.map_keys(freq)).cast("int").alias("n_map_keys"),
        F.aggregate(
            F.map_values(doubled), F.lit(0), lambda acc, v: acc + v
        ).cast("int").alias("doubled_total"),
    )


@register(
    "window_value_family",
    """
    SELECT o_orderkey, o_custkey,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(o_totalprice, 2) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS second_price
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Window value family (§2.5): first_value / last_value / nth_value "
    "with explicit full frames (last/nth need UNBOUNDED FOLLOWING — the "
    "default frame stops at CURRENT ROW). Unique (orderdate, orderkey) "
    "ordering makes every value deterministic. One shuffle on custkey.",
)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    grow = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = grow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(grow).cast("double").alias("first_price"),
        F.last("o_totalprice").over(full).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).cast("double").alias("second_price"),
    )


@register(
    "recursive_month_spine",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '2001-12-01'
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    )
    SELECT m AS month, COALESCE(n, CAST(0 AS BIGINT)) AS n_orders
    FROM months LEFT JOIN monthly ON mo = m
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): generate a complete "
    "monthly calendar spine, left-join monthly order counts — the "
    "zero-filled time series every reporting layer needs (a plain "
    "GROUP BY silently drops empty months). The recursion materializes "
    "84 rows driver-free; the spine side broadcasts into the join. "
    "Oracle: DuckDB's recursive CTE computes the identical spine.",
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__rcte_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(m, 1) FROM months WHERE m < DATE '2001-12-01'
        ),
        monthly AS (
          SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS mo,
                 COUNT(*) AS n
          FROM __rcte_orders GROUP BY 1
        )
        SELECT m AS month, COALESCE(n, 0L) AS n_orders
        FROM months LEFT JOIN monthly ON mo = m
        """
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'a_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 'b_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'c_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    doc="Ordered funnel: users who viewed, then clicked AFTER the first "
    "view, then purchased AFTER that click — each stage a min-timestamp "
    "aggregate semi-constrained by the previous stage's time. All three "
    "joins share user_id partitioning (one shuffle key end-to-end); "
    "stage outputs are one row each.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = lambda df, label: df.agg(  # noqa: E731
        F.count("*").alias("n_users")
    ).select(F.lit(label).alias("stage"), "n_users")
    return (
        stage(v, "a_view")
        .unionAll(stage(c, "b_click_after_view"))
        .unionAll(stage(p, "c_purchase_after_click"))
    )


@register(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, act_week) / 7 AS INT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
    doc="Retention cohort matrix: users bucketed by first-seen week × "
    "weeks-since-cohort activity. Two aggregates sharing the user_id "
    "shuffle key; week offsets are exact day-multiples of 7 on both "
    "engines (Monday-truncated weeks), so the integer division is exact. "
    "Output bounded by |cohorts| × |weeks|.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
    )


@register(
    "anomaly_zscore_events",
    """
    WITH w AS (
      SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER trail AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) OVER trail AS DOUBLE) AS sq,
             COUNT(*) OVER trail AS n
      FROM events
      WHERE event_type = 'purchase'
      WINDOW trail AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           FLOOR(((v - s / n) / SQRT((sq - s * s / n) / n)) * 1e6 + 0.5) / 1e6
             AS zscore
    FROM w
    WHERE n >= 5 AND (sq - s * s / n) / n > 0
    """,
    doc="Trailing-window z-score anomaly detection on purchase values: "
    "each event scored against its user's previous ≤10 purchases. "
    "Deterministic variance: window sums and sums-of-squares go through "
    "decimal (order-free), then mean/variance/sqrt are correctly-rounded "
    "IEEE ops — sqrt IS in IEEE's correctly-rounded set, unlike ln. One "
    "shuffle on user_id; the trailing frame is O(1) state per row.",
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    trail = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, -1)
    )
    vdec = F.col("value").cast("decimal(28,10)")
    w = events.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("v"),
        F.sum(vdec).over(trail).cast("double").alias("s"),
        F.sum(vdec * vdec).over(trail).cast("double").alias("sq"),
        F.count("*").over(trail).alias("n"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    return (
        w.filter((F.col("n") >= 5) & (var > 0))
        .select(
            "user_id",
            "event_id",
            (F.floor(((F.col("v") - F.col("s") / F.col("n")) / F.sqrt(var)) * 1e6 + F.lit(0.5)) / 1e6).alias("zscore"),
        )
    )


@register(
    "array_agg_orders",
    """
    SELECT o_custkey,
           COALESCE(array_to_string(
             list_sort(list(o_orderstatus)
                       FILTER (o_orderstatus IS NOT NULL)), ','), '')
             AS statuses,
           CAST(COUNT(o_orderstatus) AS INT) AS n_orders
    FROM orders
    WHERE o_custkey <= 100
    GROUP BY o_custkey
    """,
    doc="Aggregation INTO an array (collect_list + array_sort ≙ DuckDB "
    "list_sort(list(...))): the denormalize step for feature vectors and "
    "nested exports. Sorting makes the array deterministic — bare "
    "collect_list order is shuffle-dependent and would never "
    "cross-engine match. One shuffle on custkey. The result serializes "
    "the array with array_join/array_to_string on BOTH sides: the driver "
    "canonicalizer pandas-sorts result columns and numpy arrays are "
    "unhashable (r4's one red row), so catalog results must stay "
    "flat-typed — enforced for all queries by "
    "tests/test_driver_contract.py.",
)
def array_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.size(F.collect_list("o_orderstatus")).cast("int").alias("n_orders"),
    )


@register(
    "null_safe_join",
    """
    WITH l AS (
      SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
      FROM customer WHERE c_custkey <= 300
    ),
    r AS (
      SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS seg, 1 AS tag
      FROM customer
    )
    SELECT COALESCE(l.seg, '<null>') AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_matched
    FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
    GROUP BY 1
    """,
    doc="Null-safe equality join (Spark `<=>` ≙ SQL IS NOT DISTINCT "
    "FROM): NULL keys MATCH each other, unlike plain `=` which silently "
    "drops every NULL row — the semantics gap that corrupts dedup joins "
    "on nullable keys. Still plans as an equi hash join (null-safe "
    "equality is hashable), not a nested loop.",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    left = customer.filter(F.col("c_custkey") <= 300).select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    )
    right = customer.select(
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("rseg")
    ).distinct()
    return (
        left.join(right, left.seg.eqNullSafe(right.rseg))
        .groupBy(F.coalesce("seg", F.lit("<null>")).alias("seg"))
        .agg(F.count("*").alias("n_matched"))
    )


@register(
    "unpivot_order_measures",
    """
    WITH agg AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total_price,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS max_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, measure, value
    FROM agg UNPIVOT (value FOR measure IN (n_orders, total_price, max_price))
    """,
    doc="UNPIVOT (wide→long melt): per-priority order measures unpivoted "
    "to (priority, measure, value) rows — the inverse of "
    "pivot_status_by_priority, completing the reshape surface. Spark's "
    "DataFrame.unpivot compiles to an Expand over the 5-row aggregate "
    "(constant-size after the partial agg); the money measure goes "
    "through exact decimal summation before the melt.",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_price"),
        F.max(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("max_price"),
    )
    return agg.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "max_price"],
        "measure",
        "value",
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           FLOOR(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS prob
    FROM c JOIN t USING (from_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current) — the behavioral-analytics "
    "summary behind next-action prediction and anomaly scoring. The "
    "lead() window is keyed by user (event_id tie-break makes same-"
    "timestamp ordering deterministic); transition counts collapse to "
    "≤ types² rows map-side; row totals broadcast.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        half_up_round(
            F.col("n").cast("double") / F.col("tot").cast("double"), 6
        ).alias("prob"),
    )


@register(
    "event_activity_heatmap",
    """
    WITH c AS (
      SELECT CAST(extract(dow FROM ts) AS INT) AS dow,
             CAST(extract(hour FROM ts) AS INT) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT dow, hour, n,
           FLOOR(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS share
    FROM c CROSS JOIN t
    """,
    doc="Day-of-week × hour activity heatmap over events (0=Sunday, "
    "aligning Spark dayofweek−1 with DuckDB extract(dow)): the temporal "
    "load profile that sizes streaming capacity and spots crawl "
    "seasonality. ≤168 cells from one map-side aggregate; the 1-row "
    "total broadcasts.",
)
def event_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round

    events = load_table(spark, sf_dir, "events")
    c = events.groupBy(
        (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t)).select(
        "dow",
        "hour",
        "n",
        half_up_round(
            F.col("n").cast("double") / F.col("tot").cast("double"), 6
        ).alias("share"),
    )


@register(
    "last_touch_attribution",
    """
    WITH purch AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             (MAX({'e': event_id, 't': event_type})).t AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY user_id, ts
    ),
    j AS (
      SELECT p.event_id, t.touch_type
      FROM purch p ASOF LEFT JOIN touch t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    ),
    c AS (
      SELECT COALESCE(touch_type, 'unattributed') AS touch_type,
             CAST(COUNT(*) AS BIGINT) AS n_conversions
      FROM j GROUP BY 1
    ),
    t AS (SELECT SUM(n_conversions) AS tot FROM c)
    SELECT touch_type, n_conversions,
           FLOOR(CAST(n_conversions AS DOUBLE) / CAST(tot AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS share
    FROM c CROSS JOIN t
    """,
    doc="Last-touch conversion attribution: each purchase credited to "
    "the user's most recent view/click at-or-before it (the as-of join "
    "reused as a marketing-analytics operator), with unmatched "
    "purchases reported as unattributed. Touch ties at one timestamp "
    "resolve by the struct-max (event_id, type) rule in both engines. "
    "Same one-key-shuffle asof plan as asof_join_clicks_purchases; the "
    "attribution rollup is ≤ types rows.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round
    from dbt_glue_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    touch = (
        events.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(
            F.max(F.struct(F.col("event_id").alias("e"), F.col("event_type").alias("t")))["t"].alias("touch_type")
        )
    )
    j = asof_join(purch, touch, on="ts", by="user_id", right_cols=["touch_type"])
    c = j.groupBy(
        F.coalesce("touch_type_matched", F.lit("unattributed")).alias("touch_type")
    ).agg(F.count("*").cast("bigint").alias("n_conversions"))
    t = c.agg(F.sum("n_conversions").alias("tot"))
    return c.join(F.broadcast(t)).select(
        "touch_type",
        "n_conversions",
        half_up_round(
            F.col("n_conversions").cast("double") / F.col("tot").cast("double"), 6
        ).alias("share"),
    )


@register(
    "rfm_segments",
    """
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS corpus_max FROM events),
    u AS (
      SELECT user_id,
             datediff('day', CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE),
                      CAST(mx.corpus_max AS DATE)) AS r_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(value AS DECIMAL(18,6))) AS monetary
      FROM events CROSS JOIN mx
      GROUP BY user_id, mx.corpus_max
    ),
    seg AS (
      SELECT CASE WHEN r_days < 1 THEN 'recent'
                  WHEN r_days < 2 THEN 'warm' ELSE 'cold' END AS recency_seg,
             CASE WHEN freq >= 70 THEN 'high'
                  WHEN freq >= 55 THEN 'mid' ELSE 'low' END AS freq_seg,
             monetary
      FROM u
    )
    SELECT recency_seg, freq_seg,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR(CAST(SUM(monetary) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
             AS total_value,
           FLOOR(CAST(SUM(monetary) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS avg_value
    FROM seg GROUP BY recency_seg, freq_seg
    """,
    doc="RFM user segmentation over events: recency (days since last "
    "activity vs corpus max), frequency, monetary (decimal-exact value "
    "sums) bucketed by fixed thresholds into a segment grid — the "
    "classic lifecycle-marketing rollup. One user-keyed aggregate; the "
    "corpus-max timestamp broadcasts; output ≤ 9 segment rows.",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round

    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("corpus_max"))
    u = (
        events.join(F.broadcast(mx))
        .groupBy("user_id", "corpus_max")
        .agg(
            F.max("ts").alias("user_max"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("monetary"),
        )
        .select(
            F.datediff(F.to_date("corpus_max"), F.to_date("user_max")).alias(
                "r_days"
            ),
            "freq",
            "monetary",
        )
    )
    seg = u.select(
        F.when(F.col("r_days") < 1, "recent")
        .when(F.col("r_days") < 2, "warm")
        .otherwise("cold")
        .alias("recency_seg"),
        F.when(F.col("freq") >= 70, "high")
        .when(F.col("freq") >= 55, "mid")
        .otherwise("low")
        .alias("freq_seg"),
        "monetary",
    )
    return seg.groupBy("recency_seg", "freq_seg").agg(
        F.count("*").cast("bigint").alias("n_users"),
        half_up_round(F.sum("monetary").cast("double"), 4).alias("total_value"),
        half_up_round(
            F.sum("monetary").cast("double") / F.count("*").cast("double"), 4
        ).alias("avg_value"),
    )


@register(
    "funnel_conversion_timing",
    """
    WITH fv AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS v_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= fv.v_ts
      GROUP BY e.user_id
    ),
    g AS (
      SELECT fv.user_id,
             CAST(epoch_us(fp.p_ts) - epoch_us(fv.v_ts) AS BIGINT) AS gap_us
      FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers,
           CAST(COUNT(gap_us) AS BIGINT) AS n_converted,
           CASE WHEN COUNT(*) = 0 THEN NULL ELSE
             FLOOR(CAST(COUNT(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 END AS conversion_rate,
           FLOOR(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1000000.0
                 * 100.0 + 0.5) / 100.0 AS median_gap_s,
           FLOOR(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 1000000.0
                 * 100.0 + 0.5) / 100.0 AS p90_gap_s
    FROM g
    """,
    doc="Funnel conversion timing: per user, seconds from first view to "
    "first purchase at-or-after it (microsecond-exact integer gaps — "
    "unix_micros ≡ epoch_us; unix_timestamp would truncate sub-second "
    "precision); conversion rate + exact median/p90 time-to-convert "
    "(Spark percentile ≡ DuckDB quantile_cont). Two user-keyed "
    "aggregates + one hash join; the percentile runs over ≤ |converted users| integer gaps.",
)
def funnel_conversion_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_glue_spark.functions.scalars import half_up_round

    events = load_table(spark, sf_dir, "events")
    fv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    g = fv.join(fp, "user_id", "left").select(
        (
            F.unix_micros("p_ts") - F.unix_micros("v_ts")
        ).cast("bigint").alias("gap_us")
    )
    return g.agg(
        F.count("*").cast("bigint").alias("n_viewers"),
        F.count("gap_us").cast("bigint").alias("n_converted"),
        # try_divide: zero viewers (empty slice) must yield NULL, not an
        # ANSI DIVIDE_BY_ZERO abort — mirrored by the oracle's CASE
        half_up_round(
            F.try_divide(
                F.count("gap_us").cast("double"), F.count("*").cast("double")
            ),
            6,
        ).alias("conversion_rate"),
        half_up_round(
            F.expr("percentile(cast(gap_us as double), 0.5)") / F.lit(1000000.0),
            2,
        ).alias("median_gap_s"),
        half_up_round(
            F.expr("percentile(cast(gap_us as double), 0.9)") / F.lit(1000000.0),
            2,
        ).alias("p90_gap_s"),
    )

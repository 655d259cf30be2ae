"""Relational capability surface (SURVEY §2 Tier B): scans, filters, joins,
aggregation, set ops, sorting, expressions, string/date functions, subqueries.

Each query is idiomatic DataFrame API — declarative, so Catalyst gets filter
pushdown / column pruning / join selection for free. Small dimension tables
(region, nation, supplier) are explicitly ``broadcast()`` where they join the
fact table: at 100 TB the fact side never shuffles for those joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.functions import julianday, sqlite_glob, group_concat
from sqlitedataframe_spark.io import load_table
from sqlitedataframe_spark.suite import query

B = F.broadcast


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation over the fact table (TPC-H Q1 shape): filter -> groupBy -> agg.
# Spark executes partial (map-side) + final aggregation; the only shuffle is
# on the 6-value (returnflag, linestatus) key — trivially scalable.
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity) + 1e-9, 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice) + 1e-9, 4)                                   AS avg_price,
           ROUND(AVG(l_discount) + 1e-9, 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: filtered full-scan aggregation."""
    l = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 3-way join + top-k (TPC-H Q3 shape). customer is the small side of the
# customer⋈orders join; orders⋈lineitem shuffles on the join key. Top-k via
# orderBy+limit = Spark's TakeOrderedAndProject (no full sort at scale).
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer/orders/lineitem, aggregate revenue, top-10."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(B(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# 6-way star join (TPC-H Q5 shape). region/nation/supplier are broadcast —
# at 100 TB only orders⋈lineitem and customer⋈orders shuffle.
# --------------------------------------------------------------------------
@query(
    "q05_region_revenue",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop star join region->nation->supplier/customer->orders->lineitem."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(B(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(B(n), s.s_nationkey == n.n_nationkey)
        .join(B(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Returned-items ranking (TPC-H Q10 shape): join + agg + top-k.
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(B(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Filter surface: IN / BETWEEN / IS NULL / LIKE / boolean composition.
# All predicates are Catalyst filters -> pushed to the parquet scan.
# --------------------------------------------------------------------------
@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_type IN ('ECONOMY', 'SMALL')
      AND p_size BETWEEN 5 AND 25
      AND p_name LIKE '%gear%'
      AND p_retailprice IS NOT NULL
    ORDER BY p_partkey
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with IN, BETWEEN, LIKE, IS NOT NULL — pushdown-eligible filters."""
    p = T(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").isin("ECONOMY", "SMALL"))
        .filter(F.col("p_size").between(5, 25))
        .filter(F.col("p_name").like("%gear%"))
        .filter(F.col("p_retailprice").isNotNull())
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# SQLite GLOB (dialect shim -> rlike). Oracle uses DuckDB's native GLOB.
# --------------------------------------------------------------------------
@query(
    "filter_glob",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name GLOB '*w?dget'
    ORDER BY p_partkey
    """,
)
def filter_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite GLOB pattern matching via the glob->regex shim."""
    p = T(spark, sf_dir, "part")
    return (
        p.filter(sqlite_glob("p_name", "*w?dget")).select("p_partkey", "p_name").orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Outer / semi / anti joins.
# --------------------------------------------------------------------------
@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with no orders."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery as a LEFT SEMI join (no row duplication, no payload)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a LEFT ANTI join: customers with no URGENT order.

    The build side is filtered (not the bare orders table) so the result is
    non-empty at every SF — a zero-row pass would be weak oracle evidence.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_cross_theta",
    oracle="""
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    WHERE n_regionkey < r_regionkey
    ORDER BY n_name, r_name
    """,
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + non-equi (theta) predicate — nested-loop in SQLite,
    broadcast-nested-loop in Spark (both sides tiny here)."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        n.crossJoin(B(r))
        .filter(F.col("n_regionkey") < F.col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    )


# --------------------------------------------------------------------------
# GROUP BY + HAVING + DISTINCT aggregates + group_concat shim.
# --------------------------------------------------------------------------
@query(
    "agg_having_distinct",
    oracle="""
    SELECT o_custkey,
           COUNT(*)                          AS n_orders,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           ROUND(AVG(o_totalprice) + 1e-9, 4)       AS avg_price
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
)
def agg_having_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with HAVING and COUNT(DISTINCT)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            F.round(F.avg("o_totalprice") + 1e-9, 4).alias("avg_price"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@query(
    "agg_group_concat",
    oracle="""
    SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite group_concat via sorted collect_list + array_join."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(B(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(group_concat("s_name").alias("suppliers"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@query(
    "set_ops_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_ops_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union + distinct in DataFrame terms."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_ops_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_ops_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)
def set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics = DataFrame.subtract): ordering customers
    outside the non-BUILDING segments — non-empty at every SF (a zero-row
    pass would be weak oracle evidence)."""
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") != "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c)


# --------------------------------------------------------------------------
# ORDER BY ... LIMIT ... OFFSET (SQLite top-k surface).
# --------------------------------------------------------------------------
@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY with LIMIT and OFFSET (Spark >= 3.4 offset)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(20)
    )


# --------------------------------------------------------------------------
# Expression surface: CASE WHEN, CAST, arithmetic, COALESCE, NULLIF.
# --------------------------------------------------------------------------
@query(
    "expr_case_cast",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END                           AS bucket,
           CAST(floor(o_totalprice) AS BIGINT)             AS price_int,
           CAST(ROUND(o_totalprice / 1000, 1) AS DOUBLE)   AS price_k,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')    AS status_adj
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def expr_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/CAST/COALESCE/NULLIF expression surface."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("bucket"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.round(F.col("o_totalprice") / 1000, 1).cast("double").alias("price_k"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_adj"
        ),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Scalar string functions (SQLite: length/upper/lower/substr/instr/replace/
# trim/concat).
# --------------------------------------------------------------------------
@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                       AS name_upper,
           LOWER(p_brand)                      AS brand_lower,
           CAST(LENGTH(p_name) AS INT)         AS name_len,
           SUBSTR(p_name, 1, 4)                AS name_prefix,
           CAST(INSTR(p_name, 'e') AS INT)     AS first_e,
           REPLACE(p_name, ' ', '_')           AS name_snake,
           TRIM(CONCAT('  ', p_name, '  '))    AS name_trim,
           CONCAT(p_brand, ':', p_type)        AS brand_type
    FROM part
    WHERE p_partkey <= 120
    ORDER BY p_partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite scalar string-function surface mapped to Spark built-ins."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 120)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.instr("p_name", "e").cast("int").alias("first_e"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Date/time surface incl. the julianday shim (SQLite date/time functions).
# --------------------------------------------------------------------------
@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)  AS order_month,
           strftime(o_orderdate, '%Y-%m')                AS order_ym,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT)            AS unix_sec,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
    FROM orders
    WHERE o_orderkey <= 800
    ORDER BY o_orderkey
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/truncation/formatting/arithmetic (SQLite strftime etc.)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    ).orderBy("o_orderkey")


@query(
    "date_julianday",
    oracle="""
    SELECT o_orderkey,
           ROUND(epoch_us(o_orderdate) / 86400000000.0 + 2440587.5, 6) AS jd
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def date_julianday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite julianday() as the reference's inverse decode expression."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.round(julianday("o_orderdate"), 6).alias("jd"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Subqueries: scalar-aggregate comparison (decorrelated by Catalyst).
# --------------------------------------------------------------------------
@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: price above 1.5x global average (broadcast scalar).

    1.5x (not 2x) so the filter passes thousands of rows at sf0.01 — a
    zero-row oracle match would be weak evidence.
    """
    o = T(spark, sf_dir, "orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(B(avg_df))  # 1-row broadcast: scalar subquery without collect()
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .distinct()
    )

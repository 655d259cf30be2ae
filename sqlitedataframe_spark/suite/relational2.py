"""Tier-B surface, second tranche: full outer joins, grouping sets,
window distribution functions, recursive CTEs, EXISTS/IN subqueries, pivot,
math functions, JSON explode, rowid surrogate, as-of join.

SQL-string queries run through ``spark.sql`` over registered views — the
native replacement for the reference's arbitrary-SQL pass-through entry
point (DataFrame.init(connection:statement:), SQLiteDataFrame.swift:295-304).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.io import register_views
from sqlitedataframe_spark.operators.relational import asof_join, with_rowid
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

B = F.broadcast


# --------------------------------------------------------------------------
# Full outer join (SQLite >= 3.39 pass-through surface)
# --------------------------------------------------------------------------
@query(
    "join_full_outer",
    oracle="""
    WITH u AS (
      SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ),
    r AS (
      SELECT c_custkey AS custkey, ROUND(c_acctbal, 2) AS acctbal
      FROM customer WHERE c_acctbal > 9000
    )
    SELECT COALESCE(u.custkey, r.custkey) AS custkey,
           COALESCE(n_urgent, 0) AS n_urgent,
           COALESCE(acctbal, 0.0) AS acctbal
    FROM u FULL OUTER JOIN r ON u.custkey = r.custkey
    ORDER BY custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two partial views of the customer keyspace —
    nulls on both sides, coalesced deterministically."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    u = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    r = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.round("c_acctbal", 2).alias("acctbal")
    )
    return (
        u.join(r, on="custkey", how="full_outer")
        .select(
            "custkey",
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("acctbal", F.lit(0.0)).alias("acctbal"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# GROUPING SETS (capability upgrade over SQLite — SURVEY Tier B)
# --------------------------------------------------------------------------
@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL pass-through surface."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
        """
    )


# --------------------------------------------------------------------------
# Window distribution functions (SQLite >= 3.25 pass-through surface)
# --------------------------------------------------------------------------
@query(
    "window_distribution",
    oracle="""
    SELECT n_name, c_name,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(percent_rank() OVER w + 1e-9, 6) AS pct_rank,
           ROUND(cume_dist() OVER w + 1e-9, 6) AS cume,
           nth_value(c_name, 2) OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_richest
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 7500
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY n_name, pct_rank, c_name
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / nth_value over per-nation windows."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500)
    n = T(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.join(B(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_name",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cume"),
            F.nth_value("c_name", 2).over(wfull).alias("second_richest"),
        )
        .orderBy("n_name", "pct_rank", "c_name")
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE — SURVEY Tier B scan row)
# --------------------------------------------------------------------------
_RECURSIVE_SQL = """
    WITH RECURSIVE months(mo) AS (
      SELECT 1
      UNION ALL
      SELECT mo + 1 FROM months WHERE mo < 12
    )
    SELECT mo,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(revenue, 0.0) AS revenue
    FROM months
    LEFT JOIN (
      SELECT MONTH(o_orderdate) AS omo,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders
      WHERE YEAR(o_orderdate) = 1996
      GROUP BY MONTH(o_orderdate)
    ) o ON mo = omo
    ORDER BY mo
"""


@query(
    "cte_recursive",
    oracle=_RECURSIVE_SQL.replace("MONTH(o_orderdate)", "month(o_orderdate)").replace(
        "YEAR(o_orderdate)", "year(o_orderdate)"
    ),
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine left-joined to 1996 order revenue —
    the calendar-spine pattern (no row generated = no month dropped)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_RECURSIVE_SQL)


# --------------------------------------------------------------------------
# EXISTS / IN subqueries (SQLite pass-through -> semi joins in Spark)
# --------------------------------------------------------------------------
@query(
    "subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_acctbal < 0
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via the SQL surface (Catalyst decorrelates to a
    semi join — SQLite would run the subquery per row)."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_acctbal < 0
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation
      WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    )
    ORDER BY s_suppkey
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN + scalar subquery (region -> nations -> suppliers)."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    asia_nations = n.join(
        B(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == F.col("r_regionkey")
    ).select("n_nationkey")
    return (
        s.join(B(asia_nations), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Pivot (conditional aggregation; DataFrame-native capability upgrade)
# --------------------------------------------------------------------------
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "pivot_segments",
    oracle="""
    SELECT n_name,
           CAST(COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS automobile,
           CAST(COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BIGINT) AS building,
           CAST(COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS BIGINT) AS furniture,
           CAST(COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS BIGINT) AS household,
           CAST(COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS BIGINT) AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts pivoted nation x mktsegment (explicit value list =
    one pass, no distinct-values pre-query)."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    out = (
        c.join(B(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .count()
    )
    return out.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS],
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# Math functions (SQLite math extension pass-through surface)
# --------------------------------------------------------------------------
@query(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(sqrt(p_retailprice), 6) AS root_price,
           ROUND(ln(p_retailprice), 6) AS ln_price,
           ROUND(pow(p_size, 2), 1) AS size_sq,
           CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
           CAST(least(p_size, 10) AS BIGINT) AS size_min10,
           CAST(greatest(p_size, 40) AS BIGINT) AS size_max40,
           ROUND(sin(p_size) + cos(p_size), 6) AS trig
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/ln/pow/abs/least/greatest/trig — all JVM builtins."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 6).alias("root_price"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.least("p_size", F.lit(10)).cast("bigint").alias("size_min10"),
        F.greatest("p_size", F.lit(40)).cast("bigint").alias("size_max40"),
        F.round(F.sin("p_size") + F.cos("p_size"), 6).alias("trig"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# JSON explode (SQLite json_each pass-through surface)
# --------------------------------------------------------------------------
@query(
    "json_each_props",
    oracle="""
    -- this DuckDB build lacks the json_each table function; the fixture's
    -- props objects have the single key 'k', so extraction is equivalent
    SELECT 'k' AS prop_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total
    FROM events
    GROUP BY 1
    ORDER BY prop_key
    """,
)
def json_each_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_each equivalent: parse props to a map, explode entries,
    aggregate per key."""
    e = T(spark, sf_dir, "events")
    kv = e.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("prop_key", "v")
    )
    return (
        kv.groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .orderBy("prop_key")
    )


# --------------------------------------------------------------------------
# rowid surrogate (SURVEY §7 hard part 1)
# --------------------------------------------------------------------------
@query(
    "rowid_surrogate",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) AS INT) AS rowid,
           n_name
    FROM nation
    ORDER BY rowid
    """,
)
def rowid_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable dense 1-based rowid over an explicit total order."""
    n = T(spark, sf_dir, "nation")
    return with_rowid(n, "n_nationkey").select("rowid", "n_name").orderBy("rowid")


@query(
    "rowid_fact_scale",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS INT)
             AS rowid,
           o_orderkey
    FROM orders
    ORDER BY rowid
    """,
)
def rowid_fact_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rowid over a FACT-sized table and a two-column order (date + unique
    tiebreaker): exercises the zipWithIndex shape (range exchange +
    partitioned numbering + broadcast offsets) where the old global
    row_number would have serialized. No single-partition WindowExec —
    the property `test_plans.py::test_rowid_no_global_window` asserts."""
    o = T(spark, sf_dir, "orders")
    return (
        with_rowid(o, "o_orderdate", "o_orderkey")
        .select("rowid", "o_orderkey")
        .orderBy("rowid")
    )


# --------------------------------------------------------------------------
# As-of join (time-series operator Spark lacks as a primitive)
# --------------------------------------------------------------------------
@query(
    "asof_join_events_orders",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(MAX(o_totalprice), 2) AS max_price
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.n_orders, o.max_price
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    WHERE e.event_id < 2000
    ORDER BY e.event_id
    """,
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's most recent order-day at or
    before the event time (union + ordered-window merge formulation — one
    shuffle per side, no range cross-join)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 2000).select(
        "event_id", "user_id", "ts"
    )
    o = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            "n_orders",
            "max_price",
        )
    )
    return asof_join(e, o, on="user_id", left_ts="ts", right_ts="o_orderdate").select(
        "event_id", "user_id", "ts", "o_orderdate", "n_orders", "max_price"
    ).orderBy("event_id")

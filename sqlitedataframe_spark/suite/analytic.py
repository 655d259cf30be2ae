"""Analytic surface: window functions (SQLite >= 3.25 pass-through) and
ROLLUP/CUBE/GROUPING SETS (a Spark capability upgrade — SQLite lacks them).

Windows partition by a key, so Spark shuffles once on the partition key and
sorts within partitions — the same plan shape at any scale. Frames (ROWS and
RANGE) map 1:1 onto pyspark.sql.Window. GROUPS frames and the EXCLUDE
clause (SQLite 3.28+ features, absent from Spark's window engine) are
implemented as the ``operators/windows.groups_frame`` composition —
declared a gap in round 1, closed in round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# --------------------------------------------------------------------------
# row_number top-k per group — the canonical "top orders per customer".
# --------------------------------------------------------------------------
@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (one shuffle on o_custkey)."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# Running aggregate with an explicit ROWS frame.
# --------------------------------------------------------------------------
@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer with ROWS UNBOUNDED PRECEDING frame."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# lag / lead / first_value / last_value / nth_value.
# --------------------------------------------------------------------------
@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2)                                             AS price,
           ROUND(LAG(o_totalprice)  OVER w, 2)                                AS prev_price,
           ROUND(LEAD(o_totalprice) OVER w, 2)                                AS next_price,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2)                         AS first_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2)                        AS second_price
    FROM orders
    WHERE o_custkey <= 150
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/nth_value navigation functions."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 150)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# Ranking family: rank / dense_rank / percent_rank / cume_dist / ntile.
# --------------------------------------------------------------------------
@query(
    "window_ranking",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(RANK()       OVER w AS INT)       AS rnk,
           CAST(DENSE_RANK() OVER w AS INT)       AS drnk,
           ROUND(PERCENT_RANK() OVER w + 1e-9, 6)        AS prnk,
           ROUND(CUME_DIST() OVER w + 1e-9, 6)        AS cdist,
           CAST(NTILE(4) OVER w AS INT)           AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    ORDER BY p_brand, p_partkey
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist/ntile ranking surface."""
    p = T(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("prnk"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).orderBy("p_brand", "p_partkey")


# --------------------------------------------------------------------------
# RANGE frame over a numeric ordering column.
# --------------------------------------------------------------------------
@query(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal,
           CAST(COUNT(*) OVER (ORDER BY s_acctbal
                 RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS BIGINT) AS peers_within_500
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value-based frame: suppliers with acctbal within +-500.

    Global RANGE semantics WITHOUT a global window: the bucketed
    ``global_range_frame`` operator partitions the frame by value buckets
    (operators/windows.py), so no single-partition WindowExec appears in
    the plan.
    """
    from sqlitedataframe_spark.operators.windows import global_range_frame

    s = T(spark, sf_dir, "supplier")
    out = global_range_frame(
        s,
        "s_acctbal",
        -500,
        500,
        {"peers_within_500": lambda w: F.count(F.lit(1)).over(w)},
    )
    return out.select(
        "s_suppkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "peers_within_500",
    ).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# GROUPS frames + EXCLUDE clause (SQLite 3.28 surface Spark lacks) via the
# dense_rank / group-partial composition in operators/windows.groups_frame.
# DuckDB also lacks GROUPS mode, so the oracle spells the identical frame as
# RANGE over DENSE_RANK (a GROUPS frame IS a RANGE frame on the dense group
# index); EXCLUDE is native DuckDB.
# --------------------------------------------------------------------------
@query(
    "window_groups_frame",
    oracle="""
    WITH g AS (SELECT p_brand, p_partkey, p_retailprice,
                      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size)
                        AS dr
               FROM part)
    SELECT p_brand, p_partkey,
           ROUND(SUM(p_retailprice) OVER w, 2) AS grp_sum,
           CAST(COUNT(p_partkey) OVER w AS BIGINT) AS grp_cnt
    FROM g
    WINDOW w AS (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ORDER BY p_brand, p_partkey
    """,
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING: sum and count over the
    current peer group (rows tying on p_size) and both neighbor groups."""
    from sqlitedataframe_spark.operators.windows import groups_frames

    p = T(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_size", "p_retailprice")
    out = groups_frames(
        p,
        ["p_brand"],
        "p_size",
        [
            (-1, 1, "sum", "p_retailprice", "grp_sum", "no others"),
            (-1, 1, "count", "p_partkey", "grp_cnt", "no others"),
        ],
    )
    return out.select(
        "p_brand",
        "p_partkey",
        F.round("grp_sum", 2).alias("grp_sum"),
        "grp_cnt",
    ).orderBy("p_brand", "p_partkey")


@query(
    "window_frame_exclude",
    oracle="""
    WITH g AS (SELECT p_brand, p_partkey, p_retailprice,
                      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size)
                        AS dr
               FROM part)
    SELECT p_brand, p_partkey,
           ROUND(AVG(p_retailprice) OVER (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)
                 + 1e-9, 4) AS avg_excl_ties,
           CAST(COUNT(p_partkey) OVER (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE GROUP)
                AS BIGINT) AS cnt_excl_group
    FROM g
    ORDER BY p_brand, p_partkey
    """,
)
def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE TIES / EXCLUDE GROUP on GROUPS frames — the invertible-
    aggregate arithmetic (frame − group ± current) in groups_frame."""
    from sqlitedataframe_spark.operators.windows import groups_frames

    p = T(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_size", "p_retailprice")
    out = groups_frames(
        p,
        ["p_brand"],
        "p_size",
        [
            (-1, 1, "avg", "p_retailprice", "avg_excl_ties", "ties"),
            (-2, 0, "count", "p_partkey", "cnt_excl_group", "group"),
        ],
    )
    return out.select(
        "p_brand",
        "p_partkey",
        F.round(F.col("avg_excl_ties") + 1e-9, 4).alias("avg_excl_ties"),
        "cnt_excl_group",
    ).orderBy("p_brand", "p_partkey")


@query(
    "window_exclude_minmax",
    oracle="""
    WITH g AS (SELECT p_brand, p_partkey, p_retailprice,
                      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size)
                        AS dr
               FROM part)
    SELECT p_brand, p_partkey,
           ROUND(MIN(p_retailprice) OVER (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP),
                 2) AS min_excl_group,
           ROUND(MAX(p_retailprice) OVER (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES),
                 2) AS max_excl_ties,
           ROUND(MIN(p_retailprice) OVER (PARTITION BY p_brand ORDER BY dr
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
                 EXCLUDE CURRENT ROW), 2) AS min_excl_current
    FROM g
    ORDER BY p_brand, p_partkey
    """,
)
def window_exclude_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE with min/max on GROUPS frames — NOT invertible, so the
    frame decomposes into strictly-before/strictly-after RANGE windows
    (plus within-peer-group except-self bookkeeping for EXCLUDE CURRENT
    ROW); closed the round-1 "segment-tree out of scope" limitation.
    Semantics cross-checked against SQLite's own GROUPS engine in
    tests/test_operators.py::test_groups_frame_matches_sqlite_reference
    (covering frames here, where the DuckDB RANGE+EXCLUDE oracle agrees
    with SQLite)."""
    from sqlitedataframe_spark.operators.windows import groups_frames

    p = T(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_size", "p_retailprice")
    out = groups_frames(
        p,
        ["p_brand"],
        "p_size",
        [
            (-1, 1, "min", "p_retailprice", "min_excl_group", "group"),
            (-1, 1, "max", "p_retailprice", "max_excl_ties", "ties"),
            (-2, 0, "min", "p_retailprice", "min_excl_current", "current row"),
        ],
    )
    return out.select(
        "p_brand",
        "p_partkey",
        F.round("min_excl_group", 2).alias("min_excl_group"),
        F.round("max_excl_ties", 2).alias("max_excl_ties"),
        F.round("min_excl_current", 2).alias("min_excl_current"),
    ).orderBy("p_brand", "p_partkey")


# --------------------------------------------------------------------------
# ROLLUP / CUBE — Spark capability upgrade over SQLite (SURVEY §2 Tier B).
# --------------------------------------------------------------------------
@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY gid, r_name, n_name
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) customer counts with grouping id."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT)  AS n_items,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Approximate analytics: Spark-native upgrade (SQLite has none built in).
# Exact-count oracle is intentionally NOT used — approx answers differ; the
# suite exposes a deterministic exact twin for the gate and keeps the approx
# version for bench/scale (rows-only check).
# --------------------------------------------------------------------------
@query(
    "agg_count_distinct_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) (expand-based in Spark)."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


@query("agg_approx", oracle=None)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct + approx percentiles — the 100 TB path where
    exact distinct counts would shuffle every key. Rows-only check (approx
    algorithms differ across engines by design)."""
    l = T(spark, sf_dir, "lineitem")
    # One quantile sketch per group (array form), then flattened to scalar
    # columns post-agg — the driver's pandas canonicalizer can't hash an
    # ARRAY column (r02 red row), and three separate percentile_approx aggs
    # would build three sketches over the same data.
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.95, 0.99], 10000
            ).alias("_pcts"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            F.element_at("_pcts", 1).alias("p50"),
            F.element_at("_pcts", 2).alias("p95"),
            F.element_at("_pcts", 3).alias("p99"),
        )
    )

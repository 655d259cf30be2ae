"""Analytic surface, second tranche: array/collection operators over the
``embeddings`` table, exact percentiles and statistical moments, regexp
string functions, melt/unpivot reshaping, and time-series gap-filling.

These extend the Tier-B capability surface (the reference exposes whatever
SQL the engine can run — /root/reference/README.md:48-56) with the
collection-typed operations Spark adds natively (SURVEY §1.4 "not supported
by the reference ... Spark gives ArrayType for free") and the rollup shapes
a training-data / time-series pipeline needs.

Scale notes: every query here is a single scan + at most one shuffle.
Array expressions (``transform``/``aggregate``/``explode``) run inside
whole-stage codegen — no Python in the hot path. The gap-fill calendar is
generated from a 1-row aggregate (driver-side tiny) and exploded, then the
per-day counts join it broadcast — at 100 TB the fact side still only
shuffles once for its own groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

B = F.broadcast


@query(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                             AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE) + 1e-9, 4)           AS first_elem,
           ROUND(list_aggregate(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') + 1e-9, 4)
                                                                   AS sq_norm,
           ROUND(list_aggregate(list_transform(embedding,
                   x -> CAST(x AS DOUBLE)), 'max') + 1e-9, 4)      AS max_elem
    FROM embeddings
    WHERE vec_id % 7 = 0
    ORDER BY vec_id
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType operators: size / element_at / higher-order transform +
    aggregate (squared L2 norm, max element). All JVM-side codegen — the
    lambda functions compile to Catalyst expressions, not UDFs."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    xd = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double") + 1e-9, 4).alias(
            "first_elem"
        ),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: xd(x) * xd(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + 1e-9,
            4,
        ).alias("sq_norm"),
        F.round(
            F.array_max(F.transform("embedding", xd)) + 1e-9, 4
        ).alias("max_elem"),
    ).orderBy("vec_id")


@query(
    "explode_unnest",
    oracle="""
    SELECT vec_id, ROUND(CAST(unnest(embedding) AS DOUBLE) + 1e-9, 4) AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array flattening (SQLite json_each analog for native arrays):
    explode == UNNEST. Generates rows inside codegen; no shuffle at all."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.explode("embedding").alias("x")
    ).select("vec_id", F.round(F.col("x").cast("double") + 1e-9, 4).alias("val"))


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25) + 1e-9, 4)      AS p25_qty,
           ROUND(quantile_cont(l_quantity, 0.5) + 1e-9, 4)       AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.75) + 1e-9, 4)      AS p75_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9) + 1e-9, 4)  AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the exact counterpart of
    the rows-only `agg_approx`). Spark's `percentile` == DuckDB
    quantile_cont (linear interpolation). At 100 TB prefer
    percentile_approx; this is the correctness anchor for it."""
    li = T(spark, sf_dir, "lineitem")
    # one percentile buffer for all three l_quantity quantiles (array-of-
    # percentages form), not three separate full-column buffers per group
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("_q"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)) + 1e-9, 4).alias(
                "p90_price"
            ),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("_q", 1) + 1e-9, 4).alias("p25_qty"),
            F.round(F.element_at("_q", 2) + 1e-9, 4).alias("median_qty"),
            F.round(F.element_at("_q", 3) + 1e-9, 4).alias("p75_qty"),
            "p90_price",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity) + 1e-9, 4)                     AS sd_qty,
           ROUND(var_samp(l_extendedprice) + 1e-9, 2)                   AS var_price,
           ROUND(corr(l_extendedprice, l_quantity) + 1e-9, 4) + 0.0     AS corr_price_qty,
           ROUND(covar_samp(l_extendedprice, l_quantity) + 1e-9, 2) + 0.0 AS cov_price_qty,
           ROUND(skewness(l_discount) + 1e-9, 4) + 0.0                  AS skew_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moment aggregates (stddev / variance / correlation /
    covariance / skewness) — single partial+final aggregation pass.

    Spark's ``skewness`` is the population moment g1; DuckDB's is the
    bias-corrected sample statistic G1 = g1 * sqrt(n(n-1))/(n-2), so the
    Spark side applies that factor explicitly."""
    li = T(spark, sf_dir, "lineitem")
    n = F.col("n").cast("double")
    g1_to_G1 = F.sqrt(n * (n - 1)) / (n - 2)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity") + 1e-9, 4).alias("sd_qty"),
            F.round(F.var_samp("l_extendedprice") + 1e-9, 2).alias("var_price"),
            # signed stats get `ROUND(...) + 0.0` on BOTH sides: a tiny
            # negative rounds to -0.0 in DuckDB but +0.0 in Spark, and the
            # driver's hash distinguishes the two (the welch r7/r8 lesson)
            (F.round(F.corr("l_extendedprice", "l_quantity") + 1e-9, 4) + 0.0).alias(
                "corr_price_qty"
            ),
            (F.round(F.covar_samp("l_extendedprice", "l_quantity") + 1e-9, 2) + 0.0).alias(
                "cov_price_qty"
            ),
            F.skewness("l_discount").alias("g1"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "sd_qty",
            "var_price",
            "corr_price_qty",
            "cov_price_qty",
            (F.round(F.col("g1") * g1_to_G1 + 1e-9, 4) + 0.0).alias("skew_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+) ', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')        AS devoweled,
           CAST(regexp_matches(p_name, 'widget$') AS BOOLEAN) AS is_widget,
           CAST(len(string_split(p_name, ' ')) AS INT)        AS n_words
    FROM part
    WHERE p_partkey % 5 = 0
    ORDER BY p_partkey
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp string surface (SQLite exposes REGEXP as an operator users
    must provide; Spark has it built in): extract / global replace /
    boolean match / split."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("widget$").alias("is_widget"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    ).orderBy("p_partkey")


@query(
    "unpivot_measures",
    oracle="""
    SELECT 'sum_qty' AS measure, ROUND(SUM(l_quantity) + 1e-9, 2) AS value FROM lineitem
    UNION ALL
    SELECT 'sum_price', ROUND(SUM(l_extendedprice) + 1e-9, 2) FROM lineitem
    UNION ALL
    SELECT 'sum_disc', ROUND(SUM(l_discount) + 1e-9, 2) FROM lineitem
    UNION ALL
    SELECT 'sum_tax', ROUND(SUM(l_tax) + 1e-9, 2) FROM lineitem
    ORDER BY measure
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape: one aggregation pass over the fact table, then
    `unpivot` (melt) of the measure columns — the inverse of
    `pivot_segments`. The unpivot runs on a 1-row frame (free)."""
    li = T(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.round(F.sum("l_quantity") + 1e-9, 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice") + 1e-9, 2).alias("sum_price"),
        F.round(F.sum("l_discount") + 1e-9, 2).alias("sum_disc"),
        F.round(F.sum("l_tax") + 1e-9, 2).alias("sum_tax"),
    )
    return wide.unpivot(
        [], ["sum_qty", "sum_price", "sum_disc", "sum_tax"], "measure", "value"
    ).orderBy("measure")


@query(
    "gapfill_timeseries",
    oracle="""
    WITH days AS (
      SELECT day FROM generate_series(TIMESTAMP '1996-01-01',
                                      TIMESTAMP '1996-03-31',
                                      INTERVAL 1 DAY) t(day)),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice) + 1e-9, 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT CAST(days.day AS TIMESTAMP) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(revenue, 0.0) AS revenue
    FROM days LEFT JOIN daily ON days.day = daily.day
    ORDER BY day
    """,
)
def gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (hypertable-rollup shape): a generated
    day calendar left-joined with per-day order aggregates so missing days
    appear as zeros. The calendar is one generated row exploded (~90 rows,
    broadcast); the fact table shuffles once for its own daily rollup."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice") + 1e-9, 2).alias("revenue"),
    )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-03-31").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    # left-outer can only broadcast its build (right) side; `daily` is
    # calendar-bounded (one row per day) so broadcasting it is scale-safe
    return (
        days.join(B(daily), days.day == daily.d, "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Histogram via width_bucket: the fixed-bin aggregation every profiling /
# distribution dashboard runs — one scan, one exchange on the bin id.
# ---------------------------------------------------------------------------
@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 25
                     ELSE floor(o_totalprice / 25000.0) + 1 END AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice) + 1e-9, 2) AS lo,
           ROUND(MAX(o_totalprice) + 1e-9, 2) AS hi
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bin fixed-width histogram of order totals (width_bucket is pure
    arithmetic — bins are computed map-side, the exchange carries one row
    per bin)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(24))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice") + 1e-9, 2).alias("lo"),
            F.round(F.max("o_totalprice") + 1e-9, 2).alias("hi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Correlation / covariance: bivariate statistics per group.
# ---------------------------------------------------------------------------
@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_linestatus,
           ROUND(corr(l_quantity, l_extendedprice) + 1e-9, 6) + 0.0 AS corr_qty_price,
           ROUND(covar_pop(l_quantity, l_discount) + 1e-9, 6) + 0.0 AS covar_qty_disc,
           ROUND(covar_samp(l_quantity, l_discount) + 1e-9, 6) + 0.0 AS covars_qty_disc
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and population/sample covariance per line
    status — single-pass bivariate moments (map-side partials)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            # + 0.0 after ROUND: signed-zero convention (see agg_stats_moments)
            (F.round(F.corr("l_quantity", "l_extendedprice") + 1e-9, 6) + 0.0).alias(
                "corr_qty_price"
            ),
            (F.round(F.covar_pop("l_quantity", "l_discount") + 1e-9, 6) + 0.0).alias(
                "covar_qty_disc"
            ),
            (F.round(F.covar_samp("l_quantity", "l_discount") + 1e-9, 6) + 0.0).alias(
                "covars_qty_disc"
            ),
        )
        .orderBy("l_linestatus")
    )

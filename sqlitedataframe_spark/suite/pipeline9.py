"""Round-5 wave 2: survival analysis (Kaplan-Meier), quasi-experiment
readouts (difference-in-differences, BH-FDR-corrected metric sweeps),
position-based multi-touch attribution, per-user behavioral entropy, and
per-source KL divergence from the corpus unigram distribution.

Each query pairs an idiomatic-Spark plan with a DuckDB oracle the driver
hash-compares at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


@query(
    "events_survival_km",
    oracle="""
    WITH pu AS (
      SELECT user_id, MIN(ts::date) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts::date END) AS p
      FROM events GROUP BY 1),
    e AS (SELECT MAX(ts::date) AS ed FROM events),
    subj AS (
      SELECT CASE WHEN p IS NOT NULL THEN p - t0 ELSE ed - t0 END AS t,
             CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM pu, e),
    per_t AS (SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c
              FROM subj GROUP BY 1),
    risk AS (
      SELECT a.t, SUM(b.d + b.c) AS n_risk
      FROM per_t a JOIN per_t b ON b.t >= a.t GROUP BY 1),
    evf AS (
      SELECT b.t, 1.0 - b.d * 1.0 / r.n_risk AS f
      FROM per_t b JOIN risk r USING (t) WHERE b.d > 0),
    surv AS (
      SELECT a.t, COALESCE(exp(SUM(ln(GREATEST(f, 1e-300)))), 1.0) AS s
      FROM per_t a LEFT JOIN evf ON evf.t <= a.t GROUP BY 1)
    SELECT p.t AS duration, CAST(r.n_risk AS BIGINT) AS n_risk,
           CAST(p.d AS BIGINT) AS n_events,
           CAST(p.c AS BIGINT) AS n_censored,
           ROUND(s.s + 1e-9, 6) AS survival
    FROM per_t p JOIN risk r USING (t) JOIN surv s USING (t)
    ORDER BY 1
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase curve: per user, duration =
    days from first event to first purchase (right-censored at the
    corpus end date when no purchase happened) — the honest conversion
    curve when a chunk of the population hasn't converted YET.

    operators.survival.km_curve: the fact table collapses to one
    per-user aggregate, then one duration-keyed aggregate (~30 rows);
    the at-risk counts and the product-limit survival are bounded
    triangular self-joins over that tiny frame.
    """
    from sqlitedataframe_spark.operators.survival import km_curve

    ev = T(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("_t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("_p"),
    )
    end = ev.agg(F.max(F.to_date("ts")).alias("_ed"))
    subj = pu.join(F.broadcast(end)).select(
        F.when(
            F.col("_p").isNotNull(), F.datediff("_p", "_t0")
        )
        .otherwise(F.datediff("_ed", "_t0"))
        .alias("dur"),
        F.col("_p").isNotNull().cast("int").alias("ev"),
    )
    return km_curve(subj, "dur", "ev")


@query(
    "events_did_estimate",
    oracle="""
    WITH cells AS (
      SELECT (user_id % 2) AS tr,
             CASE WHEN ts::date >= DATE '2024-01-16' THEN 1 ELSE 0 END AS po,
             COUNT(*) AS n, AVG(value) AS m, var_samp(value) AS v
      FROM events GROUP BY 1, 2),
    one AS (
      SELECT MAX(CASE WHEN tr = 0 AND po = 0 THEN m END) AS m00,
             MAX(CASE WHEN tr = 0 AND po = 1 THEN m END) AS m01,
             MAX(CASE WHEN tr = 1 AND po = 0 THEN m END) AS m10,
             MAX(CASE WHEN tr = 1 AND po = 1 THEN m END) AS m11,
             MAX(CASE WHEN tr = 0 AND po = 0 THEN v END) AS v00,
             MAX(CASE WHEN tr = 0 AND po = 1 THEN v END) AS v01,
             MAX(CASE WHEN tr = 1 AND po = 0 THEN v END) AS v10,
             MAX(CASE WHEN tr = 1 AND po = 1 THEN v END) AS v11,
             MAX(CASE WHEN tr = 0 AND po = 0 THEN n END) AS n00,
             MAX(CASE WHEN tr = 0 AND po = 1 THEN n END) AS n01,
             MAX(CASE WHEN tr = 1 AND po = 0 THEN n END) AS n10,
             MAX(CASE WHEN tr = 1 AND po = 1 THEN n END) AS n11
      FROM cells)
    SELECT ROUND(m00 + 1e-9, 4) AS mean_ctrl_pre,
           ROUND(m01 + 1e-9, 4) AS mean_ctrl_post,
           ROUND(m10 + 1e-9, 4) AS mean_treat_pre,
           ROUND(m11 + 1e-9, 4) AS mean_treat_post,
           ROUND((m11 - m10) - (m01 - m00) + 1e-9, 4) AS did,
           ROUND(sqrt(v00 / n00 + v01 / n01 + v10 / n10 + v11 / n11)
                 + 1e-9, 4) AS se,
           ROUND(((m11 - m10) - (m01 - m00))
                 / sqrt(v00 / n00 + v01 / n01 + v10 / n10 + v11 / n11)
                 + 1e-9, 4) AS t_stat,
           CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n_obs
    FROM one
    """,
)
def events_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: treatment = odd user ids,
    post-period = Jan 16 onward, metric = event value — the 2x2 cell
    means, the DiD point estimate, its independent-cells SE, and the t
    statistic.

    operators.profiling.did_estimate: ONE aggregation pass computes the
    4 cells' (n, mean, var) map-side; everything after is arithmetic on
    a 1-row pivot.
    """
    from sqlitedataframe_spark.operators.profiling import did_estimate

    ev = T(spark, sf_dir, "events")
    return did_estimate(
        ev,
        "value",
        (F.col("user_id") % 2 == 1),
        (F.to_date("ts") >= F.lit("2024-01-16").cast("date")),
    )


@query(
    "events_position_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    conv AS (
      SELECT user_id, MIN(rn) AS conv_rn FROM ordered
      WHERE event_type = 'purchase' GROUP BY 1),
    touches AS (
      SELECT o.user_id, o.event_type, o.rn, c.conv_rn - 1 AS n
      FROM ordered o JOIN conv c USING (user_id)
      WHERE o.rn < c.conv_rn),
    credited AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 THEN 0.4
                  WHEN rn = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS credit
      FROM touches)
    SELECT event_type, ROUND(SUM(credit) + 1e-9, 4) AS total_credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM credited GROUP BY 1 ORDER BY 1
    """,
)
def events_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each user's
    first conversion (purchase) distributes credit over the touches
    before it — 40% first touch, 40% last, 20% split across the middle
    (100%/50-50 for 1/2-touch paths) — summed per touch event type.

    Plan shape: one per-user ordered window (PARTITIONED by user_id —
    the key-parallel shape, never global), a user-sized conversion-rank
    join, scan-side credit arithmetic, and a #types-row aggregate.
    """
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", "event_id", F.row_number().over(w).alias("rn")
    )
    conv = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("conv_rn"))
    )
    touches = ordered.join(conv, "user_id").filter(
        F.col("rn") < F.col("conv_rn")
    ).withColumn("n", F.col("conv_rn") - 1)
    credit = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when(F.col("rn") == 1, 0.4)
        .when(F.col("rn") == F.col("n"), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        touches.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("credit") + 1e-9, 4).alias("total_credit"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
        .orderBy("event_type")
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
    u AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1),
    h AS (
      SELECT c.user_id,
             -SUM((n * 1.0 / tot) * ln(n * 1.0 / tot)) AS ent
      FROM c JOIN u USING (user_id) GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(ent) + 1e-9, 6) AS avg_entropy,
           ROUND(MIN(ent) + 1e-9, 6) AS min_entropy,
           ROUND(MAX(ent) + 1e-9, 6) AS max_entropy,
           CAST(SUM(CASE WHEN ent < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_entropy
    FROM h
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution,
    summarized corpus-wide (mean/min/max and the count of low-entropy
    users) — the bot/monoculture screen: a user who only ever fires one
    event type has entropy 0 and is usually a script.

    Plan shape: one (user, type) count aggregate, a user-sized total
    join, a user-sized entropy aggregate, then a 1-row summary — the
    fact stream crosses exactly one exchange on user_id.
    """
    ev = T(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("_n"))
    u = c.groupBy("user_id").agg(F.sum("_n").alias("_tot"))
    p = F.col("_n") / F.col("_tot")
    h = (
        c.join(u, "user_id")
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p))).alias("_ent"))
    )
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("_ent") + 1e-9, 6).alias("avg_entropy"),
        F.round(F.min("_ent") + 1e-9, 6).alias("min_entropy"),
        F.round(F.max("_ent") + 1e-9, 6).alias("max_entropy"),
        F.sum((F.col("_ent") < 1.0).cast("int"))
        .cast("bigint")
        .alias("n_low_entropy"),
    )


@query(
    "text_source_kl",
    oracle="""
    WITH t AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    sc AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
    st AS (SELECT source, SUM(n) AS tot FROM sc GROUP BY 1),
    gc AS (SELECT tok, SUM(n) AS g FROM sc GROUP BY 1),
    gt AS (SELECT SUM(n) AS gtot FROM sc)
    SELECT sc.source,
           ROUND(SUM((n * 1.0 / tot) * ln((n * 1.0 / tot)
                                          / (g * 1.0 / gtot))) + 1e-9, 6)
             AS kl_nats,
           CAST(MAX(tot) AS BIGINT) AS n_tokens
    FROM sc JOIN st USING (source) JOIN gc USING (tok), gt
    GROUP BY sc.source ORDER BY sc.source
    """,
)
def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    corpus-wide distribution — the mixture diagnostic that ranks which
    feeds are most "off-distribution" before weighting them (high-KL
    sources get down- or up-weighted deliberately, not by accident).

    Plan shape: one (source, token) count aggregate from the exploded
    scan; source totals and the global token distribution are
    source-sized / vocab-sized broadcasts back onto that count table —
    text itself never shuffles, only (token, count) pairs.
    """
    from sqlitedataframe_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents")
    sc = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    st = sc.groupBy("source").agg(F.sum("_n").alias("_tot"))
    gc = sc.groupBy("tok").agg(F.sum("_n").alias("_g"))
    gt = sc.agg(F.sum("_n").alias("_gtot"))
    ps = F.col("_n") / F.col("_tot")
    pg = F.col("_g") / F.col("_gtot")
    return (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(gc), "tok")
        .join(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.round(F.sum(ps * F.log(ps / pg)) + 1e-9, 6).alias("kl_nats"),
            F.max("_tot").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source")
    )


from sqlitedataframe_spark.operators.profiling import NORMAL_SF_SQL

_Z_SQL = (
    "((ma - mb) / sqrt(va / na + vb / nb))"
)

@query(
    "events_ab_fdr",
    oracle=f"""
    WITH s AS (
      SELECT event_type, (user_id % 2) AS arm, COUNT(*) AS n,
             AVG(value) AS m, var_samp(value) AS v
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT a.event_type,
             a.n AS na, a.m AS ma, a.v AS va,
             b.n AS nb, b.m AS mb, b.v AS vb
      FROM (SELECT * FROM s WHERE arm = 0) a
      JOIN (SELECT * FROM s WHERE arm = 1) b USING (event_type)),
    p AS (
      SELECT event_type AS test,
             {NORMAL_SF_SQL.format(z=_Z_SQL)} AS pv
      FROM w),
    ranked AS (
      SELECT test, pv,
             row_number() OVER (ORDER BY pv, test) AS rk,
             COUNT(*) OVER () AS m
      FROM p),
    cut AS (
      SELECT MAX(CASE WHEN pv <= rk * 0.10 / m THEN rk END) AS kstar
      FROM ranked)
    SELECT test, ROUND(pv + 1e-9, 6) AS p_value,
           CAST(rk AS BIGINT) AS p_rank,
           ROUND(rk * 0.10 / m + 1e-9, 6) AS bh_threshold,
           CAST(CASE WHEN kstar IS NOT NULL AND rk <= kstar
                     THEN 1 ELSE 0 END AS INT) AS rejected
    FROM ranked, cut ORDER BY p_rank
    """,
)
def events_ab_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg-corrected A/B sweep: Welch z-test of the
    value metric between arms (odd vs even user ids) PER event type,
    two-sided normal p-values (A&S erf polynomial — identical
    arithmetic both engines), then the BH step-up over the 5 tests at
    q=0.10 — the honest version of "which segments moved".

    operators.profiling.bh_fdr: the fact stream reduces to a
    (type, arm) moment table in one pass; p-values and the BH
    rank/threshold machinery are bounded self-joins over the
    tests-sized frame.
    """
    from sqlitedataframe_spark.operators.profiling import (
        bh_fdr,
        normal_sf_twosided,
    )

    ev = T(spark, sf_dir, "events")
    s = (
        ev.select(
            "event_type",
            (F.col("user_id") % 2).alias("_arm"),
            F.col("value").alias("_v"),
        )
        .groupBy("event_type", "_arm")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg("_v").alias("_m"),
            F.var_samp("_v").alias("_var"),
        )
    )
    a = s.filter(F.col("_arm") == 0).select(
        "event_type",
        F.col("_n").alias("na"), F.col("_m").alias("ma"),
        F.col("_var").alias("va"),
    )
    b = s.filter(F.col("_arm") == 1).select(
        "event_type",
        F.col("_n").alias("nb"), F.col("_m").alias("mb"),
        F.col("_var").alias("vb"),
    )
    z = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    pv = a.join(b, "event_type").select(
        "event_type", normal_sf_twosided(z).alias("pv")
    )
    return bh_fdr(pv, "event_type", "pv", q=0.10)


@query(
    "agg_percentile_disc",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS g, l_quantity AS q, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2),
    cum AS (
      SELECT g, q,
             SUM(n) OVER (PARTITION BY g ORDER BY q) AS cw,
             SUM(n) OVER (PARTITION BY g) AS tot
      FROM c)
    SELECT g AS l_returnflag,
           ROUND(MIN(CASE WHEN cw >= CEIL(0.25 * tot) THEN q END)
                 + 1e-9, 2) AS p25_qty,
           ROUND(MIN(CASE WHEN cw >= CEIL(0.50 * tot) THEN q END)
                 + 1e-9, 2) AS p50_qty,
           ROUND(MIN(CASE WHEN cw >= CEIL(0.75 * tot) THEN q END)
                 + 1e-9, 2) AS p75_qty,
           ROUND(MIN(CASE WHEN cw >= CEIL(0.90 * tot) THEN q END)
                 + 1e-9, 2) AS p90_qty
    FROM cum GROUP BY g ORDER BY g
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE (type-1, no interpolation) per-group percentiles of
    line quantity — the SQL-standard PERCENTILE_DISC ("first value
    whose cumulative weight reaches p"), which Spark lacks as a
    builtin; the complement of agg_percentile_exact's interpolated
    form, and the right choice when the value domain is discrete
    (counts, grades) and an interpolated 37.5 is meaningless.

    Plan shape: one (group, value) count aggregate collapses the fact
    table to ~#distinct-values rows per group; the cumulative weights
    run in a PARTITIONED (per-group) window over that tiny frame —
    the same two-level shape as weighted_median, never a global sort.
    """
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("q")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("g").orderBy("q")
    cum = c.select(
        "g", "q",
        F.sum("n").over(w).alias("cw"),
        F.sum("n").over(Window.partitionBy("g")).alias("tot"),
    )

    def disc(p: float, alias: str):
        return F.round(
            F.min(
                F.when(F.col("cw") >= F.ceil(F.lit(p) * F.col("tot")), F.col("q"))
            )
            + 1e-9,
            2,
        ).alias(alias)

    return (
        cum.groupBy(F.col("g").alias("l_returnflag"))
        .agg(
            disc(0.25, "p25_qty"), disc(0.50, "p50_qty"),
            disc(0.75, "p75_qty"), disc(0.90, "p90_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "orders_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             o_orderdate::date - lag(o_orderdate::date) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS gap
      FROM orders),
    gaps AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL),
    nc AS (SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
           ROUND(COUNT(DISTINCT o_custkey) * 1.0 / MAX(nc.n_cust) + 1e-9, 6)
             AS repeat_rate,
           ROUND(AVG(gap) + 1e-9, 4) AS avg_gap_days,
           ROUND(quantile_cont(gap, 0.5) + 1e-9, 4) AS p50_gap_days,
           ROUND(quantile_cont(gap, 0.9) + 1e-9, 4) AS p90_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM gaps, nc
    """,
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer repeat-purchase cadence: the distribution of day gaps
    between a customer's consecutive orders (mean/median/p90/max), the
    repeat-customer count, and the repeat rate — the input to both LTV
    models and churn-definition choices ("inactive = 3x the p90 gap").

    Plan shape: one per-customer ordered window (PARTITIONED by
    customer — key-parallel), then a 1-row summary aggregate over the
    gap rows; the customer-count denominator rides in as a 1-row
    broadcast.
    """
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    nc = o.agg(F.count_distinct("o_custkey").alias("n_cust"))
    return gaps.join(F.broadcast(nc)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.count_distinct("o_custkey").cast("bigint").alias(
            "n_repeat_customers"
        ),
        F.round(
            F.count_distinct("o_custkey") / F.max("n_cust") + 1e-9, 6
        ).alias("repeat_rate"),
        F.round(F.avg("gap") + 1e-9, 4).alias("avg_gap_days"),
        F.round(F.percentile("gap", F.lit(0.5)) + 1e-9, 4).alias(
            "p50_gap_days"
        ),
        F.round(F.percentile("gap", F.lit(0.9)) + 1e-9, 4).alias(
            "p90_gap_days"
        ),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )


@query(
    "profile_join_skew",
    oracle="""
    WITH c1 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem
                GROUP BY 1),
    s1 AS (
      SELECT 'lineitem.l_orderkey' AS relation,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_rows,
             quantile_cont(c, 0.5) AS p50, quantile_cont(c, 0.99) AS p99
      FROM c1),
    c2 AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
    s2 AS (
      SELECT 'events.user_id' AS relation,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_rows,
             quantile_cont(c, 0.5) AS p50, quantile_cont(c, 0.99) AS p99
      FROM c2),
    u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
    SELECT relation, n_keys, n_rows, max_key_rows,
           ROUND(max_key_rows * 1.0 / n_rows + 1e-9, 6) AS max_share,
           ROUND(p99 / p50 + 1e-9, 4) AS p99_over_p50,
           CAST(CEIL(max_key_rows / p50) AS BIGINT) AS suggested_salt
    FROM u ORDER BY relation
    """,
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic for the two hottest join keys in the
    fixture (order line fan-out, per-user event fan-out): heaviest-key
    share, p99/p50 key-size ratio, and the salt factor that would level
    the heaviest key to the median — the pre-flight check that decides
    between plain shuffle, AQE skew join, and explicit salting
    (operators.skew).

    operators.profiling.key_skew_profile: one key-sized count aggregate
    per relation, a 1-row stats aggregate over it; the fact tables are
    scanned once and never re-shuffled.
    """
    from sqlitedataframe_spark.operators.profiling import key_skew_profile

    return key_skew_profile(
        [
            ("events.user_id", T(spark, sf_dir, "events"), "user_id"),
            ("lineitem.l_orderkey", T(spark, sf_dir, "lineitem"),
             "l_orderkey"),
        ]
    )


@query(
    "embed_centroid_distances",
    oracle="""
    WITH cen AS (
      SELECT label, pos, AVG(v) AS c
      FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
      GROUP BY label, pos)
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(SUM(a.c * b.c)
                 / (sqrt(SUM(a.c * a.c)) * sqrt(SUM(b.c * b.c)))
                 + 1e-9, 6) AS cos_sim,
           ROUND(sqrt(SUM((a.c - b.c) * (a.c - b.c))) + 1e-9, 6) AS l2_dist
    FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def embed_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine/L2 distance matrix between label centroids —
    the class-geometry diagnostic behind embedding-model QA (which
    labels are near-collisions?) and hard-negative label pairing.

    Plan shape: the data-sized work is the one posexplode centroid
    aggregate (labels x dims rows — tens); the pair matrix is a
    dim-keyed self-join over that tiny frame, output labels^2/2 rows.
    """
    e = T(spark, sf_dir, "embeddings")
    cen = (
        e.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
            .alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
    )
    a = cen.select(
        F.col("label").alias("label_a"), "pos", F.col("c").alias("ca")
    )
    b = cen.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("c").alias("cb"),
    )
    return (
        a.join(
            b,
            (F.col("pos") == F.col("pos_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                )
                + 1e-9,
                6,
            ).alias("cos_sim"),
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("ca") - F.col("cb"))
                        * (F.col("ca") - F.col("cb"))
                    )
                )
                + 1e-9,
                6,
            ).alias("l2_dist"),
        )
        .orderBy("label_a", "label_b")
    )


@query(
    "orders_theil_sen_trend",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(year FROM o_orderdate) * 12
               + EXTRACT(month FROM o_orderdate) AS idx,
             ROUND(SUM(o_totalprice) + 1e-9, 2) AS rev
      FROM orders GROUP BY 1),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.idx - a.idx) AS s
      FROM m a JOIN m b ON b.idx > a.idx)
    SELECT ROUND(quantile_cont(s, 0.5) + 1e-9, 2) + 0.0 AS ts_slope,
           CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_months,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM slopes
    """,
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the median of all
    pairwise month-to-month slopes — immune to the single blowout or
    crash month that drags an OLS slope (grouped_log_log_slope's
    complement for level series).

    Plan shape: the fact table collapses to one monthly aggregate
    (#months rows); the slope set is the months^2/2 triangular
    self-join over that tiny frame (~700 pairs for 3 years) and the
    median is one exact-percentile aggregate. Monthly revenues are
    rounded to cents BEFORE the slopes on both engines so
    parallel-summation ulp drift cannot reorder near-equal slopes
    around the median cut.
    """
    o = T(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("idx")
    ).agg(F.round(F.sum("o_totalprice") + 1e-9, 2).alias("rev"))
    a = m.select(F.col("idx").alias("ia"), F.col("rev").alias("ra"))
    b = m.select(F.col("idx").alias("ib"), F.col("rev").alias("rb"))
    slopes = a.join(b, F.col("ib") > F.col("ia")).select(
        ((F.col("rb") - F.col("ra")) / (F.col("ib") - F.col("ia"))).alias("s")
    )
    nm = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return slopes.join(F.broadcast(nm)).agg(
        # + 0.0: signed-zero convention (slope can be a tiny negative)
        (F.round(F.percentile("s", F.lit(0.5)) + 1e-9, 2) + 0.0).alias("ts_slope"),
        F.max("n_months").alias("n_months"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )

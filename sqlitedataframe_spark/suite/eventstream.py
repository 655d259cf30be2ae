"""Event-stream queries in batch form: JSON extraction, tumbling/sliding
windows, sessionization. The true Structured Streaming versions (readStream,
watermarks, session_window, stateful dedup) live in
``sqlitedataframe_spark.streaming`` and are exercised by tests; these batch
twins give the gate a DuckDB oracle for the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.relational import sessionize
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


@query(
    "events_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(value) + 1e-9, 4) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (SQLite json_extract surface) + aggregation."""
    e = T(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("value") + 1e-9, 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_json_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_high,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_high_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType JSON path: ``parse_json`` ONCE per row, then
    ``variant_get`` extractions and predicates operate on the binary
    variant encoding — the scale-right upgrade over repeated
    ``get_json_object`` calls, each of which re-parses the JSON text
    (SURVEY §2 Tier B JSON row: "VariantType in Spark 4")."""
    e = T(spark, sf_dir, "events")
    v = e.withColumn("v", F.parse_json("props")).withColumn(
        "k", F.variant_get("v", "$.k", "bigint")
    )
    return (
        v.filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.sum("k").alias("sum_high_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_window_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows via Spark's window() — identical semantics to
    the streaming groupBy(window(...)) plan."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_window_sliding",
    oracle="""
    WITH w AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 * 1000000 AS BIGINT))         AS ws, value FROM events
      UNION ALL
      SELECT make_timestamp(CAST((floor(epoch(ts) / 300) * 300 - 300) * 1000000 AS BIGINT)) AS ws, value FROM events
    )
    SELECT ws AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM w
    GROUP BY ws
    ORDER BY ws
    """,
)
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event lands in two
    windows; Spark's window() explodes them exactly like the oracle's UNION."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT)
                       > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via operators.sessionize."""
    e = T(spark, sf_dir, "events")
    return (
        sessionize(e, "user_id", "ts", gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_sec"
            ),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_enrich_join",
    oracle="""
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
    """,
)
def events_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-table enrichment join (events x customer dimension)."""
    e = T(spark, sf_dir, "events")
    c = T(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


# ---------------------------------------------------------------------------
# Funnel analysis: strictly-ordered view -> click -> purchase progression
# per user. Each stage is a min-timestamp aggregate over events after the
# previous stage's timestamp — three user_id-keyed joins, co-partitioned.
# ---------------------------------------------------------------------------
@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT v.user_id,
           CAST(floor(epoch(v.t_view)) AS BIGINT) AS view_s,
           CAST(floor(epoch(c.t_click)) AS BIGINT) AS click_s,
           CAST(floor(epoch(p.t_purchase)) AS BIGINT) AS purchase_s,
           CAST(1 + CAST(c.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS stage
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    ORDER BY user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel progression (first view, first click after it,
    first purchase after that) with the reached stage 1-3. All three
    stage frames key on user_id, so the joins co-partition on one
    exchange lineage; event-type filters push to the scan."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_timestamp("t_view").alias("view_s"),
            F.unix_timestamp("t_click").alias("click_s"),
            F.unix_timestamp("t_purchase").alias("purchase_s"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).cast("int").alias("stage"),
        )
        .orderBy("user_id")
    )
    return out

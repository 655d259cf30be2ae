"""Structured Streaming suite queries: each runs a real readStream →
transform → writeStream pipeline to completion (Trigger.AvailableNow,
memory sink) and returns the result, so the DuckDB oracle checks
batch-equivalence of the incremental plan — the defining correctness
property of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark import streaming as STR
from sqlitedataframe_spark.streaming import (
    read_events_stream,
    run_available_now,
    stateful_sessionize,
    stream_dedup,
    stream_sliding_counts,
    stream_tumbling_counts,
)
from sqlitedataframe_spark.streaming.core import stream_stream_attribution
from sqlitedataframe_spark.suite import query

#: Shared session-boundary oracle CTE (30-min inactivity gap per user).
_SESSION_CTE = """
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
"""


@query(
    "stream_window_tumbling",
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
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked 1-hour tumbling windows, run to completion via
    AvailableNow — must equal the batch/DuckDB result over the same files."""
    s = stream_tumbling_counts(read_events_stream(spark, sf_dir))
    return run_available_now(s, output_mode="complete").orderBy("window_start", "event_type")


@query(
    "stream_window_sliding",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/300) AS BIGINT)*300 - 300*g)
                AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS g) t
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked 10-min/5-min sliding windows run to
    completion — every event lands in exactly two windows (window = 2x
    slide), which is what the oracle's two-bucket expansion computes."""
    s = stream_sliding_counts(read_events_stream(spark, sf_dir))
    return run_available_now(s, output_mode="complete").orderBy("window_start")


@query(
    "stream_session_window",
    oracle=_SESSION_CTE
    + """
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming native session_window (30-min gap) per user — equals the
    batch LAG+cumsum sessionization the oracle computes."""
    s = STR.stream_session_window(read_events_stream(spark, sf_dir))
    return run_available_now(s, output_mode="complete").orderBy("user_id", "session_start")


@query(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
    FROM events
    ORDER BY user_id, event_type, ts
    """,
)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup (watermark-bounded state): first arrival per
    (user_id, event_type, ts) wins; output = the distinct key set."""
    s = stream_dedup(read_events_stream(spark, sf_dir), ["user_id", "event_type"])
    return run_available_now(s, output_mode="append").orderBy("user_id", "event_type", "ts")


@query(
    "stream_stream_join",
    oracle="""
    SELECT a.event_id AS conv_id, a.user_id,
           CAST(a.ts AS TIMESTAMP) AS conv_ts,
           b.event_id AS attr_id,
           CAST(b.ts AS TIMESTAMP) AS attr_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'click'
     AND b.ts BETWEEN a.ts - INTERVAL 30 MINUTE AND a.ts
    ORDER BY conv_id, attr_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream attribution join (purchase <- clicks in the
    prior 30 min), run to completion — equals the batch time-range join."""
    s = stream_stream_attribution(read_events_stream(spark, sf_dir))
    return run_available_now(s, output_mode="append").orderBy("conv_id", "attr_id")


@query(
    "stream_stateful_sessionize",
    oracle=_SESSION_CTE
    + """
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           CAST(COUNT(*) AS INT) AS n_events
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) sessionizing the
    stream with explicit per-user state; update-mode re-emits are folded to
    the latest row per session, which over a complete replay equals batch
    sessionization."""
    s = stateful_sessionize(read_events_stream(spark, sf_dir))
    out = run_available_now(s, output_mode="update")
    # latest re-emit per (user, session_start) wins (update-mode contract)
    return (
        out.groupBy("user_id", "session_start")
        .agg(F.max("session_end").alias("session_end"), F.max("n_events").alias("n_events"))
        .orderBy("user_id", "session_start")
    )


@query(
    "stream_quality_ingest",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS DOUBLE) AS n_char
      FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             LEAST(n_char / 200.0, 1.0) AS len_score,
             CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
               / len(toks) AS sw_ratio,
             CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
               / n_char AS punct_ratio
      FROM t
    ),
    scored AS (
      SELECT doc_id, lang,
             ROUND((len_score + LEAST(sw_ratio * 4, 1.0)
                    + GREATEST(0.0, 1.0 - punct_ratio * 5)) / 3, 6) AS quality
      FROM feats
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality), 6) AS avg_quality
    FROM scored WHERE quality >= 0.5
    GROUP BY lang ORDER BY lang
    """,
)
def stream_quality_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingest with a quality gate: documents stream in,
    each micro-batch is scored map-side (operators.text.quality_score —
    the same expression the batch path uses), low-quality docs are
    dropped before they ever reach an aggregation, and the running
    per-language mixture report updates incrementally (complete mode).

    This is the continuous-ingestion pattern of a training-data pipeline
    — filter at the edge, aggregate the survivors — and the oracle checks
    the defining property: the incremental result equals the one-shot
    batch/DuckDB result over the same files.
    """
    from sqlitedataframe_spark.operators.text import quality_score
    from sqlitedataframe_spark.streaming.core import read_table_stream

    s = read_table_stream(spark, sf_dir, "documents")
    scored = s.select("lang", quality_score("text").alias("quality")).filter(
        F.col("quality") >= 0.5
    )
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )
    return run_available_now(agg, output_mode="complete").orderBy("lang")

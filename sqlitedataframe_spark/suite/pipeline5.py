"""Round-4 additions: substring-span dedup, corpus n-gram top-k, SCD2
dimension history, MAD-based robust anomaly detection.

Like every suite module, each query pairs an idiomatic-Spark plan with a
DuckDB oracle the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators import profiling as P
from sqlitedataframe_spark.operators import relational as R
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Substring-level duplicate spans (ExactSubstr shingle approximation).
# ---------------------------------------------------------------------------
@query(
    "dedup_substring_spans",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
    sh AS (
      SELECT doc_id, i AS pos, md5(substr(text, i, 30)) AS h
      FROM d, UNNEST(generate_series(1, length(text) - 29, 10)) AS r(i)),
    dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM sh JOIN dup USING (h)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 30-char spans (stride 10) shared across >= 2 documents:
    the shingle approximation of suffix-array ExactSubstr dedup.

    operators.dedup.substring_span_stats: windows expand map-side
    (sequence + substr, scan-stage expressions); only (id, pos, digest)
    rows shuffle — never text.
    """
    return D.substring_span_stats(
        T(spark, sf_dir, "documents"), k=30, stride=10, min_docs=2
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus-wide most frequent n-grams (boilerplate radar / vocab counting).
# ---------------------------------------------------------------------------
@query(
    "text_ngram_topk",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT array_to_string(t[i:i+2], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS r(i))
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 50
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus-wide word trigrams by occurrence count (ties broken
    on the gram text so both engines keep the same row set).

    operators.text.frequent_ngrams: map-side gram expansion, one partial-
    combined count aggregate, TakeOrderedAndProject top-k — no full sort.
    """
    return X.frequent_ngrams(T(spark, sf_dir, "documents"), n=3, k=50)


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history over orders.
# ---------------------------------------------------------------------------
@query(
    "scd2_order_history",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             LAG(o_orderpriority) OVER w AS prev_p,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    chg AS (
      SELECT * FROM o WHERE rn = 1 OR prev_p IS DISTINCT FROM o_orderpriority)
    SELECT o_custkey,
           o_orderpriority AS priority,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to,
           (LEAD(o_orderdate) OVER w2 IS NULL) AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, version
    """,
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's order priority: consecutive
    unchanged-priority orders collapse, survivors get versioned
    [valid_from, valid_to) intervals.

    operators.relational.scd2_history: one shuffle on o_custkey; the
    change-detect and re-version windows share the partitioning, so the
    second window plans without a new exchange.
    """
    o = T(spark, sf_dir, "orders")
    return (
        R.scd2_history(
            o.select("o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"),
            key_cols=["o_custkey"],
            order_col="o_orderdate",
            attr_cols=["o_orderpriority"],
            tiebreak_col="o_orderkey",
        )
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("priority"),
            "version",
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("o_custkey", "version")
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection: MAD outliers per event type.
# ---------------------------------------------------------------------------
@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, median(abs(e.value - med.m)) AS mad
      FROM events e JOIN med USING (event_type) GROUP BY e.event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND(abs(e.value - med.m) / NULLIF(mad.mad, 0), 4) AS mad_score
    FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
    WHERE abs(e.value - med.m) > 5 * mad.mad
    ORDER BY e.event_id
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates from their type's median by more than
    5 MADs — the robust (outlier-immune) anomaly screen.

    operators.profiling.mad_outliers: two tiny per-type aggregates
    broadcast back; the event stream is scanned, never shuffled. exact=True
    here for the bit-exact oracle; exact=False swaps in the mergeable
    approx-percentile sketch for unbounded groups.
    """
    return P.mad_outliers(
        T(spark, sf_dir, "events"),
        group_col="event_type",
        value_col="value",
        id_cols=["event_id"],
        thresh=5.0,
    ).orderBy("event_id")

"""Bridge queries: data flows through the SQLite source/sink (Tier A) and
back into Spark, proving read/write parity inside the correctness gate.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.functions.sql_rewrite import sqlite_sql
from sqlitedataframe_spark.io import register_views
from sqlitedataframe_spark.sources.sqlite import read_sql, write_sql
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


@query(
    "sqlite_roundtrip",
    oracle="""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def sqlite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation+region take a full trip through the SQLite bridge (write_sql
    with replace policy, read_sql table scan + SQL-statement scan), then the
    join/agg runs in Spark. Values must be byte-identical to reading the
    parquet directly — the reference's write->read equality test shape
    (SQLiteDataFrameTests.swift:175-198) under the oracle gate."""
    db = os.path.join(tempfile.gettempdir(), "sdfspark_bridge.db")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    write_sql(nation, db, table="nation_rt", if_exists="replace")
    write_sql(region, db, table="region_rt", if_exists="replace")

    n = read_sql(spark, db, table="nation_rt", types={"n_nationkey": "int", "n_regionkey": "int"})
    r = read_sql(
        spark,
        db,
        statement="SELECT r_regionkey, r_name FROM region_rt",
        types={"r_regionkey": "int", "r_name": "text"},
    )
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .orderBy("r_name")
    )


@query(
    "sqlite_dialect_sql",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS names,
           strftime(MIN(o_min), '%Y-%m') AS first_month
    FROM nation
    JOIN (SELECT o_custkey % 25 AS nk, MIN(o_orderdate) AS o_min
          FROM orders GROUP BY 1) o ON nk = n_nationkey
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def sqlite_dialect_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQLite-dialect SQL string (group_concat, strftime) executed through
    the string-level rewriter — the reference's arbitrary-SQL pass-through
    entry point (A2, SQLiteDataFrame.swift:295-304) running natively on
    Spark SQL."""
    register_views(spark, sf_dir, ["nation", "orders"])
    return sqlite_sql(
        spark,
        """
        SELECT n_regionkey,
               group_concat(n_name, '|') AS names,
               strftime('%Y-%m', MIN(o_min)) AS first_month
        FROM nation
        JOIN (SELECT o_custkey % 25 AS nk, MIN(o_orderdate) AS o_min
              FROM orders GROUP BY 1) o ON nk = n_nationkey
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """,
    )


@query(
    "sqlite_dialect_sql2",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS state,
           chr(ascii(o_orderstatus)) AS status_letter,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COALESCE(SUM(CAST(o_totalprice AS DOUBLE)), 0.0) + 1e-9, 2)
             AS revenue,
           strftime(date_trunc('month', CAST(MIN(o_orderdate) AS TIMESTAMP)),
                    '%Y-%m-%d') AS first_month,
           strftime(CAST(MAX(o_orderdate) AS TIMESTAMP) + INTERVAL 7 DAY,
                    '%Y-%m-%d %H:%M:%S') AS week_after_last,
           GREATEST(MIN(o_custkey), 100) AS floor_cust
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, state, status_letter
    """,
)
def sqlite_dialect_sql2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 dialect coverage through the string rewriter: iif, total(),
    char()/unicode(), scalar max(), and date()/datetime() with modifiers
    ('start of month', '+7 days') — all running natively on spark.sql."""
    register_views(spark, sf_dir, ["orders"])
    return sqlite_sql(
        spark,
        """
        SELECT o_orderpriority,
               iif(o_orderstatus = 'F', 'done', 'open') AS state,
               char(unicode(o_orderstatus)) AS status_letter,
               COUNT(*) AS n,
               ROUND(total(o_totalprice) + 1e-9, 2) AS revenue,
               date(MIN(o_orderdate), 'start of month') AS first_month,
               datetime(MAX(o_orderdate), '+7 days') AS week_after_last,
               max(MIN(o_custkey), 100) AS floor_cust
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
        ORDER BY o_orderpriority, state, status_letter
        """,
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink parity (Tier C csvRepresentation round-trip,
    SQLiteDataFrameTests.swift:105, as a distributed source): orders is
    written to CSV with header + explicit timestamp format and read back
    with an EXPLICIT schema (never inferSchema at scale — schema inference
    is an extra full pass over 100 TB), then aggregated. Values must match
    the parquet original exactly."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_orders_csv")
    o = T(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    o.write.mode("overwrite").option("header", True).option(
        "timestampFormat", fmt
    ).csv(out)
    back = (
        spark.read.schema(o.schema)
        .option("header", True)
        .option("timestampFormat", fmt)
        .csv(out)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value) + 1e-9, 2) AS value_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink parity: events round-trips through
    newline-delimited JSON (the interchange format of most ingestion
    pipelines) with an explicit schema on read, then aggregates must match
    the parquet original. Timestamps carried as ISO-8601 strings with
    microsecond precision."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_events_json")
    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_iso"),
    )
    e.write.mode("overwrite").json(out)
    back = spark.read.schema(e.schema).json(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + 1e-9, 2).alias("value_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink parity: the second columnar format Spark ships
    natively (predicate pushdown + column pruning apply exactly as for
    parquet). Orders round-trips through ORC and must aggregate to the
    parquet original's values."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_orders_orc")
    o = T(spark, sf_dir, "orders")
    o.write.mode("overwrite").orc(out)
    back = spark.read.schema(o.schema).orc(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "source_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-file ingestion via Spark's ``binaryFile`` source — THE
    pattern for reading raw media (images/audio/video) off object storage
    at 100 TB: each file becomes one (path, length, content) row, files
    split across tasks by count, and the binary column stays opaque
    through the plan (feeds the multimodal mapInPandas stages). Fixture
    setup materializes one file per document; the measured pattern is the
    distributed read + metadata extraction, verified byte-exactly via
    content md5 against the source table."""
    import shutil

    out = os.path.join(
        tempfile.gettempdir(), f"sdfspark_bin_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    for r in d.select("doc_id", "text").collect():
        with open(os.path.join(out, f"{r.doc_id:08d}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"(\d+)", 1
        )
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    ).orderBy("doc_id")


@query(
    "source_text_gz",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(len(string_split(line, ' '))) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id || CHR(9) || lower(trim(text)) AS line FROM documents)
    """,
)
def source_text_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text corpus ingestion: documents are exported as gzip-compressed
    tab-separated text lines (the classic one-doc-per-line corpus layout)
    and re-ingested with spark.read.text — gzip is NOT splittable, so at
    100 TB one .gz file = one task; the export writes many files
    (partition-parallel) precisely so the read side parallelizes by file
    count. Tokens are then counted over the re-read lines."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_docs_txt")
    d = T(spark, sf_dir, "documents")
    lines = d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.lower(F.trim("text"))).alias(
            "value"
        )
    )
    lines.write.mode("overwrite").option("compression", "gzip").text(out)
    back = spark.read.text(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.size(F.split(F.col("value"), " "))).alias("n_tokens"),
    )


@query(
    "source_partitioned_pruning",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: orders written partitionBy(
    o_orderpriority), then read with a partition-key filter — the scan
    touches ONLY the matching directory (PartitionFilters, asserted in
    tests/test_plans.py::test_partition_pruning). At 100 TB this is
    the difference between listing one partition and scanning the lake."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_orders_part")
    o = T(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "source_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS n_with_priority,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS total
    FROM (
      SELECT o_orderstatus, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on plain parquet: an early batch written WITHOUT
    ``o_orderpriority`` and a later batch WITH it land in the same
    directory; ``mergeSchema`` reconciles the footers and the old rows
    surface the new column as NULL — exactly how a long-lived ingestion
    path picks up new fields without rewriting history.

    Scale note: mergeSchema reads every file footer at planning time — fine
    per-ingestion-batch, but at lake scale keep the canonical schema in a
    catalog and pass it explicitly (``spark.read.schema(...)``) instead of
    re-deriving it from 10^6 footers on every read."""
    out = os.path.join(tempfile.gettempdir(), "sdfspark_orders_evo")
    o = T(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(out)
    v2.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink parity (built into Spark 4): the interchange format
    enterprise feeds still arrive in. Documents round-trip through
    row-tagged XML with an EXPLICIT read schema — schema inference over
    XML costs a second full scan and guesses types, the same reason the
    CSV query pins its schema — and must aggregate to the parquet
    original's values. Text content survives entity-escaping byte-exactly
    (the aggregate covers n_chars for every row).
    """
    out = os.path.join(tempfile.gettempdir(), "sdfspark_docs_xml")
    d = T(spark, sf_dir, "documents")
    d.write.mode("overwrite").format("xml").option("rowTag", "doc").save(out)
    back = (
        spark.read.schema(d.schema)
        .format("xml")
        .option("rowTag", "doc")
        .load(out)
    )
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang", "source")
    )

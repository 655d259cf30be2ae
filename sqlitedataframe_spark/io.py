"""Fixture-table IO: parquet star schema used by the gate and bench.

Scale note: plain ``spark.read.parquet`` keeps every Catalyst optimization
live — column pruning and predicate pushdown reach the parquet scan, and
file-level partitioning parallelizes across executors. Never pre-collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS): read as long nanos (see
    # session.tune) and truncate to microsecond timestamps, matching how
    # engines without a nanos type (DuckDB included) view the column.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    # Route through load_table so normalizations (events ts nanos ->
    # microsecond timestamp) apply identically on every entry point — SQL
    # views and DataFrame callers must see the same types.
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries (the
    reference's pass-through surface, SURVEY §2 Tier B) can address them."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)

"""Tier-C host-DataFrame surface (SURVEY §2 Tier C): the TabularData
operations the reference's tests rely on — construct from rows, append,
shape, equality, CSV round-trip, pretty-print — as thin Spark idioms.

These exist so a reference user has a 1:1 target for every call site;
each is the documented Spark equivalent, not a new abstraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """Construct a DataFrame from typed rows (TabularData column-init
    equivalent, SQLiteDataFrameTests.swift:97-102)."""
    return spark.createDataFrame(rows, schema)


def append_row(df: DataFrame, row: tuple) -> DataFrame:
    """Append one row (tests :103-104). O(1) plan growth — the union is
    lazy; do not loop this per-row at scale (build a frame and union once)."""
    return df.union(df.sparkSession.createDataFrame([row], df.schema))


def shape(df: DataFrame) -> tuple[int, int]:
    """(n_rows, n_cols) — tests :110, :194-195. Triggers one count job."""
    return (df.count(), len(df.columns))


def frames_equal(a: DataFrame, b: DataFrame) -> bool:
    """Multiset row equality + same column names/types (tests :196).
    Distributed: two exceptAll anti-joins, no collect."""
    if [(f.name, f.dataType) for f in a.schema.fields] != [
        (f.name, f.dataType) for f in b.schema.fields
    ]:
        return False
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def to_csv(df: DataFrame, path: str) -> None:
    """CSV encode (csvRepresentation, tests :105): header + standard
    quoting; one file per partition at scale."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def from_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV decode; pass the original schema for a lossless round-trip
    (header-only inference would widen everything to string)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def show_str(df: DataFrame, n: int = 20) -> str:
    """Pretty-print to a string (print(dataFrame) equivalent)."""
    return df._show_string(n, 0, False)

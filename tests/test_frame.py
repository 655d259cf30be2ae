"""Tier-C frame-surface tests: append / shape / equality / CSV round-trip —
the remaining reference test shapes (SQLiteDataFrameTests.swift:96-111,
175-198).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import types as ST

from sqlitedataframe_spark.frame import (
    append_row,
    frames_equal,
    from_csv,
    from_rows,
    shape,
    show_str,
    to_csv,
)

SCHEMA = ST.StructType(
    [
        ST.StructField("name", ST.StringType()),
        ST.StructField("n", ST.LongType()),
        ST.StructField("ok", ST.BooleanType()),
    ]
)


def test_from_rows_append_shape(spark):
    df = from_rows(spark, [("a", 1, True), ("b", 2, False)], SCHEMA)
    assert shape(df) == (2, 3)
    df2 = append_row(df, ("c", 3, True))
    assert shape(df2) == (3, 3)


def test_frames_equal(spark):
    df = from_rows(spark, [("a", 1, True), ("b", 2, False)], SCHEMA)
    same_reordered = from_rows(spark, [("b", 2, False), ("a", 1, True)], SCHEMA)
    assert frames_equal(df, same_reordered)  # multiset, order-insensitive
    assert not frames_equal(df, append_row(df, ("a", 1, True)))  # multiplicity
    other_schema = from_rows(
        spark, [("a", 1), ("b", 2)], "name string, n int"
    )
    assert not frames_equal(df.select("name", "n"), other_schema)  # type diff


def test_csv_roundtrip(spark):
    df = from_rows(spark, [("a,b", 1, True), ('q"x', 2, False)], SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        to_csv(df, f"{d}/out")
        back = from_csv(spark, f"{d}/out", SCHEMA)
        assert frames_equal(df, back)


def test_show_str(spark):
    df = from_rows(spark, [("a", 1, True)], SCHEMA)
    s = show_str(df)
    assert "name" in s and "a" in s

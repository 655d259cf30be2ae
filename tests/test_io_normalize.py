"""Version-drift guard for the fixture-type normalization boundary.

The events fixture's parquet TIMESTAMP(NANOS) column surfaces differently
across Spark builds (bigint nanos under honored nanosAsLong; timestamp_ntz
on Spark 4.1.2 where the flag is ignored; plain timestamp on builds that
map nanos natively). ``io.normalize`` is the single place all three
converge to microsecond ``timestamp`` — these tests pin that contract for
both the batch and streaming readers, on synthetic frames of each input
dtype AND on the real fixture.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlitedataframe_spark.io import load_table, normalize
from sqlitedataframe_spark.streaming.core import read_events_stream

# one instant, three physical encodings
_UTC_2021 = datetime.datetime(2021, 6, 1, 12, 30, 15)
_NANOS = 1622550615_000_000_000


def test_normalize_bigint_nanos(spark):
    df = spark.createDataFrame(
        [(_NANOS,)], T.StructType([T.StructField("ts", T.LongType())])
    )
    out = normalize(df, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0].ts == _UTC_2021


def test_normalize_timestamp_ntz(spark):
    df = spark.createDataFrame(
        [(_UTC_2021,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    out = normalize(df, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    # session tz is UTC (session.tune), so NTZ reinterpretation is identity
    assert out.collect()[0].ts == _UTC_2021


def test_normalize_timestamp_passthrough(spark):
    df = spark.createDataFrame(
        [(_UTC_2021,)], T.StructType([T.StructField("ts", T.TimestampType())])
    )
    out = normalize(df, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0].ts == _UTC_2021


def test_normalize_other_tables_untouched(spark):
    df = spark.createDataFrame(
        [(_UTC_2021,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    assert dict(normalize(df, "orders").dtypes)["ts"] == "timestamp_ntz"


def test_load_table_events_ts_is_timestamp(spark, sf_dir):
    """Whatever this Spark version does with parquet TIMESTAMP(NANOS), the
    batch reader must hand downstream operators a plain timestamp."""
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.filter(F.col("ts").isNull()).count() == 0


def test_stream_events_ts_is_timestamp(spark, sf_dir):
    """Watermarks require TimestampType — the streaming reader must emit it
    regardless of the physical parquet encoding (the r02 regression threw
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE here)."""
    stream = read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark is the call that hard-fails on non-timestamp event time
    stream.withWatermark("ts", "1 hour")


def test_batch_and_stream_ts_values_agree(spark, sf_dir):
    """The two readers must decode the same instants, not just the same
    type (a tz-shifted reinterpretation would pass the dtype checks)."""
    from sqlitedataframe_spark.streaming.core import run_available_now

    batch = load_table(spark, sf_dir, "events").select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    stream = read_events_stream(spark, sf_dir).select("ts")
    got = run_available_now(
        stream.groupBy().agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")),
        output_mode="complete",
    )
    assert batch.collect() == got.collect()

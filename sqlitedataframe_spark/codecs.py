"""User-codec surface (reference A17): custom value <-> cell transcoding.

The reference's SQLiteEncodable/SQLiteDecodable protocols
(SQLiteDataFrame.swift:134-158, dispatch :444-449/:595-597) let a user type
map itself to one of the 5 storage classes. Spark's idiomatic equivalent is
a UDF pair applied around the bridge: decode on read (raw column -> typed
column), encode on write (typed -> storable). Registered codecs are plain
named functions so they pickle cleanly to executors.

Note the reference quirk preserved here: decode dispatch happens BEFORE the
null check (:446-453), so a codec may map NULL to a value — the decode UDF
receives nullable input and decides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


@dataclass(frozen=True)
class Codec:
    name: str
    decode: Callable  # storage value -> user value
    encode: Callable  # user value -> storage value
    spark_type: DataType  # decoded column type
    storage_type: DataType  # encoded column type


_REGISTRY: dict[str, Codec] = {}


def register_codec(
    name: str,
    decode: Callable,
    encode: Callable,
    spark_type: DataType,
    storage_type: DataType,
) -> Codec:
    codec = Codec(name, decode, encode, spark_type, storage_type)
    _REGISTRY[name] = codec
    return codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def decode_col(codec_name: str, col: Column | str) -> Column:
    """Decoded view of a raw storage column (read-side dispatch, ref :446-449)."""
    codec = get_codec(codec_name)
    c = F.col(col) if isinstance(col, str) else col
    return F.udf(codec.decode, codec.spark_type, useArrow=True)(c)


def encode_col(codec_name: str, col: Column | str) -> Column:
    """Storable view of a typed column (write-side dispatch, ref :595-597)."""
    codec = get_codec(codec_name)
    c = F.col(col) if isinstance(col, str) else col
    return F.udf(codec.encode, codec.storage_type, useArrow=True)(c)


def apply_decoders(df: DataFrame, codecs: dict[str, str]) -> DataFrame:
    """Apply column->codec decode mapping after read_sql."""
    for col, name in codecs.items():
        df = df.withColumn(col, decode_col(name, col))
    return df


def apply_encoders(df: DataFrame, codecs: dict[str, str]) -> DataFrame:
    """Apply column->codec encode mapping before write_sql."""
    for col, name in codecs.items():
        df = df.withColumn(col, encode_col(name, col))
    return df

"""Property-based tests (hypothesis) for the value model: encode → SQLite
storage → decode round-trips across the type lattice, plus affinity rules.
No Spark — pure Python, so hundreds of cases run in milliseconds.
"""

from __future__ import annotations

import datetime as dt
import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st

from sqlitedataframe_spark.sqlite_types import (
    INT64_MAX,
    SQLiteType,
    affinity,
    decode_cell,
    encode_cell,
)

I64 = st.integers(min_value=-(1 << 63), max_value=INT64_MAX)


@given(I64)
def test_int_roundtrip(x):
    assert decode_cell(encode_cell(x), SQLiteType.INT) == x


@given(st.integers(min_value=INT64_MAX + 1, max_value=(1 << 70)))
def test_beyond_int64_encodes_as_text(x):
    # the UInt64-overflow rule: stored as decimal TEXT, reparseable
    enc = encode_cell(x)
    assert isinstance(enc, str) and int(enc) == x


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_float_roundtrip(x):
    assert decode_cell(encode_cell(x), SQLiteType.FLOAT) == x


@given(st.text(max_size=200))
def test_text_roundtrip(s):
    assert decode_cell(encode_cell(s), SQLiteType.TEXT) == s


@given(st.binary(max_size=200))
def test_blob_roundtrip(b):
    assert decode_cell(encode_cell(b), SQLiteType.BLOB) == b


@given(st.booleans())
def test_bool_roundtrip(b):
    enc = encode_cell(b)
    assert enc in (0, 1)
    assert decode_cell(enc, SQLiteType.BOOL) is b


@given(
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2200, 1, 1),
    ).map(lambda d: d.replace(microsecond=0))
)
def test_date_roundtrip(d):
    # encode is always TEXT 'yyyy-MM-dd HH:mm:ss' (second precision)
    assert decode_cell(encode_cell(d), SQLiteType.DATE) == d


@settings(max_examples=30)
@given(st.text(min_size=0, max_size=30))
def test_affinity_total(decl):
    # affinity never throws and always lands in the enum
    assert affinity(decl) in SQLiteType


@given(I64, st.text(max_size=50), st.floats(allow_nan=False, allow_infinity=False))
def test_through_real_sqlite(i, s, f):
    """Encoded cells must be bindable by the real sqlite3 driver and come
    back equal after storage (the actual storage-class contract)."""
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE t (i INT, s TEXT, f DOUBLE)")
    conn.execute(
        "INSERT INTO t VALUES (?, ?, ?)",
        (encode_cell(i), encode_cell(s), encode_cell(f)),
    )
    row = conn.execute("SELECT i, s, f FROM t").fetchone()
    assert decode_cell(row[0], SQLiteType.INT) == i
    assert decode_cell(row[1], SQLiteType.TEXT) == s
    assert decode_cell(row[2], SQLiteType.FLOAT) == f
    conn.close()

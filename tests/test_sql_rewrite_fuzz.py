"""Differential fuzz for the SQLite-dialect shim (VERDICT r5 #8).

Hypothesis generates small SQLite-dialect SELECTs (GLOB, julianday,
unixepoch, strftime, date modifiers, ``||``, iif, scalar min/max, printf,
char/unicode, CAST) and runs each BOTH ways over the same 10-row table:
the original statement on real SQLite, the translated one on Spark via
``sqlite_sql``. Values must agree row-by-row (numeric with float
tolerance) — hardening the A2 pass-through surface far beyond the fixed
``sqlite_dialect_sql`` suite query.

Deliberately NOT generated (documented divergences, each covered by a
directed test elsewhere):
- integer ``/`` (SQLite truncates, Spark SQL divides as double),
- ``'+N months'`` (SQLite normalizes Jan 31 + 1 month to Mar 02/03,
  Spark's timestampadd clamps to Feb 28/29),
- unsorted ``group_concat`` per-row form (the rewrite sorts for
  deterministic distributed output; the aggregate fuzz below compares
  it order-insensitively instead).
"""

from __future__ import annotations

import math
import sqlite3

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlitedataframe_spark.functions.sql_rewrite import sqlite_sql

ROWS = [
    (
        i,
        round(i * 1.7 - 4.2, 3),
        ["apple", "banana", "cherry", "dew", "orange"][i % 5],
        f"2023-0{1 + i % 9}-{10 + i:02d} {i:02d}:1{i % 10}:2{i % 10}",
    )
    for i in range(10)
]


@pytest.fixture(scope="module")
def engines(spark):
    con = sqlite3.connect(":memory:", check_same_thread=False)
    con.execute("CREATE TABLE t (i INTEGER, x REAL, s TEXT, d TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", ROWS)
    sdf = spark.createDataFrame(ROWS, "i bigint, x double, s string, d string")
    sdf.createOrReplaceTempView("t")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield spark, con
    spark.conf.set("spark.sql.session.timeZone", prev_tz)
    con.close()


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("n", float(int(v)))
    if isinstance(v, (int, float)):
        return ("n", float(v))
    s = str(v)
    try:
        f = float(s)
        # 'nan'/'inf' as TEXT (e.g. substr('banana',3,3)) must compare as
        # strings — float('nan') != float('nan') would poison the compare
        return ("n", f) if math.isfinite(f) else ("s", s)
    except ValueError:
        return ("s", s)


def assert_same(sqlite_vals, spark_vals, stmt):
    assert len(sqlite_vals) == len(spark_vals), stmt
    for a, b in zip(sqlite_vals, spark_vals):
        ca, cb = canon(a), canon(b)
        if ca is None or cb is None:
            assert ca == cb, f"{stmt!r}: {a!r} vs {b!r}"
        elif ca[0] == "n" and cb[0] == "n":
            assert math.isclose(ca[1], cb[1], rel_tol=1e-9, abs_tol=1e-6), (
                f"{stmt!r}: {a!r} vs {b!r}"
            )
        else:
            assert ca == cb, f"{stmt!r}: {a!r} vs {b!r}"


# --- expression strategies -------------------------------------------------
NUM_BASE = st.sampled_from(["i", "length(s)", "unicode(s)", "3", "7", "42"])
NUM = st.recursive(
    NUM_BASE,
    lambda ch: st.one_of(
        st.tuples(ch, st.sampled_from(["+", "-", "*"]), ch).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        ch.map(lambda a: f"abs({a})"),
        ch.map(lambda a: f"cast(cast({a} as real) as integer)"),
        st.tuples(ch, ch).map(lambda t: f"min({t[0]}, {t[1]})"),
        st.tuples(ch, ch).map(lambda t: f"max({t[0]}, {t[1]})"),
    ),
    max_leaves=4,
)
WORD = st.sampled_from(["'apple'", "'ba''na'", "'zz'"])
STR_BASE = st.one_of(st.just("s"), WORD)
STR = st.recursive(
    STR_BASE,
    lambda ch: st.one_of(
        ch.map(lambda a: f"upper({a})"),
        ch.map(lambda a: f"lower({a})"),
        st.tuples(ch, ch).map(lambda t: f"({t[0]} || {t[1]})"),
        st.tuples(ch, st.integers(1, 3), st.integers(1, 4)).map(
            lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"
        ),
        NUM.map(lambda n: f"printf('%d', {n})"),
        NUM.map(lambda n: f"cast({n} as text)"),
        NUM.map(lambda n: f"char((abs({n}) % 26) + 97)"),
    ),
    max_leaves=3,
)
FMT = st.sampled_from(["'%Y-%m-%d'", "'%H:%M:%S'", "'%Y'", "'%m/%d'", "'%H%M'"])
MOD = st.sampled_from(
    ["'+3 days'", "'-10 days'", "'start of day'", "'start of month'", "'start of year'"]
)
DATE = st.one_of(
    FMT.map(lambda f: f"strftime({f}, d)"),
    st.just("julianday(d)"),
    st.just("unixepoch(d)"),
    MOD.map(lambda m: f"date(d, {m})"),
    st.sampled_from(["date(d)", "datetime(d)", "time(d)"]),
)
GLOBPAT = st.sampled_from(["'a*'", "'*e'", "'?an*'", "'*rr*'", "'apple'", "'?e*'"])
BOOL = st.one_of(
    GLOBPAT.map(lambda p: f"s GLOB {p}"),
    st.tuples(NUM, NUM).map(lambda t: f"({t[0]} > {t[1]})"),
)
EXPR = st.one_of(
    NUM,
    STR,
    DATE,
    BOOL,
    st.tuples(BOOL, NUM, NUM).map(lambda t: f"iif({t[0]}, {t[1]}, {t[2]})"),
    st.tuples(BOOL, STR, STR).map(lambda t: f"iif({t[0]}, {t[1]}, {t[2]})"),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(exprs=st.lists(EXPR, min_size=1, max_size=8))
def test_differential_scalar_exprs(engines, exprs):
    # r13: the same ~200 sampled expressions (25 examples x up to 8), but
    # evaluated 8-per-SELECT so each example is ONE Spark job instead of
    # one per expression — the per-case collect was ~0.6 s of pure
    # planning/dispatch over a 10-row table and made this the test
    # suite's #1 offender (126 s) in the driver-timeout budget.
    spark, con = engines
    cols = ", ".join(f"{e} AS v{i}" for i, e in enumerate(exprs))
    stmt = f"SELECT {cols} FROM t ORDER BY i"
    sqlite_rows = con.execute(stmt).fetchall()
    spark_rows = sqlite_sql(spark, stmt).collect()
    for i, e in enumerate(exprs):
        assert_same(
            [r[i] for r in sqlite_rows],
            [r[i] for r in spark_rows],
            f"SELECT {e} AS v FROM t ORDER BY i",
        )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=NUM, sep=st.sampled_from(["','", "'|'"]))
def test_differential_aggregates(engines, expr, sep):
    """total() and group_concat() through the shim; group_concat compared
    order-insensitively (the rewrite sorts, SQLite scans)."""
    spark, con = engines
    stmt = f"SELECT total({expr}) AS tot, group_concat(s, {sep}) AS gc FROM t"
    s_tot, s_gc = con.execute(stmt).fetchone()
    row = sqlite_sql(spark, stmt).collect()[0]
    assert math.isclose(s_tot, float(row["tot"]), rel_tol=1e-9, abs_tol=1e-6), stmt
    delim = sep.strip("'")
    assert sorted(s_gc.split(delim)) == sorted(row["gc"].split(delim)), stmt

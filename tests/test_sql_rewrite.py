"""SQLite-dialect SQL string rewriting tests: pure translation assertions +
end-to-end execution on Spark views.
"""

from __future__ import annotations

import pytest

from sqlitedataframe_spark.functions.sql_rewrite import (
    sqlite_sql,
    translate_sqlite_sql,
)
from sqlitedataframe_spark.io import register_views


def test_translate_glob():
    assert (
        translate_sqlite_sql("SELECT * FROM t WHERE name GLOB 'ab*'")
        == "SELECT * FROM t WHERE name RLIKE '^ab.*$'"
    )


def test_translate_julianday_and_unixepoch():
    out = translate_sqlite_sql("SELECT julianday(ts), unixepoch(ts) FROM t")
    assert "2440587.5" in out and "unix_timestamp(ts)" in out


def test_translate_strftime():
    out = translate_sqlite_sql("SELECT strftime('%Y-%m', ts) FROM t")
    assert out == "SELECT date_format(ts, 'yyyy-MM') FROM t"
    assert translate_sqlite_sql("SELECT strftime('%s', ts) FROM t") == (
        "SELECT unix_timestamp(ts) FROM t"
    )


def test_translate_group_concat_and_printf():
    out = translate_sqlite_sql("SELECT group_concat(x), group_concat(y, ';') FROM t GROUP BY k")
    assert "array_join(array_sort(collect_list(x)), ',')" in out
    assert "array_join(array_sort(collect_list(y)), ';')" in out
    assert translate_sqlite_sql("SELECT printf('%d-%s', a, b) FROM t") == (
        "SELECT format_string('%d-%s', a, b) FROM t"
    )


def test_nested_calls_survive():
    out = translate_sqlite_sql("SELECT group_concat(upper(trim(x)), '|') FROM t")
    assert "array_join(array_sort(collect_list(upper(trim(x)))), '|')" in out


def test_untouched_sql_passes_through():
    q = "SELECT a || b AS ab, ifnull(c, 0) FROM t WHERE d LIKE 'x%'"
    assert translate_sqlite_sql(q) == q


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    register_views(spark, sf_dir, ["region", "nation", "orders"])
    return spark


def test_end_to_end_glob(views):
    rows = sqlite_sql(
        views, "SELECT r_name FROM region WHERE r_name GLOB 'A*A' ORDER BY r_name"
    ).collect()
    assert [r.r_name for r in rows] == ["AFRICA", "AMERICA", "ASIA"]


def test_end_to_end_group_concat(views):
    rows = sqlite_sql(
        views,
        "SELECT n_regionkey, group_concat(n_name, '|') AS names "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    ).collect()
    assert len(rows) == 5
    names0 = rows[0].names.split("|")
    assert names0 == sorted(names0) and len(names0) == 5


def test_end_to_end_strftime_julianday(views):
    row = sqlite_sql(
        views,
        "SELECT strftime('%Y-%m', o_orderdate) AS ym, "
        "CAST(julianday(o_orderdate) AS BIGINT) AS jd "
        "FROM orders WHERE o_orderkey = 1",
    ).collect()[0]
    assert len(row.ym) == 7 and row.jd > 2_400_000


def test_translate_strftime_literal_letters():
    """Literal letters in the format must be quoted AND the quotes escaped
    when spliced into the single-quoted SQL literal."""
    out = translate_sqlite_sql("SELECT strftime('%YT%H', ts) FROM t")
    assert "date_format(ts, 'yyyy''T''HH')" in out


def test_translate_strftime_literal_letters_runs(spark):
    from sqlitedataframe_spark.functions.sql_rewrite import sqlite_sql

    spark.sql("SELECT timestamp'2024-03-05 07:00:00' AS ts").createOrReplaceTempView(
        "one_ts"
    )
    row = sqlite_sql(spark, "SELECT strftime('%YT%H', ts) AS s FROM one_ts").first()
    assert row.s == "2024T07"

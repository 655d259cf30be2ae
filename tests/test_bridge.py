"""SQLite bridge end-to-end tests — port of the reference's 12 XCTests
(SQLiteDataFrameTests.swift, SURVEY §5) onto read_sql/write_sql.
"""

from __future__ import annotations

import datetime as dt
import sqlite3

import pytest

import json

from pyspark.sql import Row, functions as F, types as ST

from sqlitedataframe_spark.errors import TableExistsError, UnknownColumnError
from sqlitedataframe_spark.sources.sqlite import (
    exec_sql,
    read_sql,
    table_exists,
    upsert_sql,
    write_sql,
)


# -- read paths (reference testDataFrame :39-47, testTextStatement :74-80,
#    testTable :82-87) -------------------------------------------------------
def test_read_statement(spark, tasks_db):
    df = read_sql(
        spark,
        tasks_db,
        statement="SELECT rowid, description, done, date FROM tasks ORDER BY rowid",
    )
    rows = df.collect()
    assert df.columns == ["rowid", "description", "done", "date"]
    assert [r.rowid for r in rows] == [1, 2, 3]
    assert rows[0].description == "write code"
    assert rows[0].done is True and rows[1].done is False
    assert rows[0].date == dt.datetime(2021, 1, 1, 10, 0, 0)


def test_read_table(spark, tasks_db):
    df = read_sql(spark, tasks_db, table="tasks")
    assert df.count() == 3
    assert df.columns == ["description", "done", "date"]


def test_read_statement_with_params(spark, tasks_db):
    # prepared-statement entry point with caller binds (reference A3 :346-397)
    df = read_sql(
        spark,
        tasks_db,
        statement="SELECT description FROM tasks WHERE done = ?",
        params=[0],
    )
    assert sorted(r.description for r in df.collect()) == ["ship code", "test code"]


# -- column allowlist (reference :49-57, :89-94) ----------------------------
def test_statement_columns_filter_ignores_unknown(spark, tasks_db):
    # statement path: unknown names silently ignored (reference :354-363)
    df = read_sql(
        spark,
        tasks_db,
        statement="SELECT rowid, description, done FROM tasks",
        columns=["description", "bogus"],
    )
    assert df.columns == ["description"]
    assert df.count() == 3


def test_table_columns_unknown_raises(spark, tasks_db):
    # table path: unknown requested columns are an error (reference :214-220)
    with pytest.raises(UnknownColumnError):
        read_sql(spark, tasks_db, table="tasks", columns=["description", "bogus"])


# -- type overrides (reference testDataFrameSpecifyTypes :59-72) ------------
def test_types_override_and_bogus_key(spark, tasks_db):
    df = read_sql(
        spark,
        tasks_db,
        statement="SELECT done, date FROM tasks ORDER BY rowid",
        types={"done": "int", "bogus": "text"},  # bogus keys ignored
    )
    assert dict(df.dtypes)["done"] == "bigint"
    assert df.collect()[0].done == 1


def test_affinity_inference(spark, db_path):
    exec_sql(
        db_path,
        """
        CREATE TABLE t (i INTEGER, f REAL, s VARCHAR(10), b BLOB, bo BOOLEAN, d DATE);
        INSERT INTO t VALUES (1, 1.5, 'x', x'0102', 1, '2021-06-01 00:00:00');
        """,
    )
    df = read_sql(spark, db_path, table="t")
    assert dict(df.dtypes) == {
        "i": "bigint",
        "f": "double",
        "s": "string",
        "b": "binary",
        "bo": "boolean",
        "d": "timestamp",
    }
    r = df.collect()[0]
    assert r.i == 1 and r.f == 1.5 and r.s == "x"
    assert bytes(r.b) == b"\x01\x02" and r.bo is True
    assert r.d == dt.datetime(2021, 6, 1)


def test_date_three_representations(spark, db_path):
    # one date column holding TEXT / INTEGER unix / REAL julian cells
    # (dynamic typing, reference :491-511)
    want = dt.datetime(2021, 1, 1, 10, 0, 0)
    unix = int(want.replace(tzinfo=dt.timezone.utc).timestamp())
    julian = unix / 86400.0 + 2440587.5
    exec_sql(db_path, "CREATE TABLE d (v DATE);")
    conn = sqlite3.connect(db_path)
    with conn:
        conn.execute("INSERT INTO d VALUES (?)", ("2021-01-01 10:00:00",))
        conn.execute("INSERT INTO d VALUES (?)", (unix,))
        conn.execute("INSERT INTO d VALUES (?)", (julian,))
    conn.close()
    vals = [r.v for r in read_sql(spark, db_path, table="d").collect()]
    assert all(abs((v - want).total_seconds()) < 1e-3 for v in vals)


def test_rowid_partitioned_read(spark, tasks_db):
    df = read_sql(spark, tasks_db, table="tasks", columns=["rowid", "description"],
                  num_partitions=2)
    assert df.rdd.getNumPartitions() == 2
    assert sorted(r.rowid for r in df.collect()) == [1, 2, 3]


# -- write paths (reference testWriteSQL :96-111, testWriteTable :113-127,
#    exists-policies :129-172, round-trip :175-198) -------------------------
def _frame(spark):
    return spark.createDataFrame(
        [
            Row(description="a", done=True, date=dt.datetime(2021, 3, 1, 1, 2, 3)),
            Row(description="b", done=False, date=dt.datetime(2021, 3, 2, 4, 5, 6)),
        ],
        schema=ST.StructType(
            [
                ST.StructField("description", ST.StringType()),
                ST.StructField("done", ST.BooleanType()),
                ST.StructField("date", ST.TimestampType()),
            ]
        ),
    )


def test_write_table_and_roundtrip(spark, db_path):
    df = _frame(spark)
    write_sql(df, db_path, table="out")
    assert table_exists(db_path, "out")
    back = read_sql(spark, db_path, table="out")
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_write_if_exists_policies(spark, db_path):
    df = _frame(spark)
    write_sql(df, db_path, table="t")

    with pytest.raises(TableExistsError):
        write_sql(df, db_path, table="t", if_exists="fail")

    write_sql(df, db_path, table="t", if_exists="ignore")
    assert read_sql(spark, db_path, table="t").count() == 2

    write_sql(df, db_path, table="t", if_exists="append")
    assert read_sql(spark, db_path, table="t").count() == 4

    write_sql(df, db_path, table="t", if_exists="replace")
    assert read_sql(spark, db_path, table="t").count() == 2


def test_write_dml_statement(spark, tasks_db):
    # arbitrary parameterized DML sink (reference A8 :572-591): UPDATE rows
    upd = spark.createDataFrame([(True, "test code")], ["done", "description"])
    write_sql(upd, tasks_db, statement="UPDATE tasks SET done = ? WHERE description = ?")
    df = read_sql(spark, tasks_db, statement="SELECT done FROM tasks WHERE description = 'test code'")
    assert df.collect()[0].done is True


def test_write_dml_extra_params_bind_null(spark, db_path):
    # extra statement params → NULL; extra DF columns truncated (ref :578-584)
    exec_sql(db_path, "CREATE TABLE p (a INT, b INT);")
    df = spark.createDataFrame([(1,)], ["a"])
    write_sql(df, db_path, statement="INSERT INTO p (a, b) VALUES (?, ?)")
    rows = read_sql(spark, db_path, table="p").collect()
    assert rows[0].a == 1 and rows[0].b is None


def test_upsert(spark, db_path):
    # MERGE-style upsert: conflict rows update, new rows insert
    exec_sql(db_path, "CREATE TABLE kv (k INT PRIMARY KEY, v TEXT);"
                      "INSERT INTO kv VALUES (1, 'old'), (2, 'keep');")
    df = spark.createDataFrame([(1, "new"), (3, "ins")], ["k", "v"])
    upsert_sql(df, db_path, "kv", ["k"])
    got = {r.k: r.v for r in read_sql(spark, db_path, table="kv").collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_auto_partition_sizing(spark, tasks_db):
    # tiny table + default partitioning -> ONE cursor, not 8
    df = read_sql(spark, tasks_db, table="tasks")
    assert df.rdd.getNumPartitions() == 1
    # explicit request still honored
    df2 = read_sql(spark, tasks_db, table="tasks", num_partitions=2)
    assert df2.rdd.getNumPartitions() == 2


def test_exists_probe_and_exec(db_path):
    exec_sql(db_path, "CREATE TABLE x (a INT); CREATE TABLE y (b TEXT);")
    assert table_exists(db_path, "x") and table_exists(db_path, "y")
    assert not table_exists(db_path, "z")


# -- single-execution statement reads (VERDICT r1 "What's wrong" #3) ---------
def test_statement_runs_once_on_driver(spark, tasks_db, monkeypatch):
    """The user's statement may be expensive or non-idempotent: the driver
    must execute it exactly once (names + type sniff from one cursor)."""
    import sqlitedataframe_spark.sources.sqlite as S

    executed = []
    real_connect = S._connect

    def counting_connect(path):
        conn = real_connect(path)

        class Wrap:
            def execute(self, sql, *a):
                executed.append(sql)
                return conn.execute(sql, *a)

            def __getattr__(self, name):
                return getattr(conn, name)

        return Wrap()

    monkeypatch.setattr(S, "_connect", counting_connect)
    stmt = "SELECT description, done FROM tasks"
    df = read_sql(spark, tasks_db, statement=stmt)
    assert executed.count(stmt) == 1  # driver-side: exactly one execution
    assert df.count() > 0


def test_bind_param_count_ignores_literals():
    from sqlitedataframe_spark.sources.sqlite import _bind_param_count

    assert _bind_param_count("INSERT INTO t VALUES (?, ?)") == 2
    assert _bind_param_count("INSERT INTO t VALUES (?, 'what?')") == 1
    assert _bind_param_count("UPDATE t SET a = '??' WHERE b = ?") == 1
    assert _bind_param_count('SELECT "odd?col" FROM t WHERE x = ?') == 1
    assert _bind_param_count("SELECT 1 -- really?\n WHERE x = ?") == 1
    assert _bind_param_count("SELECT /* eh? */ ? || 'it''s?'") == 1


def test_write_statement_with_question_in_literal(spark, tmp_path):
    """A '?' inside a string literal must not shift the bind positions."""
    db = str(tmp_path / "q.db")
    exec_sql(db, "CREATE TABLE notes (body TEXT, tag TEXT)")
    df = spark.createDataFrame([("hello",), ("world",)], ["tag"])
    write_sql(df, db, statement="INSERT INTO notes VALUES ('why?', ?)")
    conn = sqlite3.connect(db)
    rows = sorted(conn.execute("SELECT body, tag FROM notes").fetchall())
    conn.close()
    assert rows == [("why?", "hello"), ("why?", "world")]


# -- runtime-typed .any cells (reference SQLiteValue parity) ------------------
def test_any_struct_mode_roundtrip(spark, tmp_path):
    """A decltype-less column holding four storage classes reads as the
    tagged union (any_mode='struct') and writes back with the ORIGINAL
    storage class per cell — the reference's .any/SQLiteValue semantics
    (SQLiteDataFrame.swift:77-83, 512-527), which the default string mode
    flattens."""
    db = str(tmp_path / "any.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE mixed (id INTEGER PRIMARY KEY, v)")  # no decltype
    conn.executemany(
        "INSERT INTO mixed (id, v) VALUES (?, ?)",
        [(1, 42), (2, 2.5), (3, "word"), (4, b"\x01\x02"), (5, None)],
    )
    conn.commit()
    conn.close()

    df = read_sql(spark, db, table="mixed", any_mode="struct")
    rows = {r.id: r.v for r in df.collect()}
    assert rows[1].kind == "int" and rows[1].int_value == 42
    assert rows[2].kind == "real" and rows[2].real_value == 2.5
    assert rows[3].kind == "text" and rows[3].text_value == "word"
    assert rows[4].kind == "blob" and bytes(rows[4].blob_value) == b"\x01\x02"
    assert rows[5] is None

    out = str(tmp_path / "any_out.db")
    write_sql(df, out, table="mixed2", if_exists="replace")
    conn = sqlite3.connect(out)
    back = dict(conn.execute("SELECT id, typeof(v) FROM mixed2").fetchall())
    conn.close()
    assert back == {1: "integer", 2: "real", 3: "text", 4: "blob", 5: "null"}


def test_any_string_mode_unchanged(spark, tmp_path):
    """Default mode keeps the SURVEY §1.4 lossless-string policy."""
    db = str(tmp_path / "any2.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE mixed (id INTEGER PRIMARY KEY, v)")
    conn.executemany(
        "INSERT INTO mixed (id, v) VALUES (?, ?)", [(1, 42), (2, "word")]
    )
    conn.commit()
    conn.close()
    rows = {r.id: r.v for r in read_sql(spark, db, table="mixed").collect()}
    assert rows == {1: "42", 2: "word"}


# ---------------------------------------------------------------------------
# filter pushdown (r2): SQLite pre-filters a SUPERSET, Spark re-applies —
# results must be identical to the unpushed read under every storage mess.
# ---------------------------------------------------------------------------
def test_pushdown_translation_units():
    from pyspark.sql import datasource as dsf

    from sqlitedataframe_spark.sources.sqlite import SQLiteReader

    r = SQLiteReader(
        {
            "path": "/nonexistent",
            "table": "t",
            "columns": json.dumps(["i", "f", "s", "b", "d"]),
            "types": json.dumps(
                {"i": "int", "f": "float", "s": "text", "b": "bool", "d": "date"}
            ),
        },
        None,
    )
    frag = r._translate_filter(dsf.GreaterThan(("i",), 5))
    assert frag and "CAST" in frag[0] and "typeof" in frag[0] and frag[1] == [5]
    frag = r._translate_filter(dsf.EqualTo(("s",), "x"))
    assert frag and "AS TEXT" in frag[0]
    # TEXT range predicates must NOT push (UTF-8 vs UTF-16 ordering)
    assert r._translate_filter(dsf.GreaterThan(("s",), "x")) is None
    # DATE never pushes (3-format decode)
    assert r._translate_filter(dsf.EqualTo(("d",), 1)) is None
    assert r._translate_filter(dsf.IsNotNull(("d",))) == ("\"d\" IS NOT NULL", [])
    # IsNull only safe on TEXT
    assert r._translate_filter(dsf.IsNull(("i",))) is None
    assert r._translate_filter(dsf.IsNull(("s",))) == ("\"s\" IS NULL", [])
    # rowid is always clean: no typeof guard
    frag = r._translate_filter(dsf.LessThan(("rowid",), 10))
    assert frag == ("(CAST(rowid AS INTEGER) < ?)", [10])
    # pushFilters returns EVERY filter (Spark re-applies: superset contract)
    # while the translated fragments land in the partition queries
    fs = [dsf.GreaterThan(("i",), 5), dsf.EqualTo(("d",), 1)]
    back = list(r.pushFilters(fs))
    assert back == fs
    from sqlitedataframe_spark.sources.sqlite import SQLiteRangePartition

    q, params = r._query(SQLiteRangePartition(0, 99))
    assert "rowid BETWEEN ? AND ?" in q and "CAST(\"i\" AS INTEGER) > ?" in q
    assert params == [0, 99, 5]


def test_pushdown_results_match_dirty_storage(spark, db_path):
    """Mixed-storage table: TEXT in an INT column, blob in a FLOAT column,
    ints in a TEXT column. Filtered reads with pushdown must equal the
    Spark-side-only semantics (decode coercion then filter)."""
    conn = sqlite3.connect(db_path)
    conn.execute("CREATE TABLE mess (i INT, f FLOAT, s TEXT)")
    rows = [
        (1, 1.5, "alpha"),
        ("42abc", 2.5, 7),            # text-in-int (coerces 42), int-in-text
        ("junk", b"\x00\x01", "beta"), # coerces 0; blob-in-float -> null
        (None, None, None),
        (99, 0.5, "alphabet"),
    ]
    conn.executemany("INSERT INTO mess VALUES (?, ?, ?)", rows)
    conn.commit()
    conn.close()

    df = read_sql(spark, db_path, table="mess")
    got = sorted(
        (r.i, r.s) for r in df.filter(F.col("i") > 5).select("i", "s").collect()
    )
    assert got == [(42, "7"), (99, "alphabet")]
    # blob-in-float decodes to NULL: IS NOT NULL must drop it
    assert df.filter(F.col("f").isNotNull()).count() == 3
    # TEXT equality with int storage ('7' after decode)
    assert df.filter(F.col("s") == "7").count() == 1
    # prefix pushdown
    assert df.filter(F.col("s").startswith("alpha")).count() == 2
    # conjunction of pushable + unpushable filters ('7' < 'a': only
    # "alphabet" survives the unpushed string-range predicate)
    assert df.filter((F.col("i") > 5) & (F.col("s") > "a")).count() == 1

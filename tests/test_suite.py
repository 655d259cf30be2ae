"""Suite-level differential tests at sf0.001: every oracle-backed query's
Spark result must match its DuckDB oracle (row count, columns, value hash) —
the in-repo replica of the driver's correctness gate.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlitedataframe_spark.io import TABLES, table_path
from sqlitedataframe_spark.suite import load_all

from tools.oracle_check import value_hash

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0 and len(df.columns) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_check_budget_invariant():
    """VERDICT r6 #4: the driver records CORRECTNESS rows for only a
    bounded prefix (~50) of queries() per round. The every-query-has-a-
    driver-green-row invariant therefore requires the never-checked set
    (fresh additions + ever-red queries) to stay within that budget at
    round close — this test fails the build when a round adds more new
    queries than one driver pass can verify."""
    import __spark_entry__ as e

    unseen = e._unseen_names()
    assert len(unseen) <= e.DRIVER_CHECK_BUDGET, (
        f"{len(unseen)} never-driver-checked queries exceed the "
        f"{e.DRIVER_CHECK_BUDGET}-row driver capture budget; trim this "
        f"round's additions or split across rounds: {unseen}"
    )
    # the rotation must surface exactly the unseen set first and cover
    # the whole registry exactly once
    ordered = e._ordered_names()
    assert ordered[: len(unseen)] == unseen
    assert sorted(ordered) == sorted(load_all().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.sql(q.oracle)
    ocols, orows = list(res.columns), res.fetchall()
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} oracle={len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(scols, srows) == value_hash(ocols, orows)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    assert df.count() >= 0

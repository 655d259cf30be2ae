"""Shared fixtures: one SparkSession per test run, tiny-sf fixture dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlitedataframe_spark.session import default_parallelism  # noqa: E402
from sqlitedataframe_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # r13: the test session is right-sized to the sf0.001 fixtures (~6k
    # lineitem rows): at local[32] every tiny stage pays 32-task scheduling
    # for no parallelism gain, and the full suite overran the driver's
    # pytest window (VERIFY_r12 tests_ok=false was a timeout at ~87%).
    # Measured ~15% faster suite-wide at 8 cores on identical tests.
    # SPARK_GRAFT_CPUS still lowers it further; bench/oracle harnesses are
    # untouched (they keep the real core contract).
    s = get_spark("tests", cpus=min(default_parallelism(), 8))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def db_path(tmp_path):
    """Fresh SQLite db file per test (mirrors the reference's setUpWithError
    rebuilding an in-memory db, SQLiteDataFrameTests.swift:17-32)."""
    return str(tmp_path / "test.db")


@pytest.fixture()
def tasks_db(db_path):
    """The reference's fixture table: 3-row `tasks`
    (SQLiteDataFrameTests.swift:17-32)."""
    from sqlitedataframe_spark.sources.sqlite import exec_sql

    exec_sql(
        db_path,
        """
        CREATE TABLE tasks (
          description TEXT NOT NULL,
          done BOOL DEFAULT FALSE NOT NULL,
          date DATE DEFAULT CURRENT_TIMESTAMP NOT NULL
        );
        INSERT INTO tasks (description, done, date)
          VALUES ('write code', 1, '2021-01-01 10:00:00');
        INSERT INTO tasks (description, done, date)
          VALUES ('test code', 0, '2021-01-02 11:30:00');
        INSERT INTO tasks (description, done, date)
          VALUES ('ship code', 0, '2021-01-03 12:45:00');
        """,
    )
    return db_path

"""Typed errors — the Spark-side analog of the reference's error mapping.

Reference: ``checkSQLite`` maps sqlite return codes to NSError unless
OK/ROW/DONE (SQLiteDataFrame.swift:24-30, tests SQLiteCheckSQLiteTests.swift:7-19).
Here the same contract is a small exception hierarchy raised eagerly at the
API boundary (Spark itself raises AnalysisException lazily at analysis time).
"""

from __future__ import annotations


class SQLiteDataFrameError(Exception):
    """Base error for the bridge surface."""


class TableExistsError(SQLiteDataFrameError):
    """Raised by write_sql(if_exists='fail') when the target table exists
    (reference IfTableExistsPolicy.fail, SQLiteDataFrame.swift:197-206,724)."""


class UnknownColumnError(SQLiteDataFrameError):
    """Raised by the table-read path when a requested column does not exist
    (reference contract at SQLiteDataFrame.swift:214-220)."""


class SQLiteOperationalError(SQLiteDataFrameError):
    """Wraps sqlite3 errors with the failing statement attached
    (reference checkSQLite, SQLiteDataFrame.swift:24-30)."""

    def __init__(self, message: str, statement: str | None = None):
        super().__init__(message if statement is None else f"{message} [in: {statement}]")
        self.statement = statement

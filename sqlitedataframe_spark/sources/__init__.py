"""Sources & sinks: the SQLite bridge (reference Tier A) and helpers."""

from sqlitedataframe_spark.sources.sqlite import (
    SQLiteDataSource,
    exec_sql,
    read_sql,
    table_exists,
    upsert_sql,
    write_sql,
)

__all__ = [
    "SQLiteDataSource",
    "read_sql",
    "write_sql",
    "upsert_sql",
    "table_exists",
    "exec_sql",
]

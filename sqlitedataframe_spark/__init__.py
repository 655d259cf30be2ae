"""sqlitedataframe_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of jackpal/SQLiteDataFrame.

The reference (``/root/reference/Sources/SQLiteDataFrame/SQLiteDataFrame.swift``)
is a *bridge*: it reads SQLite query results into typed columnar DataFrames and
writes DataFrames back to SQLite; all relational capability is exposed by SQL
pass-through. This package re-expresses that surface Spark-first:

- ``sources.sqlite``: SQLite <-> Spark DataFrame bridge (read_sql / write_sql)
  with the reference's type-affinity schema inference, 3-format date decode,
  SaveMode policies, and codec registry (reference A1-A17).
- ``functions``: SQLite-dialect shims (GLOB, julianday, strftime, group_concat)
  as Catalyst Column expressions.
- ``operators``: scale-oriented data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) built on DataFrame primitives.
- ``streaming``: Structured Streaming equivalents over event streams.
- ``suite``: the declared query inventory (Spark impl + DuckDB oracle SQL)
  exercised by the correctness gate.
"""

from sqlitedataframe_spark.session import get_spark, tune

__all__ = ["get_spark", "tune"]
__version__ = "0.1.0"

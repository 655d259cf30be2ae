"""The declared query inventory: Spark implementation + DuckDB oracle pairs.

Each entry maps a SURVEY §2 capability to (a) an idiomatic-Spark callable
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI-SQL oracle string
DuckDB runs on the same parquet tables. The driver hash-compares both at
sf=0.01 — this is the correctness gate.

Determinism rules used throughout (so order-insensitive value hashing works):
- every computed column is aliased identically on both sides;
- floating aggregates are rounded (2 dp for money sums, 4-6 dp for ratios)
  on BOTH sides, so parallel-summation ulp drift cannot flip the hash;
- every LIMIT/top-k has a total order (unique tiebreaker key) so both engines
  keep the same row set;
- timestamps: session tz pinned to UTC (session.tune) = DuckDB's naive view
  of the same parquet instants.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a suite query (and its oracle) by name."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate suite query {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every suite module so their @query decorators run."""
    from sqlitedataframe_spark.suite import (  # noqa: F401
        relational,
        relational2,
        tpch2,
        tpch3,
        analytic,
        analytic2,
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        pipeline6,
        pipeline7,
        pipeline8,
        pipeline9,
        pipeline10,
        pipeline11,
        pipeline12,
        pipeline13,
        pipeline14,
        pipeline15,
        pipeline16,
        pipeline17,
        pipeline18,
        pipeline19,
        pipeline20,
        eventstream,
        streamingq,
        bridge,
    )

    return REGISTRY

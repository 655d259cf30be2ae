"""Data-quality profiling: the summary statistics a curation pipeline
computes before and after every transformation step (null rates, distinct
counts, value ranges) — df.summary()'s shape, but deterministic,
long-form, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Single-pass column profiling: one output row per column with
    (n_rows, n_nulls, n_distinct, min/max) — the data-quality summary a
    curation pipeline runs before and after every transformation.

    ONE aggregation pass produces every statistic (map-side partials, one
    exchange of a single row); the per-column rows are then exploded from
    that 1-row frame, so profiling N columns costs one scan, not N.

    ``exact=True`` uses COUNT(DISTINCT) — Catalyst plans multi-distinct
    aggregates via Expand (input amplified by the number of distinct aggs).
    At 100 TB set ``exact=False`` for HyperLogLog (approx_count_distinct)
    cardinalities in a plain single pass.

    Numeric columns report min_d/max_d (double, 2 dp); other columns
    min_s/max_s (string form) — the unused pair is NULL, keeping one
    uniform schema in long form.
    """
    from pyspark.sql.types import NumericType

    cols = list(cols or df.columns)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        distinct = F.countDistinct(c) if exact else F.approx_count_distinct(c)
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(distinct.alias(f"{c}__distinct"))
        if isinstance(by_name[c], NumericType):
            aggs.append(F.round(F.min(c).cast("double") + 1e-9, 2).alias(f"{c}__min"))
            aggs.append(F.round(F.max(c).cast("double") + 1e-9, 2).alias(f"{c}__max"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        numeric = isinstance(by_name[c], NumericType)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias("min_d"),
                (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias("max_d"),
                (F.lit(None).cast("string") if numeric else F.col(f"{c}__min")).alias("min_s"),
                (F.lit(None).cast("string") if numeric else F.col(f"{c}__max")).alias("max_s"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

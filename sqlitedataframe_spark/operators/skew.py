"""Skew-handling operators: explicit salting for hot keys.

AQE's skew-join splitting (enabled in session.tune) covers sort-merge joins
at runtime; these helpers cover the cases AQE doesn't: aggregations whose
single hot key funnels into one reducer, and broadcast-infeasible joins
where one side's hot keys need replication. Both are pure DataFrame
transforms — the standard two-phase (salt → partial → unsalt → final)
shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys + random salt) so a hot key spreads over
    ``salt_buckets`` reducers; phase 2 re-aggregates the partials by the
    real keys. ``aggs`` must be ALGEBRAIC aggregates expressed over the
    phase-1 output columns — pass (partial, final) pairs via aliases:
    every agg must be decomposable (sum/count/min/max; avg = sum+count).

    Example::

        salted_agg(df, ["k"], [F.sum("v").alias("v_sum"),
                               F.count(F.lit(1)).alias("n")])

    re-applies sum() over the partial column names in phase 2, which is
    correct exactly for sum/count(+re-sum)/min/max.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    agg_cols = [c for c in partial.columns if c not in (*keys, "_salt")]
    # re-combine partials: sum for sums/counts, min/max detected by prefix
    finals = []
    for c in agg_cols:
        if c.startswith("min_"):
            finals.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            finals.append(F.max(c).alias(c))
        else:
            finals.append(F.sum(c).alias(c))
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed inner equi-join: salt the (large, skewed) left side randomly;
    replicate every right row across all ``salt_buckets`` salt values so
    each left shard finds its match. Right-side rows multiply by
    salt_buckets — use only when right is too big to broadcast but small
    enough to replicate 8x, the classic middle regime."""
    l_s = left.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = l_s.join(r_s, [on, "_salt"])
    return out.drop("_salt")

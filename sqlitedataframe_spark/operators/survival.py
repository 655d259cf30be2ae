"""Survival analysis: the Kaplan-Meier product-limit estimator over
right-censored durations — time-to-conversion / time-to-churn curves.

Reference parity: the reference (jackpal/SQLiteDataFrame) has no
analytics surface beyond SQL pass-through
(SQLiteDataFrame.swift:295-304); this is a Tier-D extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def km_curve(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve over per-subject ``(duration,
    event)`` rows (event=1 observed, 0 right-censored): for each
    distinct duration, the at-risk count, observed events, censored
    count, and the product-limit survival estimate
    ``S(t) = prod_{t' <= t, d_{t'} > 0} (1 - d_{t'} / n_{t'})`` —
    time-to-first-purchase / time-to-churn curves with honest handling
    of subjects still alive at the observation boundary.

    Plan shape at 100 TB: the subject table collapses to one
    duration-keyed aggregate (#distinct durations rows — days, so
    dozens); the at-risk counts and the running product (computed as
    ``exp(sum(ln(1 - d/n)))``) are bounded triangular self-joins over
    that tiny frame, not duration-ordered single-partition windows.
    The censoring-only durations carry survival unchanged (their
    ``1 - 0/n`` factor is 1), matching the textbook estimator.
    """
    per_t = (
        df.select(
            F.col(duration_col).alias("_t"),
            F.col(event_col).cast("int").alias("_e"),
        )
        .groupBy("_t")
        .agg(
            F.sum("_e").alias("_d"),
            F.sum(1 - F.col("_e")).alias("_c"),
        )
    )
    # n_at_risk(t) = subjects with duration >= t : reverse triangular join
    a = per_t.select(F.col("_t").alias("t"))
    b = per_t.select(
        F.col("_t").alias("_bt"), F.col("_d").alias("_bd"),
        F.col("_c").alias("_bc"),
    )
    risk = (
        a.join(b, F.col("_bt") >= F.col("t"))
        .groupBy("t")
        .agg(F.sum(F.col("_bd") + F.col("_bc")).alias("n_risk"))
    )
    # survival(t) = exp( sum_{t' <= t} ln(1 - d/n) ) over event times
    ev = per_t.join(risk, per_t._t == risk.t).select(
        F.col("_t").alias("_et"),
        (F.lit(1.0) - F.col("_d") / F.col("n_risk")).alias("_f"),
        F.col("_d").alias("_ed"),
    )
    s = (
        a.select(F.col("t").alias("st"))
        .join(
            ev,
            (F.col("_et") <= F.col("st")) & (F.col("_ed") > 0),
            "left",
        )
        .groupBy("st")
        .agg(
            # clamp the factor: a duration where EVERYONE at risk events
            # gives f = 0, and ln(0) is NULL in Spark (silently dropping
            # the factor) / an error in DuckDB. exp(ln(1e-300) + ...)
            # underflows to ~0, which rounds to the correct 0.0 survival.
            F.coalesce(
                F.exp(F.sum(F.log(F.greatest(F.col("_f"), F.lit(1e-300))))),
                F.lit(1.0),
            ).alias("_s")
        )
    )
    return (
        per_t.join(risk, per_t["_t"] == risk["t"])
        .join(s, per_t["_t"] == s["st"])
        .select(
            F.col("_t").alias("duration"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("_d").cast("bigint").alias("n_events"),
            F.col("_c").cast("bigint").alias("n_censored"),
            F.round(F.col("_s") + 1e-9, round_dp).alias("survival"),
        )
        .orderBy("duration")
    )

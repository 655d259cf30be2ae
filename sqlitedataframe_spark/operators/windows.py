"""Scale-safe window-frame operators.

Spark evaluates an ORDER BY window with no PARTITION BY on a single task
("No Partition Defined" warning) — correct, but a one-machine bottleneck at
cluster scale. ``global_range_frame`` re-expresses the global value-RANGE
frame as a bucketed, fully partitioned plan with identical semantics.

Reference parity: the reference delegates RANGE frames to SQLite's window
engine (single-threaded by nature); this is the distributed re-expression.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def global_range_frame(
    df: DataFrame,
    order_col: str,
    lower: float,
    upper: float,
    aggs: Mapping[str, Callable[[WindowSpec], Column]],
) -> DataFrame:
    """Global ``RANGE BETWEEN lower AND upper`` frame without a global window.

    For each row x, every frame peer lies within ``w = max(|lower|, |upper|)``
    of x's value, so with value buckets of width w (``bucket = floor(v / w)``)
    the whole frame is contained in buckets ``b-1, b, b+1``. Plan:

    1. replicate each row to its home bucket and both neighbors (3x, map-side
       — no data-dependent blowup);
    2. ONE hash exchange on the bucket id;
    3. the RANGE window runs *partitioned by bucket* — every qualifying peer
       of a home-bucket row is present in that bucket exactly once, so the
       in-bucket frame equals the global frame;
    4. keep only home-bucket rows.

    Scale: shuffle carries 3x the projected rows (bounded, data-independent);
    window work parallelizes across buckets. Value skew concentrates a hot
    bucket at worst to 3x its population — same order as the skew any
    value-partitioned plan faces, vs. the global window's *total*
    serialization. NULL ordering values keep only their home replica and
    remain mutual peers (SQL RANGE-frame NULL semantics) in the NULL bucket.

    ``aggs`` maps output column name -> (WindowSpec -> Column), e.g.
    ``{"peers": lambda w: F.count(F.lit(1)).over(w)}``.
    """
    if not aggs:
        raise ValueError("aggs must name at least one window aggregate")
    width = float(max(abs(lower), abs(upper)))
    if width <= 0:
        raise ValueError("RANGE frame must extend beyond the current row")

    home = F.floor(F.col(order_col).cast("double") / F.lit(width))
    tagged = df.withColumn("_home", home)
    replicas = tagged.withColumn(
        "_delta",
        F.explode(
            F.when(F.col("_home").isNull(), F.array(F.lit(0))).otherwise(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            )
        ),
    ).withColumn("_bucket", F.col("_home") + F.col("_delta"))

    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(order_col).cast("double"))
        .rangeBetween(lower, upper)
    )
    out = replicas.select(
        *df.columns,
        F.col("_delta"),
        *[fn(w).alias(name) for name, fn in aggs.items()],
    )
    return out.filter(F.col("_delta") == 0).drop("_delta")

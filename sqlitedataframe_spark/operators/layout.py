"""Data-layout keys: Z-order (Morton) interleaving for multi-column
clustering.

Why it matters at 100 TB: parquet min/max zone maps prune files only along
the columns the data is *sorted* by. Sorting by a Z-order key interleaves
the bits of several columns so file-level min/max ranges stay tight on ALL
of them at once — the technique behind Delta/Iceberg ``ZORDER BY`` — and
multi-dimensional point/range predicates skip most files instead of only
pruning on the leading sort column.

The key is pure integer arithmetic (shift/mask, whole-stage codegen); the
layout step itself is ``repartitionByRange(zkey)`` + write, which is one
range exchange — the same cost as any global sort, paid once at write time
and amortized over every subsequent scan.

The reference (jackpal/SQLiteDataFrame) has no storage-layout surface; part
of the training-data pipeline extension (SURVEY Tier D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: x occupies even bit positions, y odd. 2*bits <= 62 so the
    result fits a long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xc = xc.cast("bigint")
    yc = yc.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftright(xc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL text (oracle twin of
    :func:`zorder_key`)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, x: str, y: str, bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the Z-key.

    ``repartitionByRange`` samples the key distribution so output files
    get balanced, contiguous Z-ranges; the within-partition sort makes
    parquet row-group min/max tight on both source columns.
    ``num_partitions`` defaults to Spark's shuffle parallelism (AQE may
    coalesce); set it to the target output file count when writing.
    """
    zk = zorder_key(x, y, bits).alias("_zkey")
    ranged = (
        df.withColumn("_zkey", zk).repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else df.withColumn("_zkey", zk).repartitionByRange("_zkey")
    )
    return ranged.sortWithinPartitions("_zkey")


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Small-file compaction: rewrite a parquet directory into
    size-targeted files — the table-maintenance job (Delta OPTIMIZE /
    Iceberg rewrite_data_files) every streaming or per-batch-append
    pipeline at 100 TB must run, because a scan of N tiny files pays N
    footer reads + N task schedules and floods the driver with splits.

    Plan shape: one pass — scan, AQE ``REBALANCE`` hint, write. The
    rebalance hint lets AQE split oversized shuffle partitions AND
    coalesce tiny ones to ``spark.sql.adaptive.advisoryPartitionSizeInBytes``
    (set here to ``target_bytes`` for the write), which beats a
    hand-computed ``repartition(n)``: no full-width deterministic shuffle
    into a guessed file count, and skewed input files can't produce
    skewed outputs. Compaction never changes CONTENT — callers verify
    row count + content hash, which is what the suite oracle does.

    Returns the compacted frame read back from ``dst_dir``.
    """
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_bytes)
    )
    try:
        (
            spark.read.parquet(src_dir)
            .hint("rebalance")
            .write.mode("overwrite")
            .parquet(dst_dir)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev
            )
    return spark.read.parquet(dst_dir)

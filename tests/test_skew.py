"""Salting correctness: results must equal the unsalted plan exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("hot", i * 1.0) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        ["k", "v"],
    )
    got = {
        r.k: (r.v_sum, r.n, r.min_v)
        for r in salted_agg(
            df,
            ["k"],
            [
                F.sum("v").alias("v_sum"),
                F.count(F.lit(1)).alias("n"),
                F.min("v").alias("min_v"),
            ],
        ).collect()
    }
    assert got["hot"] == (sum(i * 1.0 for i in range(1000)), 1000, 0.0)
    assert got["cold"] == (3.0, 2, 1.0)


def test_salted_join_equals_plain(spark):
    left = spark.createDataFrame([("a", i) for i in range(500)] + [("b", 0)], ["k", "x"])
    right = spark.createDataFrame([("a", "A"), ("b", "B")], ["k", "y"])
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k")
    assert salted.count() == plain.count() == 501
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_adversarial_hot_key(spark):
    """90% of the probe side lands on ONE key. The salted join must (a)
    equal the plain join, and (b) actually spread the hot key across salt
    buckets so no single (key, salt) group holds more than ~2/buckets of
    the hot rows."""
    buckets = 8
    hot_n, cold_n = 20_000, 2_000
    left = (
        spark.range(hot_n + cold_n)
        .withColumn(
            "k",
            F.when(F.col("id") < hot_n, F.lit("HOT")).otherwise(
                F.concat(F.lit("cold_"), (F.col("id") % 100).cast("string"))
            ),
        )
        .withColumn("lv", F.col("id") * 2)
        .drop("id")
    )
    right = spark.createDataFrame(
        [("HOT", -1)] + [(f"cold_{i}", i) for i in range(100)], ["k", "rv"]
    )

    from sqlitedataframe_spark.operators.skew import salted_join

    got = salted_join(left, right, "k")
    plain = left.join(right, "k")
    assert got.count() == plain.count() == hot_n + cold_n
    assert (
        got.agg(F.sum(F.col("lv") + F.col("rv"))).collect()[0][0]
        == plain.agg(F.sum(F.col("lv") + F.col("rv"))).collect()[0][0]
    )

    # distribution property: the salted left's largest (k, salt) shard of
    # the hot key is far below the unsalted hot-key group size
    salted_left = left.withColumn("_salt", (F.rand(seed=7) * buckets).cast("int"))
    shard_sizes = [
        r.n
        for r in salted_left.filter(F.col("k") == "HOT")
        .groupBy("_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(shard_sizes) == buckets  # every bucket participates
    assert max(shard_sizes) < hot_n * 2 / buckets

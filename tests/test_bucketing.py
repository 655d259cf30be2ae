"""Bucketed-table co-located joins: writing both join sides bucketed by the
join key must let Spark join WITHOUT a shuffle exchange — the storage-level
answer to repeated large-table joins at 100 TB (SURVEY §7 / task brief:
"bucketing for co-located joins").
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sqlitedataframe_spark.io import load_table
from sqlitedataframe_spark.plans import exchange_count


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # default warehouse dir (./spark-warehouse, gitignored) — the
    # warehouse path is static config and cannot be set per-test
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    j = o.join(li, o.o_orderkey == li.l_orderkey).select("o_orderkey", "l_quantity")
    # co-located buckets: the join needs NO exchange on either side
    assert exchange_count(j) == 0
    assert j.count() > 0


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # force a non-broadcast join to show the baseline has exchanges
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    assert exchange_count(j) >= 2  # both sides shuffle on the key
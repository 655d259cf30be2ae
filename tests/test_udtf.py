"""Python UDTF tests: json_each lateral table function."""

from __future__ import annotations

from sqlitedataframe_spark.functions.udtf import JsonEachUDTF, register_udtfs


def test_json_each_object(spark):
    register_udtfs(spark)
    rows = spark.sql(
        """SELECT key, value FROM json_each('{"a": 1, "b": "x"}') ORDER BY key"""
    ).collect()
    assert [(r.key, r.value) for r in rows] == [("a", "1"), ("b", "x")]


def test_json_each_array_and_malformed(spark):
    register_udtfs(spark)
    rows = spark.sql("SELECT * FROM json_each('[10, 20]')").collect()
    assert [(r.key, r.value) for r in rows] == [("0", "10"), ("1", "20")]
    assert spark.sql("SELECT * FROM json_each('not json')").count() == 0


def test_json_each_lateral_join(spark, sf_dir):
    from sqlitedataframe_spark.io import register_views

    register_udtfs(spark)
    register_views(spark, sf_dir, ["events"])
    rows = spark.sql(
        """
        SELECT e.event_id, j.key, j.value
        FROM events e, LATERAL json_each(e.props) j
        WHERE e.event_id < 5
        ORDER BY e.event_id, j.key
        """
    ).collect()
    assert len(rows) == 5 and all(r.key == "k" for r in rows)

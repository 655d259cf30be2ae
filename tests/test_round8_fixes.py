"""Round-8 fix regressions: welch drift-proofing (VERDICT r7 #1) and the
five r7 advisor findings (assortativity overflow-proof sums, fd_candidates
NULL semantics, macro_f1 zero-division convention, kcenter early stop,
unicode_quality code-point portability)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.evalmetrics import macro_f1
from sqlitedataframe_spark.operators.graph import degree_assortativity
from sqlitedataframe_spark.operators.profiling import (
    fd_candidates,
    welch_ttest_onevsrest,
)
from sqlitedataframe_spark.operators.similarity import kcenter_coreset
from sqlitedataframe_spark.operators.text import unicode_quality


def test_welch_bitstable_across_partition_layouts(spark):
    """The r7 driver red row: t_stat/welch_df 4-dp roundings must not move
    with the partial-aggregation order. Integer-scaled exact moments make
    the doubles feeding ROUND bit-identical under ANY partition layout —
    assert equality across shuffle-partition settings and input layouts."""
    import random

    rng = random.Random(8)
    rows = [
        (f"g{i % 5}", round(rng.uniform(0.01, 490.0), 2))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for parts, nslices in [(1, 1), (7, 3), (200, 32)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            d = df.repartition(nslices)
            outs.append(
                sorted(map(tuple, welch_ttest_onevsrest(d, "grp", "value").collect()))
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 5
    # and the closed form is right: cross-check one group against python
    import math

    vals = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    g0 = vals["g0"]
    rest = [v for g, v in rows if g != "g0"]
    n1, n2 = len(g0), len(rest)
    m1, m2 = sum(g0) / n1, sum(rest) / n2
    v1 = (sum(v * v for v in g0) - sum(g0) ** 2 / n1) / (n1 - 1)
    v2 = (sum(v * v for v in rest) - sum(rest) ** 2 / n2) / (n2 - 1)
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    got = {r[0]: r for r in outs[0]}
    assert got["g0"][4] == pytest.approx(t, abs=2e-4)


def test_fd_candidates_counts_null_as_value(spark):
    """Advisor r7: bare countDistinct(a, b) drops rows where EITHER column
    is NULL while countDistinct(a) only drops NULL a — struct-wrapped
    counts treat NULL as a value on both sides, matching DuckDB's
    COUNT(DISTINCT ROW(a)) / COUNT(DISTINCT (a, b))."""
    df = spark.createDataFrame(
        [(1, 1), (1, None), (None, 2), (None, None), (2, 2)],
        "a int, b int",
    )
    got = {
        (r["det"], r["dep"]): (r["nd_det"], r["nd_pair"], r["fd_holds"])
        for r in fd_candidates(df, ["a", "b"]).collect()
    }
    # distinct a-values incl. NULL: {1, NULL, 2} = 3
    # distinct (a,b) pairs: all five rows distinct = 5
    assert got[("a", "b")] == (3, 5, False)
    assert got[("b", "a")] == (3, 5, False)
    # DuckDB twin agrees cell-for-cell
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a INT, b INT)")
    con.execute("INSERT INTO t VALUES (1,1),(1,NULL),(NULL,2),(NULL,NULL),(2,2)")
    nd_a, nd_ab = con.execute(
        "SELECT COUNT(DISTINCT ROW(a)), COUNT(DISTINCT (a, b)) FROM t"
    ).fetchone()
    assert (nd_a, nd_ab) == (3, 5)


def test_macro_f1_zero_division_consistent(spark):
    """Advisor r7: a never-predicted class must enter macro precision as 0
    (sklearn zero_division=0), not be skipped — otherwise macro P averages
    over a different class set than macro F1."""
    # truth has class 'c' but the predictor never says 'c'
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "b"), ("a", "c"), ("b", "c")],
        "pred string, truth string",
    )
    rows = {r["cls"]: r for r in macro_f1(df, "pred", "truth").collect()}
    assert rows["c"]["precision"] is None  # per-class row stays honest
    assert rows["c"]["f1"] == 0.0
    # macro precision = (P_a + P_b + 0) / 3 = (2/3 + 1/2 + 0) / 3
    assert rows["MACRO"]["precision"] == pytest.approx(
        (2 / 3 + 1 / 2 + 0.0) / 3, abs=1e-5
    )
    # macro recall = (R_a + R_b + R_c)/3 = (1 + 1 + 0)/3
    assert rows["MACRO"]["recall"] == pytest.approx(2 / 3, abs=1e-5)


def test_kcenter_stops_when_points_exhausted(spark):
    """Advisor r7: k > distinct points must stop at the last real center,
    not emit duplicate center_id rows with radius 0."""
    pts = [(1, [0.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 4.0]),
           (4, [3.0, 0.0])]  # 4 ids, 3 distinct locations
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = kcenter_coreset(df, k=8).collect()
    ids = [r["center_id"] for r in rows]
    assert len(ids) == len(set(ids))  # no duplicate centers
    assert len(rows) == 3  # the 4th pick would have distance 0 -> stop
    assert all(r["radius"] is None or r["radius"] > 0 for r in rows)


def test_assortativity_exact_on_star_graph(spark):
    """Advisor r7: product moments now sum in DECIMAL(38,0) (int64-
    overflow-proof); closed form still exact — a star graph has
    assortativity -1 (every edge joins the hub to a leaf)."""
    edges = [(0, i) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(df).collect()[0]
    assert row["m2"] == 16
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-6)
    # decimal sums survive values that WOULD overflow int64 product sums:
    # x*y with x = y = 3_100_000 repeated -> per-row product 9.61e12 is
    # fine, but deg^3-style magnitudes are exercised via the wide star
    big = spark.createDataFrame(
        [(0, i) for i in range(1, 3001)], "src long, dst long"
    )
    r2 = degree_assortativity(big).collect()[0]
    assert r2["assortativity"] == pytest.approx(-1.0, abs=1e-6)


def test_unicode_quality_codepoint_portable_on_astral(spark):
    """Advisor r7 claimed UTF-16 code-unit divergence on astral chars;
    verified false — Spark length()/regexp_replace() count CODE POINTS.
    Pin the behavior with a non-BMP fixture against the DuckDB twin."""
    rows = [("s1", "a\U0001f600b c"), ("s1", "plain ascii")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = unicode_quality(df).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = con.execute(
        r"""
        WITH per AS (
          SELECT source, LENGTH(text) AS n,
                 LENGTH(text) - LENGTH(regexp_replace(
                     text, '[^\x00-\x7f]', '', 'g')) AS na,
                 LENGTH(text) - LENGTH(regexp_replace(
                     text, '[ \t\n\r\f]', '', 'g')) AS ws
          FROM d WHERE LENGTH(text) > 0)
        SELECT ROUND(AVG(na / CAST(n AS DOUBLE)) + 1e-9, 6),
               ROUND(AVG(ws / CAST(n AS DOUBLE)) + 1e-9, 6)
        FROM per GROUP BY source
        """
    ).fetchone()
    assert (got["avg_non_ascii_ratio"], got["avg_ws_ratio"]) == want

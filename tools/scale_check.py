"""Empirical 10x scale check (VERDICT r3 task #5).

Builds a 10x-scaled copy of the sf0.1 fixtures under /tmp (10 key-shifted
copies of every table; document text is letter-rotated per copy so each
copy keeps sf0.1's internal duplicate DENSITY without creating cross-copy
duplicates — the honest way to scale a dedup benchmark), then times a set
of scale-critical suite queries at sf0.1 and at the scaled dir and writes
``BENCH_r04_sf1.json`` with per-query ratios.

Pass criterion (from the judge): no query grows more than ~15x wall time
at 10x data; superlinear growth needs a written explanation.

Usage: python tools/scale_check.py [--build-only|--run-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqlitedataframe_spark.io import load_table  # noqa: E402
from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
DST = os.environ.get("SPARK_GRAFT_SCALE_DST", f"/tmp/sf{COPIES // 10}_scaled")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", "BENCH_r04_sf1.json")
ONLY = [q for q in os.environ.get("SPARK_GRAFT_SCALE_QUERIES", "").split(",") if q]

#: per-table (key columns to shift, shift unit). Shift unit must exceed the
#: max key in the sf0.1 table so copies never collide.
KEY_SHIFTS = {
    "region": (["r_regionkey"], None),  # dims: keep 1 copy (fk targets)
    "nation": (["n_nationkey", "n_regionkey"], None),
    "customer": (["c_custkey"], 10_000_000),
    "supplier": (["s_suppkey"], 10_000_000),
    "part": (["p_partkey"], 10_000_000),
    "orders": (["o_orderkey", "o_custkey"], 10_000_000),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 10_000_000),
    "events": (["event_id", "user_id"], 100_000_000),
    "documents": (["doc_id"], 10_000_000),
    "embeddings": (["vec_id"], 10_000_000),
}

#: scale-critical queries: shuffling joins/aggs, banded pair generators,
#: iterative graph ops, window-heavy plans, sketches.
QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q09_product_profit",
    "q13_order_distribution",
    "q18_large_orders",
    "q21_waiting_supplier",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_components",
    "pipeline_near_dedup",
    "graph_pagerank",
    "dedup_semantic",
    "sim_ann_lsh",
    "text_tfidf_topk",
    "agg_hll_sketch",
    "agg_countmin_sketch",
    "events_sessionize",
    "window_topk_per_group",
    "agg_hist_quantiles",
    "embed_pca_power",
    "dedup_simhash128",
    "dedup_bloom_decontaminate",
    "sample_temperature_mix",
    "stream_hll_rollup",
    "dedup_substring_spans",
    "dedup_span_coverage",
    "text_ngram_topk",
    "text_bpe_pairs",
    "scd2_order_history",
    "events_anomaly_mad",
    "embed_label_outliers",
    "embed_hard_negatives",
    "dedup_containment",
    "stream_anomaly_mad",
    "events_drift_psi",
    "source_xml_roundtrip",
    "events_top_paths",
    "basket_part_pairs",
    "multimodal_phash_pairs",
    "events_audience_overlap",
    "scd2_point_in_time",
    "scd2_merge_changes",
    "dedup_incremental_lsh",
    "graph_triangles",
    "events_ab_ztest",
    "stream_incremental_dedup",
    "text_skipgram_pairs",
    "events_forecast_baseline",
    "text_cosine_pairs",
    "events_changepoint_cusum",
    "text_bm25_topk",
    "text_vocab_coverage",
    "sample_curriculum_buckets",
    "events_item2vec_pairs",
    "source_compact_small_files",
    "text_token_entropy",
    "orders_rfm_segments",
    "events_activity_streaks",
    "events_minhash_audience",
]

#: per-copy letter permutations: rewrite document text so copies are not
#: near-duplicates of each other (shingle sets diverge completely) while
#: each copy keeps the original's internal duplicate structure. Seeded
#: shuffles (not rotations) stay distinct for any copy count.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot(i: int) -> tuple[str, str]:
    import random

    letters = list(_ALPHA)
    random.Random(i).shuffle(letters)
    return _ALPHA, "".join(letters)


#: multiply every per-copy key shift (needed when stacking builds: a
#: second-level build from an already-scaled dir must shift past its keys).
SHIFT_MULT = int(os.environ.get("SPARK_GRAFT_SCALE_SHIFT_MULT", "1"))
#: optional comma-separated table subset to build.
TABLES = [t for t in os.environ.get("SPARK_GRAFT_SCALE_TABLES", "").split(",") if t]


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for table, (keys, shift) in KEY_SHIFTS.items():
        if TABLES and table not in TABLES:
            continue
        if shift is not None:
            shift *= SHIFT_MULT
        out = os.path.join(DST, f"{table}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = load_table(spark, SRC, table)
        if shift is None:
            base.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * shift))
            if table == "documents":
                src_a, dst_a = _rot(i)
                c = c.withColumn("text", F.translate("text", src_a, dst_a))
            if table == "embeddings":
                # deterministic per-copy perturbation: cosine structure
                # within a copy is preserved, across copies it diverges
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (x + F.lit(i * 0.013) * F.cos(j + F.lit(i))).cast(
                            "float"
                        ),
                    ),
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"# built {table}", file=sys.stderr)


def run(spark) -> None:
    registry = load_all()
    spark.range(1).count()
    out: dict[str, dict] = {}
    for name in ONLY or QUERIES:
        row: dict = {}
        for label, d in (("sf0_1", SRC), ("sf1", DST)):
            t0 = time.time()
            try:
                n = len(registry[name].spark_fn(spark, d).collect())
                row[label] = round(time.time() - t0, 2)
                row[f"{label}_rows"] = n
            except Exception as exc:  # noqa: BLE001
                row[f"{label}_error"] = f"{type(exc).__name__}: {exc}"[:200]
            finally:
                try:
                    from sqlitedataframe_spark.operators.util import (
                        release_caches,
                    )

                    release_caches()
                    spark.catalog.clearCache()
                except Exception:
                    pass
        if "sf0_1" in row and "sf1" in row:
            row["ratio"] = round(row["sf1"] / max(row["sf0_1"], 1e-3), 1)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    worst = max(
        (r["ratio"] for r in out.values() if "ratio" in r), default=None
    )
    doc = {
        "metric": f"scale_check_{COPIES}x",
        "copies": COPIES,
        "queries": out,
        "worst_ratio": worst,
        "criterion": f"ratio <= ~1.5 * {COPIES}x at {COPIES}x data",
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), OUT),
        "w",
    ) as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": f"scale_check_{COPIES}x", "worst_ratio": worst,
                      "n_queries": len(out)}))


if __name__ == "__main__":
    spark = get_spark("scale-check")
    if "--run-only" not in sys.argv:
        build(spark)
    if "--build-only" not in sys.argv:
        run(spark)

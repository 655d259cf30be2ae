"""Round-6 fixes from ADVICE.md (r5) + entry-point rotation behavior.

Each test pins one of the advisor's low-severity findings so the fix
can't regress: cohort_matrix period validation, rrf_fuse empty-input
guard, mmr_rerank id-column lookup by name, and the rotation treating
a recorded rows-only (``no_oracle``) driver row as seen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.relational import cohort_matrix
from sqlitedataframe_spark.operators.retrieval import mmr_rerank, rrf_fuse


def test_cohort_matrix_rejects_unknown_period(spark):
    df = spark.range(1).select(
        F.lit("u1").alias("u"), F.lit("2024-01-01").cast("timestamp").alias("ts")
    )
    with pytest.raises(ValueError, match="period must be 'week' or 'day'"):
        cohort_matrix(df, "u", "ts", period="month")


def test_rrf_fuse_rejects_empty_rankings():
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], id_col="doc_id", score_col="score")


def test_mmr_rerank_id_col_not_first(spark):
    """ADVICE r5: mmr_rerank must look the id type up by NAME, not assume
    id_col is the first column of the candidate frame."""
    cand = spark.createDataFrame(
        [(0.9, 1), (0.8, 2), (0.7, 3)], "rel double, doc_id int"
    )  # (rel, id) order — previously broke the inferred result schema
    sims = spark.createDataFrame(
        [(1, 2, 0.5), (2, 1, 0.5), (1, 3, 0.1), (3, 1, 0.1), (2, 3, 0.2), (3, 2, 0.2)],
        "id_a int, id_b int, sim double",
    )
    out = mmr_rerank(cand, sims, id_col="doc_id", rel_col="rel", k=2)
    assert out.schema["doc_id"].dataType.simpleString() == "int"
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1, 3]  # 3 is more diverse than 2


def test_rotation_counts_no_oracle_row_as_seen(tmp_path, monkeypatch):
    """A recorded rows-only (no_oracle, spark_rows>0) driver row is that
    query's passing entry — it must not re-front every round."""
    import json

    import __spark_entry__ as entry_mod

    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(
        json.dumps(
            {
                "agg_approx": {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": 3,
                    "oracle_rows": None,
                    "err": "no_oracle",
                },
                "q01_pricing_summary": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 4,
                    "oracle_rows": 4,
                    "err": None,
                },
            }
        )
    )
    monkeypatch.setattr(entry_mod, "_REPO", str(tmp_path))
    names = entry_mod._ordered_names()
    n = len(names)
    # both recorded queries sort into the seen tail, everything else fronts
    assert names.index("agg_approx") >= n - 2
    assert names.index("q01_pricing_summary") >= n - 2


def test_decode_image_raises_without_pillow():
    from sqlitedataframe_spark.operators import multimodal as MM

    if MM._pillow() is not None:
        pytest.skip("Pillow installed; covered by the real-decode test")
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image(b"\x89PNG\r\n")


def test_real_png_through_pillow_stages(spark):
    """VERDICT r5 #3 / r6 #3: a real PNG flows through the same
    extract_features / resize_media mapInPandas stages with true decoded
    dimensions. Runs UNCONDITIONALLY: the Pillow backend when importable,
    the stdlib PNG codec (operators.pngcodec) otherwise — the gate
    container proves real pixels either way, no skip."""
    from sqlitedataframe_spark.operators import multimodal as MM
    from sqlitedataframe_spark.operators.pngcodec import png_dims, png_encode

    image_mod = MM._pillow()
    if image_mod is not None:
        import io

        img = image_mod.new("RGB", (40, 24), (200, 10, 10))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payload = buf.getvalue()
        backend = "pillow"
    else:
        rows = [bytearray([200, 10, 10] * 40) for _ in range(24)]
        payload = png_encode(40, 24, 3, rows)
        backend = "png"
    media = spark.createDataFrame(
        [(1, payload, "image/png", len(payload), "x")],
        schema=MM.MEDIA_SCHEMA,
    )
    feats = MM.extract_features(media, decoder=backend).collect()
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_frames"]) == (40, 24, 1)
    thumb = MM.resize_media(media, stride=2, resizer=backend).collect()[0]
    assert png_dims(bytes(thumb["thumb"])) == (20, 12)
    assert thumb["out_bytes"] == len(bytes(thumb["thumb"]))


def test_fake_decoder_unchanged_by_decoder_param(spark):
    """The oracle-facing default path must be byte-identical after the
    decoder plumbing: decoder='fake' equals the historical behavior."""
    from sqlitedataframe_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(7, b"hello world", "application/fake", 11, "h")],
        schema=MM.MEDIA_SCHEMA,
    )
    r = MM.extract_features(media).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == MM.fake_decode_dims(b"hello world")
    with pytest.raises(ValueError, match="decoder"):
        MM.extract_features(media, decoder="bogus")
    with pytest.raises(ValueError, match="resizer"):
        MM.resize_media(media, resizer="bogus")

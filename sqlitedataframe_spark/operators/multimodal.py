"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake, clearly marked); everything Spark-side is real and
tested: the schema contract, the Arrow-batched ``mapInPandas`` pipeline
shape, partition-size-aware batching, and the metadata columns an ingest
pipeline needs (byte length, content hash, declared mime).

At 100 TB the pattern is: binary column stays opaque through shuffles
(never exploded), feature extraction happens once per payload inside a
mapInPandas stage whose batch size is bounded by bytes, not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-column schema: payload + sidecar metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_media(df: DataFrame, id_col: str, text_col: str, mime: str = "application/fake") -> DataFrame:
    """Build a media table from any source column: payload = UTF-8 bytes of
    the source (a deterministic stand-in for real image/audio bytes), plus
    the metadata columns computed JVM-side (no UDF)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB — image codecs are not available in this container. A real
    deployment plugs Pillow/libvips here; the fake is deterministic on the
    payload so tests are stable.
    """
    raise NotImplementedError("image codecs unavailable; use fake_decode_dims")


def fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: derives (width, height, n_frames) from the
    payload bytes. Stands in for decode_image/decode_video in tests."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 5, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video-like payloads via mapInPandas: emits
    up to ``max_frames`` rows per payload, one per sampled frame index.

    The *decode* is the deterministic fake (equal byte slices stand in for
    decoded frames — no video codecs in this container); the Spark plumbing
    is the real pattern: a one-to-many Arrow-batched stage whose output rows
    carry binary columns, runnable inside the scan stage with no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                n_frames = len(data) % 30 + 1  # matches fake_decode_dims
                picked = list(range(0, n_frames, every_n))[:max_frames]
                width = max(1, len(data) // n_frames)
                for i in picked:
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(data[i * width : (i + 1) * width])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """Feature-extraction stage over media payloads via mapInPandas.

    Real Spark plumbing: Arrow batches stream through Python; each batch is
    re-chunked so no in-flight pandas frame exceeds ``batch_bytes`` of
    payload (bytes-bounded batching — the thing that matters for 100 MB
    videos, where row-count batching OOMs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            start = 0
            while start < len(pdf):
                size = 0
                end = start
                while end < len(pdf) and size < batch_bytes:
                    size += len(pdf["payload"].iloc[end] or b"")
                    end += 1
                chunk = pdf.iloc[start:end]
                dims = [fake_decode_dims(p or b"") for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "mime": chunk["mime"].values,
                        "n_bytes": chunk["n_bytes"].values,
                        "width": [d[0] for d in dims],
                        "height": [d[1] for d in dims],
                        "n_frames": [d[2] for d in dims],
                    }
                )
                start = end

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_bytes", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_media(media: DataFrame, stride: int = 4) -> DataFrame:
    """Resize/downsample stage via mapInPandas: emits a payload decimated
    by ``stride`` (every stride-th byte) plus its size — the thumbnail/
    low-res-proxy step of an ingest pipeline.

    The *decode+resample* is the deterministic fake (byte-stride
    decimation; a real deployment plugs an image/audio resampler into the
    same stage); the Spark plumbing is the production pattern: payloads
    cross into Python once per row, Arrow-batched, inside the scan stage
    (no shuffle), and the output binary is strictly smaller — the job
    that turns a 100 TB raw-media lake into a few-TB training proxy.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")[::stride]
                ids.append(mid)
                sizes.append(len(data))
                blobs.append(data)
            yield pd.DataFrame({"media_id": ids, "out_bytes": sizes, "thumb": blobs})

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)

"""Multimodal column plumbing (Layer B).

Media (image/audio/video) is carried as an opaque ``binary`` column plus a
typed metadata struct — the 100 TB-safe representation (no decode on scan;
Parquet stores the bytes columnar, column pruning skips them unless asked).
Decode / feature-extract run as Arrow-batched ``mapInPandas`` kernels so
the Python crossing is per-batch, not per-row.

The actual codec step is STUBBED (image/audio libraries are not in this
environment): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
content hash) exercises the full Spark plumbing — schema, batching,
partitioning — end to end. The plumbing is the deliverable; swapping the
kernel body for Pillow/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _ship(df: DataFrame) -> None:
    """Kernels below reference module functions (pickled by reference);
    make the package importable on workers."""
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)


def _fake_decode(content: bytes, feature_dim: int) -> tuple[int, int, float, np.ndarray]:
    """Deterministic fake: all outputs derive from sha256(content), so the
    pipeline is reproducible and testable without codec libraries."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    mean_luma = h[2] / 255.0
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    feat = rng.standard_normal(feature_dim).astype(np.float32)
    return width, height, mean_luma, feat


def extract_image_features(
    media: DataFrame, feature_dim: int = 16, fake: bool = False
) -> DataFrame:
    """binary content → (dims, luma, feature vector) via mapInPandas.

    Real decoder not available in this environment; ``fake=True`` runs the
    deterministic stand-in through the identical Spark plan.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires Pillow/opencv, not present in this "
            "environment; pass fake=True to exercise the pipeline"
        )
    _ship(media)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_luma": [],
                "feature": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, luma, feat = _fake_decode(
                    bytes(content) if content is not None else b"",
                    feature_dim,
                )
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (media_id, ts_ms,
    frame bytes). Stubbed the same way as extract_image_features."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    if not fake:
        raise NotImplementedError(
            "video decoding requires ffmpeg bindings, not present; pass "
            "fake=True to exercise the pipeline"
        )
    _ship(media)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "ts_ms": [], "frame": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                dur = int(dur) if dur is not None else 0
                for ts in range(0, max(dur, 1), every_ms):
                    h = hashlib.sha256(
                        (bytes(content or b"")) + ts.to_bytes(8, "big")
                    ).digest()
                    rows["media_id"].append(mid)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(h)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content", "duration_ms").mapInPandas(
        kernel, out_schema
    )

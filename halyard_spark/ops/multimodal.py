"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec calls are STUBBED —
image/audio libraries are not in this container.  ``fake=True`` routes to
a deterministic content-derived fake so the distributed path can be
exercised end to end; ``fake=False`` raises NotImplementedError at the
decode call site, marking exactly where PIL/ffmpeg plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, width int, height int, duration_ms int"

FEATURE_SCHEMA = "asset_id long, kind string, n_bytes long, feature array<float>"


def decode_features(assets: DataFrame, feat_dim: int = 8, fake: bool = True) -> DataFrame:
    """Per-asset feature extraction over mapInPandas (Arrow batches).

    Real implementation would decode payload (PIL / soundfile / pyav) and
    run a feature net; the fake derives a deterministic vector from the
    payload digest so results are reproducible at any parallelism.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs PIL/ffmpeg — not in this container; "
                    "plug the codec in here"
                )
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload or b"")).digest()
                vec = np.frombuffer(digest[: feat_dim * 4], dtype="<u4").astype("float32")
                feats.append((vec / np.float32(2**32)).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (asset, frame_ts).

    The frame timestamps are computed JVM-side from metadata (no decode);
    the actual frame grab is the stubbed decode above.  This is the
    explode-then-process shape that keeps per-frame work distributed.
    """
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.sha2(F.col("id").cast("string").cast("binary"), 256).cast("binary").alias("payload"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") % 5000 + 100).cast("int").alias("duration_ms"),
    )
    return df

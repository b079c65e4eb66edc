"""Multimodal column plumbing: opaque binary payloads with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, or ``NotImplementedError`` when
``fake=False``) — but everything Spark-side is real and tested: schema
contracts, Arrow batch shape through ``mapInPandas``, partition-preserving
iteration, and metadata extraction as pure expressions.

At 100 TB the pattern matters more than the codec: payloads never enter a
shuffle (feature extraction is a map), and the output schema carries the
features + metadata only, so downstream joins/aggregations move kilobytes
per row, not the blobs.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media_table(spark, rows: int = 1000, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA: the payload is
    a seeded pseudo-random byte string (stands in for encoded bytes)."""
    df = spark.range(0, rows, numPartitions=partitions)
    payload = F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 512).cast(
        "binary"
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(F.col("id"), F.lit(3)).cast("int") + 1,
    )
    return df.select(
        F.col("id").alias("media_id"),
        payload.alias("payload"),
        mtype.alias("media_type"),
        (F.pmod(F.xxhash64(F.lit(1), F.col("id")), F.lit(1920)).cast("int") + 32).alias("width"),
        (F.pmod(F.xxhash64(F.lit(2), F.col("id")), F.lit(1080)).cast("int") + 32).alias("height"),
        (F.pmod(F.xxhash64(F.lit(3), F.col("id")), F.lit(600000))).alias("duration_ms"),
    )


def extract_media_features(
    df: DataFrame, *, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    ``fake=True`` computes a deterministic FEATURE_DIM-float vector from
    the payload bytes (so the full pipeline is testable end-to-end in this
    container). ``fake=False`` is the integration point for a real codec
    (PIL/librosa/ffmpeg) and raises ``NotImplementedError`` here.

    The Arrow batch iterator preserves partitioning — no shuffle; payloads
    are dropped from the output schema.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "stand-in"
                )
            out_rows: List[dict] = []
            for media_id, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(raw).hexdigest()
                arr = np.frombuffer(
                    hashlib.sha512(raw).digest(), dtype=np.uint8
                ).astype(np.float32)
                feats = (arr[:FEATURE_DIM] / 255.0).tolist()
                out_rows.append(
                    {
                        "media_id": int(media_id),
                        "media_type": mtype,
                        "payload_bytes": len(raw),
                        "payload_sha": sha,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(_extract, schema=_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) on an
    ``every_ms`` lattice — pure expressions (sequence + explode). The
    actual frame decode plugs into ``extract_media_features``."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return (
        df.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * F.lit(every_ms)).cast("long").alias("frame_ts_ms"),
        )
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("orig_width", T.IntegerType(), True),
        T.StructField("orig_height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    target_width: int = 224,
    target_height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing via ``mapInPandas``: binary in -> binary out with
    updated dimension metadata, aspect-preserving fit inside the target box.

    ``fake=True`` passes payload bytes through untouched while computing
    the real output geometry (so schema, batch shape, and metadata flow
    are exercised end-to-end); ``fake=False`` is the integration point
    for an actual image codec (PIL etc.) and raises
    ``NotImplementedError`` in this environment. Partition-preserving —
    resizing never shuffles.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode/resize requires codec libraries not "
                    "present in this environment; pass fake=True for the "
                    "pass-through stand-in"
                )
            out_rows: List[dict] = []
            for media_id, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                w, h = int(w), int(h)
                scale = min(target_width / max(w, 1), target_height / max(h, 1))
                out_rows.append(
                    {
                        "media_id": int(media_id),
                        "payload": payload,
                        "width": max(1, round(w * scale)),
                        "height": max(1, round(h * scale)),
                        "orig_width": w,
                        "orig_height": h,
                    }
                )
            yield pd.DataFrame(out_rows)

    return df.where(F.col("media_type") == "image").mapInPandas(
        _resize, schema=_RESIZE_SCHEMA
    )

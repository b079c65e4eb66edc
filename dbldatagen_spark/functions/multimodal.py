"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Decode has two tiers. Uncompressed formats need no codec library, so
P6 PPM decode (``decode_ppm`` / ``extract_image_features``) is REAL —
header parse + numpy reshape + true pixel statistics, exercised
end-to-end. Compressed formats (JPEG/PNG/audio/video) need codec
libraries absent from this container, so that step stays stubbed
(deterministic fake features, or ``NotImplementedError`` when
``fake=False``). Everything Spark-side is identical for both tiers and
tested: schema contracts, Arrow batch shape through ``mapInPandas``,
partition-preserving iteration, metadata extraction as pure expressions.

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
            F.explode_outer(
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


# -- real decode path: uncompressed formats need no codec library ----------

_IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("std_gray", T.DoubleType(), True),
    ]
)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary P6 PPM payload."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _decode_ppm_sized(payload: bytes) -> "tuple[np.ndarray, int]":
    """Decode one P6 frame at the start of ``payload`` and return
    ``(frame, consumed)`` where ``consumed`` counts the header + pixel
    bytes actually parsed — so multi-frame streams advance by what the
    decoder read, not by a re-encode of canonical output (external P6
    with comments / different header whitespace stays in sync)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines starting with '#' allowed), then a single whitespace
    # byte before the raw RGB triples
    tokens: List[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    n_pixels = w * h * 3
    if i + n_pixels > len(payload):
        raise ValueError("truncated P6 payload")
    data = np.frombuffer(payload, dtype=np.uint8, count=n_pixels, offset=i)
    return data.reshape(h, w, 3), i + n_pixels


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary P6 PPM payload to an (h, w, 3) uint8 array — a
    *real* image decode implemented on numpy alone (PPM is uncompressed,
    so no codec library is needed)."""
    frame, _ = _decode_ppm_sized(payload)
    return frame


def synthesize_ppm_table(spark, rows: int = 500, partitions: int = 4,
                         size: int = 8) -> DataFrame:
    """Media table whose payloads are REAL decodable P6 PPM images
    (deterministic seeded pixels), for exercising the genuine decode path."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for media_id in pdf["id"]:
                rng = np.random.default_rng(int(media_id) + 1)
                px = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
                rows_out.append(
                    {"media_id": int(media_id), "payload": encode_ppm(px)}
                )
            yield pd.DataFrame(rows_out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return spark.range(0, rows, numPartitions=partitions).mapInPandas(
        _make, schema=schema
    )


def extract_image_features(df: DataFrame) -> DataFrame:
    """REAL image feature extraction over P6 PPM payloads: decode with
    :func:`decode_ppm`, emit dimensions + channel means + grayscale std.
    Same scale shape as the stubbed extractor — mapInPandas, partition
    preserving, blobs never shuffled, output is metadata-sized."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm(bytes(payload)).astype(np.float64)
                gray = px.mean(axis=2)
                out.append(
                    {
                        "media_id": int(media_id),
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                        "mean_r": float(px[:, :, 0].mean()),
                        "mean_g": float(px[:, :, 1].mean()),
                        "mean_b": float(px[:, :, 2].mean()),
                        "std_gray": float(gray.std()),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, schema=_IMAGE_FEATURE_SCHEMA)


# -- magic-bytes content sniffing -------------------------------------------
# At ingestion scale, declared formats lie (mislabeled uploads, renamed
# extensions, truncated files); routing by actual leading bytes is the
# standard defense. Pure expressions over the binary column: the check
# runs inside the scan, payloads never move.

# (format, offset, signature) — offset is 0-based byte position.
MEDIA_SIGNATURES = [
    ("jpeg", 0, b"\xff\xd8\xff"),
    ("png", 0, b"\x89PNG\r\n\x1a\n"),
    ("gif", 0, b"GIF8"),
    ("bmp", 0, b"BM"),
    ("webp", 8, b"WEBP"),   # RIFF....WEBP — checked before generic riff
    ("riff", 0, b"RIFF"),   # wav/avi container
    ("mp4", 4, b"ftyp"),
    ("mp3", 0, b"ID3"),
    ("ogg", 0, b"OggS"),
    ("flac", 0, b"fLaC"),
    ("pdf", 0, b"%PDF"),
    ("gzip", 0, b"\x1f\x8b"),
    ("zip", 0, b"PK\x03\x04"),
    ("ppm", 0, b"P6"),
]


def detect_media_type_expr(payload) -> "F.Column":
    """Expression classifying a binary column by its magic bytes — one of
    the MEDIA_SIGNATURES formats, ``"unknown"`` for unrecognized bytes,
    NULL for a NULL payload. Offset-qualified signatures (webp inside
    RIFF, mp4's ftyp at byte 4) are checked most-specific-first."""
    out = F.lit("unknown")
    for fmt, off, sig in reversed(MEDIA_SIGNATURES):
        probe = F.substring(payload, off + 1, len(sig))
        out = F.when(probe == F.lit(sig), F.lit(fmt)).otherwise(out)
    return F.when(payload.isNull(), F.lit(None).cast("string")).otherwise(out)


def detect_media_types(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    declared_col: str = None,
) -> DataFrame:
    """Sniff every payload's actual format from its leading bytes.

    Returns ``(id, detected_type[, declared, type_mismatch])`` — with
    ``declared_col``, ``type_mismatch`` flags rows whose declared format
    disagrees with the sniffed one (NULL-safe: a NULL payload never
    flags). Map-only: no shuffle, no UDF, payload bytes read once in the
    scan.
    """
    cols = [
        F.col(id_col),
        detect_media_type_expr(F.col(payload_col)).alias("detected_type"),
    ]
    out = df.select(*cols) if declared_col is None else df.select(
        *cols, F.col(declared_col).alias("declared")
    )
    if declared_col is not None:
        out = out.withColumn(
            "type_mismatch",
            F.when(F.col("detected_type").isNull(), F.lit(False)).otherwise(
                F.col("detected_type") != F.col("declared")
            ),
        )
    return out


def resize_ppm_images(
    df: DataFrame,
    *,
    target_width: int,
    target_height: int,
) -> DataFrame:
    """REAL image resize over P6 PPM payloads: decode with
    :func:`decode_ppm`, nearest-neighbor sample onto the exact
    ``target_width x target_height`` grid (source pixel for output
    ``(y, x)`` is ``(floor(y*h/H), floor(x*w/W))`` — integer-exact, so
    any engine recomputes the identical output bytes), re-encode with
    :func:`encode_ppm`.

    Same scale shape as the other payload transforms: ``mapInPandas``,
    partition-preserving (a resize never needs a shuffle), Arrow-batched,
    payload bytes move only scan -> transform -> sink. Compressed-format
    resize plugs into :func:`resize_images` instead (codec-gated).
    """
    if target_width <= 0 or target_height <= 0:
        raise ValueError("target dimensions must be positive")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                ys = (np.arange(target_height) * h) // target_height
                xs = (np.arange(target_width) * w) // target_width
                resized = px[ys][:, xs]
                out.append(
                    {
                        "media_id": int(media_id),
                        "payload": encode_ppm(resized),
                        "width": target_width,
                        "height": target_height,
                        "orig_width": w,
                        "orig_height": h,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


# -- real audio path: uncompressed WAV PCM needs no codec library ----------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM WAV payload (RIFF +
    fmt + data chunks) — pure struct packing, no codec library."""
    import struct

    pcm = samples.astype("<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + pcm


def decode_wav(payload: bytes):
    """Decode a mono 16-bit PCM WAV payload to ``(samples, sample_rate)``
    — a REAL audio decode implemented on numpy alone (PCM is
    uncompressed). Walks the RIFF chunk list, so extra chunks (LIST,
    fact) before ``data`` are handled."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels = 12, None, None, None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_code != 1:
                raise ValueError(f"only PCM supported, got format {fmt_code}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"only mono 16-bit supported, got {channels}ch {bits}bit")
    return np.frombuffer(data, dtype="<i2"), rate


def synthesize_wav_table(
    spark, rows: int = 500, partitions: int = 4,
    *, seconds: float = 0.05, sample_rate: int = 16000,
) -> DataFrame:
    """Media table whose payloads are REAL decodable mono PCM WAV clips
    (deterministic seeded sine + noise), for exercising the genuine
    audio decode path."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = int(seconds * sample_rate)
        t = np.arange(n) / sample_rate
        for pdf in batches:
            out = []
            for media_id in pdf["id"]:
                rng = np.random.default_rng(int(media_id) + 1)
                freq = 200.0 + (int(media_id) % 40) * 100.0
                wave = 0.6 * np.sin(2 * np.pi * freq * t)
                wave += 0.1 * rng.standard_normal(n)
                pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
                out.append(
                    {"media_id": int(media_id),
                     "payload": encode_wav(pcm, sample_rate)}
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return spark.range(0, rows, numPartitions=partitions).mapInPandas(
        _make, schema=schema
    )


_AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV PCM payloads: decode with
    :func:`decode_wav`, emit duration + RMS/peak (unit scale) + zero
    crossing rate. Same scale shape as the image path — mapInPandas,
    partition-preserving, payload bytes never shuffle, output is
    metadata-sized."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                x = samples.astype(np.float64) / 32768.0
                n = len(x)
                zc = (
                    float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    / max(n - 1, 1)
                )
                out.append(
                    {
                        "media_id": int(media_id),
                        "sample_rate": int(rate),
                        "n_samples": int(n),
                        "duration_ms": 1000.0 * n / rate,
                        "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
                        "peak": float(np.abs(x).max()) if n else 0.0,
                        "zero_crossing_rate": zc,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, schema=_AUDIO_FEATURE_SCHEMA)


# -- real video path: concatenated P6 frames need no codec library ---------
# A "PPM stream" is the simplest honest video container: P6 frames are
# self-delimiting (dimensions in each header), so back-to-back frames
# form a decodable sequence — the same trick mjpeg uses with JPEGs.

def encode_ppm_video(frames) -> bytes:
    """Concatenate (h, w, 3) uint8 frames into a P6-stream payload."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_video(payload: bytes):
    """Decode a P6-stream payload into a list of (h, w, 3) uint8 frames —
    a REAL multi-frame decode on numpy alone."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"bad frame magic at offset {pos}")
        frame, consumed = _decode_ppm_sized(payload[pos:])
        frames.append(frame)
        pos += consumed
    return frames


def synthesize_ppm_video_table(
    spark, rows: int = 200, partitions: int = 4,
    *, n_frames: int = 12, size: int = 8,
) -> DataFrame:
    """Media table whose payloads are REAL decodable P6-stream videos
    (deterministic seeded frames with per-frame brightness ramps)."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id in pdf["id"]:
                rng = np.random.default_rng(int(media_id) + 1)
                base = rng.integers(0, 128, size=(size, size, 3), dtype=np.uint8)
                frames = [
                    np.clip(base.astype(np.int32) + 10 * i, 0, 255).astype(np.uint8)
                    for i in range(n_frames)
                ]
                out.append(
                    {"media_id": int(media_id),
                     "payload": encode_ppm_video(frames)}
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    return spark.range(0, rows, numPartitions=partitions).mapInPandas(
        _make, schema=schema
    )


_FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_brightness", T.DoubleType(), True),
    ]
)


def sample_video_frames(df: DataFrame, *, every_n: int = 4) -> DataFrame:
    """REAL video frame sampling over P6-stream payloads: decode the
    frame sequence, keep every ``every_n``-th frame, emit per-frame
    features — one row per sampled frame. This is the executable
    counterpart of :func:`frame_sample_plan` (which plans sampling from
    metadata without touching payloads). mapInPandas,
    partition-preserving; output is frames x metadata, never pixels."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_ppm_video(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    fr = frames[idx]
                    out.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "n_frames": len(frames),
                            "width": int(fr.shape[1]),
                            "height": int(fr.shape[0]),
                            "mean_brightness": float(fr.mean()),
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema=_FRAME_FEATURE_SCHEMA)


# -- perceptual-hash image near-duplication ----------------------------------
# The LAION-style pipeline step after decode: near-identical images
# (re-encodes, resizes, mild noise) must collapse before training. An
# average-hash is resolution- and brightness-shift-tolerant where the
# byte-level sha256 of the payload is not.

def _phash_from_pixels(px: "np.ndarray", hash_size: int) -> int:
    """Average-hash of an RGB pixel array: grayscale -> block-mean
    downsample to hash_size x hash_size -> threshold at the mean ->
    bits packed row-major (MSB first) into a signed 64-bit int."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(hash_size + 1) * h) // hash_size
    xs = (np.arange(hash_size + 1) * w) // hash_size
    blocks = np.empty((hash_size, hash_size), dtype=np.float64)
    for i in range(hash_size):
        for j in range(hash_size):
            blocks[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks >= blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_phash(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual average-hash over REAL P6 PPM payloads: decode
    (:func:`decode_ppm`), grayscale, block-mean downsample to
    ``hash_size x hash_size``, threshold at the mean, pack into one
    signed 64-bit long.  Returns ``(id_col, phash)``.  Near-identical
    images agree on most bits, so Hamming distance ranks similarity —
    the image twin of :func:`dbldatagen_spark.functions.dedup.
    simhash_signatures`.

    ``hash_size`` must be 8 (64 bits fills the long exactly; other
    sizes would change the banding contract downstream).

    Scale shape: ``mapInPandas``, partition-preserving — payload blobs
    never shuffle; what leaves the scan is 8 bytes per image.
    """
    if hash_size != 8:
        raise ValueError(f"hash_size must be 8 (64-bit hash), got {hash_size}")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_ppm(bytes(payload))
                out.append(
                    {id_col: int(mid),
                     "phash": _phash_from_pixels(px, hash_size)}
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )
    return df.mapInPandas(_hash, schema=schema)


def image_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs via banded perceptual-hash blocking:
    split each 64-bit :func:`image_phash` into ``bands`` contiguous
    16-bit band keys, equi-join on ``(band index, band key)``, then
    verify candidates exactly with ``bit_count(a XOR b) <= max_hamming``.
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, one row per
    pair.

    Pigeonhole guarantee: ``max_hamming < bands`` means every true pair
    differs in fewer bits than there are bands, so at least one band
    matches exactly — NO false negatives (the default 3 < 4 keeps the
    guarantee; a larger ``max_hamming`` is best-effort recall and the
    validation refuses silently degraded settings unless the caller
    raises ``bands`` too).

    Scale shape: hashing is scan-local (blobs never move); the banded
    join (`dedup.hamming_near_duplicates`, the kernel shared with
    SimHash text and audio fingerprints) shuffles ``bands`` 10-byte
    rows per image; candidate volume is bucket-bounded.
    """
    from dbldatagen_spark.functions.dedup import hamming_near_duplicates

    hashes = image_phash(df, id_col=id_col, payload_col=payload_col)
    return hamming_near_duplicates(
        hashes, id_col, "phash", max_hamming=max_hamming, bands=bands
    )


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 64,
) -> DataFrame:
    """Gain-invariant audio fingerprint over REAL mono PCM WAV
    payloads: decode (:func:`decode_wav`), split the samples into
    ``n_frames`` equal frames, compute the RMS energy envelope,
    threshold each frame at the envelope's median, pack the bits into
    one signed 64-bit long.  Returns ``(id_col, afp)``.

    Volume scaling multiplies every frame's RMS equally and the median
    scales with them, so the bit pattern is invariant under gain — the
    byte-level hash of the payload is not.  ``n_frames`` must be 64
    (the long is the banding contract downstream).

    Scale shape: ``mapInPandas``, partition-preserving — audio blobs
    never shuffle; 8 bytes per clip leave the scan.
    """
    if n_frames != 64:
        raise ValueError(f"n_frames must be 64 (64-bit fingerprint), got {n_frames}")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _ = decode_wav(bytes(payload))
                x = samples.astype(np.float64)
                n = len(x)
                edges = (np.arange(n_frames + 1) * n) // n_frames
                rms = np.array([
                    np.sqrt(np.mean(x[edges[i]:edges[i + 1]] ** 2))
                    if edges[i + 1] > edges[i] else 0.0
                    for i in range(n_frames)
                ])
                bits = rms >= np.median(rms)
                v = 0
                for b in bits:
                    v = (v << 1) | int(b)
                if v >= 1 << 63:
                    v -= 1 << 64
                out.append({id_col: int(mid), "afp": v})
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("afp", T.LongType(), False),
        ]
    )
    return df.mapInPandas(_fp, schema=schema)


def audio_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate audio pairs: :func:`audio_fingerprint` envelopes
    joined by the shared banded Hamming kernel
    (``dedup.hamming_near_duplicates`` — same pigeonhole
    no-false-negative guarantee and scale shape as the image and
    SimHash paths).  Returns ``(id_a, id_b, hamming)``."""
    from dbldatagen_spark.functions.dedup import hamming_near_duplicates

    fps = audio_fingerprint(df, id_col=id_col, payload_col=payload_col)
    return hamming_near_duplicates(
        fps, id_col, "afp", max_hamming=max_hamming, bands=bands
    )


def video_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 1,
) -> DataFrame:
    """Temporal perceptual fingerprint over REAL P6-stream video
    payloads: decode (:func:`decode_ppm_video`), average-hash every
    ``every_n``-th frame (:func:`_phash_from_pixels` — the image
    kernel), then majority-vote each of the 64 bit positions across
    the sampled frames into one signed long.  Returns
    ``(id_col, vfp, n_frames)``.

    Majority voting makes the fingerprint robust to what video
    near-dups actually differ in — a few re-encoded, trimmed, or
    brightness-ramped frames — while byte hashing breaks on the first
    changed byte.  Ties (even frame counts) round toward 1, fixed and
    engine-independent.

    Scale shape: ``mapInPandas``, partition-preserving — video blobs
    never shuffle; 8 bytes + a count per clip leave the scan.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = decode_ppm_video(bytes(payload))
                sampled = frames[::every_n]
                votes = np.zeros(64, dtype=np.int64)
                for fr in sampled:
                    h = _phash_from_pixels(fr, 8) & ((1 << 64) - 1)
                    bits = np.array(
                        [(h >> (63 - i)) & 1 for i in range(64)], dtype=np.int64
                    )
                    votes += bits
                maj = votes * 2 >= len(sampled)  # ties round toward 1
                v = 0
                for b in maj:
                    v = (v << 1) | int(b)
                if v >= 1 << 63:
                    v -= 1 << 64
                out.append(
                    {id_col: int(mid), "vfp": v, "n_frames": len(frames)}
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("vfp", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
        ]
    )
    return df.mapInPandas(_fp, schema=schema)


def video_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 1,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate video pairs: :func:`video_fingerprint` majority
    hashes joined by the shared banded Hamming kernel
    (``dedup.hamming_near_duplicates`` — pigeonhole no-false-negative
    guarantee, same scale shape as the image/audio/SimHash paths).
    Returns ``(id_a, id_b, hamming)``."""
    from dbldatagen_spark.functions.dedup import hamming_near_duplicates

    fps = video_fingerprint(
        df, id_col=id_col, payload_col=payload_col, every_n=every_n
    ).select(id_col, "vfp")
    return hamming_near_duplicates(
        fps, id_col, "vfp", max_hamming=max_hamming, bands=bands
    )

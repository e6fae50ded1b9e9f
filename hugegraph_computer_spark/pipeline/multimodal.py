"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched mapInPandas.

Decode status per mime:
- image/png: REAL — synth payloads are valid PNG files (zlib-deflated
  grayscale scanlines, CRC-correct chunks) and `parse_png_header` /
  `png_metadata` parse the IHDR from the actual bytes (stdlib
  struct+zlib only). Oracle-verifiable: the generator's ground-truth
  dimensions are arithmetic in media_id, so DuckDB can emit the
  expected table without decoding.
- audio/wav: REAL — synth payloads are valid PCM-16 RIFF files and
  `parse_wav_header` / `wav_metadata` walk the actual chunk list
  (stdlib struct only) for sample_rate/channels/bits/frames. Oracle-
  verifiable the same way as PNG: the generator's parameters are
  arithmetic in media_id.
- video: the container ships no codecs, so its decode remains a
  clearly-marked stub (deterministic fake features keyed on the
  payload hash); the Spark-side plumbing — schema, binary columns,
  mapInPandas batch shape, partitioning — is real and tested either
  way. Swapping `_decode_stub` for ffmpeg does not touch the plan.

Scale notes: binary payloads ride the shuffle as-is; feature extraction
is mapInPandas (one Arrow batch per ~10k rows, no per-row Python);
repartition by content hash spreads hot mime-types.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal VALID grayscale-8 PNG (signature + IHDR + IDAT + IEND,
    correct CRCs, zlib-deflated scanlines with filter byte 0) built
    with stdlib only. Pixel values are a deterministic function of
    (seed, x, y) so payloads differ per media row."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + 7 * y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def parse_png_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """REAL decode of the PNG IHDR (the first chunk after the 8-byte
    signature): returns (width, height, bit_depth, color_type), or
    None if the payload is not a PNG."""
    if len(payload) < 29 or payload[:8] != PNG_SIGNATURE:
        return None
    length, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or length != 13:
        return None
    width, height, bit_depth, color_type = struct.unpack(">IIBB", payload[16:26])
    return width, height, bit_depth, color_type


def make_wav(
    sample_rate: int, channels: int, n_samples: int, seed: int = 0
) -> bytes:
    """A minimal VALID PCM-16 WAV (RIFF + fmt + data chunks, correct
    sizes) built with stdlib struct only. Sample values are a
    deterministic function of (seed, frame, channel) so payloads differ
    per media row."""
    bits = 16
    block_align = channels * bits // 8
    frames = b"".join(
        struct.pack("<h", ((seed + 37 * f + 101 * c) % 65536) - 32768)
        for f in range(n_samples)
        for c in range(channels)
    )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(
    payload: bytes,
) -> tuple[int, int, int, int] | None:
    """REAL decode of the RIFF/fmt/data chunk structure: returns
    (sample_rate, channels, bits_per_sample, n_samples) — n_samples is
    per-channel frames, data_len / block_align — or None if the payload
    is not a PCM WAV. Walks the chunk list properly (word-aligned, any
    chunk order, unknown chunks skipped)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        tag, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data_len = len(body)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_len is None or fmt[0] != 1:  # PCM only
        return None
    _, channels, sample_rate, _, block_align, bits = fmt
    if block_align == 0 or sample_rate == 0:
        # a crafted zero-rate fmt would otherwise surface as a
        # ZeroDivisionError in wav_metadata's duration arithmetic,
        # failing the whole mapInPandas stage instead of one row
        return None
    return sample_rate, channels, bits, data_len // block_align


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: image/png rows carry REAL
    PNG payloads (dimensions are ground-truth arithmetic in media_id:
    width 64 + i%8, height 48 + i%5); audio/wav rows carry REAL PCM-16
    WAV payloads (sample_rate 8000 + 1000*(i%5), channels 1 + i%2,
    n_samples 40 + i%9 — also arithmetic in media_id, so the oracle can
    emit ground truth without decoding); video rows carry seeded opaque
    bytes (no codecs in the container)."""
    rows = []
    for i in range(n):
        mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
        w, h = 64 + i % 8, 48 + i % 5
        if mime == "image/png":
            payload = make_png(w, h, seed=i)
        elif mime == "audio/wav":
            payload = make_wav(
                sample_rate=8000 + 1000 * (i % 5),
                channels=1 + i % 2,
                n_samples=40 + i % 9,
                seed=i,
            )
        else:
            payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 3)
        rows.append((i, mime, w, h, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, mime: str, dim: int = 8) -> list[float]:
    """STUB decode/feature-extract: a real deployment replaces this with
    PIL/librosa/ffmpeg. Deterministic: features derive from the payload
    digest, so tests are stable and plumbing is fully exercised."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": [
                        _decode_stub(bytes(b), m, dim)
                        for b, m in zip(payloads, pdf["mime"])
                    ],
                }
            )

    return media.repartition(F.col("media_id")).mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


PNG_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
    ]
)


def png_metadata(media: DataFrame) -> DataFrame:
    """REAL image decode step: parse width/height/bit_depth out of each
    PNG payload's IHDR bytes (not the declared metadata columns) via
    Arrow-batched mapInPandas. Non-PNG payloads yield NULL dims."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_png_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bit_depth": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        batches, schema=PNG_META_SCHEMA
    )


WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
    ]
)


def wav_metadata(media: DataFrame) -> DataFrame:
    """REAL audio decode step: parse sample_rate/channels/bits/frames
    out of each WAV payload's RIFF+fmt+data chunks (not the declared
    metadata columns) via Arrow-batched mapInPandas. Non-WAV payloads
    yield NULLs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_wav_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "sample_rate": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        [1000.0 * p[3] / p[0] if p else None for p in parsed],
                        dtype="float64",
                    ),
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        batches, schema=WAV_META_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx) rows for
    the decode stage — sampling itself is a lazy sequence explode, the
    decode of each frame is the stubbed map above."""
    n_frames = (F.length("payload") / 16).cast("int")  # stub: 16 B / frame
    return (
        media.where(F.col("mime") == "video/mp4")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )

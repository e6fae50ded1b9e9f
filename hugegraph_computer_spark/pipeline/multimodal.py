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
- video/avi: REAL — synth payloads are valid RIFF-AVI containers
  (avih/strh/strf headers + uncompressed 24-bit BI_RGB '00db' frames)
  and `parse_avi_header` / `avi_metadata` / `avi_frame_sample` walk
  the actual chunk tree and decode the actual frame bytes with numpy
  (stride-padded rows, bottom-up storage). Oracle-verifiable like
  PNG/WAV: generator parameters and per-frame pixel means are
  arithmetic in media_id.
- video/mp4 (compressed): the container ships no codecs, so
  compressed-video decode remains a clearly-marked stub
  (deterministic fake features keyed on the payload hash); the
  Spark-side plumbing — schema, binary columns, mapInPandas batch
  shape, partitioning — is identical to the real AVI path. Swapping
  `_decode_stub` for ffmpeg does not touch the plan.

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


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


# fps values whose frame period is an exact microsecond count, so the
# generator parameters stay integer-arithmetic in media_id for the oracle
AVI_FPS_CHOICES = (10, 16, 20, 25, 40)


def make_avi(
    width: int, height: int, n_frames: int, fps: int, seed: int = 0
) -> bytes:
    """A minimal VALID uncompressed AVI (RIFF 'AVI ' with avih/strh/strf
    headers and 24-bit BI_RGB '00db' frames) built with stdlib struct
    only. Every pixel of frame f, logical row y is
    (seed + 7*f + y) % 256 across all of x and the three channels, so
    per-frame means are arithmetic ground truth; rows are written
    bottom-up with 4-byte stride padding (the BMP/DIB convention a real
    decoder must honor). fps must divide 1,000,000 exactly (see
    AVI_FPS_CHOICES) so us_per_frame round-trips; the pixel ramp must
    stay below 256 so the 'never wraps' arithmetic the oracle relies on
    is ENFORCED here, not assumed by callers."""
    if 1_000_000 % fps != 0:
        raise ValueError(f"fps={fps} must divide 1,000,000 (AVI_FPS_CHOICES)")
    if seed + 7 * (n_frames - 1) + (height - 1) > 255:
        raise ValueError(
            f"pixel ramp wraps mod 256 (seed={seed}, n_frames={n_frames}, "
            f"height={height}); the arithmetic oracle requires no wrap"
        )
    stride = (3 * width + 3) & ~3
    us_per_frame = 1_000_000 // fps
    frames = []
    for f in range(n_frames):
        rows = []
        for y in reversed(range(height)):  # bottom-up storage
            val = (seed + 7 * f + y) % 256
            rows.append(bytes([val]) * (3 * width) + b"\x00" * (stride - 3 * width))
        frames.append(_riff_chunk(b"00db", b"".join(rows)))

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, stride * height * fps, 0, 0,  # flags=0: no idx1 chunk is written, so AVIF_HASINDEX must not be set
        n_frames, 0, 1, stride * height, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames,
            stride * height, 0, 0,
        ) + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,  # BI_RGB
        stride * height, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(frames))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def _riff_walk(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk run,
    honoring word alignment and refusing to read past `end`."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            return  # truncated chunk — stop, caller yields NULLs
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi_header(
    payload: bytes,
) -> tuple[int, int, int, int] | None:
    """REAL decode of the AVI header tree: returns (width, height,
    n_frames, us_per_frame) from the actual avih bytes, or None when
    the payload is not an uncompressed 24-bit BI_RGB AVI this decoder
    handles (compressed codecs are out of scope in this container)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    avih = None
    bi_rgb24 = False
    for tag, start, size in _riff_walk(payload, 12, len(payload)):
        if tag != b"LIST" or payload[start : start + 4] != b"hdrl":
            continue
        for t2, s2, z2 in _riff_walk(payload, start + 4, start + size):
            if t2 == b"avih" and z2 >= 40:
                a = struct.unpack("<10I", payload[s2 : s2 + 40])
                avih = (a[8], a[9], a[4], a[0])  # width, height, frames, usPerFrame
            elif t2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                for t3, s3, z3 in _riff_walk(payload, s2 + 4, s2 + z2):
                    if t3 == b"strf" and z3 >= 40:
                        b = struct.unpack("<IiiHHI", payload[s3 : s3 + 20])
                        # OR across streams: a later strl (e.g. an audio
                        # stream's WAVEFORMATEX) must not veto a valid
                        # 24-bit BI_RGB video stream seen earlier
                        bi_rgb24 = bi_rgb24 or (b[4] == 24 and b[5] == 0)
    if avih is None or not bi_rgb24:
        return None
    width, height, n_frames, us_per_frame = avih
    if width <= 0 or height <= 0 or us_per_frame == 0:
        return None
    return width, height, n_frames, us_per_frame


def decode_avi_frames(payload: bytes, header=None):
    """REAL frame decode: numpy view over each '00db' chunk's BGR bytes
    (stride-padded, bottom-up) → list of per-frame mean pixel values.
    Returns None when the container/codec is unsupported; skips
    malformed frame chunks rather than failing the batch. Pass a
    pre-parsed `header` to skip the second RIFF tree walk in hot
    mapInPandas loops."""
    import numpy as np

    head = header if header is not None else parse_avi_header(payload)
    if head is None:
        return None
    width, height, _, _ = head
    stride = (3 * width + 3) & ~3
    means = []
    for tag, start, size in _riff_walk(payload, 12, len(payload)):
        if tag != b"LIST" or payload[start : start + 4] != b"movi":
            continue
        for t2, s2, z2 in _riff_walk(payload, start + 4, start + size):
            if t2 != b"00db" or z2 != stride * height:
                continue
            arr = np.frombuffer(payload, dtype=np.uint8, count=z2, offset=s2)
            rows = arr.reshape(height, stride)[:, : 3 * width]  # drop pad bytes
            means.append(float(rows.mean()))
    return means


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: image/png rows carry REAL
    PNG payloads (dimensions are ground-truth arithmetic in media_id:
    width 64 + i%8, height 48 + i%5); audio/wav rows carry REAL PCM-16
    WAV payloads (sample_rate 8000 + 1000*(i%5), channels 1 + i%2,
    n_samples 40 + i%9 — also arithmetic in media_id, so the oracle can
    emit ground truth without decoding); video rows alternate between
    video/avi with REAL uncompressed RIFF-AVI payloads (width 16 + i%8,
    height 12 + i%5, n_frames 3 + i%4, fps AVI_FPS_CHOICES[i%5], pixel
    ramp seeded by media_id — all arithmetic for the oracle) and
    video/mp4 with seeded opaque bytes (compressed codecs are not in
    the container, so that decode stays a labeled stub)."""
    rows = []
    for i in range(n):
        mime = ["image/png", "audio/wav", "video/avi" if i % 6 == 2 else "video/mp4"][
            i % 3
        ]
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
        elif mime == "video/avi":
            w, h = 16 + i % 8, 12 + i % 5
            payload = make_avi(
                w, h, n_frames=3 + i % 4, fps=AVI_FPS_CHOICES[i % 5], seed=i
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


AVI_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("mean_luma_f0", T.DoubleType(), True),
        T.StructField("mean_luma_all", T.DoubleType(), True),
    ]
)


def avi_metadata(media: DataFrame) -> DataFrame:
    """REAL video decode step: walk the RIFF/avih/strf tree for
    dimensions/frame-count/rate AND numpy-decode every '00db' frame's
    BGR bytes for per-frame pixel means — all from the actual payload,
    via Arrow-batched mapInPandas. Non-AVI payloads yield NULLs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            heads, f0, fall = [], [], []
            for b in pdf["payload"]:
                payload = bytes(b)  # one copy + one header walk per row
                head = parse_avi_header(payload)
                means = (
                    decode_avi_frames(payload, header=head) if head else None
                )
                heads.append(head)
                f0.append(means[0] if means else None)
                fall.append(sum(means) / len(means) if means else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": pd.array(
                        [h[0] if h else None for h in heads], dtype="Int32"
                    ),
                    "height": pd.array(
                        [h[1] if h else None for h in heads], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [h[2] if h else None for h in heads], dtype="Int32"
                    ),
                    "fps": pd.array(
                        [1e6 / h[3] if h else None for h in heads], dtype="float64"
                    ),
                    "duration_ms": pd.array(
                        [h[2] * h[3] / 1000.0 if h else None for h in heads],
                        dtype="float64",
                    ),
                    "mean_luma_f0": pd.array(f0, dtype="float64"),
                    "mean_luma_all": pd.array(fall, dtype="float64"),
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        batches, schema=AVI_META_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def avi_frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode every `every_n`-th frame of each AVI
    payload and emit its mean pixel value — the decode-one-frame-in-N
    pattern a training pipeline runs over video corpora. Non-AVI rows
    produce no output rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lumas = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                means = decode_avi_frames(bytes(b))
                if not means:
                    continue
                for f in range(0, len(means), every_n):
                    ids.append(mid)
                    idxs.append(f)
                    lumas.append(means[f])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "mean_luma": pd.array(lumas, dtype="float64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
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

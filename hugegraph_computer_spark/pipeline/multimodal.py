"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched mapInPandas.

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features keyed on the payload
hash) — but everything Spark-side is real and tested: the schema, the
binary column handling, the mapInPandas batch shape, and the
partitioning. Swapping `_decode_stub` for PIL/torchaudio is a one-line
change that does not touch the plan.

Scale notes: binary payloads ride the shuffle as-is; feature extraction
is mapInPandas (one Arrow batch per ~10k rows, no per-row Python);
repartition by content hash spreads hot mime-types.
"""

from __future__ import annotations

import hashlib
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


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (seeded payloads) for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 3)
        mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
        rows.append((i, mime, 64 + i % 8, 48 + i % 5, bytearray(payload)))
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

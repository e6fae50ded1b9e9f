"""Multimodal plumbing tests: real PNG header decode + stubbed
feature extraction over binary columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_computer_spark.pipeline.multimodal import (
    extract_features,
    frame_sample_plan,
    make_png,
    parse_png_header,
    png_metadata,
    synth_media,
)


def test_png_roundtrip_pure():
    """make_png produces a valid PNG whose IHDR parses back exactly."""
    b = make_png(33, 21, seed=7)
    assert parse_png_header(b) == (33, 21, 8, 0)
    assert parse_png_header(b"not a png") is None
    assert parse_png_header(b[:10]) is None
    # stdlib zlib can actually inflate the IDAT scanlines
    import struct
    import zlib

    idat_len = struct.unpack(">I", b[33:37])[0]
    raw = zlib.decompress(b[41 : 41 + idat_len])
    assert len(raw) == 21 * (33 + 1)  # filter byte + row, per scanline


def test_png_metadata_matches_generator(spark):
    """The Spark decode path recovers the generator's ground-truth
    dimensions from the actual bytes (the multimodal_png gate oracle)."""
    media = synth_media(spark, n=24)
    got = {
        r["media_id"]: (r["width"], r["height"], r["bit_depth"])
        for r in png_metadata(media).where(F.col("mime") == "image/png").collect()
    }
    assert got == {
        i: (64 + i % 8, 48 + i % 5, 8) for i in range(24) if i % 3 == 0
    }
    # non-PNG payloads decode to NULLs, not errors
    other = png_metadata(media).where(F.col("mime") != "image/png").collect()
    assert other and all(r["width"] is None for r in other)


def test_extract_features_shape(spark):
    feats = extract_features(synth_media(spark, n=12), dim=8).collect()
    assert len(feats) == 12
    assert all(len(r["features"]) == 8 for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(synth_media(spark, n=12), every_n=2)
    rows = plan.collect()
    assert rows and all(r["frame_idx"] % 2 == 0 for r in rows)

"""Multimodal plumbing tests: real PNG header decode + stubbed
feature extraction over binary columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_computer_spark.pipeline.multimodal import (
    make_wav,
    parse_wav_header,
    wav_metadata,
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


def test_wav_roundtrip_pure():
    """make_wav produces a valid PCM-16 RIFF file whose chunks parse
    back exactly, including stereo block alignment and word-aligned
    unknown-chunk skipping."""
    b = make_wav(sample_rate=11025, channels=2, n_samples=37, seed=3)
    assert parse_wav_header(b) == (11025, 2, 16, 37)
    assert len(b) == 44 + 37 * 2 * 2  # canonical header + frames
    assert parse_wav_header(b"RIFFxxxx") is None
    assert parse_wav_header(b"not audio at all") is None
    # an extra odd-length chunk between fmt and data must be skipped
    import struct

    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    head = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert parse_wav_header(head) == (11025, 2, 16, 37)


def test_wav_metadata_matches_generator(spark):
    """The Spark decode path recovers the generator's ground-truth
    parameters from the actual bytes (the multimodal_wav gate oracle)."""
    media = synth_media(spark, n=24)
    got = {
        r["media_id"]: (
            r["sample_rate"], r["channels"], r["bits_per_sample"], r["n_samples"]
        )
        for r in wav_metadata(media).where(F.col("mime") == "audio/wav").collect()
    }
    assert got == {
        i: (8000 + 1000 * (i % 5), 1 + i % 2, 16, 40 + i % 9)
        for i in range(24)
        if i % 3 == 1
    }
    # non-WAV payloads decode to NULLs, not errors
    other = wav_metadata(media).where(F.col("mime") != "audio/wav").collect()
    assert other and all(r["sample_rate"] is None for r in other)


def _splice_riff(chunks: list[bytes]) -> bytes:
    """Assemble a RIFF/WAVE container from raw chunk byte strings."""
    import struct

    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt_chunk(
    audio_format=1, channels=1, sample_rate=8000, block_align=2, bits=16
):
    import struct

    body = struct.pack(
        "<HHIIHH",
        audio_format,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    return b"fmt " + struct.pack("<I", len(body)) + body


def test_wav_malformed_chunks_yield_none_not_errors():
    """RIFF walker hardening (round-4 verdict task 8): truncated and
    crafted chunk structures must degrade to None (-> NULL rows in the
    Spark path), mirroring the PNG path's invalid-payload handling."""
    import struct

    # fmt chunk declares 16 bytes but the payload is cut mid-chunk
    whole = _splice_riff([_fmt_chunk()])
    truncated_fmt = whole[:-10]
    assert parse_wav_header(truncated_fmt) is None

    # data chunk declares more bytes than the payload carries: the
    # walker trusts only the bytes present (truncated frame count, no
    # out-of-range read)
    data = b"data" + struct.pack("<I", 400) + b"\x00" * 100
    assert parse_wav_header(_splice_riff([_fmt_chunk(), data])) == (
        8000, 1, 16, 50,
    )

    # odd-sized chunk followed by its pad byte: the pad must be skipped
    # so the data chunk after it still parses (8-bit mono, 7 frames)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    data8 = b"data" + struct.pack("<I", 7) + b"\x07" * 7
    assert parse_wav_header(
        _splice_riff([_fmt_chunk(block_align=1, bits=8), odd, data8])
    ) == (8000, 1, 8, 7)

    # zero sample_rate: would divide-by-zero in wav_metadata's duration
    # arithmetic — must parse to None instead (ADVICE round 4)
    zero_rate = _splice_riff(
        [_fmt_chunk(sample_rate=0), b"data" + struct.pack("<I", 4) + b"\x00" * 4]
    )
    assert parse_wav_header(zero_rate) is None
    # zero block_align guard still holds alongside it
    zero_align = _splice_riff(
        [
            _fmt_chunk(block_align=0),
            b"data" + struct.pack("<I", 4) + b"\x00" * 4,
        ]
    )
    assert parse_wav_header(zero_align) is None


def test_wav_metadata_zero_rate_payload_nulls_one_row(spark):
    """A crafted zero-sample-rate WAV must NULL its own row, not fail
    the whole mapInPandas stage with ZeroDivisionError."""
    import struct

    from hugegraph_computer_spark.pipeline.multimodal import MEDIA_SCHEMA

    zero_rate = _splice_riff(
        [_fmt_chunk(sample_rate=0), b"data" + struct.pack("<I", 4) + b"\x00" * 4]
    )
    good = make_wav(sample_rate=8000, channels=1, n_samples=10, seed=1)
    media = spark.createDataFrame(
        [
            (0, "audio/wav", None, None, bytearray(zero_rate)),
            (1, "audio/wav", None, None, bytearray(good)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in wav_metadata(media).collect()}
    assert rows[0]["sample_rate"] is None
    assert rows[1]["sample_rate"] == 8000 and rows[1]["n_samples"] == 10


def test_avi_roundtrip_pure():
    """make_avi produces a valid uncompressed RIFF-AVI whose header tree
    and frame bytes parse back exactly — including stride padding
    (3*17 = 51 -> 52) and bottom-up row order."""
    from hugegraph_computer_spark.pipeline.multimodal import (
        decode_avi_frames,
        make_avi,
        parse_avi_header,
    )

    b = make_avi(17, 13, 4, fps=25, seed=5)
    assert parse_avi_header(b) == (17, 13, 4, 40000)
    means = decode_avi_frames(b)
    assert len(means) == 4
    # pixel(f, y) = 5 + 7f + y, constant over x/channels -> frame mean
    # = 5 + 7f + (13-1)/2, independent of storage orientation
    assert all(abs(m - (5 + 7 * f + 6.0)) < 1e-9 for f, m in enumerate(means))
    # non-AVI / truncated payloads refuse gracefully
    assert parse_avi_header(b"RIFFxxxxWAVE") is None
    assert parse_avi_header(b[:40]) is None
    assert decode_avi_frames(b"\x00" * 100) is None
    # truncated movi: header still parses, malformed frame run yields []
    assert parse_avi_header(b[:-10]) == (17, 13, 4, 40000)
    assert decode_avi_frames(b[:-10]) == []


def test_avi_metadata_matches_generator(spark):
    """The Spark decode path recovers the generator's ground truth from
    the actual bytes (the multimodal_avi gate oracle): header fields
    from avih/strf, pixel means from the '00db' frames."""
    from hugegraph_computer_spark.pipeline.multimodal import (
        AVI_FPS_CHOICES,
        avi_metadata,
        synth_media,
    )

    media = synth_media(spark, n=24)
    got = {
        r["media_id"]: r
        for r in avi_metadata(media).where(F.col("mime") == "video/avi").collect()
    }
    assert set(got) == {i for i in range(24) if i % 6 == 2}
    for i, r in got.items():
        w, h, nf, fps = 16 + i % 8, 12 + i % 5, 3 + i % 4, AVI_FPS_CHOICES[i % 5]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert abs(r["fps"] - fps) < 1e-9
        assert abs(r["duration_ms"] - nf * 1000.0 / fps) < 1e-9
        assert abs(r["mean_luma_f0"] - (i + (h - 1) / 2.0)) < 1e-9
        assert abs(
            r["mean_luma_all"] - (i + 7 * (nf - 1) / 2.0 + (h - 1) / 2.0)
        ) < 1e-9
    # non-AVI payloads (png/wav/mp4) decode to NULLs, not errors
    other = avi_metadata(media).where(F.col("mime") != "video/avi").collect()
    assert other and all(r["width"] is None for r in other)


def test_avi_frame_sample_real_decode(spark):
    """Every-Nth-frame sampling decodes the actual sampled frames."""
    from hugegraph_computer_spark.pipeline.multimodal import (
        avi_frame_sample,
        synth_media,
    )

    media = synth_media(spark, n=24)
    rows = avi_frame_sample(media, every_n=2).collect()
    assert rows and all(r["frame_idx"] % 2 == 0 for r in rows)
    for r in rows:
        i, h = r["media_id"], 12 + r["media_id"] % 5
        assert i % 6 == 2  # only real AVI rows produce frames
        exp = i + 7 * r["frame_idx"] + (h - 1) / 2.0
        assert abs(r["mean_luma"] - exp) < 1e-9


def test_make_avi_rejects_wrapping_ramp_and_bad_fps():
    """The arithmetic oracle depends on pixels never wrapping mod 256
    and on fps dividing 1e6 — make_avi must ENFORCE both, not assume."""
    import pytest as _pytest

    from hugegraph_computer_spark.pipeline.multimodal import make_avi

    with _pytest.raises(ValueError, match="wraps"):
        make_avi(4, 4, n_frames=3, fps=10, seed=250)
    with _pytest.raises(ValueError, match="divide"):
        make_avi(4, 4, n_frames=3, fps=30)
    assert make_avi(4, 4, n_frames=3, fps=10, seed=200)  # max 200+14+3 < 256


def test_avi_second_stream_strf_does_not_veto_video():
    """A later strl (e.g. an audio stream's >=40-byte strf) must not
    overwrite the video stream's BI_RGB24 qualification — the check
    ORs across streams."""
    import struct

    from hugegraph_computer_spark.pipeline.multimodal import (
        _riff_chunk,
        _riff_list,
        decode_avi_frames,
        make_avi,
        parse_avi_header,
    )

    base = make_avi(6, 4, n_frames=2, fps=10, seed=3)
    # split the generated file: RIFF header (12) + hdrl LIST + movi LIST
    (hdrl_size,) = struct.unpack("<I", base[16:20])
    hdrl_end = 12 + 8 + hdrl_size + (hdrl_size & 1)
    hdrl_body = base[20:hdrl_end]
    movi = base[hdrl_end:]
    # append a second strl whose 44-byte strf is NOT 24-bit BI_RGB
    audio_strf = struct.pack("<IiiHHI", 40, 0, 0, 1, 16, 1) + b"\x00" * 24
    audio_strl = _riff_list(
        b"strl",
        _riff_chunk(b"strh", b"auds" + b"\x00" * 52)
        + _riff_chunk(b"strf", audio_strf),
    )
    hdrl2 = _riff_list(b"hdrl", hdrl_body[4:] + audio_strl)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(hdrl2) + len(movi))
        + b"AVI "
        + hdrl2
        + movi
    )
    head = parse_avi_header(payload)
    assert head is not None and head[:2] == (6, 4)
    means = decode_avi_frames(payload, header=head)
    assert means == decode_avi_frames(base)

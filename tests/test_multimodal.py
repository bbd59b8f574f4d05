"""Multimodal plumbing: binary columns, magic sniffing, decode hooks,
frame fan-out (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.operators.multimodal import (
    attach_media_metadata,
    codec_decode,
    decode_media,
    fake_decode,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"png-payload"),
        (2, bytes.fromhex("FFD8FFE0") + b"jpeg-payload"),
        (3, b"just plain text bytes"),
    ]
    return spark.createDataFrame(rows, "media_id bigint, content binary")


def test_sniff_and_metadata(spark):
    got = {
        r["media_id"]: (r["media_format"], r["byte_size"])
        for r in attach_media_metadata(_media(spark), "content").collect()
    }
    assert got[1] == ("png", 8 + len(b"png-payload"))
    assert got[2] == ("jpeg", 4 + len(b"jpeg-payload"))
    assert got[3] == ("unknown", len(b"just plain text bytes"))


def test_codec_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="decoder"):
        codec_decode(b"anything")


def test_decode_media_fake_matches_driver_side(spark):
    df = _media(spark)
    got = {r["media_id"]: r.asDict() for r in decode_media(df, "media_id", "content").collect()}
    for media_id, content in [(1, bytes.fromhex("89504E470D0A1A0A") + b"png-payload")]:
        want = fake_decode(content)
        row = got[media_id]
        assert (row["width"], row["height"], row["n_channels"]) == (
            want["width"],
            want["height"],
            want["n_channels"],
        )
        assert abs(row["mean_intensity"] - want["mean_intensity"]) < 1e-12


def test_decode_media_corrupt_rows_become_nulls(spark):
    def flaky(content: bytes):
        if content.startswith(b"\x89PNG"):
            raise ValueError("corrupt")
        return fake_decode(content)

    rows = decode_media(_media(spark), "media_id", "content", decode_fn=flaky).collect()
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[1]["width"] is None  # corrupt row survives as nulls
    assert by_id[2]["width"] is not None
    assert len(rows) == 3  # no rows lost


def test_sample_frames_fanout(spark):
    payload = bytes(range(256)) * 2  # 512 bytes -> 8 chunks of 64
    df = spark.createDataFrame([(7, payload)], "media_id bigint, content binary")
    rows = sample_frames(df, "media_id", "content", frame_bytes=64, every_n=3).collect()
    idxs = sorted(r["frame_idx"] for r in rows)
    assert idxs == [0, 3, 6]
    for r in rows:
        start = r["frame_idx"] * 64
        assert bytes(r["frame"]) == payload[start : start + 64]

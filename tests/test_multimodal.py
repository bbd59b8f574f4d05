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


# --- perceptual near-dup (dHash through the codec hook) -------------------


def test_fake_pixel_grid_shape_and_locality():
    """Grid contract: rows x cols of 0-255 ints; a single-character edit
    perturbs only the cells whose slice moved — the locality property
    dHash needs (an md5 grid would scramble everything)."""
    from spark_pipeline_spark.operators.multimodal import (
        PHASH_COLS,
        PHASH_ROWS,
        fake_pixel_grid,
    )

    base = ("the quick brown fox jumps over the lazy dog " * 10).encode()
    g = fake_pixel_grid(base)
    assert len(g) == PHASH_ROWS and all(len(r) == PHASH_COLS for r in g)
    assert all(0 <= px <= 255 for row in g for px in row)

    # same-length local edit: most cells unchanged
    edited = bytearray(base)
    edited[5] = ord("x")
    g2 = fake_pixel_grid(bytes(edited))
    diff = sum(a != b for ra, rb in zip(g, g2) for a, b in zip(ra, rb))
    assert 1 <= diff <= 3  # only the slice(s) containing the edit moved


def test_dhash_bit_packing():
    from spark_pipeline_spark.operators.multimodal import dhash_from_grid

    # 2x3 grid: row0 bits (10<20)=1, (20<5)=0 ; row1 bits (7<7)=0, (7<9)=1
    grid = [[10, 20, 5], [7, 7, 9]]
    assert dhash_from_grid(grid) == 0b1001


def test_codec_pixel_grid_is_explicit_stub():
    from spark_pipeline_spark.operators.multimodal import codec_pixel_grid

    with pytest.raises(NotImplementedError, match="grid contract"):
        codec_pixel_grid(b"anything")


def test_perceptual_hash_matches_driver_side(spark):
    from spark_pipeline_spark.operators.multimodal import (
        dhash_from_grid,
        fake_pixel_grid,
        perceptual_hash,
    )

    df = _media(spark)
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(df, "media_id", "content").collect()
    }
    for mid, content in [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"png-payload"),
        (3, b"just plain text bytes"),
    ]:
        assert got[mid] == dhash_from_grid(fake_pixel_grid(content))


def test_hamming_near_dup_pairs_blocking_is_exact_below_blocks(spark):
    """max_hamming < blocks => banded join ≡ brute force (pigeonhole)."""
    import itertools

    from spark_pipeline_spark.operators.dedup import hamming_near_dup_pairs

    fps = [
        (1, 0b1111000011110000),
        (2, 0b1111000011110001),  # hamming 1 from id 1
        (3, 0b1111000011111111),  # hamming 4 from id 1 — must NOT pair with 1
        (4, 0b0000111100001111),
        (5, 0b1111000011110000),  # exact dup of id 1
    ]
    df = spark.createDataFrame(fps, "mid bigint, fp bigint")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            df, "mid", "fp", max_hamming=3, bits=16, blocks=4
        ).collect()
    }
    want = {
        (a, b): bin(fa ^ fb).count("1")
        for (a, fa), (b, fb) in itertools.combinations(fps, 2)
        if bin(fa ^ fb).count("1") <= 3
    }
    assert got == want


def test_multimodal_neardup_media_empty_input_and_plan(spark, tmp_path):
    """Empty corpus -> empty pair frame with the contract schema; the
    plan is a banded equi-join — no cartesian/NLJ anywhere."""
    from spark_pipeline_spark.queries import REGISTRY

    # plan gate at real data
    df = REGISTRY["multimodal_neardup_media"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # empty input
    empty_dir = tmp_path / "empty_sf"
    for tname in ("documents",):
        spark.read.parquet(f"/root/testdata/sf0.001/{tname}.parquet").limit(
            0
        ).write.parquet(str(empty_dir / f"{tname}.parquet"))
    out = REGISTRY["multimodal_neardup_media"].fn(spark, str(empty_dir))
    assert out.columns == ["id_a", "id_b", "hamming"]
    assert out.count() == 0

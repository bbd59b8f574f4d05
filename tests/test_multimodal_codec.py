"""The swappable-codec hook proven against a REAL decoder (VERDICT r14
item 7): `bmp_decode` / `bmp_pixel_grid` read hand-built uncompressed
24-bpp BMP bytes (pure stdlib — no Pillow in this container), so
`decode_media`'s per-row error policy and `perceptual_hash`'s grid
contract are exercised with genuine codec error modes — wrong magic,
truncated pixel arrays, unsupported variants — not only the
deterministic fake."""

from __future__ import annotations

import struct

import pytest

from spark_pipeline_spark.operators.multimodal import (
    bmp_decode,
    bmp_pixel_grid,
    decode_media,
    dhash_from_grid,
    perceptual_hash,
    sniff_format,
)


def make_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Hand-assemble an uncompressed bottom-up 24-bpp BMP from rows of
    (r, g, b) tuples (row 0 = top)."""
    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) // 4 * 4
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + body


def gradient_bmp(w: int = 36, h: int = 28, flip: bool = False) -> bytes:
    px = [
        [((x * 255) // (w - 1),) * 3 for x in range(w)]
        for _ in range(h)
    ]
    if flip:
        px = [list(reversed(r)) for r in px]
    return make_bmp(px)


def test_bmp_decode_roundtrip():
    img = make_bmp([[(255, 0, 0), (0, 255, 0)],
                    [(0, 0, 255), (255, 255, 255)]])
    meta = bmp_decode(img)
    assert (meta["width"], meta["height"], meta["n_channels"]) == (2, 2, 3)
    # 12 samples: three 255s per pure channel + three 255s for white
    expected = (255 * 6) / 12 / 255.0
    assert abs(meta["mean_intensity"] - expected) < 1e-9


def test_bmp_decode_error_modes():
    img = make_bmp([[(1, 2, 3)]])
    with pytest.raises(ValueError, match="magic"):
        bmp_decode(b"PK" + img[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(img[:20])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(img[:-2])  # pixel array short
    bad_bpp = bytearray(img)
    struct.pack_into("<H", bad_bpp, 28, 32)
    with pytest.raises(ValueError, match="unsupported"):
        bmp_decode(bytes(bad_bpp))


def test_decode_media_per_row_policy_with_real_codec(spark):
    """One corrupt payload must null its own row, not kill the batch —
    the policy's first exercise with a real decoder's exceptions."""
    good = make_bmp([[(10, 20, 30), (40, 50, 60)]])
    rows = [
        (1, good),
        (2, good[:20]),          # truncated header
        (3, b"JUNK" + good),     # wrong magic
        (4, good[:-2]),          # truncated pixels
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, content BINARY")
    out = {
        r["media_id"]: r
        for r in decode_media(
            df, "media_id", "content", decode_fn=bmp_decode
        ).collect()
    }
    assert len(out) == 4
    assert (out[1]["width"], out[1]["height"]) == (2, 1)
    assert out[1]["mean_intensity"] is not None
    for bad in (2, 3, 4):
        assert out[bad]["width"] is None
        assert out[bad]["mean_intensity"] is None


def test_bmp_sniffed_and_decoded_consistently(spark):
    img = gradient_bmp()
    df = spark.createDataFrame([(1, img)], "media_id BIGINT, content BINARY")
    fmt = df.select(sniff_format("content").alias("f")).first()["f"]
    assert fmt == "bmp"
    meta = bmp_decode(img)
    assert (meta["width"], meta["height"]) == (36, 28)


def test_perceptual_hash_locality_with_real_pixels(spark):
    """The dHash locality property on REAL decoded pixels: a smooth
    left-to-right ramp yields the all-ascending fingerprint, its
    mirrored twin the all-descending one — maximal Hamming distance —
    while a lightly perturbed copy of the ramp stays nearby."""
    ramp = gradient_bmp()
    mirrored = gradient_bmp(flip=True)
    # perturb one interior pixel of the ramp
    perturbed = bytearray(ramp)
    perturbed[200] = perturbed[200] ^ 0x10
    df = spark.createDataFrame(
        [(1, ramp), (2, mirrored), (3, bytes(perturbed))],
        "media_id BIGINT, content BINARY",
    )
    fps = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(
            df, "media_id", "content", grid_fn=bmp_pixel_grid
        ).collect()
    }
    assert fps[1] == dhash_from_grid(bmp_pixel_grid(ramp))  # engine == local
    full = (1 << 56) - 1
    assert fps[1] == full  # ascending everywhere
    assert fps[2] == 0     # descending everywhere
    d_near = bin(fps[1] ^ fps[3]).count("1")
    assert d_near <= 4     # local edit moves few bits

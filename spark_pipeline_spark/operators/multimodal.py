"""Multimodal columns: opaque binary media + typed metadata + batched
decode plumbing.

North-star capability (SURVEY.md §2.11). The data model: media travels
as an ordinary ``binary`` column next to typed metadata columns — no
special storage, full Spark semantics (predicate pushdown on metadata,
binary payloads only materialized where referenced).

Two layers, deliberately separated:

1. **JVM-side metadata** (`attach_media_metadata`, `sniff_format`) —
   byte size and container-format sniffing from magic prefixes are pure
   Catalyst expressions; a 100 TB corpus can be inventoried/filtered by
   format without a single Python worker or full decode.
2. **Python-side decode** (`decode_media`, `sample_frames`) — Arrow
   ``mapInPandas`` with an explicit output schema and a *swappable
   decode function*. Real codecs (Pillow/ffmpeg/torchaudio) are not in
   this container, so the default decoder is :func:`fake_decode` — a
   clearly-marked deterministic stand-in that derives pseudo-metadata
   from the md5 of the bytes (NOT a real decoder); :func:`codec_decode`
   documents the production hook and raises ``NotImplementedError``.
   Everything around the hook — batch shape, schema contract, binary
   transfer through Arrow, per-row error policy — is real and tested.

Scale notes: decode is the expensive stage — repartition by a key before
``decode_media`` so batches are balanced (one 4 GB video per batch vs a
thousand thumbnails); keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
small for large payloads (Arrow batches hold ``batch × payload`` bytes
in memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MAGIC_PREFIXES",
    "sniff_format",
    "attach_media_metadata",
    "fake_decode",
    "codec_decode",
    "decode_media",
    "sample_frames",
    "PHASH_ROWS",
    "PHASH_COLS",
    "PHASH_BITS",
    "fake_pixel_grid",
    "codec_pixel_grid",
    "dhash_from_grid",
    "perceptual_hash",
]

# (format, hex prefix of the file's magic bytes) — public file signatures.
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("riff", "52494646"),  # wav/avi/webp container
    ("pdf", "25504446"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sniff_format(content: Column | str) -> Column:
    """Container format from magic bytes — a pure expression over the
    binary prefix (no decode, no Python)."""
    head = F.hex(F.substring(_c(content), 1, 8))
    expr: Column = F.lit("unknown")
    for name, prefix in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix), F.lit(name)).otherwise(expr)
    return expr


def attach_media_metadata(df: DataFrame, content_col: str) -> DataFrame:
    """Add ``byte_size`` / ``media_format`` metadata columns for a binary
    column — the JVM-side inventory pass."""
    return df.withColumns(
        {
            "byte_size": F.length(_c(content_col)),
            "media_format": sniff_format(content_col),
        }
    )


def fake_decode(content: bytes) -> dict[str, Any]:
    """DETERMINISTIC FAKE decoder (no media libraries in this
    environment): derives stand-in dimensions/intensity from the md5 of
    the raw bytes. Only the *values* are fake — the decode contract
    (bytes in, metadata dict out) is the real one.
    """
    h = hashlib.md5(content).hexdigest()
    return {
        "width": int(h[0:8], 16) % 512 + 1,
        "height": int(h[8:16], 16) % 512 + 1,
        "n_channels": 3,
        "mean_intensity": float(int(h[16:24], 16)) / float(1 << 32),
    }


def codec_decode(content: bytes) -> dict[str, Any]:
    """Production decode hook. Wire Pillow / ffmpeg / torchaudio here;
    this container ships none of them."""
    raise NotImplementedError(
        "no media codec available in this environment; pass "
        "decode_fn=fake_decode (deterministic stand-in) or supply a real "
        "decoder with the same bytes -> dict contract"
    )


DECODED_SCHEMA = (
    "{id} {id_type}, width int, height int, n_channels int, mean_intensity double"
)


def decode_media(
    df: DataFrame,
    id_col: str,
    content_col: str,
    decode_fn: Callable[[bytes], dict[str, Any]] = fake_decode,
) -> DataFrame:
    """Batched decode: binary column → typed media metadata via Arrow
    ``mapInPandas``.

    Output schema is explicit DDL (never inferred); rows whose bytes fail
    to decode surface as nulls in the metadata columns rather than
    killing the batch (per-row error policy — at a billion media files,
    some are corrupt).
    """
    id_type = dict(df.dtypes)[id_col]
    schema = DECODED_SCHEMA.format(id=id_col, id_type=id_type)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for media_id, content in zip(batch[id_col], batch[content_col]):
                try:
                    meta = decode_fn(bytes(content))
                except NotImplementedError:
                    raise
                except Exception:
                    meta = {
                        "width": None,
                        "height": None,
                        "n_channels": None,
                        "mean_intensity": None,
                    }
                out.append({id_col: media_id, **meta})
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


# dHash grid: ROWS x COLS grayscale cells -> ROWS x (COLS-1) horizontal
# gradient bits. The classic dHash is 8x9 -> 64 bits; we use 7x9 -> 56
# so the fingerprint always fits a SIGNED bigint (same reason
# SIMHASH_BITS is 60, dedup.py) — bit 63 would overflow the column type
# on both engines.
PHASH_ROWS, PHASH_COLS = 7, 9
PHASH_BITS = PHASH_ROWS * (PHASH_COLS - 1)


def fake_pixel_grid(
    content: bytes, rows: int = PHASH_ROWS, cols: int = PHASH_COLS
) -> list[list[int]]:
    """DETERMINISTIC FAKE "resize to a tiny grayscale grid" (no image
    codec in this environment): treat the payload as a 1-D signal of
    UTF-8 code points and average-pool it into ``rows*cols`` cells —
    cell k covers code points [k*n/cells, (k+1)*n/cells) and its pixel
    is their sum mod 256. Only the *pixels* are fake; the contract
    (bytes in, small grayscale grid out) and the LOCALITY property the
    dHash needs — a local edit perturbs only nearby cells — are the
    real ones, which is what makes the downstream near-dup behavior
    representative (unlike an md5-derived grid, under which only
    byte-identical payloads would ever collide)."""
    import numpy as np

    # vectorized code points: utf-32-le round-trip == [ord(c) for c in s]
    # (surrogate-free by construction of str), prefix sums give every
    # cell's slice sum in O(n) — the scalar ord/sum loop was the hot
    # path of the fingerprint mapInPandas pass (measured 4.9 s at sf0.1)
    s = content.decode("utf-8", errors="replace")
    cps = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    n, cells = len(cps), rows * cols
    k = np.arange(cells + 1, dtype=np.int64)
    bounds = (k * n) // cells
    csum = np.concatenate(([0], np.cumsum(cps)))
    flat = ((csum[bounds[1:]] - csum[bounds[:-1]]) % 256).tolist()
    return [flat[r * cols : (r + 1) * cols] for r in range(rows)]


def codec_pixel_grid(content: bytes) -> list[list[int]]:
    """Production grid hook: wire Pillow here (decode -> grayscale ->
    ``Image.resize((PHASH_COLS, PHASH_ROWS))``); this container ships no
    image codec."""
    raise NotImplementedError(
        "no image codec available in this environment; pass "
        "grid_fn=fake_pixel_grid (deterministic stand-in) or supply a "
        "real decoder with the same bytes -> rows x cols grid contract"
    )


def dhash_from_grid(grid: list[list[int]]) -> int:
    """Difference hash (dHash): bit r*(cols-1)+c is set iff
    grid[r][c] < grid[r][c+1] — the horizontal-gradient fingerprint
    (public pHash/dHash family; robust to uniform brightness shifts,
    cheap to compare by xor+popcount)."""
    fp, b = 0, 0
    for row in grid:
        for c in range(len(row) - 1):
            if row[c] < row[c + 1]:
                fp |= 1 << b
            b += 1
    return fp


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    content_col: str,
    grid_fn: Callable[[bytes], list[list[int]]] = fake_pixel_grid,
) -> DataFrame:
    """64-bit-class perceptual fingerprints for binary media: decode each
    payload to a tiny grayscale grid through the swappable codec hook
    (`fake_pixel_grid` default, `codec_pixel_grid` in production), then
    dHash it — one Arrow ``mapInPandas`` pass, output ``(id, phash
    bigint)``.

    Pair generation belongs downstream in
    `dedup.hamming_near_dup_pairs` (bit-block candidates + popcount
    verify — never all-pairs); this operator only fingerprints, so one
    decode pass serves any number of threshold sweeps. Scale: output is
    two fixed-width columns per media file; the expensive decode is
    embarrassingly parallel — repartition upstream for balance like
    `decode_media`."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, phash bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for media_id, content in zip(batch[id_col], batch[content_col]):
                out.append(
                    {
                        id_col: media_id,
                        "phash": dhash_from_grid(grid_fn(bytes(content))),
                    }
                )
            yield pd.DataFrame(out, columns=[id_col, "phash"])

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    content_col: str,
    frame_bytes: int = 4096,
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split the byte
    stream into fixed-size chunks ("frames") and keep every ``n``-th.

    With no video codec available the chunking is byte-positional (a
    deterministic stand-in for keyframe extraction), but the operator
    shape is the production one: one input row fans out to (id,
    frame_idx, frame binary) rows through ``mapInPandas``, and downstream
    feature extraction treats frames as independent rows.
    """
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content)
                chunks = [
                    data[i : i + frame_bytes]
                    for i in range(0, len(data), frame_bytes)
                ]
                for idx in range(0, len(chunks), every_n):
                    rows.append(
                        {id_col: media_id, "frame_idx": idx, "frame": chunks[idx]}
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)

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

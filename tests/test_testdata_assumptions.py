"""Guards for corpus-shape assumptions that oracle pairs silently rely
on (ADVICE r14): several SQL oracles slice ``documents.text`` by
CHARACTERS while the Spark side operates on UTF-8 BYTES (e.g. the
multimodal family encodes text as the stand-in media payload). Those
pairs are equivalent ONLY for ASCII corpora — assert it per SF instead
of letting a future non-ASCII regeneration silently diverge.

Pure-DuckDB checks — no Spark session, runs in milliseconds.
"""

import os

import duckdb
import pytest

_SF_DIRS = [
    d for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ) if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_text_is_ascii(sf_dir):
    """octet_length == char length for every document ⇒ byte-positional
    framing (Spark) and character slicing (oracle SQL) agree."""
    con = duckdb.connect()
    n_bad, = con.execute(
        "SELECT count(*) FROM read_parquet(?) "
        "WHERE octet_length(encode(text)) != length(text)",
        [f"{sf_dir}/documents.parquet"],
    ).fetchone()
    assert n_bad == 0, (
        f"{sf_dir}: {n_bad} non-ASCII documents — byte-framing oracles "
        f"(multimodal family) would diverge from their SQL character "
        f"slicing; re-derive those oracles over octet positions first"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_have_nonnull_text_and_ids(sf_dir):
    con = duckdb.connect()
    n_null, = con.execute(
        "SELECT count(*) FROM read_parquet(?) "
        "WHERE text IS NULL OR doc_id IS NULL",
        [f"{sf_dir}/documents.parquet"],
    ).fetchone()
    assert n_null == 0

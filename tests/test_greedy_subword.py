"""greedy_subword_count: the Catalyst aggregate-fold greedy encoder vs
an independent pure-Python reference of the same WordPiece matching
rule (longest piece 4→3→2, else single char). Hypothesis drives random
words and random vocabularies; the DuckDB recursive-CTE replay in
`tokenizer_fertility_documents`' oracle is the third implementation,
checked by parity."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import greedy_subword_count


def _ref_count(word: str, vocab: set[str]) -> int:
    """Reference greedy longest-match piece count, plain Python."""
    pos, n = 0, 0
    while pos < len(word):
        for k in (4, 3, 2):
            if word[pos : pos + k] in vocab and len(word[pos : pos + k]) == k:
                pos += k
                break
        else:
            pos += 1
        n += 1
    return n


# Tiny alphabet so vocab pieces actually collide with words, but include
# the SQL-literal hazard characters — backslash and single quote — so a
# bad escape in the embedded vocab literal diverges from the reference
# (or fails to parse) instead of hiding behind a letters-only alphabet.
_ALPHA = "ab\\'"


words_st = st.lists(
    st.text(alphabet=_ALPHA, min_size=0, max_size=12), min_size=1, max_size=8
)
vocab_st = st.lists(
    st.text(alphabet=_ALPHA, min_size=2, max_size=4), max_size=10, unique=True
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=words_st, vocab=vocab_st)
def test_greedy_fold_matches_python_reference(spark, words, vocab):
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["n"]
        for r in df.select(
            "term", greedy_subword_count("term", vocab).alias("n")
        ).collect()
    }
    vset = set(vocab)
    for w in set(words):
        assert got[w] == _ref_count(w, vset), (w, vocab)


def test_greedy_pinned_examples(spark):
    """Hand-pinned cases: longest-match preference, overlap consumption,
    empty string, and the no-vocab degenerate (pure char count)."""
    vocab = ["ab", "abc", "cd"]
    rows = [("abcd",), ("ababab",), ("",), ("zzz",)]
    df = spark.createDataFrame(rows, "term string")
    got = {
        r["term"]: r["n"]
        for r in df.select(
            "term", greedy_subword_count("term", vocab).alias("n")
        ).collect()
    }
    # abcd: 'abc' (longest wins over 'ab') + 'd' = 2
    # ababab: 'ab' x3 = 3;  '' = 0;  zzz: chars = 3
    assert got == {"abcd": 2, "ababab": 3, "": 0, "zzz": 3}

    no_vocab = {
        r["term"]: r["n"]
        for r in df.select(
            "term", greedy_subword_count("term", []).alias("n")
        ).collect()
    }
    assert no_vocab == {"abcd": 4, "ababab": 6, "": 0, "zzz": 3}


def test_greedy_escape_hazard_pieces(spark):
    """Vocab pieces containing backslash / quote must round-trip the
    embedded SQL literal: a piece ending in a backslash used to escape
    the closing quote (parse error), and interior backslashes encoded
    the wrong piece."""
    vocab = ["a\\", "\\\\", "a'b", "'\\"]
    rows = [("a\\b",), ("\\\\",), ("a'b'c",), ("'\\x",), ("",)]
    df = spark.createDataFrame(rows, "term string")
    got = {
        r["term"]: r["n"]
        for r in df.select(
            "term", greedy_subword_count("term", vocab).alias("n")
        ).collect()
    }
    vset = set(vocab)
    assert got == {w: _ref_count(w, vset) for (w,) in rows}


def test_greedy_rejects_bad_piece_lengths():
    with pytest.raises(ValueError):
        greedy_subword_count("term", ["a"])
    with pytest.raises(ValueError):
        greedy_subword_count("term", ["abcde"])

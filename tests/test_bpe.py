"""Iterated BPE training (`operators/bpe.py`): merge-application
semantics, determinism/early-stop, and the claim that justifies the
trainer's existence — a BPE-trained vocabulary beats the same-budget
char-n-gram baseline through the SAME greedy apply path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.operators.bpe import bpe_train
from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def _wc(spark, rows):
    return spark.createDataFrame(rows, "term string, n long")


def test_merge_application_is_left_to_right_single_pass(spark):
    """The fold must implement the standard non-overlapping left-to-right
    scan: 'aaaa' under merge (a,a) becomes [aa, aa]; 'aaa' becomes
    [aa, a] (the trailing 'a' is NOT merged with the fresh 'aa')."""
    merges, sym = bpe_train(_wc(spark, [("aaaa", 10), ("aaa", 1)]), 1)
    assert merges == [{"step": 1, "pair": "a a", "n": 32}]
    got = {r["term"]: r["s"] for r in sym.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_merged_symbols_compose_across_rounds(spark):
    """Round 2 counts pairs over round-1's merged symbols — 'abab'
    learns (a,b) then (ab,ab)."""
    merges, sym = bpe_train(_wc(spark, [("abab", 5)]), 2)
    assert [m["pair"] for m in merges] == ["a b", "ab ab"]
    assert merges[0]["n"] == 10 and merges[1]["n"] == 5
    assert sym.collect()[0]["s"] == ["abab"]


def test_tie_break_and_weighting(spark):
    """Counts are word-frequency weighted; equal counts break to the
    lexicographically smaller pair (the oracle convention)."""
    # 'xy' seen 3 times (pair x y count 3); 'zw' seen 3 times — tie on
    # (w z? no) 'x y' vs 'z w': both 3, 'x y' < 'z w'
    merges, _ = bpe_train(_wc(spark, [("xy", 3), ("zw", 3)]), 1)
    assert merges == [{"step": 1, "pair": "x y", "n": 3}]


def test_early_stop_when_fully_merged(spark):
    """Training stops when every word is one symbol — no empty-pair
    rounds, no error."""
    merges, sym = bpe_train(_wc(spark, [("ab", 2)]), 5)
    assert [m["pair"] for m in merges] == ["a b"]
    assert sym.collect()[0]["s"] == ["ab"]


def test_n_merges_validation(spark):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(_wc(spark, [("ab", 1)]), 0)


def test_trained_vocab_beats_ngram_baseline_fertility(spark):
    """VERDICT r12 item 4 'done' gate: corpus-weighted fertility
    (pieces per word) through `greedy_subword_count` — the
    `tokenizer_fertility_documents` apply path — with the 2-4-char
    pieces of a 64-merge BPE vocabulary is strictly better than with
    the top-64 char-{2,3,4}-gram vocabulary (the existing baseline
    derivation), and the direct BPE encode (the symbol arrays
    themselves) is better still. Measured at sf0.001: ~2.21 vs ~2.91
    vs ~1.77 pieces/word."""
    from spark_pipeline_spark.functions import greedy_subword_count

    toks = (
        t(spark, SF_SMALL, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), "\\s+")
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )
    wc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        merges, sym = bpe_train(wc, 64)
        bpe_vocab = [
            p for p in (m["pair"].replace(" ", "") for m in merges)
            if 2 <= len(p) <= 4
        ]
        grams = None
        for n in (2, 3, 4):
            g = toks.filter(F.length("term") >= n).select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, length(term) - {n} + 1),"
                        f" i -> substring(term, i, {n}))"
                    )
                ).alias("g")
            )
            grams = g if grams is None else grams.unionAll(g)
        gram_vocab = [
            r["g"]
            for r in grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("g"))
            .limit(64)
            .collect()
        ]

        def fertility(vocab):
            return (
                wc.select(
                    "n", greedy_subword_count("term", vocab).alias("p")
                )
                .agg((F.sum(F.col("n") * F.col("p")) / F.sum("n")))
                .first()[0]
            )

        f_bpe, f_gram = fertility(bpe_vocab), fertility(gram_vocab)
        f_direct = sym.agg(
            F.sum(F.col("n") * F.size("s")) / F.sum("n")
        ).first()[0]
        assert f_bpe < f_gram, (f_bpe, f_gram)
        assert f_direct <= f_bpe, (f_direct, f_bpe)
    finally:
        wc.unpersist()

"""Iterated distributed BPE training (Sennrich et al. 2016) — the
tokenizer-trainer loop at corpus scale.

North-star capability (SURVEY.md §2.11; the reference has no text
functions at all — its closest hook is the ``transform-sql`` passthrough,
``sparktools/core.py:158-160``). `bpe_merge_candidates_documents`
computes ONE merge round's statistics; real tokenizer training iterates:
count adjacent symbol pairs (weighted by word frequency), merge the most
frequent pair everywhere, recount, N times.

Scale design — why this survives 100 TB:

- The loop runs over the **word-frequency table**, never the corpus: one
  corpus scan builds ``(term, n)`` (orders of magnitude smaller than the
  token stream — the classic BPE trainer layout), and every subsequent
  round touches only that vocabulary-sized frame.
- Pair counting is explode → groupBy(pair) → sum(n): map-side partial
  combine, one keyed shuffle of pair-count rows per round.
- The winning merge is ONE top-1 row fetched to the driver per round
  (contract-bounded, the k-center argmin discipline), then applied as a
  pure Catalyst ``aggregate`` left-fold over each word's symbol array —
  no Python UDFs, no per-row Python.
- ``localCheckpoint`` truncates lineage between rounds (the
  `connected_components` / `pagerank` iterative discipline), so round
  R's plan does not replay rounds 1..R-1.

Left-to-right merge semantics: the fold appends symbols to an
accumulator and, when (last(acc), current) equals the winning pair,
replaces the last element with the merged symbol. Because the merged
symbol ``a||b`` can never equal ``a`` (``b`` is nonempty), a freshly
merged element never re-matches as the LEFT side in the same pass —
i.e. the fold is exactly the standard single-pass, non-overlapping,
left-to-right BPE application (on ``aaa`` with merge ``(a,a)`` it
produces ``[aa, a]``, not ``[aa, aa]``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train"]


def _apply_merge(s, a: str, b: str):
    """Single-pass left-to-right application of merge ``(a, b) -> a||b``
    to a symbol-array column (see module docstring for why the fold is
    exactly BPE's non-overlapping scan)."""
    merged = a + b
    rest = F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.slice(s, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    term_col: str = "term",
    count_col: str = "n",
) -> tuple[list[dict], DataFrame]:
    """Train ``n_merges`` BPE merges over a word-frequency table.

    ``words``: ``(term_col string, count_col long)`` — distinct words
    with corpus frequencies (the one corpus-sized aggregation happens
    BEFORE this call; the loop itself is vocabulary-sized). Terms must
    be non-empty and whitespace-free (whitespace-split tokens are —
    the pair key joins symbols with a space, unambiguous by
    construction).

    Returns ``(merges, symbols)``: ``merges`` is the learned table —
    one dict ``{"step", "pair", "n"}`` per round, where ``pair`` is
    ``"a b"`` and ``n`` the weighted pair count at the time it won
    (count desc, pair asc tie-break — the deterministic convention
    every oracle replays) — and ``symbols`` the final
    ``(term, n, s array<string>)`` frame encoding each word under all
    learned merges. Training stops early if a round finds no pairs
    (every word collapsed to one symbol)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from spark_pipeline_spark.operators.graph import _free_local_checkpoint

    sym = words.select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("long").alias("n"),
        F.split(term_col, "").alias("s"),
    ).localCheckpoint(eager=True)

    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        pair_expr = F.transform(
            F.sequence(F.lit(1), F.size("s") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("s"), i), F.element_at(F.col("s"), i + 1)
            ),
        )
        top = (
            sym.filter(F.size("s") >= 2)
            .select("n", F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("n").alias("__cnt"))
            .orderBy(F.desc("__cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["__cnt"])
        a, b = pair.split(" ", 1)
        merges.append({"step": step, "pair": pair, "n": cnt})
        new_sym = sym.select(
            "term", "n", _apply_merge(F.col("s"), a, b).alias("s")
        ).localCheckpoint(eager=True)
        _free_local_checkpoint(sym, successor=new_sym)
        sym = new_sym
    return merges, sym

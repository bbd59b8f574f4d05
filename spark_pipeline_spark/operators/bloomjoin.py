"""Bloom-filter join pruning: shrink the big side BEFORE its shuffle.

Scale story: joining a 100 TB fact table to a filtered dimension
shuffles the full fact side even when only a few % of its rows can
possibly match. Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects this
automatically in some plans, but it is opportunistic and its
``bloom_filter_agg`` aggregate is not exposed to the SQL/DataFrame
surface. This operator makes the pattern explicit and deterministic:

1. build a Bloom filter over the dimension keys DISTRIBUTED-side — each
   key sets ``n_hashes`` bits (seeded ``xxhash64``); the bitmap is a
   SPARSE ``map<word_index, long>`` assembled in one aggregation
   (``bit_or`` per 64-bit word, then ``map_from_entries``) so nothing
   ever passes through the driver;
2. broadcast the one-row bitmap to the fact side (``crossJoin`` +
   ``broadcast`` — the same tiny-aggregate broadcast pattern as
   ``layout.zorder_by`` bounds) and keep only rows whose ``n_hashes``
   bits are all set — pure codegen bit arithmetic, no UDF;
3. run the real equi-join on the survivors.

No false negatives by construction, so step 3 removes the false
positives and the composed result is EXACTLY the plain join — which is
what the oracle checks. The fact-side shuffle after pruning carries
``selectivity + fpr`` of the rows instead of all of them.

Sizing: with ``n_bits = 10 × |dim|`` and ``n_hashes = 7`` the classic
false-positive rate is <1%. The broadcast map holds at most
``min(n_hashes · |dim|, n_bits / 64)`` entries — for a 1M-key dimension
at 10 bits/key that is ≤160k map entries (~2.5 MB), well under
broadcast limits; dimensions too large for that are too large for
bloom pruning to pay off anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_bitmap", "bloom_might_contain", "bloom_prune_join"]


def _bit_positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The ``n_hashes`` bit positions a key sets — seeded xxhash64,
    folded into [0, n_bits). ``pmod`` keeps negatives out."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)
    ]


def bloom_bitmap(
    dim: DataFrame, key: str, n_bits: int = 1 << 20, n_hashes: int = 7
) -> DataFrame:
    """One-row DataFrame ``(bf: map<int,long>)``: the sparse Bloom bitmap
    over ``dim[key]``. Fully distributed: explode each key's bit
    positions, ``bit_or`` per 64-bit word (partial-combines map-side),
    assemble the word map in a final single-row aggregation."""
    pos = F.explode(F.array(*_bit_positions(F.col(key), n_bits, n_hashes)))
    words = (
        dim.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("__word"),
            # call_function: the SQL shiftleft takes a column shift
            # amount; the pyspark wrapper accepts only a literal int
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__word", "__bits")))
        ).alias("bf")
    )


def bloom_might_contain(
    bf: Column, key: Column, n_bits: int, n_hashes: int
) -> Column:
    """True iff all of ``key``'s bits are set in the bitmap map column.
    A missing word means bit unset (``element_at`` → NULL → false)."""
    cond = F.lit(True)
    for p in _bit_positions(key, n_bits, n_hashes):
        word = (p / 64).cast("int")
        bit = (p % 64).cast("int")
        hit = (
            F.call_function(
                "shiftright",
                F.coalesce(F.element_at(bf, word), F.lit(0).cast("long")),
                bit,
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
        cond = cond & hit
    return cond


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the fact side Bloom-pruned first.

    Result is exactly ``fact.join(dim, on=key, how=...)`` for ``inner``
    and ``left_semi`` (the joins that can only shrink the fact side) —
    the filter admits no false negatives and the join removes false
    positives.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom pruning only preserves inner/left_semi semantics, got {how!r}"
        )
    dk = dim_key or fact_key
    bitmap = bloom_bitmap(dim, dk, n_bits, n_hashes)
    pruned = (
        fact.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("bf"), F.col(fact_key), n_bits, n_hashes))
        .drop("bf")
    )
    if dk == fact_key:
        return pruned.join(dim, on=fact_key, how=how)
    return pruned.join(dim, on=pruned[fact_key] == dim[dk], how=how)

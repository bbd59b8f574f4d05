"""Incremental aggregate maintenance: merge a persisted aggregate
snapshot with a new delta partition — no full rescan.

Scale story: a 100 TB fact table with daily arrivals should not
recompute `GROUP BY` rollups from scratch each day. For ADDITIVE
aggregates (sum, count, min, max — anything with an associative,
commutative merge) the maintained snapshot IS the partial-aggregate
state: aggregate only the delta, union with the snapshot, and re-merge
per key. Cost is O(|delta| + |snapshot|) per refresh instead of
O(|history|); the snapshot never exceeds one row per key.

Derived measures (avg = sum/count, rates, ratios) must be stored as
their additive components and projected at read time —
``with_derived`` does that projection. Non-additive aggregates
(exact distinct, median) need sketch-backed variants
(``operators/sketches``: linear counting merges by bit-OR, Count-Min by
cell-sum); this module deliberately covers the exact-additive family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_snapshot",
    "incremental_agg_merge",
    "incremental_join_delta",
    "with_derived",
]

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}

_FIRST = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def aggregate_snapshot(
    df: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate raw rows into snapshot form: one row per key, one
    column per ``spec`` entry ``out_col -> (kind, src_col)`` with
    ``kind`` in {sum, count, min, max}."""
    aggs = []
    for out, (kind, src) in spec.items():
        if kind not in _FIRST:
            raise ValueError(f"non-additive aggregate kind {kind!r}")
        aggs.append(_FIRST[kind](F.col(src)).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def incremental_agg_merge(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
) -> DataFrame:
    """New snapshot = merge(old snapshot, aggregate(delta)).

    Invariant (the one worth testing): for any split of the input into
    (history, delta), ``incremental_agg_merge(aggregate_snapshot(
    history), delta)`` equals ``aggregate_snapshot(history ∪ delta)``.
    Keys absent from one side pass through the merge untouched
    (union + groupBy handles both directions).

    One exchange keyed on ``keys`` over snapshot-sized inputs; the
    delta's raw rows partial-combine map-side inside
    :func:`aggregate_snapshot` before anything shuffles.
    """
    delta_snap = aggregate_snapshot(delta, keys, spec)
    unioned = snapshot.select(*keys, *spec).unionByName(
        delta_snap.select(*keys, *spec)
    )
    merges = []
    for out, (kind, _) in spec.items():
        merges.append(_MERGE[kind](F.col(out)).alias(out))
    return unioned.groupBy(*keys).agg(*merges)


def incremental_join_delta(
    a0: DataFrame,
    delta_a: DataFrame,
    b0: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Rows an inner equi-join GAINS when both inputs grow: with
    A := A0 ∪ ΔA and B := B0 ∪ ΔB (appends only, no updates),

        Δ(A ⋈ B) = (ΔA ⋈ B0) ∪ (A0 ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so the maintained join ``(A0 ⋈ B0) ∪ incremental_join_delta(...)``
    equals the from-scratch join of the full inputs — the classic
    delta rule for view maintenance of joins.

    Scale story: a daily refresh of a 100 TB join touches ΔA⋈B0, A0⋈ΔB
    and ΔA⋈ΔB — each bounded by |Δ| on at least one side, so every one
    of the three joins broadcasts its delta side when the day's arrivals
    are small, and the snapshot side is only ever PROBED, never
    re-joined against itself. Restricted to append-only inputs: updates
    and deletes need keyed upsert/tombstone maintenance
    (``operators/merge``), not the join delta rule.
    """
    return (
        delta_a.join(b0, on)
        .unionByName(a0.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def with_derived(
    snapshot: DataFrame, derived: dict[str, Column]
) -> DataFrame:
    """Project read-time measures over a snapshot (avg = sum/count and
    friends). Kept separate from the stored state so the state stays
    mergeable."""
    out = snapshot
    for name, expr in derived.items():
        out = out.withColumn(name, expr)
    return out

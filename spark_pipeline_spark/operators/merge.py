"""Upsert / slowly-changing-dimension operators (batch CDC).

North-star additions (no counterpart in the reference, whose sinks are
append/overwrite only — ``sparktools/core.py:171-231``): a training-data
warehouse ingests correction feeds and needs MERGE semantics without a
table format that provides them natively.

Both operators are single-shuffle window plans: union the change feed
with the base, rank per key, keep the winner. At 100 TB the shuffle is
keyed on the merge key only — Catalyst prunes unreferenced columns out
of the exchange, and AQE handles skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_intervals"]


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins MERGE: one surviving row per key, the one with the
    highest ``version_col`` (updates beat base on ties).

    Delta-style ``MERGE INTO`` semantics expressed as a pure batch plan:
    ``unionByName`` → per-key ``row_number`` ordered by (version desc,
    side desc) → keep rank 1. Insert-only rows (keys absent from base)
    survive automatically; deletes are modeled upstream by filtering the
    feed. One exchange keyed on ``keys``; no broadcast assumption on
    either side, so a 100 TB base with a 1 TB daily feed runs the same
    plan shape.
    """
    b = base.withColumn("__side", F.lit(0))
    u = updates.withColumn("__side", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__side").desc()
    )
    return (
        b.unionByName(u)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__side")
    )


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals: each change event
    becomes a validity window ``[valid_from, valid_to)`` per key, with
    ``valid_to`` null (open) on the latest row.

    ``lead(ts)`` over (key, ts, tiebreak) — one window shuffle on the
    key. ``tiebreak_cols`` make the interval chain deterministic when a
    key changes twice at the same timestamp.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )

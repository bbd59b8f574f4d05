"""Data-quality expectation checks (dbt-test / Great-Expectations style).

North-star utility (no counterpart in the reference): a training-data
warehouse gates every ingest on expectations — null rates, key
uniqueness, value ranges, referential integrity — and wants them as ONE
aggregate pass over the table, not a job per rule.

``check`` evaluates any number of column rules in a single aggregate
(each rule is a conditional-sum expression; partial combine collapses
everything map-side), then unpivots the one result row into a
``(rule, violations, passed)`` report. ``ref_integrity`` is the one
rule that needs a second input: a left-anti join counted — broadcast
when the parent's keys are small, shuffle otherwise (AQE decides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["not_null", "in_range", "unique", "accepted_values", "check", "ref_integrity"]


def not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` is null."""
    return f"not_null:{col}", F.sum(F.col(col).isNull().cast("long"))


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(col)
    bad = ((c < F.lit(lo)) | (c > F.lit(hi))).cast("long")
    return f"in_range:{col}", F.sum(F.coalesce(bad, F.lit(0)))


def unique(*cols: str) -> tuple[str, Column]:
    """Violations = rows beyond the first per distinct key. Rows with a
    null key column are excluded from both counts (countDistinct skips
    them, matching SQL COUNT(DISTINCT))."""
    all_not_null = F.lit(True)
    for c in cols:
        all_not_null = all_not_null & F.col(c).isNotNull()
    non_null_rows = F.sum(all_not_null.cast("long"))
    return (
        f"unique:{','.join(cols)}",
        non_null_rows - F.countDistinct(*[F.col(c) for c in cols]),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    """Violations = non-null rows whose value is outside ``values``."""
    bad = (~F.col(col).isin(*values)).cast("long")
    return f"accepted_values:{col}", F.sum(F.coalesce(bad, F.lit(0)))


def check(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate all rules in ONE aggregate over ``df``; report one row
    per rule: ``(rule, violations, passed)``.

    Each aggregate is coalesced to 0 here: on an empty table every
    ``sum``-shaped rule yields NULL, which would propagate to
    ``passed = NULL`` and fail an empty-but-clean ingest.
    """
    wide = df.agg(
        *[expr.alias(f"__r{i}") for i, (_, expr) in enumerate(rules)]
    )
    pairs = []
    for i, (name, _) in enumerate(rules):
        pairs += [
            F.lit(name),
            F.coalesce(F.col(f"__r{i}").cast("long"), F.lit(0)),
        ]
    stacked = wide.select(
        F.explode(
            F.map_from_arrays(
                F.array(*pairs[0::2]), F.array(*pairs[1::2])
            )
        ).alias("rule", "violations")
    )
    return stacked.select(
        "rule", "violations", (F.col("violations") == 0).alias("passed")
    )


def ref_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan count: child rows whose non-null key has no parent. Same
    report schema as :func:`check` (one row)."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return orphans.select(
        F.lit(f"ref_integrity:{child_key}").alias("rule"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )

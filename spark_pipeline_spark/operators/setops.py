"""Set operations, exposed natively (SURVEY.md §2.8).

The reference reaches set semantics only through its SQL passthrough
(``sparktools/core.py:158-160``); the engine exposes Spark's operators
directly. Thin by design — the value is the documented semantics:

- ``union_all``      — bag union by POSITION (SQL UNION ALL);
- ``union_by_name``  — bag union by NAME, optionally filling missing
  columns with nulls (schema-evolution-safe appends);
- ``intersect`` / ``except_`` — set semantics (deduplicating);
- ``intersect_all`` / ``except_all`` — bag semantics.

Scale notes: unions are free (no shuffle — partitions concatenate);
intersect/except variants shuffle both sides on all columns, so project
to the comparison columns FIRST — intersecting two 500-column tables to
compare 2 columns shuffles 250× more than needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "union_all",
    "union_by_name",
    "intersect",
    "intersect_all",
    "except_",
    "except_all",
]


def union_all(*dfs: DataFrame) -> DataFrame:
    """Positional bag union of any number of DataFrames (UNION ALL)."""
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.union(df)
    return out


def union_by_name(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """Name-resolved bag union; ``allow_missing=True`` null-fills columns
    absent on one side (schema evolution)."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct rows present in both (SQL INTERSECT)."""
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag intersection — keeps duplicate multiplicity (INTERSECT ALL)."""
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct rows of ``a`` not in ``b`` (SQL EXCEPT)."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag difference — multiplicity-aware (EXCEPT ALL)."""
    return a.exceptAll(b)

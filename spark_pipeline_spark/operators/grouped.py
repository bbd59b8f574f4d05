"""Grouped pandas transforms (applyInPandas) and skew-safe aggregation.

Two complementary tools for per-group computation at scale:

- :func:`grouped_apply` — arbitrary pandas logic per group
  (``applyInPandas``): the escape hatch when the transform genuinely
  can't be expressed in Catalyst (iterative fitting, scipy calls,
  per-group model application). Groups must fit in executor memory; the
  schema is explicit DDL, never inferred.
- :func:`salted_agg` — algebraic aggregation (sum/count/min/max) under
  key skew: a deterministic salt splits each hot key across ``salt``
  sub-keys for the first (partial) aggregation, a second tiny
  aggregation merges. Two shuffles, but the first is uniform — the
  classic fix when one key holds 30% of a 100 TB table and AQE's skew
  handling can't help (skewed *aggregation*, not join).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_apply", "salted_agg", "salted_join"]


def grouped_apply(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply a pandas function to each key-group (``applyInPandas``).

    One shuffle on ``keys``; each group becomes ONE pandas frame on an
    executor (that is the memory contract — pre-aggregate or sub-bucket
    monster groups first). ``schema`` is explicit DDL.
    """
    return df.groupBy(*list(keys)).applyInPandas(fn, schema=schema)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    salt: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Skew-safe sum/count aggregation via two-stage salting.

    Stage 1 groups by (keys, salt-bucket) — hot keys split ``salt`` ways,
    so no single reducer owns a hot key's entire volume; stage 2 merges
    the ≤ ``salt`` partials per key. Output: ``sum_<col>`` per requested
    column plus ``n_rows``. The salt derives from ``salt_source`` (any
    column/expression; defaults to the first sum column) via crc32 —
    deterministic, so reruns produce identical intermediate groupings.

    Only algebraic aggregates belong here (sum/count/min/max compose);
    avg must be derived as sum/count AFTER the merge — never salted
    directly.
    """
    if not sums and not counts:
        raise ValueError("nothing to aggregate")
    src = salt_source if salt_source is not None else sums[0] if sums else keys[0]
    src_col = F.col(src) if isinstance(src, str) else src
    salted = df.withColumn("__salt", F.pmod(F.crc32(src_col.cast("string")), F.lit(salt)))

    stage1_aggs = [F.sum(c).alias(f"sum_{c}") for c in sums]
    if counts:
        stage1_aggs.append(F.count(F.lit(1)).alias("n_rows"))
    partial = salted.groupBy(*list(keys), "__salt").agg(*stage1_aggs)

    stage2_aggs = [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        stage2_aggs.append(F.sum("n_rows").alias("n_rows"))
    return partial.groupBy(*list(keys)).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big (skewed) side gets a deterministic
    salt bucket, the small side is replicated ``salt``× with every
    bucket, and the join key becomes (keys, salt) — a hot key's rows
    spread over ``salt`` reducers instead of one.

    Semantically identical to ``big.join(small, on, how)`` for
    inner/left joins. Use when one key dominates and the small side is
    too large to broadcast but cheap to replicate ``salt``× (otherwise
    prefer ``F.broadcast`` or AQE's skew-join, which only handles SORTED
    merge joins it can detect). The salt derives from ``salt_source``
    (default: the first non-key column of ``big``) via crc32 —
    deterministic across reruns.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = list(on)
    if salt_source is None:
        non_keys = [c for c in big.columns if c not in keys]
        salt_source = non_keys[0] if non_keys else keys[0]
    src_col = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    # null-safe: a null salt source must not change join semantics
    basis = F.coalesce(src_col.cast("string"), F.lit(""))
    big_s = big.withColumn("__salt", F.pmod(F.crc32(basis), F.lit(salt)))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, on=[*keys, "__salt"], how=how).drop("__salt")

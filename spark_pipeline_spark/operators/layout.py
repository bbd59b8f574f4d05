"""Data-layout operators: multi-dimensional clustering keys (z-order).

North-star addition (the reference has no layout story at all; its file
sink is a plain ``partitionBy`` — ``sparktools/core.py:171-231``): at
100 TB, which rows share a file decides how much a scan can skip.
Sorting by one column gives min/max pruning on that column only;
interleaving the bits of several columns (a Morton / z-order key) gives
useful min/max bounds on ALL of them simultaneously, so range-writing
by the z-key lets parquet row-group stats prune scans filtered on any
participating column.

Everything here is pure integer bit arithmetic — exact in any engine
(the oracle recomputes the same key in DuckDB) and codegen'd in Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scale_to_int", "morton_key", "zorder_by"]


def scale_to_int(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Map values from [lo, hi] onto the integer grid [0, 2^bits - 1]
    with pure integer arithmetic: ``(v - lo) * 2^bits div (hi - lo + 1)``.

    ``floor`` of the double quotient equals exact integer division while
    the numerator stays below 2^52 (a misround at an integer boundary
    would need numerator·denominator ≥ 2^53) — and both engines evaluate
    the identical doubles anyway, so the cell assignment is engine-exact.
    That precondition is ENFORCED, not assumed: a span wider than
    2^(52-bits) (e.g. epoch-micros over decades) raises at evaluation
    time instead of silently misassigning z-order cells — pre-bucket the
    column (days, hours) or lower ``bits``. Bounds come from one tiny
    aggregate broadcast back (see :func:`zorder_by`).
    """
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = hi_c.cast("long") - lo_c.cast("long") + F.lit(1)
    span_lim = 1 << (52 - bits)  # keeps (v - lo) * 2^bits ≤ 2^52 exact
    scaled = ((col.cast("long") - lo_c.cast("long")) * F.lit(1 << bits)) / span
    return F.when(span <= F.lit(span_lim), F.floor(scaled).cast("long")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("scale_to_int: span "),
                span.cast("string"),
                F.lit(
                    f" exceeds the exact-double bound 2^{52 - bits} for"
                    f" bits={bits}; pre-bucket the column or lower bits"
                ),
            )
        )
    )


def morton_key(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each column round-robin:
    col0 bit i lands at position ``i * n + 0``, col1's at ``i * n + 1``,
    … The classic Morton (z-order) curve: keys close in z-order are
    close in every participating dimension, so range-partitioning by the
    key co-locates multi-dimensional neighborhoods into the same files.
    """
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "zkey",
) -> DataFrame:
    """Tag rows with a z-order key over integer columns ``cols``.

    One aggregate discovers per-column min/max (a single row, broadcast
    back — no driver collect); each column is scaled to ``bits`` bits
    and interleaved. Write with ``repartitionByRange(key_col)`` +
    ``sortWithinPartitions(key_col)`` to get files whose parquet min/max
    stats are tight on EVERY participating column.
    """
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__hi_{c}") for c in cols],
    )
    tagged = df.join(F.broadcast(bounds))
    scaled = [
        scale_to_int(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in cols
    ]
    out = tagged.withColumn(key_col, morton_key(scaled, bits))
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])

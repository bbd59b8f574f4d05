"""Approximate/sketch aggregations: HLL distinct counts, GK quantiles,
frequent items, and a deterministic md5-bucket cardinality estimator.

Sketches are the 100 TB answer to "how many / how distributed" questions
that don't need exact answers: constant memory, one pass, mergeable
partials. Spark's built-ins used here:

- ``approx_count_distinct`` — HyperLogLog++, default rsd 5%;
- ``approxQuantile`` / ``percentile_approx`` — Greenwald-Khanna;
- ``freqItems`` — misra-gries style frequent-item sketch.

These are estimation algorithms with engine-specific internals, so their
outputs are NOT cross-engine hash-comparable — correctness is asserted
as error bounds against exact answers in tests (and the driver records
rows-only checks for their queries). That is the honest contract for a
sketch: bounded error, not bit equality.

:func:`md5_bucket_cardinality` is the exception — a deterministic
K-minimum-values-flavored estimator built on the engine's portable md5,
included to show the sketch *mechanism* (hash → bounded state →
estimate) in a form an oracle CAN replay exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import md5_int

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "frequent_items",
    "md5_bucket_cardinality",
]


def approx_distinct(
    df: DataFrame, column: str, keys: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """HLL++ distinct count per key group (exact would need a
    two-level shuffle or a huge hash table; HLL is one pass, ~1.5 KB of
    state per group at 5% rsd)."""
    agg = F.approx_count_distinct(column, rsd=rsd).alias(f"approx_distinct_{column}")
    return df.groupBy(*(keys or [])).agg(agg)


def approx_quantiles(
    df: DataFrame, column: str, probabilities: list[float], accuracy: int = 10_000
) -> DataFrame:
    """Greenwald-Khanna quantiles as a 1-row DataFrame (``percentile_approx``
    — mergeable, bounded-memory; exact percentiles need a full sort)."""
    return df.agg(
        F.percentile_approx(
            column, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias(f"quantiles_{column}")
    )


def frequent_items(df: DataFrame, columns: list[str], support: float = 0.01) -> DataFrame:
    """Heavy hitters per column (``freqItems``): single pass, false
    positives possible, no false negatives above the support."""
    return df.freqItems(columns, support)


def md5_bucket_cardinality(df: DataFrame, column: str, buckets: int = 4096) -> DataFrame:
    """Deterministic cardinality estimate via hash-bucket occupancy
    (linear counting): hash values into ``buckets`` md5 buckets, count
    occupied buckets m, estimate ``-B * ln(1 - m/B)``.

    Unlike HLL this is reproducible across engines bit-for-bit (the
    bucket set is a pure function of the data), so its query carries a
    full value oracle. State: one bit per bucket — a 4 KB sketch.
    Output: ``(occupied, estimate)``.
    """
    occ = (
        df.select(F.pmod(md5_int(F.col(column)), F.lit(buckets)).alias("b"))
        .agg(F.countDistinct("b").alias("occupied"))
    )
    b = float(buckets)
    return occ.select(
        "occupied",
        F.round(-b * F.log(1.0 - F.col("occupied") / b), 4).alias("estimate"),
    )

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
    "cm_sketch",
    "cm_estimate",
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


def md5_bucket_cardinality(
    df: DataFrame,
    column: str,
    buckets: int = 4096,
    keys: list[str] | None = None,
) -> DataFrame:
    """Deterministic cardinality estimate via hash-bucket occupancy
    (linear counting): hash values into ``buckets`` md5 buckets, count
    occupied buckets m, estimate ``-B * ln(1 - m/B)``, optionally per
    ``keys`` group.

    Unlike HLL this is reproducible across engines bit-for-bit (the
    bucket set is a pure function of the data), so its query carries a
    full value oracle. State: one bit per bucket — a 4 KB sketch per
    group. Saturated groups (every bucket occupied, where the raw
    formula is ``-B·ln(0)``) clamp occupancy to ``B-1``, reporting the
    sketch's representable upper bound ``-B·ln(1/B) = B·ln(B)`` instead
    of infinity. Output: ``(*keys, occupied, estimate)``.
    """
    occ = (
        df.select(
            *(keys or []),
            F.pmod(md5_int(F.col(column)), F.lit(buckets)).alias("b"),
        )
        .groupBy(*(keys or []))
        .agg(F.countDistinct("b").alias("occupied"))
    )
    b = float(buckets)
    clamped = F.least(F.col("occupied"), F.lit(buckets - 1))
    return occ.select(
        *(keys or []),
        "occupied",
        F.round(-b * F.log(1.0 - clamped / b), 4).alias("estimate"),
    )


def cm_sketch(
    df: DataFrame,
    column: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch of a column's value frequencies: ``depth``
    md5-seeded hash rows × ``width`` counters, built in ONE aggregation
    (explode each value into its ``depth`` (row, bucket) cells, sum).

    Unlike HLL/GK (engine-specific estimators, rows-only checkable),
    every hash here is an md5 expression, so the sketch itself is
    deterministic and cross-engine verifiable. Output:
    ``(row, bucket, n)`` — depth × width cells at most, mergeable by
    summation (combine shards/days by adding cell counts).
    """
    from spark_pipeline_spark.functions import md5_int

    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    md5_int(F.concat(F.lit(f"cm{r}|"), F.col(column).cast("string"))),
                    F.lit(width),
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    ex = df.select(F.explode(cells).alias("c"))
    return (
        ex.select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each key,
    min over its ``depth`` counters (never underestimates; overestimates
    bounded by collisions). The keys frame is tiny → its hashed probe
    cells broadcast against the sketch."""
    from spark_pipeline_spark.functions import md5_int

    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(
                            md5_int(
                                F.concat(F.lit(f"cm{r}|"), F.col(key_col).cast("string"))
                            ),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    j = probes.join(sketch, ["row", "bucket"], "left").fillna(0, ["n"])
    return j.groupBy(key_col).agg(F.min("n").alias("cm_count"))


def sliding_distinct_linear_counting(
    df: DataFrame,
    ts_col: str,
    column: str,
    window_days: int = 7,
    buckets: int = 4096,
) -> DataFrame:
    """Distinct-count over SLIDING windows from mergeable per-day sketch
    partials — the continuous-aggregate pattern for the one aggregate
    that is not additive.

    A 7-day sliding distinct recomputed naively rescans every event 7
    times. Here each day is reduced ONCE to its linear-counting partial —
    the set of occupied md5 buckets, ≤ ``buckets`` rows per day — and
    the sliding merge works entirely on partials: explode each day's
    buckets to the ≤ ``window_days`` windows it serves (window labeled
    by its END day), dedup, count occupancy, apply the linear-counting
    estimate. Raw data is touched exactly once regardless of window
    count or length; the merge input is O(days × buckets), constant per
    day.

    Deterministic (md5 bucketing), so cross-engine value-verifiable —
    unlike HLL partials, which only merge inside one engine. Output:
    ``(win_end, occupied, estimate)`` for every window that contains at
    least one event day. Two semantics notes: (1) saturated windows
    (every bucket occupied) clamp occupancy to ``buckets - 1`` so the
    estimate is the sketch's representable upper bound ``B·ln(B)``
    rather than ``-B·ln(0)`` = +inf/null; (2) the trailing
    ``window_days - 1`` windows (win_end past the last event day) are
    PARTIAL — they only see days up to the data's end. Their values are
    correct for the data as-of query time but will grow if later events
    arrive; filter ``win_end <= max(day)`` downstream if only complete
    windows are wanted.
    """
    from spark_pipeline_spark.functions import md5_int

    day = F.date_trunc("day", F.col(ts_col))
    partials = (
        df.select(
            day.alias("day"),
            F.pmod(md5_int(F.col(column).cast("string")), F.lit(buckets)).alias("b"),
        )
        .distinct()
    )
    wins = partials.select(
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days,"
                f" interval 1 day)"
            )
        ).alias("win_end"),
        "b",
    )
    occ = wins.groupBy("win_end").agg(F.countDistinct("b").alias("occupied"))
    b = float(buckets)
    clamped = F.least(F.col("occupied"), F.lit(buckets - 1))
    return occ.select(
        "win_end",
        "occupied",
        F.round(-b * F.log(1.0 - clamped / b), 4).alias("estimate"),
    )

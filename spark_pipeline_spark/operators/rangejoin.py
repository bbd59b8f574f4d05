"""Range (interval) join: points matched to [lo, hi) intervals, bucketed.

Spark executes a raw ``p >= lo AND p < hi`` θ-join as
BroadcastNestedLoopJoin (fine for a small interval side) or, worse, a
cartesian per key — at 100 TB the latter is unrunnable. This operator
uses **bucketization**: pick a bucket width, explode each interval to
the buckets it covers, tag each point with its single bucket, equi-join
on the bucket id, then apply the exact range predicate.

Cost model: the equi-join shuffles on the bucket id (hash join, partial
pruning, AQE-skew-splittable); the explode factor is
``interval_length / bucket_width`` — pick the width near the median
interval length so most intervals land in O(1) buckets. Each
(point, interval) match is produced exactly once: the point carries one
bucket, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "interval_overlap_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with
    ``lo <= point < hi`` (half-open), via bucket equi-join.

    Returns points' columns + intervals' columns. ``how`` supports
    ``inner`` (matching pairs) only — outer variants of a range join are
    ambiguous (which interval's nulls?) and deliberately not offered.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    w = float(bucket_width)
    p = F.col(point_col).cast("double")
    lo = F.col(lo_col).cast("double")
    hi = F.col(hi_col).cast("double")

    # interval [lo, hi) covers buckets floor(lo/w) .. floor(hi/w), minus
    # the last when hi sits exactly on a bucket edge (hi exclusive)
    first_b = F.floor(lo / w)
    last_b = F.floor(hi / w) - F.when(F.pmod(hi, F.lit(w)) == 0.0, 1).otherwise(0)
    exploded = intervals.withColumn(
        "__bucket", F.explode(F.sequence(first_b, F.greatest(last_b, first_b)))
    )
    tagged = points.withColumn("__bucket", F.floor(p / w))

    joined = tagged.join(exploded, on="__bucket", how="inner")
    return joined.filter((p >= lo) & (p < hi)).drop("__bucket")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    lo_col: str,
    hi_col: str,
    keys: list[str] | tuple[str, ...] = (),
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval × interval OVERLAP join, bucketed — the session-overlap /
    attribution-window shape (`lo_a < hi_b AND lo_b < hi_a` on half-open
    integer intervals) that a raw θ-join would execute as a nested loop.

    Both sides explode to the integer buckets their interval covers;
    candidates equi-join on (keys, bucket); the exact overlap predicate
    then applies. **Exactly-once emission**: a pair overlapping across
    many buckets is emitted only in the bucket containing
    ``greatest(lo_a, lo_b)`` — the first bucket where both intervals are
    live — so no post-join dedup pass is needed.

    Contract: ``lo_col``/``hi_col`` are NON-NEGATIVE integers on both
    sides (cast timestamps to epoch seconds/micros first — integer
    bucket arithmetic is exact, float division is not); intervals are
    half-open ``[lo, hi)`` with ``lo < hi``. Non-key payload column
    names must be disjoint between the sides; the interval columns come
    back suffixed ``_a`` / ``_b``. Explode factor is
    ``interval_length / bucket_width`` — pick the width near the median
    interval length so most intervals land in O(1) buckets.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(keys)

    def prep(df: DataFrame, side: str) -> DataFrame:
        lo, hi = f"{lo_col}_{side}", f"{hi_col}_{side}"
        out = df.withColumnRenamed(lo_col, lo).withColumnRenamed(hi_col, hi)
        return out.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"`{lo}` div {w}"), F.expr(f"(`{hi}` - 1) div {w}")
                )
            ),
        )
    ea, eb = prep(a, "a"), prep(b, "b")
    lo_a, hi_a = F.col(f"{lo_col}_a"), F.col(f"{hi_col}_a")
    lo_b, hi_b = F.col(f"{lo_col}_b"), F.col(f"{hi_col}_b")
    first_live = F.expr(
        f"greatest(`{lo_col}_a`, `{lo_col}_b`) div {w}"
    )
    joined = ea.join(
        eb,
        [*keys, "__bucket"],
    ).filter(
        (lo_a < hi_b) & (lo_b < hi_a) & (F.col("__bucket") == first_live)
    )
    return joined.drop("__bucket")

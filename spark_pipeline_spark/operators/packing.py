"""Distributed prefix sums and training-sequence packing.

The LLM-training-data step after dedup/sampling: shuffle the corpus
deterministically, then pack documents into fixed-token-length training
sequences ("pack_id") by their running token offset. Both need an exact
GLOBAL running total in a deterministic order — the textbook
single-partition-window trap at scale.

Scale shape (same discipline as ``sampling.token_budget_sample``): the
deterministic order is the md5 content hash, whose 2^32 space is cut
into fixed ranges. One groupBy computes per-bucket value totals
(``n_buckets`` rows), a prefix sum over that tiny frame yields each
bucket's global offset (broadcast back), and a window PARTITIONED BY
bucket — parallel, never global — adds the within-bucket running sum.
``global_prefix = bucket_offset + within_bucket_prefix`` is exact and
bit-identical to the naive global window (which the DuckDB oracles run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import md5_int
from spark_pipeline_spark.operators.sampling import _key_basis

__all__ = [
    "running_total",
    "pack_sequences",
    "shard_assign",
    "global_row_number",
]


def running_total(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    out_col: str = "running_before",
    n_buckets: int = 1024,
) -> DataFrame:
    """Exclusive global running total of ``value_col`` in deterministic
    hash order (md5 of ``key_cols``): each row gets the exact sum of the
    values of all strictly-preceding rows.

    Executes as one small aggregate + a broadcast join + a
    bucket-partitioned window — parallelism ``n_buckets``, no global
    sort, no single-partition window.
    """
    width = (1 << 32) // n_buckets
    u = md5_int(_key_basis(df, key_cols))
    tagged = df.withColumn("__u", u).withColumn(
        "__bucket", F.floor(F.col("__u") / F.lit(width)).cast("bigint")
    )
    val = F.col(value_col).cast("bigint")

    totals = tagged.groupBy("__bucket").agg(F.sum(val).alias("__btot"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_buckets rows: the single-partition window here is trivially small.
    offsets = totals.withColumn(
        "__boffset", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    ).select("__bucket", "__boffset")

    wrow = (
        Window.partitionBy("__bucket")
        .orderBy("__u", *key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col, F.col("__boffset") + F.coalesce(F.sum(val).over(wrow), F.lit(0))
        )
        .drop("__u", "__bucket", "__boffset")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    key_cols: list[str],
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each document to a fixed-length training sequence: shuffle
    deterministically (hash order), lay documents end-to-end, and give
    each a ``pack_col`` = its starting offset ÷ ``seq_len``.

    This is offset packing (a document belongs to the sequence its first
    token lands in) — the concat-and-chunk approximation used when
    packing corpora for LLM training; boundary documents straddle into
    the next sequence rather than being split, which downstream loaders
    handle by truncation. Pack ids are dense, deterministic, and
    reproducible across reruns/partitionings/engines.
    """
    out = running_total(df, token_col, key_cols, out_col="__before")
    return out.withColumn(
        pack_col, F.floor(F.col("__before") / F.lit(float(seq_len))).cast("bigint")
    ).drop("__before")


def shard_assign(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id (0..n_shards-1) from the md5 of the key
    columns — the write-side partitioner for training-data output files.

    Content-hash sharding keeps assignment stable across reruns, cluster
    sizes, and engines (the oracle recomputes it), and statistically
    balances both row and token totals across shards. Writing with
    ``.repartition(n_shards, shard)`` + ``partitionBy(shard)`` then
    yields one output stream per shard with no global sort.
    """
    from spark_pipeline_spark.functions import md5_int

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.withColumn(shard_col, F.pmod(md5_int(key), F.lit(n_shards)).cast("int"))


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Dense global row numbers (1..N) in ``order_cols`` order WITHOUT a
    single global sort partition — the scale-correct form of the
    reference's ``rdd.zipWithIndex`` (``sparktools/core.py:23-27``).

    Range-bucket on exact quantile boundaries of the leading order
    column (one aggregate, broadcast back; ties of the leading column
    stay in one bucket, so bucketing is order-consistent), count rows
    per bucket, prefix-sum the ≤ ``n_buckets`` bucket counts into
    offsets, and add a within-bucket ``row_number``. Parallelism is
    ``n_buckets``; the only global structure is the tiny offsets frame.
    ``order_cols`` must be a total order (add a unique tiebreak column).
    """
    lead = order_cols[0]
    if n_buckets <= 1:
        # no boundaries: percentile of an empty prob array is NULL, and a
        # NULL join key would silently drop every row — use one bucket
        tagged = df.withColumn("__bucket", F.lit(0))
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.agg(
            F.percentile(lead, F.array(*[F.lit(p) for p in probs])).alias("__bnds")
        )
        tagged = df.join(F.broadcast(bounds)).withColumn(
            "__bucket",
            F.coalesce(
                F.aggregate(
                    F.col("__bnds"),
                    F.lit(0),
                    lambda acc, b: acc + F.when(F.col(lead) > b, 1).otherwise(0),
                ),
                F.lit(0),  # all-null lead column ⇒ everything in bucket 0
            ),
        ).drop("__bnds")

    counts = tagged.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__bn"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__boffset", F.coalesce(F.sum("__bn").over(wb), F.lit(0))
    ).select("__bucket", "__boffset")

    wrow = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__boffset") + F.row_number().over(wrow))
        .drop("__bucket", "__boffset")
    )

"""Partition introspection + batched driver-side pandas bridges.

Parity targets (SURVEY.md §2.12 I6 / §2.6 W2): ``spark_partition_id``
tagging (``sparktools/core.py:504-509``) and the batched
``toPandasIterative`` bridge (``core.py:512-522``) — the reference built
both over a Hive-CLI subprocess and RDD iteration; here they are plain
column expressions and Arrow ``toLocalIterator``.

Scale rule encoded by ``iter_pandas_batches``: the driver never holds
more than one batch — the safe way to stream a big result into
driver-side code (plotting, model fitting beyond trainer's collect,
export protocols) without an OOM. Full ``toPandas`` stays an explicit
small-result API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_partition_id",
    "partition_sizes",
    "iter_pandas_batches",
    "ensure_min_partitions",
]


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Raise the partition count to at least ``min_partitions`` (default:
    cluster default parallelism) ahead of a CPU-heavy per-row stage.

    A small parquet file scans as ONE partition (`maxPartitionBytes`
    windows), which serializes any expensive projection placed on top of
    it — measured 4× on a 5000-doc fingerprint stage at sf0.1. The
    round-robin shuffle this inserts moves only the raw input rows, which
    is cheap exactly when the downstream per-row compute (hashing,
    shingling, decoding) dominates. No-op when the scan is already
    parallel enough — at 100 TB file splits provide the parallelism and
    this helper does nothing.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def with_partition_id(df: DataFrame, col_name: str = "partition_id") -> DataFrame:
    """Tag each row with its physical partition id
    (``F.spark_partition_id``) — skew diagnosis and partition-local
    debugging (``core.py:506`` parity)."""
    return df.withColumn(col_name, F.spark_partition_id())


def partition_sizes(df: DataFrame) -> DataFrame:
    """Row count per physical partition — the one-line skew report.
    Output: ``(partition_id, n_rows)``."""
    return (
        with_partition_id(df)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def iter_pandas_batches(df: DataFrame, batch_rows: int = 100_000) -> Iterator[pd.DataFrame]:
    """Stream a DataFrame to the driver as bounded pandas batches
    (``toPandasIterative`` parity, ``core.py:512-522``).

    Arrow ``toLocalIterator`` pulls one partition at a time; rows are
    re-chunked into ``batch_rows`` frames so driver memory is bounded by
    ``batch_rows``, not by partition size.
    """
    cols = df.columns
    buf: list[tuple] = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(tuple(row))
        if len(buf) >= batch_rows:
            yield pd.DataFrame(buf, columns=cols)
            buf = []
    if buf:
        yield pd.DataFrame(buf, columns=cols)

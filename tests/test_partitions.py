"""Partition introspection + batched pandas bridge (operators/partitions.py)."""

from __future__ import annotations

from spark_pipeline_spark.operators.partitions import (
    iter_pandas_batches,
    partition_sizes,
    with_partition_id,
)
from spark_pipeline_spark.io.sources import read_file
from tests.conftest import SF_SMALL


def test_with_partition_id_and_sizes(spark):
    df = read_file(spark, f"{SF_SMALL}/orders.parquet").repartition(4)
    tagged = with_partition_id(df)
    assert "partition_id" in tagged.columns
    sizes = partition_sizes(df).collect()
    assert sum(r["n_rows"] for r in sizes) == df.count()
    assert len(sizes) == 4


def test_iter_pandas_batches_bounded(spark):
    df = read_file(spark, f"{SF_SMALL}/orders.parquet").select("o_orderkey")
    total = df.count()
    seen = 0
    for batch in iter_pandas_batches(df, batch_rows=300):
        assert len(batch) <= 300
        assert list(batch.columns) == ["o_orderkey"]
        seen += len(batch)
    assert seen == total

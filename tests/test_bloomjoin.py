"""Bloom-prune join: no false negatives ever, measured FPR within the
classic bound, and composed-join equivalence to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def test_no_false_negatives_and_fpr_bound(spark):
    from spark_pipeline_spark.operators.bloomjoin import (
        bloom_bitmap,
        bloom_might_contain,
    )

    n_bits, n_hashes = 1 << 14, 7
    dim = spark.range(0, 500).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(dim, "k", n_bits, n_hashes)

    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    hits = (
        probe.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("bf"), F.col("k"), n_bits, n_hashes))
        .select("k")
        .collect()
    )
    hit_keys = {r["k"] for r in hits}
    # every member admitted
    assert set(range(500)) <= hit_keys
    # FPR: 500 keys * 7 hashes in 16384 bits -> classic (1-e^{-kn/m})^k
    # ~ 0.0035; allow generous slack for hash clumping
    fpr = (len(hit_keys) - 500) / 9_500
    assert fpr < 0.02, fpr


def test_prune_join_equals_plain_join(spark):
    from spark_pipeline_spark.operators.bloomjoin import bloom_prune_join

    li = t(spark, SF_SMALL, "lineitem").select("l_suppkey", "l_quantity")
    supp = (
        t(spark, SF_SMALL, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey", "s_name")
    )
    got = bloom_prune_join(li, supp, "l_suppkey", "s_suppkey", n_bits=1 << 12)
    want = li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
    assert got.count() == want.count()
    g = got.groupBy("s_suppkey").agg(F.sum("l_quantity").alias("q"))
    w = want.groupBy("s_suppkey").agg(F.sum("l_quantity").alias("q"))
    assert {(r["s_suppkey"], float(r["q"])) for r in g.collect()} == {
        (r["s_suppkey"], float(r["q"])) for r in w.collect()
    }


def test_prune_actually_shrinks_fact_side(spark):
    from spark_pipeline_spark.operators.bloomjoin import (
        bloom_bitmap,
        bloom_might_contain,
    )

    li = t(spark, SF_SMALL, "lineitem").select("l_suppkey")
    all_supp = t(spark, SF_SMALL, "supplier")
    some_nation = all_supp.agg(F.min("s_nationkey")).collect()[0][0]
    supp = all_supp.filter(F.col("s_nationkey") == some_nation).select("s_suppkey")
    assert supp.count() > 0
    bitmap = bloom_bitmap(supp, "s_suppkey", 1 << 14, 7)
    total = li.count()
    kept = (
        li.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("bf"), F.col("l_suppkey"), 1 << 14, 7))
        .count()
    )
    # the point of the operator: the pre-shuffle row count drops hard
    assert kept < total / 2


def test_outer_join_is_rejected(spark):
    from spark_pipeline_spark.operators.bloomjoin import bloom_prune_join

    d = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prune_join(d, d, "k", how="left_outer")

"""Incremental aggregate maintenance: the merge invariant — snapshot
merged with delta equals the from-scratch aggregate over the union —
for every split point, including key-disjoint and empty sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL

SPEC = {
    "total_price": ("sum", "o_totalprice"),
    "n_orders": ("count", "o_orderkey"),
    "min_price": ("min", "o_totalprice"),
    "max_price": ("max", "o_totalprice"),
}


def _as_map(df):
    return {
        r["o_orderstatus"]: (
            round(float(r["total_price"]), 2),
            r["n_orders"],
            round(float(r["min_price"]), 2),
            round(float(r["max_price"]), 2),
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("cutoff", ["1993-01-01", "1996-06-15", "1999-01-01"])
def test_merge_equals_full_rescan(spark, cutoff):
    from spark_pipeline_spark.operators.incremental import (
        aggregate_snapshot,
        incremental_agg_merge,
    )

    o = t(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    hist = o.filter(F.col("o_orderdate") < cutoff)
    delta = o.filter(F.col("o_orderdate") >= cutoff)

    snap = aggregate_snapshot(hist, ["o_orderstatus"], SPEC)
    merged = incremental_agg_merge(snap, delta, ["o_orderstatus"], SPEC)
    full = aggregate_snapshot(o, ["o_orderstatus"], SPEC)
    assert _as_map(merged) == _as_map(full)


def test_derived_avg_from_components(spark):
    from spark_pipeline_spark.operators.incremental import (
        aggregate_snapshot,
        with_derived,
    )

    o = t(spark, SF_SMALL, "orders")
    snap = aggregate_snapshot(o, ["o_orderstatus"], SPEC)
    derived = with_derived(
        snap, {"avg_price": F.round(F.col("total_price") / F.col("n_orders"), 6)}
    )
    want = {
        r["o_orderstatus"]: round(float(r["a"]), 6)
        for r in o.groupBy("o_orderstatus")
        .agg(F.round(F.avg("o_totalprice"), 6).alias("a"))
        .collect()
    }
    got = {r["o_orderstatus"]: round(float(r["avg_price"]), 6) for r in derived.collect()}
    assert got == want


def test_non_additive_kind_rejected(spark):
    from spark_pipeline_spark.operators.incremental import aggregate_snapshot

    o = t(spark, SF_SMALL, "orders")
    with pytest.raises(ValueError, match="non-additive"):
        aggregate_snapshot(o, ["o_orderstatus"], {"d": ("distinct", "o_custkey")})


@pytest.mark.parametrize(
    "date_cutoff,key_mod",
    [
        ("1997-01-01", 3),   # both sides have real deltas
        ("1995-01-01", 3),   # ΔA is (almost) everything
        ("2002-01-01", 3),   # ΔA empty — rule degenerates to A0⋈ΔB
        ("1997-01-01", 1),   # ΔB is everything — B0 empty
    ],
)
def test_join_delta_rule_equals_full_join(spark, date_cutoff, key_mod):
    """(A0⋈B0) ∪ Δ(A⋈B) must equal (A0∪ΔA)⋈(B0∪ΔB) for every split,
    including splits where one side's delta (or base) is empty."""
    from spark_pipeline_spark.operators.incremental import incremental_join_delta

    o = t(spark, SF_SMALL, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_orderdate"
    )
    c = t(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey")
    a0 = o.filter(F.col("o_orderdate") < date_cutoff)
    da = o.filter(F.col("o_orderdate") >= date_cutoff)
    b0 = c.filter(F.col("c_custkey") % key_mod != 0)
    db = c.filter(F.col("c_custkey") % key_mod == 0)

    maintained = a0.join(b0, ["c_custkey"]).unionByName(
        incremental_join_delta(a0, da, b0, db, ["c_custkey"])
    )
    full = o.join(c, ["c_custkey"])

    got = sorted(
        (r["o_orderkey"], r["c_nationkey"]) for r in maintained.collect()
    )
    want = sorted((r["o_orderkey"], r["c_nationkey"]) for r in full.collect())
    assert got == want  # exact multiset equality, no lost or doubled rows

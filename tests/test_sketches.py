"""Sketch error bounds vs exact answers (operators/sketches.py) — the
honest sketch contract: bounded error, not bit equality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_pipeline_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
    md5_bucket_cardinality,
)
from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def test_hll_within_rsd_bound(spark):
    e = t(spark, SF_SMALL, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct_user_id"]
        for r in approx_distinct(e, "user_id", keys=["event_type"], rsd=0.05).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.15 * n, 3), (k, approx[k], n)


def test_linear_counting_close_to_exact(spark):
    e = t(spark, SF_SMALL, "events")
    exact = e.agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    row = md5_bucket_cardinality(e, "user_id", 4096).collect()[0]
    assert not math.isnan(row["estimate"])
    assert abs(row["estimate"] - exact) <= 0.1 * exact


def test_linear_counting_saturation_clamps_not_inf(spark):
    """When every bucket is occupied, the estimate must be the finite
    representable upper bound B*ln(B), not -B*ln(0) (null/-inf)."""
    df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    row = md5_bucket_cardinality(df, "v", buckets=8).collect()[0]
    assert row["occupied"] == 8
    assert row["estimate"] is not None and not math.isnan(row["estimate"])
    assert abs(row["estimate"] - 8 * math.log(8)) < 1e-3  # estimate rounds to 4dp


def test_linear_counting_grouped_keys(spark):
    e = t(spark, SF_SMALL, "events")
    rows = md5_bucket_cardinality(e, "user_id", 4096, keys=["event_type"]).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        n = exact[r["event_type"]]
        assert abs(r["estimate"] - n) <= max(0.1 * n, 5), (r, n)


def test_gk_quantiles_bracket_exact(spark):
    l = t(spark, SF_SMALL, "lineitem").select("l_extendedprice")
    qs = approx_quantiles(l, "l_extendedprice", [0.25, 0.5, 0.75]).collect()[0][0]
    pdf = l.toPandas()["l_extendedprice"]
    for p, got in zip([0.25, 0.5, 0.75], qs):
        exact = pdf.quantile(p)
        assert abs(got - exact) <= 0.05 * abs(exact) + 1.0, (p, got, exact)
    assert qs == sorted(qs)


def test_freq_items_contains_true_heavy_hitter(spark):
    e = t(spark, SF_SMALL, "events")
    top = (
        e.groupBy("event_type").count().orderBy(F.desc("count")).limit(1).collect()[0][
            "event_type"
        ]
    )
    items = frequent_items(e, ["event_type"], support=0.1).collect()[0][0]
    assert top in items


def test_sliding_distinct_estimate_tracks_exact(spark):
    """Per-window linear-counting estimates from merged day-partials must
    land within sketch error of the exact sliding distinct count."""
    from spark_pipeline_spark.operators.sketches import (
        sliding_distinct_linear_counting,
    )

    e = t(spark, SF_SMALL, "events").select("ts", "user_id")
    est = {
        r["win_end"]: float(r["estimate"])
        for r in sliding_distinct_linear_counting(
            e, "ts", "user_id", window_days=7
        ).collect()
    }

    days = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    exact = {
        r["win_end"]: r["n"]
        for r in days.select(
            F.explode(
                F.expr("sequence(day, day + interval 6 days, interval 1 day)")
            ).alias("win_end"),
            "user_id",
        )
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for w, n in exact.items():
        assert abs(est[w] - n) <= max(0.05 * n, 10), (w, est[w], n)


def test_sliding_p95_estimate_within_one_bin_of_exact(spark):
    """The binned sliding P95 must land within one bin width above the
    exact per-window 95th percentile (upper-edge estimator: the true
    quantile lies inside the reported bin)."""
    import numpy as np

    from spark_pipeline_spark.queries import REGISTRY, t
    from tests.conftest import SF_SMALL

    est = {
        r["win_end_epoch"]: r["p95_upper"]
        for r in REGISTRY["sliding_p95_value_7d"].fn(spark, SF_SMALL).collect()
    }
    rows = (
        t(spark, SF_SMALL, "events")
        .select(F.unix_timestamp(F.date_trunc("day", "ts")).alias("day"), "value")
        .collect()
    )
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["value"])
    day_s = 86400
    checked = 0
    for win_end, p95u in est.items():
        vals = [
            v
            for d, vs in by_day.items()
            if win_end - 6 * day_s <= d <= win_end
            for v in vs
        ]
        if not vals:
            continue
        exact = float(np.quantile(np.array(vals), 0.95, method="inverted_cdf"))
        # upper-edge estimate: exact P95 must fall in (p95u - binw, p95u]
        assert exact <= p95u + 1e-9, (win_end, exact, p95u)
        # lower bound with one extra bin of slack for edge-rank ties
        assert exact > p95u - 2 * 4.0, (win_end, exact, p95u)
        checked += 1
    assert checked > 0

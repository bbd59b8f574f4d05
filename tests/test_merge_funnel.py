"""Semantic edges of merge/SCD2/funnel that the test corpus can't hit:
same-timestamp events, version ties, absent stages."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_merge_upsert_updates_inserts_and_ties(spark):
    from spark_pipeline_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5)], "k int, v string, version int"
    )
    feed = spark.createDataFrame(
        # k=1: newer version wins; k=2: SAME version — feed must beat base;
        # k=3: insert-only key survives
        [(1, "a2", 2), (2, "b2", 5), (3, "c", 1)],
        "k int, v string, version int",
    )
    out = {r["k"]: r["v"] for r in merge_upsert(base, feed, ["k"], "version").collect()}
    assert out == {1: "a2", 2: "b2", 3: "c"}


def test_scd2_intervals_chain_and_current_flag(spark):
    from spark_pipeline_spark.operators.merge import scd2_intervals

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "x"), (1, _ts("2024-01-03T00:00:00"), "y")],
        "k int, ts timestamp, v string",
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "ts").collect(), key=lambda r: r["valid_from"]
    )
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert not rows[0]["is_current"] and rows[1]["is_current"]


def test_funnel_strict_after_and_dropout(spark):
    from spark_pipeline_spark.operators.windows import funnel_times

    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        # u1: signup then view at the SAME instant -> view must NOT count
        # (strictly-after), so u1 stalls at signup
        ("u1", "signup", t0),
        ("u1", "view", t0),
        # u2: full ordered path
        ("u2", "signup", t0),
        ("u2", "view", _ts("2024-01-01T01:00:00")),
        # u3: view BEFORE signup only -> stalls at signup
        ("u3", "view", t0),
        ("u3", "signup", _ts("2024-01-01T02:00:00")),
    ]
    df = spark.createDataFrame(rows, "user string, et string, ts timestamp")
    out = {
        r["user"]: (r["t_signup"], r["t_view"])
        for r in funnel_times(df, "user", "et", "ts", ["signup", "view"]).collect()
    }
    assert out["u1"][0] is not None and out["u1"][1] is None
    assert out["u2"][1] == _ts("2024-01-01T01:00:00")
    assert out["u3"][0] is not None and out["u3"][1] is None


def test_fit_logistic_gd_learns_separator(spark):
    from spark_pipeline_spark.operators.training import fit_logistic_gd

    # y = 1 iff x > 0: GD from zero must move w positive and improve on
    # the zero-weight model
    data = [(float(x), 1 if x > 0 else 0) for x in range(-50, 50)]
    df = spark.createDataFrame(data, "x double, y int")
    w = fit_logistic_gd(df, ["x"], "y", lr=1.0, iters=5).collect()[0]
    assert w["w_x"] > 0.1


def test_quantile_bucket_deciles_are_balanced(spark):
    from spark_pipeline_spark.operators.sampling import quantile_bucket

    from tests.conftest import SF_SMALL

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_totalprice")
    qb = quantile_bucket(o, "o_totalprice", [round(0.1 * i, 1) for i in range(1, 10)])
    counts = {r["bucket"]: r["n"] for r in qb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(10))
    n = sum(counts.values())
    for b, c in counts.items():
        assert abs(c - n / 10) / (n / 10) < 0.15, (b, c, n)


def test_kmeans_fit_reduces_inertia(spark):
    from tests.conftest import SF_SMALL

    from spark_pipeline_spark.functions import cosine_similarity
    from spark_pipeline_spark.operators.similarity import ivf_assign, kmeans_fit

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    seeds = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )

    def mean_sim(cen):
        a = ivf_assign(e, cen)
        j = a.join(
            cen.select("cell", F.col("centroid").alias("__c")), "cell"
        )
        return j.agg(
            F.avg(cosine_similarity("embedding", "__c")).alias("s")
        ).collect()[0]["s"]

    s0 = mean_sim(seeds)
    s2 = mean_sim(kmeans_fit(e, seeds, iters=2))
    # Lloyd iterations must not make the fit worse (cosine objective)
    assert s2 >= s0 - 1e-9
    assert s2 > s0 + 0.01  # and on this data they measurably improve it


def test_zorder_buckets_are_tight_in_both_dims(spark):
    """Top-6-bit z-order buckets (3 bits per dim) must confine each
    bucket to 1/8 of each dimension's range (+1 cell of scaling slack) —
    the property that makes min/max file stats prunable on BOTH
    columns."""
    from tests.conftest import SF_SMALL

    from spark_pipeline_spark.operators.layout import zorder_by

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_custkey").cast("long").alias("c"),
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d"),
    )
    z = zorder_by(o, ["c", "d"], bits=8)
    rows = (
        z.withColumn("bucket", F.shiftright("zkey", 10))
        .groupBy("bucket")
        .agg(F.min("c").alias("c0"), F.max("c").alias("c1"),
             F.min("d").alias("d0"), F.max("d").alias("d1"))
        .collect()
    )
    span_c = max(r["c1"] for r in rows) - min(r["c0"] for r in rows)
    span_d = max(r["d1"] for r in rows) - min(r["d0"] for r in rows)
    assert len(rows) > 32
    for r in rows:
        assert (r["c1"] - r["c0"]) <= span_c / 8 + span_c / 256 + 1
        assert (r["d1"] - r["d0"]) <= span_d / 8 + span_d / 256 + 1


def test_asof_join_deterministic_under_duplicate_right_ts(spark):
    """Multiple right rows at the same (key, ts): the carried match must
    be the md5-max payload, identically across partitionings."""
    import datetime as dt

    from spark_pipeline_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0, "a"), (1, t0, "b"), (1, t0, "c")], "k int, ts timestamp, v string"
    )
    picks = set()
    for parts in (1, 3, 7):
        j = asof_join(
            left, right.repartition(parts), on="k", left_ts="ts", right_ts="ts"
        )
        picks.add(j.collect()[0]["asof_v"])
    assert len(picks) == 1, f"nondeterministic asof pick: {picks}"


def test_quality_check_counts_planted_violations(spark):
    from spark_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (1, -5.0, "O"),      # dup key + below range
            (None, 20.0, "X"),   # null key + bad status
            (3, 2000.0, "F"),    # above range
        ],
        "k int, price double, status string",
    )
    report = {
        r["rule"]: (r["violations"], r["passed"])
        for r in Q.check(
            df,
            [
                Q.not_null("k"),
                Q.in_range("price", 0, 1000),
                Q.accepted_values("status", ["O", "F"]),
                Q.unique("k"),
            ],
        ).collect()
    }
    assert report["not_null:k"] == (1, False)
    assert report["in_range:price"] == (2, False)
    assert report["accepted_values:status"] == (1, False)
    assert report["unique:k"] == (1, False)

    parent = spark.createDataFrame([(1,), (3,)], "pk int")
    ref = Q.ref_integrity(df, "k", parent, "pk").collect()[0]
    assert ref["violations"] == 0  # 1 and 3 both exist; null k excluded


def test_merge_upsert_idempotent_and_order_insensitive(spark):
    """Re-applying the same feed must be a no-op, and splitting a feed
    into two applications must equal one combined application (versions
    decide, not arrival order)."""
    from spark_pipeline_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, version int"
    )
    f1 = spark.createDataFrame([(1, "a2", 3), (4, "d", 1)], "k int, v string, version int")
    f2 = spark.createDataFrame([(1, "a1", 2), (2, "b2", 2)], "k int, v string, version int")

    def snap(df):
        return {(r["k"], r["v"], r["version"]) for r in df.collect()}

    once = merge_upsert(base, f1.unionByName(f2), ["k"], "version")
    twice = merge_upsert(merge_upsert(base, f1, ["k"], "version"), f2, ["k"], "version")
    reordered = merge_upsert(merge_upsert(base, f2, ["k"], "version"), f1, ["k"], "version")
    assert snap(once) == snap(twice) == snap(reordered)
    assert snap(merge_upsert(once, f1.unionByName(f2), ["k"], "version")) == snap(once)


def test_chunk_udtf_equals_expression_chunker(spark):
    """The Python UDTF chunker must produce exactly the expression-based
    chunker's rows (same windows, same overlap)."""
    from tests.conftest import SF_ORACLE

    from spark_pipeline_spark.operators.udx import chunk_udtf_frame
    from spark_pipeline_spark.queries import REGISTRY

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id", "text")
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_udtf_frame(d, "doc_id", "text", 40, 8).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in REGISTRY["chunk_documents_overlapping"].fn(spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) > 0


def test_geometric_mean_udaf_equals_algebraic_form(spark):
    from tests.conftest import SF_SMALL

    from spark_pipeline_spark.operators.udx import (
        geometric_mean_expr,
        geometric_mean_udaf,
    )

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderstatus", "o_totalprice"
    )
    gm = geometric_mean_udaf()
    a = {
        r["o_orderstatus"]: round(r["g"], 6)
        for r in o.groupBy("o_orderstatus").agg(gm("o_totalprice").alias("g")).collect()
    }
    b = {
        r["o_orderstatus"]: round(r["g"], 6)
        for r in o.groupBy("o_orderstatus")
        .agg(geometric_mean_expr("o_totalprice").alias("g"))
        .collect()
    }
    assert a == b


def test_table_diff_null_swap_is_changed(spark):
    # concat_ws drops NULL operands, so without per-column NULL encoding
    # the payloads ('x', NULL) and (NULL, 'x') fingerprint identically
    # and a changed row is misreported as unchanged.
    from spark_pipeline_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "x", None), (2, "same", "same"), (3, None, None)],
        "k int, a string, b string",
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, "same", "same"), (3, "", "")],
        "k int, a string, b string",
    )
    out = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed", 2: "unchanged", 3: "changed"}


def test_table_diff_null_vs_sentinel_literal_is_changed(spark):
    # A sentinel-token encoding makes the literal string '<null>'
    # indistinguishable from SQL NULL; the null-flag encoding must
    # classify a NULL <-> '<null>' transition as changed.
    from spark_pipeline_spark.operators.merge import table_diff

    old = spark.createDataFrame([(1, "<null>"), (2, None)], "k int, a string")
    new = spark.createDataFrame([(1, None), (2, "<null>")], "k int, a string")
    out = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed", 2: "changed"}


def test_scale_to_int_wide_range_raises(spark):
    # epoch-micros-scale spans exceed the exact-double floor bound; the
    # guard must raise instead of silently misassigning z-order cells.
    import pytest
    from pyspark.errors import SparkRuntimeException
    from spark_pipeline_spark.operators.layout import scale_to_int

    wide = spark.range(1).select(
        (F.col("id") + F.lit(1_700_000_000_000_000)).alias("v")
    )
    with pytest.raises(SparkRuntimeException, match="scale_to_int"):
        wide.select(
            scale_to_int(F.col("v"), 0, 1_700_000_000_000_000, 8).alias("s")
        ).collect()

    # in-bound spans still assign exactly
    ok = spark.range(10).select(
        scale_to_int(F.col("id"), 0, 9, 3).alias("s")
    ).collect()
    assert [r["s"] for r in ok] == [0, 0, 1, 2, 3, 4, 4, 5, 6, 7]


def test_capped_sessions_split_gap_and_duration(spark):
    from spark_pipeline_spark.operators.windows import capped_sessions

    t0 = _ts("2024-01-01T00:00:00")

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: steady clicks every 50 min for 5 h -> ONE gap session
        # (gap 60 min), split at the 2 h cap into parts 0,0,0,1,1,2
        *[("u1", i, at(50 * i)) for i in range(6)],
        # u2: two bursts 3 h apart -> two gap sessions, no cap splits
        ("u2", 0, at(0)), ("u2", 1, at(10)),
        ("u2", 2, at(190)), ("u2", 3, at(200)),
    ]
    df = spark.createDataFrame(rows, "user string, eid int, ts timestamp")
    out = {
        (r["user"], r["eid"]): (r["session_id"], r["session_part"])
        for r in capped_sessions(
            df, "ts", gap_seconds=3600, max_duration_seconds=7200,
            keys=["user"], tiebreak_col="eid",
        ).collect()
    }
    assert [out[("u1", i)] for i in range(6)] == [
        (1, 0), (1, 0), (1, 0), (1, 1), (1, 1), (1, 2)
    ]
    assert out[("u2", 0)] == (1, 0) and out[("u2", 1)] == (1, 0)
    assert out[("u2", 2)] == (2, 0) and out[("u2", 3)] == (2, 0)


def test_merge_apply_cdc_tombstones(spark):
    """Delete wins over older versions; a later re-insert wins over the
    tombstone; untouched base keys survive; feed-only inserts appear."""
    from spark_pipeline_spark.operators.merge import merge_apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, version int"
    )
    feed = spark.createDataFrame(
        [
            (1, "a2", 2, "U"),   # plain update
            (2, "b", 2, "D"),    # delete: key vanishes
            (3, "c", 2, "D"),    # delete...
            (3, "c3", 3, "I"),   # ...then re-insert at higher version
            (4, "d", 1, "I"),    # brand-new key
        ],
        "k int, v string, version int, op string",
    )
    out = {r["k"]: (r["v"], r["version"]) for r in
           merge_apply_cdc(base, feed, ["k"], "version").collect()}
    assert out == {1: ("a2", 2), 3: ("c3", 3), 4: ("d", 1)}


def test_merge_apply_cdc_out_of_order_feed(spark):
    """Version order decides, never feed arrival order: a delete that is
    OLDER than the base row must not remove it."""
    from spark_pipeline_spark.operators.merge import merge_apply_cdc

    base = spark.createDataFrame([(1, "live", 5)], "k int, v string, version int")
    feed = spark.createDataFrame(
        [(1, "stale", 3, "D")], "k int, v string, version int, op string"
    )
    out = merge_apply_cdc(base, feed, ["k"], "version").collect()
    assert [(r["k"], r["v"], r["version"]) for r in out] == [(1, "live", 5)]


def test_asof_nearest_semantics_and_tolerance(spark):
    """Nearest direction edge cases pinned: closer-after wins, closer-
    before wins, equal distance breaks to the PRIOR row (pandas tie
    rule), no-match nulls, and the tolerance bounds the WINNING gap on
    both sides."""
    import datetime as dt

    from spark_pipeline_spark.operators.asof import asof_join

    def ts(h):
        return dt.datetime(2024, 1, 1, h)

    left = spark.createDataFrame(
        [
            (1, ts(10)),  # prior@9 (1h), next@12 (2h)  -> prior 'p9'
            (2, ts(10)),  # prior@6 (4h), next@11 (1h)  -> next  'n11'
            (3, ts(10)),  # prior@8 (2h), next@12 (2h)  -> tie -> prior 'p8'
            (4, ts(10)),  # no right rows                -> null
        ],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts(9), "p9"), (1, ts(12), "n12"),
            (2, ts(6), "p6"), (2, ts(11), "n11"),
            (3, ts(8), "p8"), (3, ts(12), "n12b"),
        ],
        "k int, ts timestamp, v string",
    )
    got = {
        r["k"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", direction="nearest"
        ).collect()
    }
    assert got == {1: "p9", 2: "n11", 3: "p8", 4: None}

    # tolerance 90 minutes: k=1 keeps its 1h prior, k=2 keeps its 1h
    # next, k=3's best gap is 2h on both sides -> masked to null
    got_tol = {
        r["k"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts",
            direction="nearest", tolerance_seconds=5400,
        ).collect()
    }
    assert got_tol == {1: "p9", 2: "n11", 3: None, 4: None}

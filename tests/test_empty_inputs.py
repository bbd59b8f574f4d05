"""Operators must survive empty inputs with correct (empty) results and
stable schemas — at 100 TB a filter legitimately empties a partition or
an entire input."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def _empty_docs(spark):
    return t(spark, SF_SMALL, "documents").filter(F.lit(False))


def test_dedup_on_empty(spark):
    from spark_pipeline_spark.operators.dedup import (
        dedup_exact_content,
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )

    d = _empty_docs(spark)
    assert dedup_exact_content(d, "text", "doc_id").count() == 0
    pairs = minhash_near_dup_pairs(d, "doc_id", "text")
    assert pairs.columns == ["id_a", "id_b", "jaccard"] and pairs.count() == 0
    assert simhash_near_dup_pairs(d, "doc_id", "text").count() == 0


def test_windows_and_score_on_empty(spark):
    from spark_pipeline_spark.models import LogisticModel
    from spark_pipeline_spark.operators.scoring import score
    from spark_pipeline_spark.operators.windows import tumbling_window

    e = t(spark, SF_SMALL, "events").filter(F.lit(False))
    w = tumbling_window(e, "ts", "1 day", keys=["event_type"], aggs=[F.count(F.lit(1)).alias("n")])
    assert w.count() == 0 and w.columns == ["window_start", "window_end", "event_type", "n"]

    c = t(spark, SF_SMALL, "customer").filter(F.lit(False)).select(
        F.col("c_custkey").cast("string").alias("uid"), "c_acctbal"
    )
    scored = score(c, LogisticModel({"c_acctbal": 1.0}), cols_to_save=["uid"])
    assert scored.count() == 0 and scored.columns == ["uid", "target_proba"]


def test_short_text_shingles_and_fingerprint(spark):
    """Texts shorter than the shingle width must not error (the
    sequence-descending edge case)."""
    from spark_pipeline_spark.operators.dedup import word_shingles
    from spark_pipeline_spark.operators.text import minhash_fingerprint

    df = spark.createDataFrame(
        [(1, "one two"), (2, "single"), (3, "abc"), (4, "a b c d")],
        "doc_id bigint, text string",
    )
    rows = df.select(
        "doc_id",
        F.size(word_shingles("text", 3)).alias("n_shingles"),
        minhash_fingerprint("text", 8).alias("fp"),
    ).collect()
    got = {r["doc_id"]: (r["n_shingles"], r["fp"]) for r in rows}
    assert got[1][0] == 0 and got[2][0] == 0 and got[3][0] == 0
    assert got[4][0] == 2
    assert all(v[1] is not None for v in got.values())


def test_interval_join_empty_sides(spark):
    from spark_pipeline_spark.operators.rangejoin import interval_join

    points = spark.createDataFrame([(1, 5.0)], "id bigint, x double").filter(F.lit(False))
    bands = spark.range(3).select(
        F.col("id").alias("band"),
        (F.col("id") * 10).cast("double").alias("lo"),
        (F.col("id") * 10 + 10).cast("double").alias("hi"),
    )
    assert interval_join(points, bands, "x", bucket_width=10.0).count() == 0


def test_sampling_packing_decontaminate_on_empty(spark):
    from spark_pipeline_spark.operators.dedup import decontaminate
    from spark_pipeline_spark.operators.packing import pack_sequences, running_total
    from spark_pipeline_spark.operators.sampling import (
        mixture_sample,
        token_budget_sample,
    )

    d = _empty_docs(spark).select(
        "doc_id", "source", "text", F.lit(1).cast("bigint").alias("n_tok")
    )
    assert token_budget_sample(d, 1000, "n_tok", ["doc_id"]).count() == 0
    assert mixture_sample(d, "source", {"src0": 1.0}, 100.0, "n_tok", ["doc_id"]).count() == 0
    rt = running_total(d, "n_tok", ["doc_id"])
    assert "running_before" in rt.columns and rt.count() == 0
    assert pack_sequences(d, 100, "n_tok", ["doc_id"]).count() == 0
    # empty benchmark: nothing is contaminated; empty corpus: empty out
    full = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    empty = _empty_docs(spark).select("doc_id", "text")
    assert decontaminate(full, "doc_id", "text", empty, "text").count() == full.count()
    assert decontaminate(empty, "doc_id", "text", full, "text").count() == 0


def test_round3_operators_on_empty(spark):
    """merge/funnel/quantile/chunk/GD must all degrade cleanly on empty
    inputs — no ANSI aborts, no null-array folds blowing up."""
    from spark_pipeline_spark.operators.merge import merge_upsert, table_diff
    from spark_pipeline_spark.operators.sampling import quantile_bucket
    from spark_pipeline_spark.operators.training import fit_logistic_gd
    from spark_pipeline_spark.operators.windows import funnel_times

    empty_kv = spark.createDataFrame([], "k int, v string, version int")
    feed = spark.createDataFrame([(1, "a", 1)], "k int, v string, version int")
    assert merge_upsert(empty_kv, feed, ["k"], "version").count() == 1
    assert merge_upsert(feed, empty_kv, ["k"], "version").count() == 1
    assert merge_upsert(empty_kv, empty_kv, ["k"], "version").count() == 0

    diff = {r["change"] for r in table_diff(feed, empty_kv, ["k"]).collect()}
    assert diff == {"removed"}

    empty_ev = spark.createDataFrame([], "user string, et string, ts timestamp")
    assert funnel_times(empty_ev, "user", "et", "ts", ["a", "b"]).count() == 0

    empty_num = spark.createDataFrame([], "x double")
    assert quantile_bucket(empty_num, "x", [0.5]).count() == 0

    empty_xy = spark.createDataFrame([], "x double, y int")
    w = fit_logistic_gd(empty_xy, ["x"], "y", iters=2).collect()[0]
    # avg over zero rows is null; the fit must surface that, not crash
    assert w["w_x"] is None and w["intercept"] is None


def test_quality_check_on_empty_table_passes(spark):
    """Empty-but-clean: sum-shaped rules aggregate to NULL on zero rows;
    check() must coalesce to 0 violations / passed=True, not NULL."""
    from spark_pipeline_spark.operators import quality as Q

    d = t(spark, SF_SMALL, "orders").filter(F.lit(False))
    rows = Q.check(
        d,
        [
            Q.not_null("o_orderkey"),
            Q.in_range("o_totalprice", 0, 1e9),
            Q.unique("o_orderkey"),
            Q.accepted_values("o_orderstatus", ["O", "F", "P"]),
        ],
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["violations"] == 0 and r["passed"] is True


def test_containment_and_quantize_on_empty(spark):
    from spark_pipeline_spark.operators.dedup import containment_near_dup_pairs

    d = _empty_docs(spark)
    pairs = containment_near_dup_pairs(d, "doc_id", "text")
    assert pairs.columns == ["id_a", "id_b", "containment"] and pairs.count() == 0

    e = t(spark, SF_SMALL, "embeddings").filter(F.lit(False))
    out = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("mx", F.array_max(F.transform("v", lambda x: F.abs(x))))
    )
    assert out.count() == 0


def test_round6_operators_on_empty(spark):
    """The r6 additions keep stable schemas on empty inputs: the join
    delta rule with every side empty, connected components over an
    empty edge list, and the binned-AUC shape with zero rows."""
    from spark_pipeline_spark.operators.graph import connected_components
    from spark_pipeline_spark.operators.incremental import incremental_join_delta

    o = t(spark, SF_SMALL, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    c = t(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey")
    empty_o, empty_c = o.filter(F.lit(False)), c.filter(F.lit(False))

    # all four split combinations with at least one empty side
    assert incremental_join_delta(empty_o, empty_o, empty_c, empty_c,
                                  ["c_custkey"]).count() == 0
    assert incremental_join_delta(o, empty_o, c, empty_c,
                                  ["c_custkey"]).count() == 0
    d = incremental_join_delta(empty_o, o, empty_c, c, ["c_custkey"])
    assert d.count() == o.join(c, ["c_custkey"]).count()

    edges = (
        o.filter(F.lit(False))
        .select(F.col("o_orderkey").alias("src"), F.col("c_custkey").alias("dst"))
    )
    comp = connected_components(edges)
    assert comp.count() == 0 and comp.columns == ["id", "component"]


def test_round7_operators_on_empty(spark, tmp_path):
    """The r7 additions keep stable schemas when the corpus is empty —
    exercised end-to-end by pointing the registered queries at an sf_dir
    of genuinely empty parquet tables (the shape a quality filter that
    drops everything produces)."""
    from spark_pipeline_spark.queries import REGISTRY

    for tbl in ("documents", "embeddings"):
        t(spark, SF_SMALL, tbl).filter(F.lit(False)).write.parquet(
            f"{tmp_path}/{tbl}.parquet"
        )
    sf = str(tmp_path)

    for name in (
        "rrf_fusion_search_documents",
        "source_cap_documents",
        "bpe_merge_candidates_documents",
        "cross_source_neardup_matrix",
        "label_centroid_similarity_embeddings",
        "nll_quartile_bucket_documents",
    ):
        out = REGISTRY[name].fn(spark, sf)
        assert out.count() == 0, f"{name} nonempty on empty corpus"

    # global-aggregate shape: one all-null diagnostic row, stable schema
    z = REGISTRY["zipf_fit_documents"].fn(spark, sf)
    assert z.columns == ["slope", "intercept", "r2", "n_terms"]
    rows = z.collect()
    assert len(rows) == 1 and rows[0]["slope"] is None
    assert rows[0]["n_terms"] == 0


def test_null_text_scores_zero_quality(spark):
    """A NULL document must score quality 0.0 — Spark's null-skipping
    `least` would otherwise award it 0.7 (length credit defaults to the
    1.0 clamp) and pass every keep-threshold. Other text stats stay
    null-propagating (null in → null out), which downstream filters
    treat as not-keep."""
    from spark_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the fast data table scan")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.quality_score("text").alias("q"),
            T.token_count_ws("text").alias("n_tok"),
        ).collect()
    }
    assert rows[1]["q"] == 0.0
    assert rows[1]["n_tok"] is None  # null-propagating, not fabricated
    assert 0.0 < rows[2]["q"] < rows[3]["q"]


def test_asof_variants_on_empty_right(spark):
    """As-of with an EMPTY right side (no purchases yet): every left row
    survives with null match columns, in both directions and with a
    tolerance — the bootstrap day of an attribution pipeline."""
    from spark_pipeline_spark.operators.asof import asof_join

    e = t(spark, SF_SMALL, "events").select("event_id", "ts", "user_id", "value")
    empty_right = e.filter(F.lit(False)).select("user_id", "ts", "event_id", "value")
    n = e.count()
    for kwargs in (
        {},
        {"direction": "forward"},
        {"tolerance_seconds": 3600.0},
    ):
        j = asof_join(e, empty_right, on="user_id", left_ts="ts", **kwargs)
        assert j.count() == n
        assert j.filter(F.col("asof_event_id").isNotNull()).count() == 0


def test_round9_operators_on_empty(spark, tmp_path):
    """The r9 additions keep stable schemas on a genuinely empty corpus
    (empty parquet tables, the quality-filter-dropped-everything shape)."""
    from spark_pipeline_spark.queries import REGISTRY

    for tbl in ("documents", "embeddings", "events"):
        t(spark, SF_SMALL, tbl).filter(F.lit(False)).write.parquet(
            f"{tmp_path}/{tbl}.parquet"
        )
    sf = str(tmp_path)

    for name in (
        "longest_shared_span_documents",
        "ann_int8_recall_report",
        "dsir_importance_documents",
        "dedup_editdistance_verify_documents",
        "streaming_quality_gate_replay",
        "span_scrub_min_length_documents",
        "epoch_allocation_documents",
        "interval_overlap_sessions_events",
        "grouped_split_by_source_documents",
        "ivf_cell_balance_embeddings",
        "ann_pq_recall_report",
        "neardup_threshold_sweep_documents",
        "tfidf_top_terms_documents",
        "freshness_report_events",
        "streaming_late_arrival_report",
    ):
        out = REGISTRY[name].fn(spark, sf)
        assert out.count() == 0, f"{name} nonempty on empty corpus"

    # global-aggregate shape: one all-zero diagnostic row, stable schema
    g = REGISTRY["neardup_graph_stats_documents"].fn(spark, sf).collect()
    assert len(g) == 1 and g[0]["n_nodes"] == 0 and g[0]["n_edges"] == 0
    c = REGISTRY["source_concentration_documents"].fn(spark, sf).collect()
    assert len(c) == 1 and c[0]["n_sources"] == 0 and c[0]["hhi"] is None
    # bootstrap over an empty corpus: the one-row CI frame survives with
    # null mean and null order-statistic bounds (no replicate means)
    bci = REGISTRY["bootstrap_ci_tokens_documents"].fn(spark, sf).collect()
    assert len(bci) <= 1
    if bci:
        assert bci[0]["mean_tokens"] is None

    # schema stability: the columns the driver hashes must not drift
    assert REGISTRY["longest_shared_span_documents"].fn(spark, sf).columns == [
        "id_a", "id_b", "longest_span_words", "n_spans",
    ]
    assert REGISTRY["dsir_importance_documents"].fn(spark, sf).columns == [
        "doc_id", "source", "n_tok", "log_importance", "log_importance_per_tok",
    ]


def test_round9_late_queries_on_empty_tables(spark, tmp_path):
    """The r9-late registrations must return empty (not error) when their
    input tables are empty — an upstream filter legitimately empties a
    partition or a whole table."""
    from spark_pipeline_spark.queries import REGISTRY

    for name in ("documents", "events", "lineitem"):
        t(spark, SF_SMALL, name).filter(F.lit(False)).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{name}.parquet"))
    for q in (
        "winnowing_overlap_pairs_documents",
        "text_bigram_backoff_nll_documents",
        "assoc_rules_parts_orders",
        "session_markov_nll_events",
        "holt_linear_forecast_user_value",
    ):
        assert REGISTRY[q].fn(spark, str(tmp_path)).count() == 0, q


def test_late_r12_operators_on_empty(spark):
    """label_propagation, kcenter_select, and the shared MinHash index
    prep on empty inputs: empty results, stable schemas, no job
    failures (the k-center seed fetch and the LPA round loop must both
    tolerate zero rows)."""
    from spark_pipeline_spark.functions import md5_unit
    from spark_pipeline_spark.operators.dedup import (
        minhash_index_tables,
        minhash_near_dup_pairs,
    )
    from spark_pipeline_spark.operators.graph import label_propagation
    from spark_pipeline_spark.operators.similarity import kcenter_select

    d = _empty_docs(spark)
    base, banded = minhash_index_tables(
        d, "doc_id", "text", tag=md5_unit("__id") < 0.1
    )
    assert base.columns == ["__id", "__sh", "__tag"] and base.count() == 0
    assert banded.columns == ["__id", "__band", "__key", "__tag"]
    assert banded.count() == 0
    pairs = minhash_near_dup_pairs(
        None, "doc_id", "text", shingles=base, bands_table=banded
    )
    assert pairs.columns == ["id_a", "id_b", "jaccard"] and pairs.count() == 0

    edges = spark.createDataFrame([], "src long, dst long")
    comm = label_propagation(edges, n_iter=3)
    assert comm.columns == ["node", "community"] and comm.count() == 0

    e = t(spark, SF_SMALL, "embeddings").filter(F.lit(False))
    sel = kcenter_select(e, "vec_id", "embedding", k=4)
    assert sel.columns == ["sel_round", "id", "coverage_sim"]
    assert sel.count() == 0

    # k larger than the corpus: picks stop when exhausted, no raise
    tiny = t(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 3)
    sel3 = kcenter_select(tiny, "vec_id", "embedding", k=10)
    assert sel3.count() == 3

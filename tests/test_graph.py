"""Connected components + representative resolution (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_star,
    dedup_representatives,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_components_chain_triangle_and_isolated_pair(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_chain_needs_iterations(spark):
    n = 12
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    got = {r["id"]: r["component"] for r in connected_components(e, max_iter=30).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_max_iter_rail(spark):
    e = _edges(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=1)


def test_star_equals_minlabel_on_mixed_graph(spark):
    """Interchangeability contract: large-star/small-star labels every
    node with the same component minimum as min-label propagation."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
             (30, 30), (5, 4), (21, 20)]
    e = _edges(spark, pairs)
    want = {r["id"]: r["component"] for r in connected_components(e).collect()}
    got = {r["id"]: r["component"]
           for r in connected_components_star(e).collect()}
    assert got == want


def test_star_long_chain_converges_in_log_rounds(spark):
    """The planted pathology the min-label rail rejects: a 65-node chain
    (diameter 64 > max_iter=25) resolves to one component via star
    alternation within ~log2(n) rounds — max_iter=10 suffices where
    min-label's default raises."""
    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e)  # default rail: 25 < diameter
    got = {r["id"]: r["component"]
           for r in connected_components_star(e, max_iter=10).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_star_self_loops_and_singleton_edges(spark):
    """Self-loop-only nodes are singletons; ordinary pairs keep the min."""
    e = _edges(spark, [(7, 7), (1, 2)])
    got = {r["id"]: r["component"]
           for r in connected_components_star(e).collect()}
    assert got == {7: 7, 1: 1, 2: 1}


def test_dedup_representatives_keeps_min_and_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id bigint, payload string"
    )
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    kept = dedup_representatives(df, comp, "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {1, 10, 99}


def test_pagerank_mass_conservation_and_tiny_graph(spark):
    from spark_pipeline_spark.operators.graph import pagerank

    # path graph a-b-c (symmetric): b is the hub
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "src string, dst string"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=10).collect()}
    # no dangling nodes on a symmetric graph -> total mass conserved
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["b"] > ranks["a"] and ranks["b"] > ranks["c"]
    assert abs(ranks["a"] - ranks["c"]) < 1e-12  # symmetry

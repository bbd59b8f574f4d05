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
    # driver_solve_cap=0 forces the distributed rounds the rail guards
    e = _edges(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=1, driver_solve_cap=0)


def test_star_equals_minlabel_on_mixed_graph(spark):
    """Interchangeability contract: large-star/small-star labels every
    node with the same component minimum as min-label propagation —
    checked for every combination of the driver union-find gate and
    the distributed rounds (cap on/off per implementation)."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21),
             (30, 30), (5, 4), (21, 20)]
    e = _edges(spark, pairs)
    results = [
        {r["id"]: r["component"]
         for r in connected_components(e, driver_solve_cap=cap).collect()}
        for cap in (2_000_000, 0)
    ] + [
        {r["id"]: r["component"]
         for r in connected_components_star(e, driver_solve_cap=cap).collect()}
        for cap in (2_000_000, 0)
    ]
    for got in results[1:]:
        assert got == results[0]


def test_star_long_chain_converges_in_log_rounds(spark):
    """The planted pathology the min-label rail rejects: a 65-node chain
    (diameter 64 > max_iter=25) resolves to one component via star
    alternation within ~log2(n) rounds — max_iter=10 suffices where
    min-label's default raises."""
    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    with pytest.raises(RuntimeError, match="converge"):
        # default rail: 25 < diameter (distributed rounds forced)
        connected_components(e, driver_solve_cap=0)
    got = {r["id"]: r["component"]
           for r in connected_components_star(
               e, max_iter=10, driver_solve_cap=0).collect()}
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


def test_component_split_repair_leakage_free(spark):
    """The property split_repair_components_documents buys with
    component closure (and the single-pass split_repair_documents
    honestly disclaims): ZERO verified near-dup pairs cross a split
    boundary in the final assignment — for EVERY boundary, not just
    train-vs-eval. Also: the repair must actually differ from the
    single-pass result on this corpus or the stronger guarantee is
    vacuously tested, and clean docs must never move."""
    from spark_pipeline_spark.operators.dedup import minhash_near_dup_pairs
    from spark_pipeline_spark.queries import REGISTRY, t
    from tests.conftest import SF_SMALL

    out = REGISTRY["split_repair_components_documents"].fn(
        spark, SF_SMALL
    ).persist()
    d = t(spark, SF_SMALL, "documents")
    pairs = (
        minhash_near_dup_pairs(
            d, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.0
        )
        .filter(F.col("jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    fs = out.select("doc_id", "final_split")
    crossing = (
        pairs.join(
            fs.select(
                F.col("doc_id").alias("id_a"), F.col("final_split").alias("fa")
            ),
            "id_a",
        )
        .join(
            fs.select(
                F.col("doc_id").alias("id_b"), F.col("final_split").alias("fb")
            ),
            "id_b",
        )
        .filter(F.col("fa") != F.col("fb"))
    )
    assert crossing.count() == 0

    # every doc appears exactly once, moved flag is consistent
    assert out.count() == d.count()
    assert out.filter(
        F.col("moved") != (F.col("split") != F.col("final_split"))
    ).count() == 0
    # docs outside any verified pair never move
    paired = pairs.select(F.col("id_a").alias("doc_id")).unionByName(
        pairs.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    clean_moved = out.filter(F.col("moved")).join(paired, "doc_id", "left_anti")
    assert clean_moved.count() == 0

    out.unpersist()


def test_component_closure_repairs_chain_single_pass_misses(spark, tmp_path):
    """Non-vacuity of the closure guarantee, on a corpus where it
    BITES (the driver corpora's dup chains are too short to straddle
    three splits): a train≈val≈test chain A–B–C with J(A,C) < 0.7.
    Single-pass repair pulls only B (A's direct neighbor) into train
    and leaves the verified (B, C) pair crossing train/test; component
    closure moves the whole chain and leaves zero crossings."""
    import hashlib

    from spark_pipeline_spark.queries import REGISTRY

    def unit(i: int) -> float:
        return int(
            hashlib.md5(f"split-v1|{i}".encode()).hexdigest()[:8], 16
        ) / 2**32

    a_id = next(i for i in range(1, 10_000) if unit(i) < 0.8)
    b_id = next(i for i in range(1, 10_000) if 0.8 <= unit(i) < 0.9)
    c_id = next(i for i in range(1, 10_000) if unit(i) >= 0.9)
    toks = [f"tok{k}" for k in range(1, 12)]
    # 3-shingle Jaccards: J(A,B)=8/9, J(B,C)=7/9 (both >= 0.7),
    # J(A,C)=6/9 (< 0.7 -- the chain is genuinely transitive)
    docs = [
        (a_id, " ".join(toks[:10])),
        (b_id, " ".join(toks[:11])),
        (c_id, " ".join(toks[2:11])),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sf_dir = str(tmp_path)

    def crossings(name):
        fs = REGISTRY[name].fn(spark, sf_dir).select("doc_id", "final_split")
        m = {r["doc_id"]: r["final_split"] for r in fs.collect()}
        return m, sum(
            1
            for x, y in [(a_id, b_id), (b_id, c_id)]
            if m[x] != m[y]
        )

    single_map, single_x = crossings("split_repair_documents")
    assert single_map[b_id] == "train"  # direct neighbor pulled in
    assert single_map[c_id] == "test"  # indirect neighbor missed
    assert single_x == 1  # the (B, C) pair still crosses

    comp_map, comp_x = crossings("split_repair_components_documents")
    assert comp_map == {a_id: "train", b_id: "train", c_id: "train"}
    assert comp_x == 0


def test_merge_components_incremental_bridges_and_chains(spark):
    """The incremental merge's hard cases on a crafted graph:
    (a) a new node bridging TWO old components merges them under the
    global min label; (b) a new-new chain hanging off an old component
    adopts its label; (c) a new edge to an old node that was never in
    any old pair (no old label) treats it as its own singleton;
    (d) untouched old components keep their labels verbatim."""
    from spark_pipeline_spark.operators.graph import (
        merge_components_incremental,
    )

    old_labels = spark.createDataFrame(
        # comp {1,2}, comp {5,6}, comp {8,9} (untouched)
        [(1, 1), (2, 1), (5, 5), (6, 5), (8, 8), (9, 8)],
        "id long, component long",
    )
    new_edges = spark.createDataFrame(
        [
            (100, 2),    # bridge arm 1: new 100 touches comp 1
            (100, 6),    # bridge arm 2: same new node touches comp 5
            (101, 102),  # new-new chain...
            (102, 5),    # ...hanging off comp 5
            (103, 42),   # new node to an old UNLABELLED singleton
        ],
        "src long, dst long",
    )
    got = {
        r["id"]: r["component"]
        for r in merge_components_incremental(old_labels, new_edges).collect()
    }
    # (a)+(b): comps {1,2} and {5,6} merged with 100,101,102 under min 1
    for n in (1, 2, 5, 6, 100, 101, 102):
        assert got[n] == 1, (n, got)
    # (c): 42 and 103 form their own component under min 42
    assert got[103] == 42 and got[42] == 42
    # (d): untouched component keeps its label
    assert got[8] == 8 and got[9] == 8
    # every old node + every new-edge node is labelled, exactly once
    assert len(got) == 11


def test_label_propagation_splits_bridged_cliques_finer_than_components(spark):
    """Two 4-cliques joined by ONE bridge edge: components collapse the
    whole graph to a single cluster; 3-round synchronous LPA keeps two
    communities, because from round 2 on each clique's mode-vote is
    dominated by its own members — the finer-than-components property
    `lpa_communities_documents` documents. Also pins the cold-start
    semantics: round 1's all-tied ballots reduce to min-neighbor
    propagation, so clique B's community id is its min member's
    round-1 label, not its min member id."""
    from spark_pipeline_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    cliq_a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    cliq_b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges = spark.createDataFrame(
        cliq_a + cliq_b + [(4, 10)], "src long, dst long"  # one bridge
    )
    comp = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert len(set(comp.values())) == 1  # components: one blob

    comm = {
        r["node"]: r["community"]
        for r in label_propagation(edges, n_iter=3).collect()
    }
    groups = {}
    for n, c in comm.items():
        groups.setdefault(c, set()).add(n)
    assert sorted(map(sorted, groups.values())) == [
        [1, 2, 3, 4],
        [10, 11, 12, 13],
    ]


def test_label_propagation_matches_components_on_clique_forest(spark):
    """On disjoint cliques (no bridges) LPA's partition must equal the
    components partition — the regime the documents corpus exhibits,
    stated honestly in the query docstring."""
    from spark_pipeline_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    cliques = [(1, 2), (2, 3), (1, 3), (20, 21), (30, 31), (31, 32), (30, 32)]
    edges = spark.createDataFrame(cliques, "src long, dst long")
    comp = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    comm = {
        r["node"]: r["community"]
        for r in label_propagation(edges, n_iter=3).collect()
    }
    part = lambda d: sorted(
        sorted(k for k, v in d.items() if v == val) for val in set(d.values())
    )
    assert part(comp) == part(comm)


def test_lpa_incremental_equals_batch_and_far_communities_stable(spark):
    """VERDICT r12 item 5: `label_propagation_incremental` must equal a
    from-scratch `label_propagation` on (old ∪ new) edges EXACTLY —
    including when the increment bridges two old communities — while
    communities farther than n_iter hops from every new edge keep
    their old labels (locality of fixed-round synchronous LPA)."""
    from spark_pipeline_spark.operators.graph import (
        label_propagation,
        label_propagation_incremental,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    # three well-separated cliques + a 7-node chain (diameter > n_iter)
    old = (
        clique((1, 2, 3, 4))
        + clique((10, 11, 12, 13))
        + clique((20, 21, 22))
        + [(30, 31), (31, 32), (32, 33), (33, 34), (34, 35), (35, 36)]
    )
    # increment: bridge cliques A-B, extend the chain, add a NEW clique
    new = [(4, 10), (36, 37)] + clique((40, 41, 42))
    old_e = _edges(spark, old)
    new_e = _edges(spark, new)

    old_comm = label_propagation(old_e, n_iter=3)
    inc = {
        (r["node"], r["community"])
        for r in label_propagation_incremental(
            old_comm, old_e, new_e, n_iter=3
        ).collect()
    }
    batch = {
        (r["node"], r["community"])
        for r in label_propagation(
            old_e.unionByName(new_e), n_iter=3
        ).collect()
    }
    assert inc == batch

    # far community (20,21,22) is > n_iter hops from every new edge:
    # its rows must be the OLD rows, untouched
    old_map = {r["node"]: r["community"] for r in old_comm.collect()}
    got = dict(inc)
    for n in (20, 21, 22):
        assert got[n] == old_map[n]
    # the new clique got labelled, and the A-B bridge region re-labelled
    assert {40, 41, 42}.issubset(got)


def test_lpa_incremental_empty_increment_is_identity(spark):
    """No new edges → the old labelling comes back verbatim (the BFS
    ball is empty, nothing recomputes)."""
    from spark_pipeline_spark.operators.graph import (
        label_propagation,
        label_propagation_incremental,
    )

    old_e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    new_e = _edges(spark, []).limit(0)
    old_comm = label_propagation(old_e, n_iter=3)
    inc = {
        (r["node"], r["community"])
        for r in label_propagation_incremental(
            old_comm, old_e, new_e, n_iter=3
        ).collect()
    }
    assert inc == {(r["node"], r["community"]) for r in old_comm.collect()}


def test_merge_components_driver_gate_equals_star_path(spark):
    """The driver union-find gate must be bit-identical to the
    distributed star path on the same contracted graphs — bridges,
    chains, unlabeled singletons, self-loops."""
    from spark_pipeline_spark.operators.graph import (
        merge_components_incremental,
    )

    old_labels = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5), (8, 8), (9, 8)],
        "id long, component long",
    )
    new_edges = spark.createDataFrame(
        [(100, 2), (100, 6), (101, 102), (102, 5), (103, 42), (77, 77)],
        "src long, dst long",
    )
    via_driver = {
        tuple(r)
        for r in merge_components_incremental(old_labels, new_edges).collect()
    }
    via_star = {
        tuple(r)
        for r in merge_components_incremental(
            old_labels, new_edges, driver_solve_cap=0
        ).collect()
    }
    assert via_driver == via_star
    got = dict(via_driver)
    assert got[77] == 77  # self-loop-only node is its own singleton
    for n in (1, 2, 5, 6, 100, 101, 102):
        assert got[n] == 1


def test_lpa_incremental_partition_path_equals_batch(spark):
    """The old_components partition path (no BFS) must equal batch LPA
    exactly — including when a delta edge CHAINS two old components and
    when communities are finer than components (old edges crossing
    communities inside one component)."""
    from spark_pipeline_spark.operators.graph import (
        connected_components_star,
        label_propagation,
        label_propagation_incremental,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    # component X: two cliques bridged by ONE old edge (communities
    # finer than components); component Y: a clique; component Z:
    # untouched chain
    old = (
        clique((1, 2, 3, 4)) + clique((10, 11, 12, 13)) + [(4, 10)]
        + clique((20, 21, 22))
        + [(30, 31), (31, 32), (32, 33)]
    )
    # delta: chain component X to component Y through a new node, and
    # hang a brand-new clique off nothing
    new = [(13, 200), (200, 20)] + clique((40, 41, 42))
    old_e = _edges(spark, old)
    new_e = _edges(spark, new)
    old_comm = label_propagation(old_e, n_iter=3)
    old_comp = connected_components_star(old_e)

    for cap in (2_000_000, 0):  # driver gate and distributed sliver
        inc = {
            (r["node"], r["community"])
            for r in label_propagation_incremental(
                old_comm, old_e, new_e, n_iter=3,
                old_components=old_comp, driver_solve_cap=cap,
            ).collect()
        }
        batch = {
            (r["node"], r["community"])
            for r in label_propagation(
                old_e.unionByName(new_e), n_iter=3
            ).collect()
        }
        assert inc == batch, f"cap={cap}"

    # untouched chain keeps its old rows verbatim
    got = dict(inc)
    old_map = {r["node"]: r["community"] for r in old_comm.collect()}
    for n in (30, 31, 32, 33):
        assert got[n] == old_map[n]


def test_lpa_incremental_partition_path_empty_increment(spark):
    from spark_pipeline_spark.operators.graph import (
        connected_components_star,
        label_propagation,
        label_propagation_incremental,
    )

    old_e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    new_e = _edges(spark, []).limit(0)
    old_comm = label_propagation(old_e, n_iter=3)
    inc = {
        (r["node"], r["community"])
        for r in label_propagation_incremental(
            old_comm, old_e, new_e, n_iter=3,
            old_components=connected_components_star(old_e),
        ).collect()
    }
    assert inc == {(r["node"], r["community"]) for r in old_comm.collect()}


def test_lpa_driver_replicates_distributed_semantics(spark):
    """_lpa_driver must be bit-identical to label_propagation on the
    shapes where tie-breaking and self-votes matter."""
    from spark_pipeline_spark.operators.graph import (
        _lpa_driver,
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    cases = [
        clique((1, 2, 3, 4)) + clique((5, 6, 7, 8)) + [(4, 5)],  # bridge
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],                # chain
        [(9, 9), (1, 9)],                                        # self-loop
        [(2, 1), (1, 2), (3, 1)],            # both orientations present
    ]
    for pairs in cases:
        dist = {
            (r["node"], r["community"])
            for r in label_propagation(
                _edges(spark, pairs), n_iter=3, driver_solve_cap=0
            ).collect()
        }
        drv = set(_lpa_driver(pairs, 3).items())
        assert drv == dist, pairs
        # and the batch entry point's own gate returns the same rows
        gated = {
            (r["node"], r["community"])
            for r in label_propagation(_edges(spark, pairs), n_iter=3).collect()
        }
        assert gated == dist, pairs

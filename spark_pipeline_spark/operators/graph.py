"""Connected components over an edge list — the dedup *clustering* step.

Near-dup detection (MinHash/SimHash/embedding pairs) yields EDGES; a
dedup pipeline needs CLUSTERS: if A≈B and B≈C, then {A,B,C} is one
duplicate group even when A-C never collided. Components make the
"keep one representative per group" decision well-defined.

Algorithm: iterative min-label propagation (each node repeatedly adopts
the smallest label among itself and its neighbors) — converges in
O(graph diameter) rounds to component id = min node id, a value that is
engine- and partitioning-independent (hence oracle-verifiable).

100 TB posture:

- each round is one join + one aggregation on the edge list — all
  shuffles on node ids; no per-node driver work;
- lineage MUST be truncated between rounds (``localCheckpoint``), or
  round k replays rounds 1..k-1 and the plan grows without bound — the
  classic iterative-Spark failure. On a cluster with a checkpoint dir,
  prefer reliable ``checkpoint()`` (configurable here);
- near-dup graphs are sparse forests of small cliques — diameter is
  tiny (converges in ~3 rounds); the ``max_iter`` rail guards
  pathological chains;
- convergence is detected with one small count per round (changed
  labels), the deliberate driver-side scalar of an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_representatives", "pagerank"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """Label every node of an undirected edge list with its component id
    (= the minimum node id in the component).

    Returns ``(id, component)`` for every node that appears in an edge.
    Raises if not converged within ``max_iter`` rounds (graph diameter
    exceeded the rail — raise it for long chains).
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.d == labels.id)
            .groupBy("s")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.s, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
                F.col("label").alias("__old"),
            )
        )
        if use_reliable_checkpoint:
            new_labels = new_labels.checkpoint(eager=True)
        else:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            sym.unpersist()
            return labels.select("id", F.col("label").alias("component"))
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the rail — raise max_iter"
    )


def dedup_representatives(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Resolve near-dup clusters to survivors: rows whose id is NOT a
    non-representative member of any component (the component id itself —
    the minimum — is the kept representative; singletons, which never
    appear in an edge, are all kept)."""
    losers = components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("__loser")
    )
    return (
        df.join(
            F.broadcast(losers), df[id_col] == F.col("__loser"), "left_anti"
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    ``(node, rank)``.

    Each iteration is one join + one aggregation, both shuffling on node
    ids — the same discipline as :func:`connected_components`, with
    ``localCheckpoint`` truncating lineage between rounds. Fixed
    ``n_iter`` (not convergence-tested) keeps the result a pure
    function of the input, so a DuckDB oracle can replay the identical
    float recurrence as chained CTEs.

    Semantics: uniform init 1/N, per-iteration
    ``rank = (1-d)/N + d * Σ rank(in)/outdeg(in)``. Nodes appearing
    only as destinations still receive and emit nothing (outdeg 0 —
    their mass is dropped, the simple variant); feed symmetric edges
    for the undirected behavior, which also eliminates dangling mass.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

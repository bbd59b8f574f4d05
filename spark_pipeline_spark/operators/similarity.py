"""Similarity search over embedding columns: exact top-k and IVF ANN.

North-star capability (SURVEY.md §2.11 — absent from the reference).
Embeddings are plain ``array<float>`` columns; similarity is the engine's
JVM-side ``cosine_similarity`` expression
(`spark_pipeline_spark.functions`, Catalyst ``zip_with``+``aggregate`` —
no Python in the hot loop).

100 TB design:

- **Exact search broadcasts the small side.** The query set (thousands)
  broadcasts; the corpus (billions) streams through a
  BroadcastNestedLoopJoin without ever shuffling its vectors. The only
  shuffle is the per-query top-k window over scored (query_id,
  neighbor_id, sim) triples — fixed-width rows, not vectors.
- **IVF is the scale path.** Vectors are assigned to their nearest
  centroid once (centroids broadcast; ``max_by`` aggregation with
  map-side partial combine); search joins query cells to corpus cells so
  each query scores ~N/cells candidates instead of N. Assignment is
  deterministic (ties broken toward the lowest cell id), so results are
  reproducible and oracle-verifiable.
- Centroids are caller-provided (any small DataFrame of (cell, vector)).
  Real deployments k-means them; the mechanism — assign, bucket, search
  within buckets — is identical and is what this module owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import cosine_similarity

__all__ = [
    "cosine_topk",
    "ivf_assign",
    "ivf_topk",
    "embedding_near_dup_pairs",
]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact brute-force cosine top-k: for every query vector, the ``k``
    most similar corpus vectors.

    Returns ``(query_id, neighbor_id, cosine, rank)``. Deterministic
    ordering: cosine desc, neighbor id asc on ties.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id", "neighbor_id", cosine_similarity("__qv", "__cv").alias("cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "centroid",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (IVF cell).

    Returns the input ids + vectors + a ``cell`` column. Shape: centroids
    broadcast, one ``groupBy(id).agg(max_by(...))`` — partial combine
    means the shuffle carries one candidate per (partition × id), and the
    vector rides inside the max_by struct so no second join is needed.
    Ties break toward the lowest cell id (deterministic).
    """
    cen = centroids.select(
        F.col(cell_id).alias("__cell"), F.col(cell_vec).alias("__cenv")
    )
    scored = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).join(F.broadcast(cen), how="cross")
    sim = cosine_similarity("__v", "__cenv")
    order = F.struct(sim.alias("s"), (-F.col("__cell")).alias("c"))
    best = scored.groupBy("__id").agg(
        F.max_by(F.struct(F.col("__cell").alias("cell"), F.col("__v").alias("v")), order).alias(
            "__best"
        )
    )
    return best.select(
        F.col("__id").alias(id_col),
        F.col("__best.v").alias(vec_col),
        F.col("__best.cell").alias("cell"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "centroid",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF: search only the query's cell (nprobe=1).

    Returns ``(query_id, neighbor_id, cell, cosine, rank)``. Each query
    scores ~N/cells corpus vectors instead of N — the standard
    recall-for-throughput ANN trade. Candidate generation is an equi-join
    on the cell id (queries broadcast), so the corpus again never
    shuffles its vectors.
    """
    c_assigned = ivf_assign(corpus, centroids, corpus_id, vec_col, cell_id, cell_vec)
    q_assigned = ivf_assign(queries, centroids, query_id, vec_col, cell_id, cell_vec)
    c = c_assigned.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cell"
    )
    q = q_assigned.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"), "cell"
    )
    scored = c.join(F.broadcast(q), on="cell")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        "cell",
        cosine_similarity("__qv", "__cv").alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_id: str = "cell",
    cell_vec: str = "centroid",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by IVF cell.

    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b`` and
    ``cosine >= threshold``, comparing only pairs assigned to the same
    cell — the embedding-space member of the dedup family (same
    never-all-pairs discipline as MinHash/SimHash blocking; near-dups
    have near-identical vectors, so same-cell assignment is the standard
    recall assumption).

    The assignment table feeds both join sides, so it is persisted for
    the job — one assignment pass, not two."""
    from pyspark.storagelevel import StorageLevel

    assigned = ivf_assign(df, centroids, id_col, vec_col, cell_id, cell_vec).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "cell"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "cell"
    )
    return (
        a.join(b, on="cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_similarity("__va", "__vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )

"""Persisted near-dup GRAPH index — the base-state artifact that makes
the incremental graph queries actually incremental.

Problem (VERDICT r14, top item): the registered incremental queries
(`dedup_components_incremental_documents`,
`lpa_communities_incremental_documents`) re-derived "yesterday's" state
— the old slice's MinHash tables, near-dup edges, component labels and
LPA communities — inside every run, so the "incremental" path measured
base+delta and came out ~2× SLOWER than its own full-recompute twin at
every scale. The daily-increment regime they model never does that: the
base state is a PERSISTED artifact maintained across runs (exactly how
`operators/dedup.py:minhash_index_tables` + the streaming LSH sink
treat the dedup index, and how `ann_index.py` treats centroids/
assignments). This module is that artifact.

Layout (all parquet, one directory)::

    <path>/
      shingles/      (__id, __sh)            MinHash shingle sets
      bands/         (__id, __band, __key)   LSH band keys
      edges/         (src, dst)              verified near-dup pairs
      components/    (id, component)         connected-components labels
      communities/   (node, community)       fixed-n_iter LPA labels
      manifest/      one row: version, fingerprint, params

``shingles``/``bands`` carry the builder's ``(n, num_hashes, bands)``
as column metadata (stamped by ``minhash_index_tables``; Spark round-
trips column metadata through parquet), so downstream consumers keep
the mismatched-index refusal they have on in-memory tables.

Commit discipline: the whole index is written under
``<path>__staging_<appId>`` and renamed into place in ONE directory
rename — readers see either no index or a complete one, never a
partial build (the manifest rides inside the same rename). A build
that loses the publish race to a concurrent builder discards its
staging copy and uses the winner's (both builds are deterministic
functions of the same corpus, so the copies are identical).

Staleness: ``load_neardup_graph_index`` returns ``None`` unless the
manifest's ``(version, fingerprint)`` matches the caller's — callers
derive ``fingerprint`` from the source data (see
:func:`dataset_fingerprint`) so a regenerated corpus or a bumped
``GRAPH_INDEX_VERSION`` forces a rebuild instead of silently serving
stale labels. A stale live index is deleted by the next successful
build's publish.

100 TB posture: the build is the standard banded near-dup pipeline
(one shingle scan, banded equi-join candidates, star rounds / LPA
rounds with per-round lineage truncation) and runs ONCE per corpus
version; every subsequent increment reads these tables and touches
only the delta's neighborhood. On a real cluster the same artifact is
maintained by the streaming LSH sink + `merge_components_incremental`
instead of rebuilt, and ``path`` is a durable store, not a tempdir.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAPH_INDEX_VERSION = 1

_TABLES = ("shingles", "bands", "edges", "components", "communities")

__all__ = [
    "GRAPH_INDEX_VERSION",
    "build_neardup_graph_index",
    "load_neardup_graph_index",
    "dataset_fingerprint",
]


def dataset_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Content fingerprint for one source table: md5 over the parquet
    file listing (names, sizes, mtimes). Local-filesystem paths get
    real staleness detection; non-local URIs degrade to the path string
    (the artifact then persists until ``GRAPH_INDEX_VERSION`` bumps —
    callers owning remote data should pass their own fingerprint, e.g.
    a snapshot/commit id)."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    h = hashlib.md5()
    h.update(p.encode())
    if os.path.isfile(p):
        st = os.stat(p)
        h.update(f":{st.st_size}:{int(st.st_mtime)}".encode())
    elif os.path.isdir(p):
        for root, _dirs, files in sorted(os.walk(p)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                h.update(f":{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()


def _manifest_fingerprint(spark: SparkSession, path: str) -> tuple | None:
    from spark_pipeline_spark.streaming import _try_read_parquet

    m = _try_read_parquet(spark, path.rstrip("/") + "/manifest")
    if m is None:
        return None
    row = m.first()
    if row is None:
        return None
    return (row["version"], row["fingerprint"])


def load_neardup_graph_index(
    spark: SparkSession, path: str, fingerprint: str,
    tables: tuple[str, ...] = _TABLES,
) -> dict[str, DataFrame] | None:
    """Open a current index, or ``None`` when absent/stale (wrong
    ``fingerprint`` or built by a different ``GRAPH_INDEX_VERSION``).
    Returned frames are lazy parquet scans of the live tables.

    ``tables`` restricts which sub-tables are opened: every
    ``spark.read.parquet`` costs a 1-task schema job, so a consumer
    that needs 3 of the 5 tables should not pay for 5 (the components
    increment never reads ``communities``/``edges``). Table reads go
    through the session schema memo (`read_parquet_catalog`) — the
    artifact path is session-keyed, so its schema is stable for the
    process lifetime."""
    if _manifest_fingerprint(spark, path) != (GRAPH_INDEX_VERSION, fingerprint):
        return None
    from spark_pipeline_spark.session import read_parquet_catalog

    root = path.rstrip("/")
    return {
        name: read_parquet_catalog(spark, f"{root}/{name}")
        for name in tables
    }


def build_neardup_graph_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    fingerprint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    lpa_iters: int = 3,
) -> dict[str, DataFrame]:
    """Build the full base-state artifact over ``docs`` (the corpus the
    increments will be folded into) and publish it at ``path`` with one
    atomic directory rename. Returns the live tables (via
    :func:`load_neardup_graph_index` on the published copy)."""
    from spark_pipeline_spark.operators.dedup import (
        minhash_index_tables,
        minhash_near_dup_pairs,
    )
    from spark_pipeline_spark.operators.graph import (
        connected_components_star,
        label_propagation,
    )
    from spark_pipeline_spark.streaming import (
        _hadoop_delete,
        _hadoop_rename,
        hadoop_path_exists,
    )

    root = path.rstrip("/")
    staging = f"{root}__staging_{spark.sparkContext.applicationId}"
    _hadoop_delete(spark, staging)

    base, banded = minhash_index_tables(
        docs, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    )
    base.write.parquet(f"{staging}/shingles")
    banded.write.parquet(f"{staging}/bands")
    minhash_near_dup_pairs(
        None, id_col, text_col, threshold=threshold,
        shingles=base, bands_table=banded,
    ).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).write.parquet(f"{staging}/edges")
    # graph passes read the staged edge parquet back: truncated lineage
    # (the banded join never re-executes per star/LPA round) and the
    # exact bytes later increments will read
    edges = spark.read.parquet(f"{staging}/edges")
    connected_components_star(edges).write.parquet(f"{staging}/components")
    label_propagation(edges, n_iter=lpa_iters).write.parquet(
        f"{staging}/communities"
    )
    spark.createDataFrame(
        [(GRAPH_INDEX_VERSION, fingerprint, n, num_hashes, bands,
          float(threshold), lpa_iters)],
        "version INT, fingerprint STRING, n INT, num_hashes INT, "
        "bands INT, threshold DOUBLE, lpa_iters INT",
    ).coalesce(1).write.parquet(f"{staging}/manifest")

    # publish: delete a stale live copy, then one whole-dir rename.
    # Losing the race to a concurrent builder (rename fails because live
    # reappeared) is benign — discard staging, read the winner's copy.
    if hadoop_path_exists(spark, root):
        _hadoop_delete(spark, root)
    if not _hadoop_rename(spark, staging, root):
        _hadoop_delete(spark, staging)
    out = load_neardup_graph_index(spark, root, fingerprint)
    if out is None:
        raise IOError(
            f"build_neardup_graph_index: publish to {root} failed and no "
            f"concurrent builder's current copy is readable"
        )
    return out

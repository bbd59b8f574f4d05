"""Table maintenance: small-file inspection and compaction.

Scale story: a 100 TB table written by thousands of streaming
micro-batches or over-parallel jobs accumulates millions of tiny files;
every downstream scan then pays per-file open/footer costs and the
driver pays listing costs. Without a transactional table format the
remedy is periodic rewrite at a target file size.

``file_stats`` inspects a directory tree through the Hadoop FS API (so
it works on HDFS/S3A, not just local paths). ``compact_parquet``
rewrites data at ``target_mb`` per file, sizing the partition count from
the MEASURED input bytes — not a guess — and writes to a staging
directory first, swapping only after the rewrite commits (the same
staging discipline as ``streaming.stream_upsert_sink``; an overwrite
that read its own input lazily would corrupt the table).

Partitioned layouts: pass ``partition_by`` to keep the directory
structure; compaction then repartitions on the partition columns so each
output task writes one directory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["file_stats", "compact_parquet"]


def _fs(spark: SparkSession, path: str):
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:
        # file_stats has a Connect fallback; the compaction swap needs a
        # real filesystem delete, which the DataFrame API can't express
        raise RuntimeError(
            "compact_parquet needs a classic SparkSession (staging delete "
            "goes through the Hadoop FS API); Spark Connect sessions "
            "don't expose spark._jvm"
        )
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _sizes_via_read(spark: SparkSession, path: str, suffix: str) -> list[int]:
    """Connect-compatible recursive listing: ``binaryFile`` exposes
    (path, length) as metadata columns — no content bytes move — and
    hides ``_``/``.`` entries, matching the classic filter."""
    rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{suffix}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("length")
        .collect()
    )
    return [int(r["length"]) for r in rows]


def file_stats(spark: SparkSession, path: str, suffix: str = ".parquet") -> dict:
    """Recursive data-file census of ``path``: count, total/min/max/mean
    bytes. Driver-side listing via the Hadoop FS API — the same listing
    every scan's planning phase performs (a metadata-only ``binaryFile``
    listing on Spark Connect); fine for maintenance cadence, not for
    per-query hot paths."""
    if getattr(spark, "_jvm", None) is None:
        sizes = _sizes_via_read(spark, path, suffix)
    else:
        fs, hpath, _ = _fs(spark, path)
        # qualify BEFORE comparing: listFiles returns fully-qualified
        # URIs, so a relative caller path would never prefix-match and
        # every ancestor of the cwd would be scanned for hidden segments
        base = fs.makeQualified(hpath).toUri().getPath()
        sizes = []
        it = fs.listFiles(hpath, True)  # recursive
        while it.hasNext():
            status = it.next()
            p = status.getPath()
            name = p.getName()
            # skip hidden ANCESTOR DIRECTORIES too (_temporary/ debris from
            # a crashed write, .staging/), not just hidden file names —
            # matching the FileIndex semantics the Connect binaryFile
            # fallback inherits; without this the two session types report
            # different censuses on a torn table (ADVICE r7)
            rel = p.toUri().getPath()
            if rel.startswith(base):
                rel = rel[len(base):]
            hidden_dir = any(
                seg.startswith(("_", ".")) for seg in rel.split("/")[:-1] if seg
            )
            if (
                status.isFile()
                and name.endswith(suffix)
                and not name.startswith(("_", "."))
                and not hidden_dir
            ):
                sizes.append(int(status.getLen()))
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "min_bytes": 0, "max_bytes": 0, "mean_bytes": 0.0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
        "mean_bytes": sum(sizes) / len(sizes),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 512,
    partition_by: list[str] | None = None,
    min_skip_files: int = 2,
) -> dict:
    """Rewrite the parquet table at ``path`` into ~``target_mb`` files.

    Returns the before/after :func:`file_stats`. No-op (returns with
    ``compacted=False``) when the table already has fewer than
    ``min_skip_files`` files — rewriting one file buys nothing.

    The partition count comes from measured bytes:
    ``ceil(total_bytes / target_mb)``. That sizes OUTPUT files by INPUT
    bytes, which for parquet→parquet rewrites is the right first-order
    estimate (same encoding, same compression family).
    """
    # fail fast BEFORE any mutation: the final staging delete needs the
    # Hadoop FS API, and discovering that only after the table has been
    # rewritten would leave staging debris behind a surprise exception
    if getattr(spark, "_jvm", None) is None:
        _fs(spark, path)  # raises the canonical Connect error

    before = file_stats(spark, path)
    if before["n_files"] < min_skip_files:
        return {"before": before, "after": before, "compacted": False}

    n_parts = max(1, math.ceil(before["total_bytes"] / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact_staging"

    if partition_by:
        out = df.repartition(n_parts, *partition_by)
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(staging)
    else:
        out = df.repartition(n_parts)
        out.write.mode("overwrite").parquet(staging)

    # swap: parquet reads are lazy, so the rewrite MUST land in staging
    # before the original is overwritten from it
    final = spark.read.parquet(staging).write.mode("overwrite")
    if partition_by:
        final = final.partitionBy(*partition_by)
    final.parquet(path)

    fs, spath, _ = _fs(spark, staging)
    fs.delete(spath, True)
    after = file_stats(spark, path)
    return {"before": before, "after": after, "compacted": True}

"""Data-skipping advisor: per-file column min/max from parquet footers,
and the files a predicate could prune WITHOUT scanning them.

The lakehouse table formats (Delta/Iceberg/Hudi) keep these stats in a
manifest; plain parquet directories already carry them in every file
footer — this module surfaces them so layout decisions (Z-order,
range-partitioned writes, compaction order) can be MEASURED instead of
assumed: "after clustering on k, a `k < x` predicate skips 87% of
files" is a number, not a hope.

Scale story: footers are a few KB per file regardless of file size. The
file list comes from a `binaryFile` listing projected to `path` (no
content bytes move), and footer parsing fans out through `mapInPandas`
over that path list — so a million-file table reads a million footers
across the cluster, never through the driver. No reference analog
(`sparktools` has no storage-layout tooling); the design follows the
public parquet/pyarrow metadata API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["file_column_stats", "skipping_report"]

_STATS_SCHEMA = (
    "path string, column string, min_value string, max_value string, "
    "null_count long, num_rows long, has_stats boolean"
)


def file_column_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Per-(file, column) footer stats: lexical/numeric min & max
    (rendered as strings — the advisor casts when comparing), null count
    and row count, ``has_stats`` false when a writer omitted statistics.

    Row-group stats within a file are folded to file-level (min of mins,
    max of maxes) — the granularity file pruning operates at.
    """
    cols = list(columns)
    # glob to parquet only: a visible sidecar (report.csv, an exported
    # README) must not reach the footer parser and crash the job
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path")
    )

    def read_footers(batches):
        from urllib.parse import unquote, urlparse

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                parsed = urlparse(p)
                # file: URIs become local paths; other schemes (s3, hdfs)
                # pass through for pyarrow's own filesystem resolution
                local = unquote(parsed.path) if parsed.scheme == "file" else p
                md = pq.read_metadata(local)
                names = md.schema.names
                for col in cols:
                    if col not in names:
                        rows.append((p, col, None, None, None, md.num_rows, False))
                        continue
                    j = names.index(col)
                    mins, maxs = [], []
                    nulls = 0
                    ok = True
                    for i in range(md.num_row_groups):
                        st = md.row_group(i).column(j).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                        nulls += st.null_count or 0
                    if not ok:
                        rows.append((p, col, None, None, None, md.num_rows, False))
                    else:
                        rows.append(
                            (
                                p,
                                col,
                                str(min(mins)),
                                str(max(maxs)),
                                nulls,
                                md.num_rows,
                                True,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "column", "min_value", "max_value",
                    "null_count", "num_rows", "has_stats",
                ],
            )

    return files.mapInPandas(read_footers, schema=_STATS_SCHEMA)


def skipping_report(
    stats: DataFrame,
    column: str,
    op: str,
    value,
    numeric: bool = True,
) -> DataFrame:
    """Which files can a ``column <op> value`` predicate skip, judged
    purely from footer min/max — the same min/max argument a lakehouse
    manifest prune makes. ``op`` ∈ {``<``, ``<=``, ``>``, ``>=``,
    ``=``}. Files without stats are conservatively NOT skippable.

    Returns one row per file: ``(path, num_rows, skippable)`` — feed it
    to an aggregate for the skip ratio, or join back to a file list to
    build a pruned scan. Comparison is numeric by default (footer
    strings cast to double); pass ``numeric=False`` for lexical
    columns.
    """
    s = stats.filter(F.col("column") == column)
    if numeric:
        lo = F.col("min_value").cast("double")
        hi = F.col("max_value").cast("double")
        v = F.lit(float(value))
    else:
        lo, hi, v = F.col("min_value"), F.col("max_value"), F.lit(str(value))
    if op == "<":
        keep = lo < v
    elif op == "<=":
        keep = lo <= v
    elif op == ">":
        keep = hi > v
    elif op == ">=":
        keep = hi >= v
    elif op == "=":
        keep = (lo <= v) & (hi >= v)
    else:
        raise ValueError(f"unsupported op {op!r}")
    # conservative on every unknown: no stats, or stats strings that
    # don't cast under the requested comparison type (e.g. numeric=True
    # on a date column) → NOT skippable, never NULL — a NULL here would
    # silently drop the file from both the skip and keep sets
    skippable = F.when(
        ~F.col("has_stats") | keep.isNull(), F.lit(False)
    ).otherwise(~keep)
    return s.select(
        "path", "num_rows", skippable.alias("skippable")
    )

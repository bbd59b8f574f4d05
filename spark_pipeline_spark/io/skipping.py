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

__all__ = ["file_column_stats", "pruned_read", "skipping_report"]

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

        def render(stat):
            # bytes stats (BYTE_ARRAY physical type) must be DECODED, not
            # repr'd — str(b'ab') is "b'ab'", which corrupts lexical
            # comparisons. UTF-8 bytewise order equals code-point order,
            # so decoding preserves the footer's ordering semantics.
            if isinstance(stat, bytes):
                return stat.decode("utf-8", "replace")
            return str(stat)

        def read_metadata(p):
            parsed = urlparse(p)
            if parsed.scheme in ("", "file"):
                return pq.read_metadata(unquote(parsed.path) if parsed.scheme else p)
            # pyarrow resolves s3:// but not Hadoop's s3a:// alias; other
            # schemes (hdfs, gs, abfs) go through FileSystem.from_uri so
            # the right pyarrow filesystem is constructed explicitly
            # instead of hoping read_metadata guesses it from a string.
            from pyarrow import fs as pafs

            uri = "s3://" + p[len("s3a://"):] if p.startswith("s3a://") else p
            filesystem, fpath = pafs.FileSystem.from_uri(uri)
            return pq.read_metadata(fpath, filesystem=filesystem)

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = read_metadata(p)
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
                                render(min(mins)),
                                render(max(maxs)),
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
    build a pruned scan. Comparison is numeric by default; pass
    ``numeric=False`` for lexical columns.

    Numeric comparisons are EXACT for integer columns: a double cast of
    an int64 stat loses precision above 2^53 (hashed ids live there), and
    a rounded-up ``max`` could mark a file skippable that actually holds
    matching rows — breaking the conservative contract. Integral stats
    strings (which :func:`file_column_stats` emits iff the physical type
    is integral) therefore compare as ``decimal(38,0)``; only true float
    stats take the double path.
    """
    if op not in ("<", "<=", ">", ">=", "="):
        raise ValueError(f"unsupported op {op!r}")

    def _keep(lo, hi, v):
        if op == "<":
            return lo < v
        if op == "<=":
            return lo <= v
        if op == ">":
            return hi > v
        if op == ">=":
            return hi >= v
        return (lo <= v) & (hi >= v)

    s = stats.filter(F.col("column") == column)
    if numeric:
        import math

        keep_dbl = _keep(
            F.col("min_value").cast("double"),
            F.col("max_value").cast("double"),
            F.lit(float(value)),
        )
        stats_integral = F.col("min_value").rlike("^-?[0-9]+$") & F.col(
            "max_value"
        ).rlike("^-?[0-9]+$")
        lo_d = F.col("min_value").cast("decimal(38,0)")
        hi_d = F.col("max_value").cast("decimal(38,0)")
        # isinstance check first: float(2^63-1) rounds AWAY from the int,
        # so a float-equality probe would misroute huge exact ints into
        # the fractional branch; the string-literal cast keeps values
        # beyond float precision exact all the way into the comparison.
        # Everything else (numeric strings like '10.5', floats, inf/nan)
        # routes off the parsed float — is_integer() is False for
        # inf/nan, so non-finite pivots take the double path, where IEEE
        # comparison semantics give the right keep answer.
        fv = float(value)
        if isinstance(value, int) and not isinstance(value, bool):
            v_d = F.lit(str(value)).cast("decimal(38,0)")
            keep_int = _keep(lo_d, hi_d, v_d)
        elif fv.is_integer():
            v_d = F.lit(str(int(fv))).cast("decimal(38,0)")
            keep_int = _keep(lo_d, hi_d, v_d)
        elif math.isfinite(fv):
            # fractional predicate against an integer column: rewrite the
            # bound onto the integer domain (exists int < v ⟺ min <=
            # floor(v); exists int > v ⟺ max >= ceil(v); no int = v)
            v_floor = F.lit(math.floor(fv)).cast("decimal(38,0)")
            v_ceil = F.lit(math.ceil(fv)).cast("decimal(38,0)")
            if op in ("<", "<="):
                keep_int = lo_d <= v_floor
            elif op in (">", ">="):
                keep_int = hi_d >= v_ceil
            else:
                keep_int = F.lit(False)
        else:
            keep_int = keep_dbl  # ±inf / nan: double semantics for ints too
        keep = F.when(stats_integral, keep_int).otherwise(keep_dbl)
    else:
        keep = _keep(F.col("min_value"), F.col("max_value"), F.lit(str(value)))
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


def pruned_read(
    spark: SparkSession,
    path: str,
    column: str,
    op: str,
    value,
    numeric: bool = True,
) -> DataFrame:
    """Read only the files a ``column <op> value`` predicate cannot
    prune, with the predicate applied — the manifest-style scan the
    advisor's report enables on plain parquet directories.

    Semantics contract: ``pruned_read(...)`` ≡
    ``spark.read.parquet(path).filter(column <op> value)`` — the skip
    verdicts are conservative (a skipped file provably holds no matching
    rows), so pruning never changes the answer, only the bytes read.

    Scale: the footer sweep is a metadata-only distributed job (a few KB
    per file); the kept-file list collects to the driver as PATHS ONLY —
    one short string per kept file, the same driver footprint as
    Spark's own file-index planning. The row filter stays on the scan,
    so parquet row-group stats prune further WITHIN kept files.

    Works on Hive-partitioned layouts too: the kept-leaf-file read
    anchors partition discovery with ``basePath``, so partition columns
    survive (footers don't carry them, so every file is conservatively
    kept when filtering on one — correct, just unpruned; partition
    filters belong to the directory layout, not the footer advisor).
    """
    stats = file_column_stats(spark, path, [column])
    report = skipping_report(stats, column, op, value, numeric=numeric)
    kept = [r["path"] for r in report.filter(~F.col("skippable")).collect()]
    if numeric and isinstance(value, str):
        # the row predicate must be a NUMERIC literal when the verdicts
        # were numeric — a string literal against a bigint column throws
        # NumberFormatException at execution under ANSI casts
        try:
            value = int(value)
        except ValueError:
            value = float(value)
    if op == "<":
        pred = F.col(column) < F.lit(value)
    elif op == "<=":
        pred = F.col(column) <= F.lit(value)
    elif op == ">":
        pred = F.col(column) > F.lit(value)
    elif op == ">=":
        pred = F.col(column) >= F.lit(value)
    else:  # "=" — skipping_report already rejected anything else
        pred = F.col(column) == F.lit(value)
    if not kept:
        # every file pruned: an empty frame with the table's real schema
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.option("basePath", path).parquet(*kept).filter(pred)

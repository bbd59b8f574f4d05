"""File-skipping advisor: footer min/max stats must reflect the layout,
and the skip verdicts must agree with what the rows actually contain —
the measured version of the Z-order/range-layout story."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_pipeline_spark.io.skipping import file_column_stats, skipping_report
from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def _write_range_layout(spark, tmp_path, n_files=4):
    out = str(tmp_path / "orders_ranged")
    (
        t(spark, SF_SMALL, "orders")
        .repartitionByRange(n_files, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_footer_stats_match_actual_extremes(spark, tmp_path):
    out = _write_range_layout(spark, tmp_path)
    stats = file_column_stats(spark, out, ["o_orderkey", "o_orderstatus"]).cache()
    key = stats.filter(F.col("column") == "o_orderkey")
    rows = key.collect()
    assert len(rows) >= 2 and all(r["has_stats"] for r in rows)
    # global min/max across footers equal the table's real extremes
    table = t(spark, SF_SMALL, "orders").agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert min(int(r["min_value"]) for r in rows) == table[0]
    assert max(int(r["max_value"]) for r in rows) == table[1]
    # range layout => per-file key ranges are pairwise disjoint
    spans = sorted((int(r["min_value"]), int(r["max_value"])) for r in rows)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next
    # row counts in footers sum to the table
    assert sum(r["num_rows"] for r in rows) == t(spark, SF_SMALL, "orders").count()


def test_skip_verdicts_agree_with_contents(spark, tmp_path):
    out = _write_range_layout(spark, tmp_path)
    stats = file_column_stats(spark, out, ["o_orderkey"]).cache()
    med = t(spark, SF_SMALL, "orders").agg(
        F.expr("percentile(o_orderkey, 0.5)")
    ).collect()[0][0]

    report = skipping_report(stats, "o_orderkey", "<", med).collect()
    skippable = {r["path"] for r in report if r["skippable"]}
    kept = {r["path"] for r in report if not r["skippable"]}
    # a range layout must make SOME files skippable for a median cut
    assert skippable and kept
    # ground truth: a skippable file contains NO matching rows
    for p in report:
        local = p["path"]
        matches = (
            spark.read.parquet(local)
            .filter(F.col("o_orderkey") < med)
            .count()
        )
        if p["skippable"]:
            assert matches == 0, f"advisor skipped a file with {matches} matches"

    # and the kept files alone reproduce the full filtered count
    total = (
        spark.read.parquet(out).filter(F.col("o_orderkey") < med).count()
    )
    kept_total = sum(
        spark.read.parquet(r["path"]).filter(F.col("o_orderkey") < med).count()
        for r in report
        if not r["skippable"]
    )
    assert kept_total == total


def test_missing_column_and_equality_op(spark, tmp_path):
    out = _write_range_layout(spark, tmp_path, n_files=2)
    stats = file_column_stats(spark, out, ["no_such_col", "o_orderkey"]).cache()
    missing = stats.filter(F.col("column") == "no_such_col").collect()
    assert missing and all(not r["has_stats"] for r in missing)
    # no-stats files are conservatively unskippable
    rep = skipping_report(stats, "no_such_col", "<", 0).collect()
    assert rep and all(not r["skippable"] for r in rep)

    some_key = t(spark, SF_SMALL, "orders").agg(F.max("o_orderkey")).collect()[0][0]
    eq = skipping_report(stats, "o_orderkey", "=", some_key).collect()
    hit = [r for r in eq if not r["skippable"]]
    assert len(hit) == 1  # disjoint ranges: exactly one file can hold the max


def test_skip_verdicts_ground_truth_all_ops(spark, tmp_path):
    """For every supported operator and several pivot values, a file the
    advisor marks skippable must contain ZERO matching rows — the
    conservative contract across the whole predicate surface."""
    out = _write_range_layout(spark, tmp_path)
    stats = file_column_stats(spark, out, ["o_orderkey"]).cache()
    lo, med, hi = (
        t(spark, SF_SMALL, "orders")
        .agg(
            F.min("o_orderkey"),
            F.expr("percentile(o_orderkey, 0.5)"),
            F.max("o_orderkey"),
        )
        .collect()[0]
    )
    spark_ops = {"<": "<", "<=": "<=", ">": ">", ">=": ">=", "=": "="}
    for op in spark_ops:
        for v in (lo, med, hi):
            for r in skipping_report(stats, "o_orderkey", op, v).collect():
                if not r["skippable"]:
                    continue
                expr = f"o_orderkey {'==' if op == '=' else op} {v}"
                matches = spark.read.parquet(r["path"]).filter(expr).count()
                assert matches == 0, f"{op} {v}: skipped file has {matches} rows"

def test_int64_stats_beyond_double_precision_stay_exact(spark, tmp_path):
    """ADVICE r7 (medium): ids above 2^53 (hashed keys) must not be
    judged through a double cast — a rounded max could mark a file
    skippable that actually contains matching rows. The decimal path
    keeps the verdict exact at full int64 width."""
    base = 2**53  # 9007199254740992; base+1 is NOT representable as double
    out = str(tmp_path / "bigids")
    spark.createDataFrame(
        [(base - 1,), (base + 1,)], "id long"
    ).coalesce(1).write.mode("overwrite").parquet(out)
    stats = file_column_stats(spark, out, ["id"]).cache()

    # double(base+1) == double(base): a double compare would call
    # `id > base` unsatisfiable and skip the file — but base+1 matches.
    rep = skipping_report(stats, "id", ">", base).collect()
    assert rep and all(not r["skippable"] for r in rep)
    # and '=' on base+1 (collapses onto base in double) must keep it too
    rep = skipping_report(stats, "id", "=", base + 1).collect()
    assert rep and all(not r["skippable"] for r in rep)
    # sanity: a genuinely out-of-range predicate still skips
    rep = skipping_report(stats, "id", ">", base + 2).collect()
    assert rep and all(r["skippable"] for r in rep)


def test_fractional_value_on_integer_column(spark, tmp_path):
    """A fractional pivot against an int column rewrites onto the
    integer domain: no int equals 10.5, so '=' skips everywhere; '<'
    keeps iff min <= floor(v)."""
    out = str(tmp_path / "smallids")
    spark.createDataFrame(
        [(10,), (20,)], "id long"
    ).coalesce(1).write.mode("overwrite").parquet(out)
    stats = file_column_stats(spark, out, ["id"]).cache()
    assert all(r["skippable"] for r in skipping_report(stats, "id", "=", 10.5).collect())
    assert all(not r["skippable"] for r in skipping_report(stats, "id", "<", 10.5).collect())
    assert all(r["skippable"] for r in skipping_report(stats, "id", "<", 9.5).collect())
    assert all(not r["skippable"] for r in skipping_report(stats, "id", ">", 19.5).collect())
    assert all(r["skippable"] for r in skipping_report(stats, "id", ">", 20.5).collect())


def test_binary_string_stats_decoded_not_repred(spark, tmp_path):
    """ADVICE r7 (low): string columns are BYTE_ARRAY in parquet, so raw
    footer stats are bytes; they must decode to text ('apple'), never
    render as a bytes repr ("b'apple'") that corrupts lexical compares."""
    out = str(tmp_path / "words")
    spark.createDataFrame(
        [("apple",), ("pear",)], "w string"
    ).coalesce(1).write.mode("overwrite").parquet(out)
    stats = file_column_stats(spark, out, ["w"]).collect()
    assert stats[0]["min_value"] == "apple"
    assert stats[0]["max_value"] == "pear"
    rep = skipping_report(
        file_column_stats(spark, out, ["w"]), "w", "<", "banana", numeric=False
    ).collect()
    assert all(not r["skippable"] for r in rep)
    rep = skipping_report(
        file_column_stats(spark, out, ["w"]), "w", "<", "aardvark", numeric=False
    ).collect()
    assert all(r["skippable"] for r in rep)


def test_pruned_read_equals_full_filter(spark, tmp_path):
    """pruned_read ≡ full scan + filter, while reading fewer files (the
    advisor's verdicts turned into an actual manifest-style scan)."""
    from spark_pipeline_spark.io.skipping import pruned_read

    out = _write_range_layout(spark, tmp_path)
    med = t(spark, SF_SMALL, "orders").agg(
        F.expr("percentile(o_orderkey, 0.5)")
    ).collect()[0][0]

    pruned = pruned_read(spark, out, "o_orderkey", "<", med)
    full = spark.read.parquet(out).filter(F.col("o_orderkey") < med)
    assert pruned.count() == full.count()
    assert sorted(r["o_orderkey"] for r in pruned.select("o_orderkey").collect()) == \
           sorted(r["o_orderkey"] for r in full.select("o_orderkey").collect())
    # the pruned scan's file index really holds fewer files
    n_all = len(spark.read.parquet(out).inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert n_pruned < n_all, (n_pruned, n_all)

    # fully-out-of-range predicate: zero files, empty frame, schema intact
    empty = pruned_read(spark, out, "o_orderkey", "<", -1)
    assert empty.count() == 0
    assert empty.schema == spark.read.parquet(out).schema


def test_pruned_read_equals_full_filter_all_ops(spark, tmp_path):
    """pruned_read ≡ full scan + filter for every supported operator and
    pivot (the conservative contract end-to-end, not just for '<')."""
    from spark_pipeline_spark.io.skipping import pruned_read

    out = _write_range_layout(spark, tmp_path)
    lo, med, hi = (
        t(spark, SF_SMALL, "orders")
        .agg(
            F.min("o_orderkey"),
            F.expr("percentile(o_orderkey, 0.5)"),
            F.max("o_orderkey"),
        )
        .collect()[0]
    )
    for op in ("<", "<=", ">", ">=", "="):
        for v in (lo, int(med), hi):
            got = pruned_read(spark, out, "o_orderkey", op, v).count()
            expr = f"o_orderkey {'==' if op == '=' else op} {v}"
            want = spark.read.parquet(out).filter(expr).count()
            assert got == want, (op, v, got, want)


def test_pruned_read_on_hive_partitioned_layout(spark, tmp_path):
    """Partition columns live in the DIRECTORY layout, not footers — the
    pruned scan must anchor discovery with basePath so they survive, on
    both the kept-files and the filter-on-partition-column paths."""
    from spark_pipeline_spark.io.skipping import pruned_read

    out = str(tmp_path / "orders_part")
    (
        t(spark, SF_SMALL, "orders")
        .withColumn("bucket", (F.col("o_orderkey") % 4).cast("int"))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(out)
    )
    full = spark.read.parquet(out)

    # filter on a DATA column: schema (incl. partition col) must survive
    med = t(spark, SF_SMALL, "orders").agg(
        F.expr("percentile(o_orderkey, 0.5)")
    ).collect()[0][0]
    pruned = pruned_read(spark, out, "o_orderkey", "<", med)
    assert set(pruned.columns) == set(full.columns)
    assert pruned.count() == full.filter(F.col("o_orderkey") < med).count()

    # filter on the PARTITION column: footers can't judge it (all files
    # conservatively kept), but the predicate must still work
    pruned_p = pruned_read(spark, out, "bucket", "=", 2)
    assert pruned_p.count() == full.filter(F.col("bucket") == 2).count()
    assert pruned_p.count() > 0

    # numeric-string pivot regression (crashed via int('10.5') before)
    ok = pruned_read(spark, out, "o_orderkey", "<", str(float(med) + 0.5))
    assert ok.count() == full.filter(F.col("o_orderkey") < float(med) + 0.5).count()

"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Usage: ``python bench.py [--sf-dir DIR] [--all]``

Reads ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]``. Each query is executed to completion with a
cheap terminal action (count via ``write.format("noop")``-like collect of
aggregates — here: ``df.count()`` after the plan, which materializes every
operator). Prints::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def compact_headline(result: dict, out_path: str, budget: int = 1500) -> str:
    """The final stdout line: a compact headline JSON guaranteed to fit
    the driver's 2000-char stdout-tail capture (BENCH_rN.json parses the
    last line; the full 63-query map overflowed it every round r8-r14).
    Includes the slowest queries up to ``budget`` serialized chars; the
    complete map lives in the ``--out`` sidecar named by
    ``queries_file``."""
    timings = result["queries"]
    headline = {
        k: result[k]
        for k in (
            "metric", "value", "unit", "sf", "repeat",
            "floor_sec", "floor_adjusted_total", "spread_median",
        )
    }
    headline["n_queries"] = len(timings)
    headline["queries_file"] = os.path.basename(out_path) if out_path else None
    headline["queries"] = {}
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        headline["queries"][name] = sec
        if len(json.dumps(headline)) > budget:
            del headline["queries"][name]
            break
    return json.dumps(headline)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    parser.add_argument(
        "--all", action="store_true", help="run every registered query, not just bench set"
    )
    # best-of-3 by default: this container sees intermittent host-level
    # throttling that can inflate a single run several-fold (r3 8.1s ->
    # r4 25.4s -> r5 10.6s on an unchanged query set was machine noise);
    # the best of three runs estimates actual plan cost, and the emitted
    # "spread" band (per-query worst/best ratio) makes regression
    # comparisons against the recorded baseline meaningful.
    parser.add_argument("--repeat", type=int, default=3, help="runs per query; best is kept")
    # Default --out is CORE-COUNT-QUALIFIED (VERDICT r15 item 4): the
    # driver benches the same tree at two core counts, and a shared
    # "latest" filename meant the second (8-core) run silently clobbered
    # the 32-core comparator — any later "grab latest" comparison then
    # mixed core counts. Per-core-count filenames make every run
    # self-describing; the promoted round comparator is committed under
    # an explicit bench_full_rN.json name instead of "latest".
    _cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 0)
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f"bench_full_latest_c{_cpus}.json"),
        help="also write the full (untruncated) result JSON here; the "
        "driver's BENCH_rN.json keeps only a 2000-char stdout tail, so "
        "this file is what makes per-query round-over-round comparison "
        "possible from committed artifacts ('' disables)",
    )
    args = parser.parse_args()

    from spark_pipeline_spark import get_session
    from spark_pipeline_spark.queries import REGISTRY
    from spark_pipeline_spark.session import release_query_caches

    # Real driver headroom (the 1g default can't hold a long best-of-N
    # sweep's status stores + checkpoint blocks in one JVM).
    spark = get_session("bench", conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, q in REGISTRY.items() if args.all or q.bench]

    # Warm the JVM + parquet footer caches with one throwaway query so the
    # first timed query doesn't pay session startup.
    REGISTRY[names[0]].fn(spark, args.sf_dir).count()

    # Local scheduling floor: the cheapest possible job (1-row range →
    # count) still pays DAG submission + task launch + result fetch, a
    # per-JOB cost that dominates sub-0.5 s queries on local[N] but
    # amortizes to nothing on a real cluster's long-running stages.
    # Measuring it per bench run turns "q is 1.7× the r3 baseline" into
    # either noise (floor explains it) or a real plan regression.
    floor_runs = []
    for _ in range(7):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_runs.append(time.perf_counter() - t0)
    floor_sec = round(sorted(floor_runs)[len(floor_runs) // 2], 4)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            df.count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)
        spreads[name] = round(max(runs) / min(runs), 2)
        # drop query-internal persisted intermediates between queries so
        # the storage pool measures ONE query at a time, not a backlog
        release_query_caches()

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # run-to-run variance band: per-query worst/best ratio across
        # the repeats, plus the median of those ratios. A machine-noise
        # spike shows up here (large spread) rather than masquerading as
        # a plan regression in the headline value.
        "repeat": args.repeat,
        "spread": spreads,
        "spread_median": round(sorted(spreads.values())[len(spreads) // 2], 2),
        # median wall of a 1-row count: the per-job scheduling floor on
        # this box. floor_adjusted_total subtracts one floor per query —
        # the cluster-relevant data-dependent cost.
        "floor_sec": floor_sec,
        "floor_adjusted_total": round(
            sum(max(v - floor_sec, 0.0) for v in timings.values()), 4
        ),
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(compact_headline(result, args.out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

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


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    parser.add_argument(
        "--all", action="store_true", help="run every registered query, not just bench set"
    )
    # best-of-2 by default: this container sees intermittent host-level
    # throttling that can inflate a single run several-fold; the best of
    # two runs is a far more stable estimate of actual plan cost.
    parser.add_argument("--repeat", type=int, default=2, help="runs per query; best is kept")
    args = parser.parse_args()

    from spark_pipeline_spark import get_session
    from spark_pipeline_spark.queries import REGISTRY

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, q in REGISTRY.items() if args.all or q.bench]

    # Warm the JVM + parquet footer caches with one throwaway query so the
    # first timed query doesn't pay session startup.
    REGISTRY[names[0]].fn(spark, args.sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Plan audit: print the scale-relevant physical-plan lines for every
bench query (or --all) so pushdown/pruning/join-strategy regressions are
visible at a glance.

Usage: ``python tools/audit_plans.py [--all] [--sf-dir DIR]``

What to look for (SCALE.md):
- ``PushedFilters`` non-empty wherever the query filters a scanned column;
- ``ReadSchema`` listing ONLY the referenced columns;
- ``BroadcastHashJoin`` for dims, ``SortMergeJoin`` only where both sides
  are fact-scale; ``BroadcastNestedLoopJoin`` only for the deliberate
  brute-force similarity baseline;
- no ``Exchange`` after the final aggregation except AQE's reads;
- ``WindowGroupLimit`` before the exchange on top-k windows.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

KEY_MARKERS = (
    "PushedFilters",
    "ReadSchema",
    "Join",
    "Exchange",
    "WindowGroupLimit",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "HashAggregate",
    "Window (",
)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true")
    parser.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = parser.parse_args()

    # runnable as `python tools/audit_plans.py` without an install
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_pipeline_spark import get_session
    from spark_pipeline_spark.queries import REGISTRY

    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    for name, q in REGISTRY.items():
        if not (args.all or q.bench):
            continue
        df = q.fn(spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"==== {name}")
        for line in buf.getvalue().splitlines():
            s = line.strip()
            if any(k in s for k in KEY_MARKERS):
                print("   ", s[:160])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Dump full ``.explain("formatted")`` output for named queries into
``plans/<tag>/<query>_<suffix>.txt`` — the before/after plan evidence the
optimization rounds commit (OPTIMIZATION_r15.md contract: the judge
cannot run Spark and checks plan claims against these files).

Usage::

    python tools/dump_plans.py --suffix before q1 q2 ...
    python tools/dump_plans.py --suffix after --tag r15 q1 ...

Defaults: tag r15, sf dir $SPARK_GRAFT_SF_DIR or sf0.1.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("queries", nargs="+")
    parser.add_argument("--suffix", required=True, choices=("before", "after"))
    parser.add_argument("--tag", default="r15")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_pipeline_spark import get_session
    from spark_pipeline_spark.queries import REGISTRY
    from spark_pipeline_spark.session import release_query_caches

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_query_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

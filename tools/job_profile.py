"""Per-query job-count + wall profiler (optimization-round evidence).

Runs the named registry queries in one session, each under its own job
group, and reports best-of-N wall plus the Spark JOB COUNT the run
submitted — job counts are scheduler-floor-noise-free, so they back
wall claims on a throttly box (OPTIMIZATION_r15 methodology).

Usage::

    python tools/job_profile.py q1 q2 ... [--repeat 3] [--json PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from spark_pipeline_spark import get_session
    from spark_pipeline_spark.queries import REGISTRY
    from spark_pipeline_spark.session import release_query_caches

    spark = get_session("job_profile", conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up
    REGISTRY[args.queries[0]].fn(spark, args.sf_dir).count()
    release_query_caches()

    out = {}
    for name in args.queries:
        walls, jobs = [], []
        for i in range(args.repeat):
            gid = f"prof_{name}_{i}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, args.sf_dir).count()
            walls.append(round(time.perf_counter() - t0, 4))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(gid)))
            sc.setJobGroup(None, None)
            release_query_caches()
        out[name] = {"best_s": min(walls), "walls": walls, "jobs": jobs}
        print(json.dumps({name: out[name]}), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-query profiling for the optimization rounds: splits each bench
query's wall time into CONSTRUCT (python call that returns the DataFrame —
includes any eager fixture builds, localCheckpoints, collects the query
does while building) and EXECUTE (the noop-sink run of the returned frame),
and counts the Spark jobs each phase schedules.

Usage:
    python scripts/profile_bench.py [--only name1,name2] [--top N]

Writes PROFILE_$SPARK_GRAFT_PROFILE_TAG.json (default r15) next to bench.py.  Methodology mirrors bench.py
(same session factory, same warm-up, same namesake cache eviction) so the
numbers decompose the bench's own timings rather than a different run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def _jobs_between(tracker, group: str) -> int:
    return len(tracker.getJobIdsForGroup(group))


def main() -> int:
    only = None
    args = sys.argv[1:]
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cardinalsin-profile")
    spark.sparkContext.setLogLevel("ERROR")

    bench.warm_up(spark, sf_dir)
    bench._between_groups(spark)

    registry = q.queries()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    prev_group = None
    for name in bench._bench_sequence(registry):
        if only and name not in only:
            continue
        fn = registry[name]
        group = bench._group_of(name)
        if prev_group is not None and group != prev_group:
            bench._between_groups(spark)
        prev_group = group
        if name in bench.CACHE_NAMESAKES:
            bench._evict_index_cache(bench.CACHE_NAMESAKES[name])
        sc = spark.sparkContext
        sc.setJobGroup(f"c:{name}", f"construct {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        c_jobs = _jobs_between(tracker, f"c:{name}")
        sc.setJobGroup(f"x:{name}", f"execute {name}")
        bench._run_to_completion(df)
        t2 = time.perf_counter()
        x_jobs = _jobs_between(tracker, f"x:{name}")
        sc.setJobGroup(None, None)
        out[name] = {
            "construct_s": round(t1 - t0, 4),
            "execute_s": round(t2 - t1, 4),
            "total_s": round(t2 - t0, 4),
            "construct_jobs": c_jobs,
            "execute_jobs": x_jobs,
        }
        print(
            f"{name:36s} c={t1 - t0:7.3f}s ({c_jobs:3d} jobs)  "
            f"x={t2 - t1:7.3f}s ({x_jobs:3d} jobs)",
            flush=True,
        )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    totals = {
        "construct_s": round(sum(v["construct_s"] for v in out.values()), 2),
        "execute_s": round(sum(v["execute_s"] for v in out.values()), 2),
        "construct_jobs": sum(v["construct_jobs"] for v in out.values()),
        "execute_jobs": sum(v["execute_jobs"] for v in out.values()),
    }
    tag = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "r15")
    with open(os.path.join(here, f"PROFILE_{tag}.json"), "w") as fh:
        json.dump({"queries": out, "totals": totals}, fh, indent=1, sort_keys=True)
    print(json.dumps(totals))
    return 0


if __name__ == "__main__":
    sys.exit(main())

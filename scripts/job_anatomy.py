"""Explain where each bench query's Spark jobs come from (OPTIMIZATION
r15, guide §1/§7): for every query, list the jobs the noop-sink execute
schedules, with each job's stage count and the root operator of its last
stage, so the per-query job multiplicity (AQE shuffle waves, range-sort
sampling passes, broadcast builds) is attributable.

Usage:
    python scripts/job_anatomy.py name1 [name2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cardinalsin-job-anatomy")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark, sf_dir)
    registry = q.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    ordered = [n for n in bench._bench_sequence(registry) if n in set(names)]
    for name in ordered:
        if name in bench.CACHE_NAMESAKES:
            bench._evict_index_cache(bench.CACHE_NAMESAKES[name])
        df = registry[name](spark, sf_dir)
        sc.setJobGroup(f"ja:{name}", name)
        bench._run_to_completion(df)
        sc.setJobGroup(None, None)
        jids = sorted(tracker.getJobIdsForGroup(f"ja:{name}"))
        print(f"== {name}: {len(jids)} jobs")
        jvm_tracker = sc._jsc.statusTracker()
        for jid in jids:
            ji = jvm_tracker.getJobInfo(jid)
            if ji is None:
                print(f"  job {jid}: <gone>")
                continue
            sids = list(ji.stageIds())
            descs = []
            for sid in sids:
                s = jvm_tracker.getStageInfo(sid)
                if s is None:
                    continue
                descs.append(
                    f"stage{sid}:{s.numTasks()}t:{s.name().split(' ')[0]}"
                )
            print(f"  job {jid}: {len(sids)} stages  {'; '.join(descs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

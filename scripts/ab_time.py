"""Ad-hoc A/B timing for named registry queries (optimization rounds).

Mirrors bench.py methodology — same session factory, warm-up, namesake
cache eviction before every repeat, noop sink — but times only the named
queries and does NOT overwrite the benchmark artifacts (prints one JSON
line instead). Development aid for before/after comparisons of a single
change; the committed evidence remains bench.py output.

Usage: python scripts/ab_time.py [--repeats N] name1 name2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    repeats = 5
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cardinalsin-abtime")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark, sf_dir)
    bench._between_groups(spark)
    registry = q.queries()
    # run in bench order so shared fixture attribution matches the bench
    ordered = [n for n in bench._bench_sequence(registry) if n in set(names)]
    out = {}
    for name in ordered:
        fn = registry[name]
        runs = []
        for _ in range(repeats):
            if name in bench.CACHE_NAMESAKES:
                bench._evict_index_cache(bench.CACHE_NAMESAKES[name])
            spark.sparkContext.setJobDescription(f"abtime: {name}")
            start = time.perf_counter()
            bench._run_to_completion(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - start, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(runs), 4),
            "runs": runs,
        }
        bench._between_groups(spark)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

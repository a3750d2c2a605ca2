"""Driver-side construct profiling (OPTIMIZATION r15, guide §1).

The r14 profiler showed construct (the Python call building each query's
DataFrame) costs ~49 s over 200 queries with only 86 Spark jobs — i.e. the
time is driver-side Python + py4j, not cluster work. This script runs every
construct under cProfile to show WHERE that time goes (py4j socket waits
show up under GatewayClient/send_command; Python-side work under the
builder functions).

Usage:
    python scripts/profile_construct.py [--only name1,name2] [--top N]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cardinalsin_spark import queries as q  # noqa: E402
from cardinalsin_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    only = None
    top = 40
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))
    if "--top" in args:
        top = int(args[args.index("--top") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cardinalsin-profile-construct")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark, sf_dir)
    registry = q.queries()
    names = [
        n for n in bench._bench_sequence(registry) if not only or n in only
    ]

    # one untimed pass first so fixture caches are warm and we profile the
    # steady-state construct cost (what repeats 2..N of the bench pay);
    # cold fixture builds are a separate, already-profiled story
    per_query = {}
    for n in names:
        registry[n](spark, sf_dir)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    for n in names:
        s = time.perf_counter()
        prof.enable()
        registry[n](spark, sf_dir)
        prof.disable()
        per_query[n] = time.perf_counter() - s
    total = time.perf_counter() - t0

    out = io.StringIO()
    st = pstats.Stats(prof, stream=out)
    st.sort_stats("cumulative").print_stats(top)
    print(out.getvalue())
    print(f"TOTAL construct (warm): {total:.2f}s over {len(names)} queries")
    for n, s in sorted(per_query.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {n:40s} {s:7.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

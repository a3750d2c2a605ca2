"""Benchmark harness: runs the registry's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is executed to completion with the no-op sink (full pipeline runs
on executors, nothing is collected to the driver — same shape as a cluster
write job).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from cardinalsin_spark import queries as q
from cardinalsin_spark.session import get_spark


def _run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="cardinalsin-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/codegen paths outside the timed region.
    _run_to_completion(
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1)
    )

    timings: dict[str, float] = {}
    for name, fn in q.queries().items():
        start = time.perf_counter()
        _run_to_completion(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

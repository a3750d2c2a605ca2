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

from pyspark.sql import functions as F

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

    # Warm up the JVM/codegen paths and the Python UDF workers outside the
    # timed region (the first Arrow-batched UDF otherwise pays ~2 s of
    # worker fork + import inside whichever query hits it first).
    _run_to_completion(
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1)
    )
    from cardinalsin_spark.operators.similarity import dot_q_vectorized

    _run_to_completion(
        spark.range(1)
        .selectExpr("array(1L, 2L) AS a", "array(3L, 4L) AS b")
        .select(dot_q_vectorized()(F.col("a"), F.col("b")).alias("d"))
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
                "write_path": _bench_write_path(spark, sf_dir),
            }
        )
    )
    return 0


def _bench_write_path(spark, sf_dir: str) -> dict:
    """Write-path throughput (BASELINE.md's headline metric): events →
    metrics normalize → partitioned sorted ZSTD write."""
    import shutil
    import tempfile

    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    out_dir = tempfile.mkdtemp(prefix="bench_write_")
    try:
        ev = load_table(spark, sf_dir, "events")
        n = ev.count()
        m = normalize_to_metrics(
            ev, ts_col="ts_ns", name_col="event_type", value_col="value",
            label_cols={"user": "user_id"},
        )
        start = time.perf_counter()
        write_metrics(m, os.path.join(out_dir, "metrics"), mode="overwrite")
        elapsed = time.perf_counter() - start
        return {
            "rows": n,
            "sec": round(elapsed, 4),
            "rows_per_sec": round(n / elapsed, 1),
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())

"""SparkSession factory with a scale-oriented configuration.

The reference tunes DataFusion with ``batch_size=8192`` and
``target_partitions=num_cpus`` (reference ``query/engine.rs:70-75``) and lets
the engine do pruning/pushdown. The Spark equivalents are AQE, parquet filter
pushdown, and a shuffle-partition count sized to the cluster. On a real
cluster these configs come from spark-submit; this factory is for local
dev/test/bench.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB scale these would be set per-job; locally they keep plans honest:
# AQE coalesces the 32 shuffle partitions when data is small and splits skewed
# joins when it is not, exactly as it would at cluster scale.
_BASE_CONF = {
    # Adaptive execution: runtime re-planning, partition coalescing, skew-join
    # handling. The reference's "hot shard detection + split" (sharding/) is
    # replaced wholesale by AQE skew handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Pushdown / pruning — the Spark-native replacement for the reference's
    # chunk-pruning metadata catalog (metadata/s3.rs:1075-1136).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # Arrow for any pandas interchange (vectorized UDF path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims (region/nation/...) should always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Timestamps are UTC end-to-end (reference stores ns-UTC,
    # schema/metrics.rs:240-244).
    "spark.sql.session.timeZone": "UTC",
    # The reference stores nanosecond timestamps; Spark's timestamp is µs.
    # Read parquet TIMESTAMP(NANOS) as raw int64 ns and derive a µs timestamp
    # in the loader (sources.tables.load_events) — keeps exact ns arithmetic
    # available (reference api/query/prometheus_api.rs:971 does integer ns math).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) must read as a plain
    # UTC TIMESTAMP, not TIMESTAMP_NTZ: integer-time functions (unix_micros)
    # take LTZ only, and with the session pinned to UTC the value semantics
    # match DuckDB's naive-timestamp oracle reads bit-for-bit.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Write-side: match the reference's ZSTD-3 parquet encoding
    # (ingester/parquet_writer.rs:24-52).
    "spark.sql.parquet.compression.codec": "zstd",
    # Per-file open-cost charged when packing scan splits (OPTIMIZATION
    # r14). Spark's 4 MB default models spinning-disk/HDFS open+seek; on
    # NVMe and object stores the real cost is far lower. Two effects,
    # both right at scale: (a) many-small-file tables pack MORE files per
    # maxPartitionBytes split → fewer scan tasks (the small-file problem,
    # guide §6); (b) small tables split down to bytes/defaultParallelism
    # instead of serializing a CPU-heavy scan stage on 1-2 cores (the
    # measured local effect: events scans 1 → 16 partitions, the exact
    # bottleneck exploded_shingles works around per-operator). Large-file
    # splits stay governed by maxPartitionBytes either way. Overridable
    # per deployment via SPARK_GRAFT_OPEN_COST_BYTES.
    "spark.sql.files.openCostInBytes": os.environ.get(
        "SPARK_GRAFT_OPEN_COST_BYTES", "131072"
    ),
    # Driver-side plan-construction cost (OPTIMIZATION r15, guide §1.2
    # "the driver should do almost no data work"): PySpark 4 wraps every
    # DataFrame/Column API call in error-context capture — a
    # getActiveSession, a conf.get, a Python stack walk, and TWO extra
    # py4j round trips (PySparkCurrentOrigin.set/clear) per call. A
    # 200-query analytical driver makes ~100k such calls per suite
    # (cProfile: ~12 s of 38 s construct time at r15 start); the only
    # cost of disabling is losing the "called from <file>:<line>" line
    # in DataFrame error messages. Identical on a real cluster — this is
    # driver CPU, not data-path behavior. Overridable for debugging via
    # SPARK_GRAFT_DF_DEBUGGING.
    "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
        "SPARK_GRAFT_DF_DEBUGGING", "false"
    ),
    # Keep scheduler chatter down in local mode.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "cardinalsin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` defaults to the core count — at cluster scale this
    would be ~2-3x total cores; AQE coalesces down when partitions are small.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or max(cpus, 32))
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Compaction, retention, and downsampling — maintenance jobs as DataFrame ops.

The reference runs a hybrid-LSM compactor (L0 size-tiered by hour bucket at
≥15 files, L1+ leveled with 250MB/2GB/10GB/50GB targets,
``metadata/s3.rs:1188-1263``, ``compactor/mod.rs:81-97``), 90-day retention
(``compactor/mod.rs:921-947``), and *configures* downsampling without ever
implementing it (``compactor/mod.rs:70-91`` — config only; SURVEY §2.11).

Here the planning inputs are a chunks-metadata DataFrame (FIXTURES.md F3:
``chunk_path, min_timestamp, max_timestamp, row_count, size_bytes, level``)
and the planners are pure DataFrame algebra — tiny data (one row per file),
but expressed distributed so a 100M-file catalog would still plan fine.
Execution (``compact_partition``) is the Spark idiom: read small files →
sort by timestamp → write back coalesced.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Reference compactor/mod.rs:81-97.
L0_TRIGGER_FILES = 15
LEVEL_TARGET_BYTES = {
    0: 250 * 1024 * 1024,
    1: 2 * 1024**3,
    2: 10 * 1024**3,
    3: 50 * 1024**3,
}
RETENTION_DAYS = 90

_HOUR_NS = 3_600 * 1_000_000_000


def l0_compaction_candidates(
    chunks: DataFrame,
    trigger_files: int = L0_TRIGGER_FILES,
) -> DataFrame:
    """L0 size-tiered selection (reference ``metadata/s3.rs:1188-1217``):
    group level-0 chunks by the hour bucket of min_timestamp; any bucket
    holding ≥ trigger_files files is a merge candidate.

    Output: ``hour_bucket, n_files, total_bytes, total_rows, chunk_paths``
    (sorted path array → deterministic).
    """
    return (
        chunks.filter(F.col("level") == 0)
        .groupBy(
            # integer floor-division: ns timestamps exceed double precision
            # (2^53), so float division here would mis-bucket edge chunks
            (F.expr(f"min_timestamp div {_HOUR_NS}") * _HOUR_NS).alias(
                "hour_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
            F.sum("row_count").alias("total_rows"),
            F.sort_array(F.collect_list("chunk_path")).alias("chunk_paths"),
        )
        .filter(F.col("n_files") >= trigger_files)
        .orderBy("hour_bucket")
    )


def leveled_compaction_groups(
    chunks: DataFrame,
    level: int,
    target_bytes: int | None = None,
) -> DataFrame:
    """L1+ leveled grouping (reference ``metadata/s3.rs:1219-1263``): chunks
    of a level ordered by min_timestamp, greedily packed to the level's
    target size.

    The reference's greedy loop is sequential; the order-preserving
    distributed equivalent is a running-sum window: group_id =
    floor(cumulative_bytes_before / target). Same invariant (every group
    except possibly the last reaches the target; time-adjacent chunks stay
    together).
    """
    target = target_bytes or LEVEL_TARGET_BYTES.get(level, LEVEL_TARGET_BYTES[3])
    w = (
        Window.orderBy("min_timestamp", "chunk_path")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lvl = chunks.filter(F.col("level") == level).withColumn(
        "_cum_before", F.coalesce(F.sum("size_bytes").over(w), F.lit(0))
    )
    return (
        lvl.withColumn(
            "group_id", (F.col("_cum_before") / F.lit(target)).cast("long")
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
            F.min("min_timestamp").alias("min_timestamp"),
            F.max("max_timestamp").alias("max_timestamp"),
            F.sort_array(F.collect_list("chunk_path")).alias("chunk_paths"),
        )
        .filter(F.col("n_files") > 1)
        .orderBy("group_id")
    )


def retention_candidates(chunks: DataFrame, cutoff_ns: int) -> DataFrame:
    """Chunks wholly older than the cutoff → deletable (reference 90-day
    retention, ``compactor/mod.rs:921-947``; the skew-safe BoundedClock
    becomes 'caller passes an authoritative cutoff')."""
    return chunks.filter(F.col("max_timestamp") < F.lit(cutoff_ns)).orderBy(
        "chunk_path"
    )


def compact_partition(
    spark: SparkSession,
    root: str,
    date: str,
    hour: int | None = None,
    target_files: int = 1,
) -> int:
    """Merge one partition's small files: read → sort by timestamp →
    rewrite as ``target_files`` files (reference chunk merge: concat →
    sort → single parquet, ``compactor/merge.rs:23-74``).

    ``hour=None`` compacts a whole ``date=`` partition — the unit for
    tables written with date granularity (see ``write_metrics``'s auto
    mode) and the natural L1+ unit once hour files have been merged.

    Returns the number of input files merged. Uses overwrite of the single
    partition directory only.
    """
    part_path = os.path.join(root, f"date={date}") if hour is None else (
        os.path.join(root, f"date={date}", f"hour={hour}")
    )
    if hour is None and any(
        e.startswith("hour=") for e in os.listdir(part_path)
    ):
        # flattening an hour-partitioned date dir would silently drop the
        # hour= layout (and its pruning) — compact per hour instead
        raise ValueError(
            f"{part_path} is hour-partitioned; pass hour= to compact it"
        )
    df = spark.read.parquet(part_path)
    n_input = df.select(F.input_file_name()).distinct().count()
    if n_input <= target_files:
        return n_input
    # Stage the rewrite under an underscore-prefixed dir at the table root:
    # Spark/Hive file listing skips `_*` paths, so a crash before the swap
    # leaves the table fully readable (a tmp dir inside date=/ would break
    # partition inference for the whole table). Stale tmps from a crashed
    # run are cleared before writing.
    import shutil

    tmp_name = f"date={date}" if hour is None else f"date={date}.hour={hour}"
    tmp_path = os.path.join(root, "_compaction_tmp", tmp_name)
    shutil.rmtree(tmp_path, ignore_errors=True)
    (
        df.coalesce(target_files)
        .sortWithinPartitions("timestamp")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(tmp_path)
    )
    # Atomic-ish swap (single-driver, local-fs rename; the reference's lease
    # protocol guards multi-compactor races — out of scope for an engine
    # library. On object storage this step becomes a catalog pointer swap.)
    shutil.rmtree(part_path)
    shutil.move(tmp_path, part_path)
    return n_input


# Every downsample() output column that is NOT a series key. Consumers
# that need to recover a rollup's series columns subtract this set from
# the schema instead of keeping their own lists.
MOMENT_COLS = frozenset(
    {
        "bucket", "avg_value", "min_value", "max_value", "sum_value",
        "count_value", "row_count", "max_ts", "min_ts", "first_value",
        "last_value", "inc_value",
    }
)

# The counter-moment subset (absent from rollups written before they
# existed — such rollups keep serving the classic moments and simply
# never route counter functions).
COUNTER_MOMENT_COLS = frozenset(
    {"min_ts", "first_value", "last_value", "inc_value"}
)


def downsample(
    df: DataFrame,
    step_seconds: int,
    series_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
    counters: bool = True,
) -> DataFrame:
    """Time-bucket rollup: avg/min/max/count/sum per (bucket, *series).

    The reference ships ``downsample_after_days``/``downsample_resolution``
    config but no implementation (SURVEY §2.11) — this completes it. Output
    keeps enough moments to re-aggregate (sum+count → exact avg on rollup);
    ``max_ts`` (the bucket's latest raw sample time) lets the instant-door
    rollup route reproduce the raw path's ``timestamp_`` exactly.

    ``counters=True`` (default) appends the counter-function moments so
    PromQL ``rate``/``increase`` can serve from the rollup (the
    reference's hottest generated shape,
    ``api/query/prometheus_api.rs:969-983``, is the per-bucket rate):

    * ``min_ts`` — earliest raw sample time in the bucket;
    * ``first_value``/``last_value`` — value at the bucket's first/last
      sample (ties on the timestamp broken by the value, so the pair is
      deterministic);
    * ``inc_value`` — the reset-aware IN-BUCKET increase (sum of
      consecutive-sample deltas inside the bucket, a drop meaning
      counter reset → the post-reset value itself is the increase),
      NULL for single-sample buckets (no in-bucket delta — mirrors the
      raw path's ``SUM`` over zero deltas).  Cross-bucket boundary
      deltas are NOT included; the reader re-adds them from the
      first/last pairs (``operators.promql``'s faithful counter route),
      so the moments compose under any tiling.

    Cost: the counter moments need a per-(bucket, series) sort (one
    window sharing the aggregation's shuffle — AQE reuses the hash
    partitioning), so ``counters=False`` keeps the old single-hash-agg
    shape for callers that never serve counters from the rollup.
    """
    from cardinalsin_spark.functions.core import time_bucket

    b = time_bucket(ts_col, step_seconds).alias("bucket")
    if not counters:
        return (
            df.groupBy(b, *[F.col(c) for c in series_cols])
            .agg(
                F.avg(value_col).alias("avg_value"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value"),
                F.sum(value_col).alias("sum_value"),
                F.count(value_col).alias("count_value"),
                # row_count counts ALL rows (NULL-valued included) — the
                # PromQL count semantics; count_value (non-NULL) stays
                # the avg divisor and the SQL count(value)
                F.count(F.lit(1)).alias("row_count"),
                F.max(ts_col).alias("max_ts"),
            )
            .orderBy("bucket", *series_cols)
        )
    dfb = df.withColumn("__bucket", time_bucket(ts_col, step_seconds))
    w = Window.partitionBy("__bucket", *series_cols).orderBy(
        F.col(ts_col), F.col(value_col)
    )
    prev = F.lag(F.col(value_col)).over(w)
    v = F.col(value_col)
    delta = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(v >= prev, (v - prev).cast("double")).otherwise(
            v.cast("double")
        )
    )
    ord_key = F.struct(F.col(ts_col), F.col(value_col))
    return (
        dfb.withColumn("__delta", delta)
        .groupBy(F.col("__bucket").alias("bucket"), *[F.col(c) for c in series_cols])
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.sum(value_col).alias("sum_value"),
            F.count(value_col).alias("count_value"),
            F.count(F.lit(1)).alias("row_count"),
            F.max(ts_col).alias("max_ts"),
            F.min(ts_col).alias("min_ts"),
            F.min_by(v.cast("double"), ord_key).alias("first_value"),
            F.max_by(v.cast("double"), ord_key).alias("last_value"),
            F.sum("__delta").alias("inc_value"),
        )
        .orderBy("bucket", *series_cols)
    )


def downsample_moments(
    df: DataFrame,
    step_seconds: int,
    series_cols: list[str],
) -> DataFrame:
    """Re-bucket ``downsample()`` MOMENT rows to a coarser resolution —
    the cascade step of hierarchical continuous aggregates (5m → 1h →
    1d): sums and counts add, min/max fold, ``max_ts`` folds, and avg is
    recomputed from the exact global sum/count (never avg-of-avgs), so a
    coarse rollup can be maintained FROM a finer one without ever
    touching raw data. Output schema and ordering are identical to
    ``downsample()``, so every consumer (RollupRouter, the promql/SQL
    routes, ``refresh_rollup``'s combine) works unchanged.

    Exactness: bit-equal to ``downsample(raw, coarse_step)`` whenever the
    fine resolution divides the coarse one (each fine bucket lands wholly
    in one coarse bucket) and the raw values are exactly representable
    (integer cents / counts — the determinism doctrine); the float sums
    re-add the same addends grouped differently, associative on exact
    integers < 2^53.

    Counter moments (when the fine rollup carries them) fold too:
    ``min_ts``/``first_value``/``last_value`` by min/max over the fine
    buckets (no cross-bucket timestamp ties — fine buckets cover
    disjoint time), and ``inc_value`` as the sum of fine in-bucket
    increases PLUS the reset-aware boundary delta between each pair of
    consecutive fine buckets inside the coarse one (one window over
    rollup-sized rows) — exactly the deltas ``downsample(raw, coarse)``
    sums, so counter routing keeps working at every cascade tier."""
    from cardinalsin_spark.functions.core import time_bucket

    counters = COUNTER_MOMENT_COLS.issubset(set(df.columns))
    has_rc = "row_count" in df.columns  # pre-upgrade rollups lack it
    extra_aggs = []
    if counters:
        cb = time_bucket("bucket", step_seconds)
        w = Window.partitionBy(cb, *series_cols).orderBy("bucket")
        prev_last = F.lag("last_value").over(w)
        fv = F.col("first_value")
        bnd = F.when(prev_last.isNull(), F.lit(None).cast("double")).otherwise(
            F.when(fv >= prev_last, fv - prev_last).otherwise(fv)
        )
        df = df.withColumn("__bnd", bnd)
        extra_aggs = [
            F.min("min_ts").alias("min_ts"),
            F.min_by("first_value", "min_ts").alias("first_value"),
            F.max_by("last_value", "max_ts").alias("last_value"),
            F.sum("inc_value").alias("__inc"),
            F.sum("__bnd").alias("__bsum"),
        ]
    out = (
        df.groupBy(
            time_bucket("bucket", step_seconds).alias("bucket"),
            *[F.col(c) for c in series_cols],
        )
        .agg(
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_value").alias("sum_value"),
            F.sum("count_value").alias("count_value"),
            *([F.sum("row_count").alias("row_count")] if has_rc else []),
            F.max("max_ts").alias("max_ts"),
            *extra_aggs,
        )
    )
    counter_cols = []
    if counters:
        # NULL iff the coarse bucket saw no delta at all (a single
        # sample), mirroring downsample()'s SUM-over-zero-deltas NULL
        inc = F.when(
            F.col("__inc").isNull() & F.col("__bsum").isNull(),
            F.lit(None).cast("double"),
        ).otherwise(
            F.coalesce(F.col("__inc"), F.lit(0.0))
            + F.coalesce(F.col("__bsum"), F.lit(0.0))
        )
        counter_cols = [
            F.col("min_ts"),
            F.col("first_value"),
            F.col("last_value"),
            inc.alias("inc_value"),
        ]
    return (
        out.select(
            "bucket",
            *series_cols,
            (F.col("sum_value") / F.col("count_value")).alias("avg_value"),
            "min_value",
            "max_value",
            "sum_value",
            "count_value",
            *(["row_count"] if has_rc else []),
            "max_ts",
            *counter_cols,
        )
        .orderBy("bucket", *series_cols)
    )


# ---------------------------------------------------------------------------
# Z-order clustering (executes the adaptive recommender's "range" advice)
# ---------------------------------------------------------------------------


def zorder_key(a, b, bits: int = 16):
    """Morton/Z-order interleave of two non-negative integer columns
    (values must already sit on a 0..2^bits-1 grid — see
    ``zorder_rank_keys`` for the rank normalization): bit i of ``a`` lands
    at output bit 2i, bit i of ``b`` at 2i+1. Pure integer expressions —
    JVM-side, exactly replicable in any SQL dialect for the oracle. Rows
    sorted by this key cluster in BOTH dimensions, so parquet row-group
    min/max stats prune on either column — the Z-ORDER rewrite the
    reference's adaptive indexer recommends but never executes
    (``adaptive_index/recommender.rs:133-139``; execution is the missing
    half, same as its downsampling story)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    one = F.lit(1).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(ca, i).bitwiseAND(one), 2 * i)
        out = out + F.shiftleft(F.shiftright(cb, i).bitwiseAND(one), 2 * i + 1)
    return out


def sql_zorder_key(a: str, b: str, bits: int = 16) -> str:
    """DuckDB/ANSI form of ``zorder_key`` (same bit chain). Every term is
    fully parenthesized: ``+`` binds TIGHTER than ``<<`` in C-style
    precedence, so ``x << 0 + y << 2`` would chain the shifts."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_rank_keys(
    df: DataFrame, a: str, b: str, bits: int = 16
) -> DataFrame:
    """Normalize two numeric columns onto the 0..2^bits-1 grid by value
    RANK (ntile-style equi-depth buckets — robust to skew and outliers,
    unlike min/max scaling), then attach the interleaved ``zkey``. Two
    window ranks = two shuffles over narrow columns; at 100 TB swap the
    exact ranks for approx_percentile bucket boundaries (same key shape,
    no global sort)."""
    n = 1 << bits
    out = df.withColumn("_ra", F.ntile(n).over(Window.orderBy(a)) - 1)
    out = out.withColumn("_rb", F.ntile(n).over(Window.orderBy(b)) - 1)
    return out.withColumn(
        "zkey", zorder_key(F.col("_ra").cast("long"), F.col("_rb").cast("long"), bits)
    ).drop("_ra", "_rb")


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    bits: int = 16,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """Cluster-and-rewrite: rank-normalize (a, b), REPARTITION BY RANGE on
    the interleaved key (each output file owns a contiguous Z-curve
    segment — a 2-D tile), sort within files, write ZSTD parquet. Row-group
    stats on a and b then prune point/range queries on EITHER column."""
    clustered = zorder_rank_keys(df, a, b, bits)
    if target_files:
        clustered = clustered.repartitionByRange(target_files, "zkey")
    else:
        clustered = clustered.repartitionByRange("zkey")
    (
        clustered.sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )

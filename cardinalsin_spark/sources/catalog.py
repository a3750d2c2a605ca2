"""Chunk catalog: per-file statistics and stats-based pruning.

The reference maintains a JSON catalog in object storage with per-chunk
``{path, min_timestamp, max_timestamp, row_count, size_bytes, column_stats,
level}`` updated by ETag CAS (``metadata/s3.rs:86-127``), and prunes chunks
whose stats can't satisfy the query predicates
(``metadata/predicates.rs:59-137`` — de-facto inert there because column
stats are written empty, ``metadata/s3.rs:793-799``).

In Spark, partition pruning + parquet row-group stats make the catalog
redundant for execution; we keep it as (a) the compaction planner's input and
(b) an explicit, *working* implementation of stats pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chunk_stats(
    spark: SparkSession, path: str, ts_col: str = "timestamp"
) -> DataFrame:
    """One row per parquet file: min/max timestamp (ns) + row count.

    Distributed aggregation over ``input_file_name()`` — no driver-side file
    listing, works at any file count.
    """
    df = spark.read.parquet(path)
    # input_file_* are nondeterministic expressions: project them first
    # (allowed), aggregate the projected columns (aggregating them directly
    # is rejected). Block length == file size while files are below the
    # split size — exact for the small files compaction cares about.
    per_row = df.select(
        F.input_file_name().alias("chunk_path"),
        F.input_file_block_length().alias("_block_len"),
        F.col(ts_col).alias("_ts"),
    )
    return (
        per_row.groupBy("chunk_path")
        .agg(
            (F.min("_ts").cast("double") * 1e9).cast("long").alias("min_timestamp"),
            (F.max("_ts").cast("double") * 1e9).cast("long").alias("max_timestamp"),
            F.count(F.lit(1)).alias("row_count"),
            F.max("_block_len").alias("size_bytes"),
        )
        .withColumn("level", F.lit(0))
    )


def prune_chunks_by_time(
    chunks: DataFrame, range_start_ns: int, range_end_ns: int
) -> DataFrame:
    """Keep chunks whose [min,max] overlaps the query range — the reference's
    hour-bucket time-index walk + overlap test (``metadata/s3.rs:1083-1124``).
    """
    return chunks.filter(
        (F.col("max_timestamp") >= F.lit(range_start_ns))
        & (F.col("min_timestamp") <= F.lit(range_end_ns))
    )


def prune_chunks_by_stats(
    chunks: DataFrame,
    stats_min_col: str,
    stats_max_col: str,
    predicate: str,
    value,
) -> DataFrame:
    """Column-stats pruning (``metadata/predicates.rs:59-137`` semantics):
    keep a chunk iff the predicate is *possibly* true given [min,max].
    Conservative ops (!=, NOT) keep everything, as the reference does.
    """
    lo, hi = F.col(stats_min_col), F.col(stats_max_col)
    v = F.lit(value)
    keep = {
        "=": (lo <= v) & (v <= hi),
        "<": lo < v,
        "<=": lo <= v,
        ">": hi > v,
        ">=": hi >= v,
        "!=": F.lit(True),  # conservative, reference metadata/predicates.rs:79
    }.get(predicate)
    if keep is None:
        raise ValueError(f"unsupported predicate {predicate!r}")
    return chunks.filter(keep)

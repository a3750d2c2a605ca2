"""Parquet table catalog over the driver's test tables.

The reference registers metadata-selected parquet chunk paths as a single
listing table named ``metrics`` (reference ``query/engine.rs:127-187``). Spark's
equivalent is ``spark.read.parquet`` + temp views; partition pruning and
row-group stat pruning replace the reference's custom chunk catalog.

Small dimension tables are broadcast-hinted at load so every join against
them is a broadcast-hash join regardless of fact-table size — at 100 TB the
dims stay KB-MB sized while facts grow, so this is always the right plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Parquet read-METADATA cache (OPTIMIZATION r14, guide §6): every
# ``spark.read.parquet(path)`` re-infers the schema from file footers and
# re-resolves the datasource on the driver — ~70-90 ms per call on the
# local bench, a footer round-trip per query against an object store at
# scale — even though the datasets the registry reads are immutable
# between writes. Cache the resolved DataFrame (an immutable logical
# plan) per (applicationId, realpath, mtime_ns, mergeSchema). ONLY
# metadata is cached — no rows, no computed results: the frame is lazy
# and every action on it re-reads the files. Any rewrite/append bumps the
# file or directory mtime (Spark's overwrite mode recreates the
# directory; appends add entries) and invalidates the entry, so the
# cached file listing can never go stale. This is the catalog-metastore
# pattern ``register_metrics``'s docstring already names as the at-scale
# design ("persist the merged schema in a metastore and pass it
# explicitly").
_READ_CACHE: dict[tuple, DataFrame] = {}
_READ_CACHE_MAX = 256


def read_parquet_meta_cached(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """``spark.read.parquet(path)`` with schema inference + datasource
    resolution cached per (session, dataset version) — see ``_READ_CACHE``
    above. Falls back to a plain uncached read whenever the path cannot
    be stat'd (e.g. a non-local URI)."""
    key = None
    try:
        st = os.stat(path)
        key = (
            spark.sparkContext.applicationId,
            os.path.realpath(path),
            st.st_mtime_ns,
            merge_schema,
        )
    except OSError:
        pass
    if key is not None:
        df = _READ_CACHE.get(key)
        if df is not None:
            return df
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if key is not None:
        if len(_READ_CACHE) >= _READ_CACHE_MAX:
            _READ_CACHE.clear()
        _READ_CACHE[key] = df
    return df

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimensions that remain tiny at any scale factor → always broadcast.
SMALL_DIMS = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = read_parquet_meta_cached(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df)
    if name in SMALL_DIMS:
        df = F.broadcast(df)
    return df


def normalize_event_time(df: DataFrame) -> DataFrame:
    """Guarantee both an exact integer ``ts_ns`` column and a µs ``ts``
    timestamp, whatever precision the source parquet uses.

    - TIMESTAMP(NANOS) sources arrive as int64 ns (under
      ``spark.sql.legacy.parquet.nanosAsLong``): keep the ns value, derive the
      µs-truncated timestamp — the same truncation DuckDB applies reading ns
      into its µs-precision TIMESTAMP, so oracles agree bit-for-bit.
    - TIMESTAMP(MICROS) sources (the current driver testdata) arrive as a
      native timestamp: derive ``ts_ns = unix_micros(ts) * 1000`` — exact
      integer math on the µs grid, matching DuckDB's ``epoch_ns(ts)``.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1_000))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register each table as a temp view so ``spark.sql`` pass-through works —
    the Spark analogue of the reference's always-registered ``metrics`` table
    (``query/engine.rs:97-103``)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)

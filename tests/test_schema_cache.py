"""The parquet schema-metadata cache (OPTIMIZATION r14) must be exactly
that — metadata only. Same schema object as plain inference, data always
read fresh, and a rewrite of the dataset (new mtime) invalidates the
entry instead of serving a stale schema."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cardinalsin_spark.sources.tables import (
    _READ_CACHE,
    read_parquet_meta_cached,
)


def test_cached_read_matches_plain_inference(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    plain = spark.read.parquet(path)
    first = read_parquet_meta_cached(spark, path)  # miss: infers + stores
    second = read_parquet_meta_cached(spark, path)  # hit: schema from cache
    assert first.schema == plain.schema
    assert second.schema == plain.schema
    assert second.count() == plain.count()


def test_rewrite_invalidates_schema_entry(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.range(3).select(F.col("id").alias("a")).write.parquet(p)
    df1 = read_parquet_meta_cached(spark, p)
    assert df1.columns == ["a"]
    # rewrite with a different schema — the mtime key must miss
    spark.range(4).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    ).write.mode("overwrite").parquet(p)
    df2 = read_parquet_meta_cached(spark, p)
    assert df2.columns == ["a", "b"]
    assert df2.count() == 4


def test_data_is_never_cached_only_schema(spark, tmp_path):
    """Appending files without changing the schema must be visible on the
    next cached read even when the schema entry hits (stat of the dir
    changes on append, but even a HIT only reuses the schema — assert the
    row count tracks the files on disk)."""
    p = str(tmp_path / "tbl2")
    spark.range(5).write.parquet(p)
    assert read_parquet_meta_cached(spark, p).count() == 5
    spark.range(7).write.mode("append").parquet(p)
    assert read_parquet_meta_cached(spark, p).count() == 12
    assert any(isinstance(k, tuple) for k in _READ_CACHE)

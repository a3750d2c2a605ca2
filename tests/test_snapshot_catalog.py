"""Snapshot manifest catalog (VERDICT r5 item 7): atomic CAS commits,
reader-pinned consistency across compaction, vacuum GC grace."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.sources.snapshots import SnapshotCatalog, SnapshotConflict


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
            (F.col("id") % 7).alias("v"),
        )
        .repartition(8)
        .write.parquet(root)
    )
    cat = SnapshotCatalog(root)
    cat.init_from_directory()
    return root, cat


def test_bootstrap_read_matches_direct(spark, table):
    root, cat = table
    assert cat.current_version() == 0
    assert cat.read(spark).count() == 1000
    direct = spark.read.parquet(root).agg(F.sum("id")).first()[0]
    assert cat.read(spark).agg(F.sum("id")).first()[0] == direct


def test_pinned_reader_survives_compaction(spark, table):
    """The core consistency property: a reader pinned to version N keeps a
    complete, unchanged view while compaction commits N+1 — old files stay
    on disk, the new manifest references only the rewritten files."""
    root, cat = table
    v0_files = cat.files(0)
    assert len(v0_files) == 8
    pinned = cat.read(spark, 0)

    new_v = cat.compact(spark, target_files=2)
    assert new_v == 1 and cat.current_version() == 1

    # pinned view: same files, same rows, files still on disk
    assert cat.files(0) == v0_files
    assert all(os.path.exists(p) for p in v0_files)
    assert pinned.count() == 1000
    assert cat.read(spark, 0).agg(F.sum("id")).first()[0] == 499500

    # head view: same data through only the rewritten files
    assert len(cat.files(1)) == 2
    assert set(cat.files(1)).isdisjoint(v0_files)
    assert cat.read(spark).count() == 1000
    assert cat.read(spark).agg(F.sum("id")).first()[0] == 499500


def test_commit_cas_rejects_stale_base(spark, table):
    """Two writers from the same base: exactly one wins (the ETag-CAS
    analog); a stale base is rejected before any manifest is written."""
    root, cat = table
    head = cat.current_version()
    files = cat.files(head)
    assert cat.commit(files, head) == head + 1
    # a second writer that also built on `head` must lose
    with pytest.raises(SnapshotConflict):
        cat.commit(files, head)
    # ... and a writer on a fabricated future base is stale too
    with pytest.raises(SnapshotConflict):
        cat.commit(files, head + 5)


def test_append_then_vacuum_gc_grace(spark, table):
    root, cat = table
    extra_dir = os.path.join(root, "extra")
    spark.range(1000, 1100).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
        (F.col("id") % 7).alias("v"),
    ).coalesce(1).write.parquet(extra_dir)
    new_files = [
        os.path.join(extra_dir, f)
        for f in os.listdir(extra_dir)
        if f.endswith(".parquet")
    ]
    v1 = cat.append(new_files)
    assert cat.read(spark, v1).count() == 1100
    v2 = cat.compact(spark, target_files=1)
    assert cat.read(spark, v2).count() == 1100

    # vacuum keeps the last 2 versions: v0-only files are deleted, the
    # appended file (still referenced by retained v1) survives
    v0_files = set(cat.files(0))
    deleted = cat.vacuum(keep_last=2)
    assert set(deleted) == v0_files - set(cat.files(v1)) - set(cat.files(v2))
    assert cat.versions() == [v1, v2]
    assert cat.read(spark, v1).count() == 1100
    assert cat.read(spark, v2).agg(F.sum("id")).first()[0] == sum(range(1100))


def test_snapshot_chunk_stats_planner_input(spark, table):
    from cardinalsin_spark.sources.snapshots import snapshot_chunk_stats

    root, cat = table
    stats = snapshot_chunk_stats(spark, cat).collect()
    assert len(stats) == 8
    assert sum(r.row_count for r in stats) == 1000
    assert all(r.min_timestamp <= r.max_timestamp for r in stats)


def test_ingest_write_then_commit_new_files(spark, tmp_path):
    """write_metrics → commit_new_files is the upload→register sequence:
    each write's files land in the next manifest; a reader pinned before
    the second write keeps the first write's rows only."""
    from cardinalsin_spark.sources.ingest import write_metrics

    root = str(tmp_path / "metrics_tbl")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60).alias(
                "timestamp"
            ),
            F.lit("m").alias("metric_name"),
            F.col("id").cast("double").alias("value"),
        )

    write_metrics(batch(0, 500), root, granularity="date")
    cat = SnapshotCatalog(root)
    v0 = cat.commit_new_files()
    assert cat.read(spark, v0).count() == 500

    write_metrics(batch(500, 800), root, mode="append", granularity="date")
    v1 = cat.commit_new_files()
    assert v1 == v0 + 1
    assert cat.read(spark, v1).count() == 800
    assert cat.read(spark, v0).count() == 500  # pinned pre-append view
    # idempotent when nothing new landed
    assert cat.commit_new_files() == v1

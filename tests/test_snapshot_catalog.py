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


def _metrics_batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.lit(1704067200_000_000_000) + F.col("id") * 60_000_000_000).alias(
            "ts_ns"
        ),
        F.lit("m").alias("name"),
        # non-integral so route_value_types keeps every value in value_f64
        (F.col("id").cast("double") + F.lit(0.25)).alias("v"),
    )


def _fresh_engine(spark, tmp_path, sub="metrics_tbl"):
    from cardinalsin_spark.engine import CardinalSin

    return CardinalSin(spark, str(tmp_path / sub), view_name=f"m_{sub}")


def test_engine_ingest_compact_ingest_partitioned(spark, tmp_path):
    """ADVICE r7 medium #1 regression: ingest → compact → ingest on the
    Hive-partitioned metrics layout must neither error
    (CONFLICTING_DIRECTORY_STRUCTURES on the flat compaction dir) nor
    duplicate the compacted rows; the engine view tracks the manifest."""
    cs = _fresh_engine(spark, tmp_path, "ici")
    cs.ingest(
        _metrics_batch(spark, 0, 500), ts_col="ts_ns", name_col="name",
        value_col="v", snapshot=True,
    )
    cat = cs.snapshot_catalog()
    cat.compact(spark, target_files=1)
    # compaction output is underscore-hidden: a manifest-unaware root read
    # still sees exactly one copy of the data, on the Hive layout
    assert spark.read.parquet(cs.metrics_path).count() == 500
    # second ingest: re-registration must not error and must not re-add
    # compacted files as "new"
    cs.ingest(
        _metrics_batch(spark, 500, 800), ts_col="ts_ns", name_col="name",
        value_col="v",
    )
    view = f"m_ici"
    assert cs.sql(f"SELECT count(*) AS n FROM {view}").first().n == 800
    assert (
        cs.sql(f"SELECT count(DISTINCT value_f64) AS n FROM {view}").first().n
        == 800
    )
    # head manifest: compacted file(s) + only the second write's files
    head_files = cat.files()
    assert all("_staged-" not in p for p in head_files)
    assert sum("_data-v" in p for p in head_files) >= 1


def test_read_snapshot_schema_matches_registered_view(spark, tmp_path):
    """ADVICE r7 medium #2 regression: pinned reads must keep the Hive
    partition columns (basePath), matching the registered view's schema."""
    cs = _fresh_engine(spark, tmp_path, "schema")
    cs.ingest(
        _metrics_batch(spark, 0, 300), ts_col="ts_ns", name_col="name",
        value_col="v", snapshot=True,
    )
    view_cols = sorted(cs.metrics.columns)
    assert "date" in view_cols  # the layout under test is partitioned
    pinned = cs.read_snapshot(0)
    assert sorted(pinned.columns) == view_cols
    assert pinned.count() == 300
    # ... and still after a compaction (mixed flat+Hive manifest)
    cs.snapshot_catalog().compact(spark, target_files=1)
    cs.ingest(
        _metrics_batch(spark, 300, 400), ts_col="ts_ns", name_col="name",
        value_col="v",
    )
    head = cs.read_snapshot()
    assert sorted(head.columns) == view_cols
    assert head.count() == 400
    assert sorted(cs.metrics.columns) == view_cols


def test_orphaned_compaction_dir_never_registered(spark, table):
    """A crash between the compaction write and its commit leaves an
    unreferenced ``_data-v*`` dir; commit_new_files must not resurrect it
    as 'new' data (that would double every compacted row)."""
    root, cat = table
    head = cat.current_version()
    orphan = os.path.join(root, "_data-v000099")
    cat.read(spark).coalesce(1).write.parquet(orphan)
    assert cat.commit_new_files() == head  # nothing new registered
    assert all("_data-v000099" not in p for p in cat.files())


def test_cas_race_memory_backend(spark, tmp_path):
    """The object-store CAS protocol (conditional PUT): two writers racing
    the same next version — exactly one wins, the loser gets
    SnapshotConflict. Mirrors metadata/s3.rs:181-260 semantics through the
    in-memory backend."""
    import threading

    from cardinalsin_spark.sources.snapshots import MemoryCas

    root = str(tmp_path / "cas_tbl")
    os.makedirs(root, exist_ok=True)
    cat = SnapshotCatalog(root, backend=MemoryCas())
    cat.commit([], None)

    results: list[object] = []
    barrier = threading.Barrier(2)

    def writer(tag):
        barrier.wait()
        try:
            # both build on base 0; put_if_absent on v000001 is the lock
            cat.backend.put_if_absent(
                "v000001.json", f'{{"version":1,"parent":0,"files":[],"tag":"{tag}"}}'.encode()
            )
            results.append(("ok", tag))
        except SnapshotConflict:
            results.append(("conflict", tag))

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(r[0] for r in results) == ["conflict", "ok"]
    assert cat.current_version() == 1
    # the committed manifest is exactly the winner's
    import json as _json

    winner = next(tag for st, tag in results if st == "ok")
    assert _json.loads(cat.backend.get("v000001.json"))["tag"] == winner


def test_catalog_full_lifecycle_on_memory_backend(spark, tmp_path):
    """The whole catalog drives through the backend seam: bootstrap,
    append, compact, vacuum on MemoryCas behave exactly as on LocalFsCas
    (data files stay on the shared fs; only manifests go through CAS)."""
    from cardinalsin_spark.sources.snapshots import MemoryCas

    root = str(tmp_path / "mem_tbl")
    spark.range(100).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
    ).repartition(4).write.parquet(root)
    cat = SnapshotCatalog(root, backend=MemoryCas())
    assert cat.init_from_directory() == 0
    assert cat.read(spark).count() == 100
    v1 = cat.compact(spark, target_files=1)
    assert cat.read(spark, v1).agg(F.sum("id")).first()[0] == 4950
    deleted = cat.vacuum(keep_last=1)
    assert deleted and cat.versions() == [v1]
    assert cat.read(spark).count() == 100


def test_time_travel_version_as_of(spark, table, tmp_path):
    """Commit stamps come from the injectable BoundedClock; version_as_of
    resolves the latest version at-or-before T, raises before the table
    existed, and a wall-clock REWIND between commits still yields
    monotone stamps (version order == stamp order)."""
    from cardinalsin_spark.clock import BoundedClock
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    root = str(tmp_path / "tt")
    spark.range(0, 10).write.parquet(root)
    ticks = iter([1_000, 500, 2_000])  # NTP rewind after the first commit
    cat = SnapshotCatalog(
        root, clock=BoundedClock(wall_ns=lambda: next(ticks))
    )
    cat.init_from_directory()  # v0 @ 1000
    extra = str(tmp_path / "extra.parquet")
    spark.range(10, 15).coalesce(1).write.parquet(str(tmp_path / "xd"))
    src = next(
        f for f in os.listdir(str(tmp_path / "xd")) if f.endswith(".parquet")
    )
    os.rename(os.path.join(str(tmp_path / "xd"), src), os.path.join(root, "x.parquet"))
    cat.commit_new_files()  # v1 @ max(500, 1001) = 1001 (never backward)
    s0 = cat.manifest(0)["committed_at_ns"]
    s1 = cat.manifest(1)["committed_at_ns"]
    assert s0 == 1_000 and s1 == 1_001  # rewind absorbed, still monotone
    assert cat.version_as_of(1_000) == 0
    assert cat.version_as_of(1_001) == 1
    assert cat.version_as_of(10**15) == 1
    with pytest.raises(FileNotFoundError):
        cat.version_as_of(999)
    assert cat.read_as_of(spark, 1_000).count() == 10
    assert cat.read_as_of(spark, 1_001).count() == 15


def test_diff_and_read_changes_incremental(spark, table):
    """diff lists exactly the files an append added; read_changes returns
    exactly those rows (CDC-style consumption), and the empty diff yields
    an empty frame with the snapshot schema."""
    root, cat = table
    spark.range(5000, 5100).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704200000) + F.col("id")).alias("timestamp"),
        (F.col("id") % 7).alias("v"),
    ).coalesce(1).write.mode("append").parquet(root)
    v1 = cat.commit_new_files()
    assert v1 == 1
    d = cat.diff(0, 1)
    assert len(d["added"]) == 1 and d["removed"] == []
    changes = cat.read_changes(spark, 0, 1)
    assert changes.count() == 100
    assert changes.agg(F.min("id")).first()[0] == 5000
    # full-history diff: v_from=None means everything is an add
    assert len(cat.diff(None, 1)["added"]) == 9
    empty = cat.read_changes(spark, 1, 1)
    assert empty.count() == 0
    assert empty.schema == cat.read(spark, 1).schema


def test_diff_after_compaction_reports_rewrite(spark, table):
    """Compaction = files removed (the merged inputs) + files added (the
    compacted output under _data-v*): a CDC consumer sees the rewrite as
    adds, matching append-only change-feed semantics."""
    root, cat = table
    cat.compact(spark, target_files=2)
    d = cat.diff(0, 1)
    assert len(d["removed"]) == 8
    assert d["added"] and all("_data-v" in p for p in d["added"])
    assert cat.read_changes(spark, 0, 1).count() == 1000


def test_merge_upsert_replaces_keys_keeps_rest(spark, table):
    """MERGE semantics: matched keys take the update's row, unmatched
    survive byte-identical, brand-new keys append; a reader pinned to the
    pre-merge version still sees the original rows."""
    root, cat = table
    pinned = cat.read(spark, 0)
    updates = spark.range(0, 5).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
        F.lit(999).alias("v"),
    ).unionByName(
        spark.range(5000, 5003).select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1704300000) + F.col("id")).alias(
                "timestamp"
            ),
            F.lit(777).alias("v"),
        )
    )
    v1 = cat.merge_upsert(spark, updates, key_cols=["id"])
    assert v1 == 1
    after = cat.read(spark)
    assert after.count() == 1003
    assert after.filter(F.col("id") < 5).agg(F.sum("v")).first()[0] == 999 * 5
    assert after.filter(F.col("id") >= 5000).count() == 3
    # untouched keys keep their original values
    assert (
        after.filter((F.col("id") >= 5) & (F.col("id") < 1000))
        .agg(F.sum("v")).first()[0]
        == sum(i % 7 for i in range(5, 1000))
    )
    # pinned pre-merge reader: original everywhere
    assert pinned.filter(F.col("id") < 5).agg(F.sum("v")).first()[0] == sum(
        i % 7 for i in range(5)
    )
    assert pinned.count() == 1000


def test_merge_upsert_file_pruned_cow(spark, tmp_path):
    """File-pruned COW: an upsert whose keys live in ONE of four files
    rewrites exactly that file (diff: 1 removed + 1 added; the other
    three carry over by reference), a pure insert removes nothing, and
    the pruned result equals the full-rewrite result row-for-row."""
    root = str(tmp_path / "cow")
    (
        spark.range(0, 400)
        .select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias(
                "timestamp"
            ),
            (F.col("id") % 7).alias("v"),
        )
        .repartitionByRange(4, F.col("id"))  # contiguous id ranges per file
        .write.parquet(root)
    )
    cat = SnapshotCatalog(root)
    cat.init_from_directory()
    assert len(cat.files(0)) == 4
    # keys 0,4,8: all in the first id range — exactly one file holds them
    upd = spark.createDataFrame(
        [(i, 111) for i in (0, 4, 8)], "id long, v long"
    ).select(
        "id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
        "v",
    )
    v1 = cat.merge_upsert(spark, upd, key_cols=["id"])
    d = cat.diff(0, 1)
    assert len(d["removed"]) == 1 and len(d["added"]) == 1
    after = cat.read(spark)
    assert after.count() == 400
    assert after.filter(F.col("id").isin(0, 4, 8)).agg(F.sum("v")).first()[0] == 333
    assert (
        after.filter(~F.col("id").isin(0, 4, 8)).agg(F.sum("v")).first()[0]
        == sum(i % 7 for i in range(400) if i not in (0, 4, 8))
    )
    # pure insert: nothing removed, one file added
    ins = spark.createDataFrame([(9999, 5)], "id long, v long").select(
        "id",
        F.timestamp_seconds(F.lit(1704999999)).alias("timestamp"),
        "v",
    )
    cat.merge_upsert(spark, ins, key_cols=["id"])
    d2 = cat.diff(1, 2)
    assert d2["removed"] == [] and len(d2["added"]) == 1
    assert cat.read(spark).count() == 401
    # equality against the full-rewrite baseline from the same base
    root2 = str(tmp_path / "cow2")
    spark.read.parquet(root).write.parquet(root2)  # root read skips _data-v*
    cat2 = SnapshotCatalog(root2)
    cat2.init_from_directory()
    cat2.merge_upsert(spark, upd, key_cols=["id"], prune_files=False)
    cat2.merge_upsert(spark, ins, key_cols=["id"], prune_files=False)
    a = sorted(map(tuple, cat.read(spark).select("id", "v").collect()))
    b = sorted(map(tuple, cat2.read(spark).select("id", "v").collect()))
    assert a == b


def test_promql_at_version_is_repeatable(spark, tmp_path):
    """PromQL time travel: `at_version` pins the evaluation input to a
    snapshot — a later ingest changes the head answer but not the pinned
    one (the reference pins chunk lists per query for exactly this
    property, query/mod.rs prune→pin→register)."""
    eng = _fresh_engine(spark, tmp_path, sub="pinq")
    eng.ingest(
        _metrics_batch(spark, 0, 60), "ts_ns", "name", "v", snapshot=True
    )
    v0 = eng.snapshot_catalog().current_version()
    kw = dict(
        start_s=1704067200.0, end_s=1704067200.0 + 3600, step_s=3600
    )
    pinned_before = eng.promql_range("sum(m)", **kw).collect()
    eng.ingest(_metrics_batch(spark, 60, 120), "ts_ns", "name", "v")
    head = eng.promql_range("sum(m)", **kw).collect()
    pinned_after = eng.promql_range("sum(m)", at_version=v0, **kw).collect()
    assert pinned_after == pinned_before
    assert head != pinned_before  # the head really did move
    inst = eng.promql_instant("sum(m)", time_s=1704067200.0 + 3600,
                              at_version=v0)
    assert inst.collect()

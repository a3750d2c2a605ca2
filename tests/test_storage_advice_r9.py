"""Named regressions for the round-8 ADVICE findings and VERDICT-r8
storage items: bloom-sidecar staleness (false negatives after
ingest-after-build), point_lookup's manifest bypass, the streaming sink's
replay guard under interleaved commits, sink CAS-conflict retry with
deterministic file names, crash-orphan vacuum reclaim, the object-store
conditional-PUT backend, and the maintenance loser-retries policy."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.sources.snapshots import (
    LocalFsCas,
    ObjectStoreCas,
    SnapshotCatalog,
    SnapshotConflict,
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    (
        spark.range(0, 600)
        .select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias(
                "timestamp"
            ),
            F.concat(F.lit("m"), (F.col("id") % 5).cast("string")).alias(
                "metric_name"
            ),
            (F.col("id") % 7).cast("double").alias("value"),
        )
        .repartition(4)
        .write.parquet(root)
    )
    cat = SnapshotCatalog(root)
    cat.init_from_directory()
    return root, cat


def _batch(spark, lo: int, hi: int, metric: str = "mX"):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("timestamp"),
        F.lit(metric).alias("metric_name"),
        F.lit(1.0).alias("value"),
    )


# ---------------------------------------------------------------------------
# ADVICE high #1: bloom sidecar staleness — ingest after build
# ---------------------------------------------------------------------------


def test_bloom_candidates_include_post_build_files(spark, tmp_path):
    """A file ingested AFTER the sidecar build must stay a candidate —
    the documented no-false-negatives guarantee covers the CURRENT table,
    not the table as of the build."""
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex

    root = str(tmp_path / "plain")
    _batch(spark, 0, 100, "old_metric").coalesce(1).write.parquet(root)
    idx = ChunkBloomIndex(root, column="metric_name")
    idx.build(spark)

    # value that exists ONLY in a file written after the build
    _batch(spark, 100, 130, "new_metric").coalesce(1).write.mode(
        "append"
    ).parquet(root)

    cands = idx.candidate_files(spark, "new_metric")
    assert cands, "post-build file silently excluded (false negative)"
    got = idx.read_matching(spark, "new_metric").count()
    assert got == 30
    # and the pruning still works for values the build saw
    assert idx.read_matching(spark, "old_metric").count() == 100


def test_bloom_drops_vanished_files_and_prunes_all_null(spark, tmp_path):
    """Sidecar entries for files no longer current are dropped (reading a
    vacuumed path would fail), and a file that was indexed but held only
    NULLs in the column prunes — the explicit indexed_files stamp tells
    it apart from never-indexed."""
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex

    root = str(tmp_path / "t")
    _batch(spark, 0, 50, "keep").coalesce(1).write.parquet(root)
    _batch(spark, 50, 80, "gone").withColumn(
        "metric_name", F.lit(None).cast("string")
    ).coalesce(1).write.mode("append").parquet(root)
    idx = ChunkBloomIndex(root, column="metric_name")
    body = idx.build(spark)
    assert len(body["indexed_files"]) == 2
    # the all-null file is indexed but has no bloom words -> prunable
    assert len(body["files"]) == 1
    assert idx.read_matching(spark, "keep").count() == 50
    cands = idx.candidate_files(spark, "keep")
    assert len(cands) == 1  # the null file pruned, not treated as new

    # delete a data file out from under the sidecar: probes must not
    # reference it any more
    victim = [
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet")
    ]
    for p in victim:
        os.unlink(p)
    assert idx.candidate_files(spark, "keep") == []


def test_bloom_follows_snapshot_manifest(spark, table):
    """On a snapshot-managed table both build and probe route through the
    head manifest: after compaction the data lives under underscore-hidden
    _data-v* which a root read skips entirely."""
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex

    root, cat = table
    cat.compact(spark, target_files=1)
    cat.vacuum(keep_last=1)  # pre-compaction files are gone from disk
    idx = ChunkBloomIndex(root, column="metric_name")
    body = idx.build(spark)
    assert all(p.startswith("_data-v") for p in body["indexed_files"])
    assert idx.read_matching(spark, "m3").count() == 120
    assert idx.candidate_files(spark, "definitely-absent") == []


# ---------------------------------------------------------------------------
# ADVICE high #2: point_lookup must see what engine.sql sees
# ---------------------------------------------------------------------------


def test_point_lookup_routes_through_manifest(spark, table):
    """After compact + vacuum on a snapshot-managed table, the no-sidecar
    point_lookup fallback must read the manifest's files (a root listing
    skips _data-v* → it would read vacuumed paths or nothing)."""
    from cardinalsin_spark.engine import CardinalSin

    root, cat = table
    cat.compact(spark, target_files=1)
    cat.vacuum(keep_last=1)
    eng = CardinalSin(spark, root)
    got = eng.point_lookup("m2")
    assert got.count() == 120
    expect = cat.read(spark).filter(F.col("metric_name") == "m2").count()
    assert got.count() == expect


def test_point_lookup_sidecar_matches_manifest_view(spark, table):
    """With a sidecar present on a snapshot-managed, compacted table the
    bloom path and the manifest read agree row-for-row."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex

    root, cat = table
    cat.compact(spark, target_files=2)
    ChunkBloomIndex(root, column="metric_name").build(spark)
    eng = CardinalSin(spark, root)
    got = sorted(
        eng.point_lookup("m1").select("id").toPandas()["id"].tolist()
    )
    expect = sorted(
        cat.read(spark)
        .filter(F.col("metric_name") == "m1")
        .select("id")
        .toPandas()["id"]
        .tolist()
    )
    assert got == expect and len(got) == 120


# ---------------------------------------------------------------------------
# ADVICE medium #3: replay guard must survive interleaved non-stream commits
# ---------------------------------------------------------------------------


def test_sink_replay_after_interleaved_commit_is_noop(spark, table):
    """batch 0 → compact (a non-stream commit) → replayed batch 0: the
    carry-forward of stream_batch_id into every commit keeps the head
    check valid, so the replay appends nothing."""
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root, cat = table
    sink = snapshot_ingest_sink(root)
    sink(_batch(spark, 1000, 1040), 0)
    assert cat.read(spark).count() == 640

    cat.compact(spark, target_files=1)  # interleaved non-stream commit
    assert cat.manifest(cat.current_version())["stream_batch_id"] == 0

    sink(_batch(spark, 1000, 1040), 0)  # replay after the compaction
    assert cat.read(spark).count() == 640  # no duplicates

    cat.merge_upsert(
        spark, _batch(spark, 1000, 1001, "mY"), key_cols=["id"]
    )
    assert cat.manifest(cat.current_version())["stream_batch_id"] == 0
    sink(_batch(spark, 1000, 1040), 0)  # replay after the merge
    assert cat.read(spark).count() == 640


# ---------------------------------------------------------------------------
# ADVICE medium #4: sink CAS-conflict retry, deterministic names
# ---------------------------------------------------------------------------


class _RacingCas(LocalFsCas):
    """Injects a competing winner immediately before the victim's first
    non-bootstrap commit attempt — the victim's put_if_absent then fails
    with a GENUINE link-CAS conflict and must retry from the new head."""

    def __init__(self, directory: str, competitor):
        super().__init__(directory)
        self._competitor = competitor
        self._raced = False

    def put_if_absent(self, key: str, data: bytes) -> None:
        if not self._raced and key != "v000000.json":
            self._raced = True
            self._competitor()
        super().put_if_absent(key, data)


def test_sink_retries_lost_cas_race(spark, table, tmp_path):
    """The batch's files are durable before the commit; losing the CAS
    race must re-read the winner's head and commit the union — not raise
    and later double-register a second file set."""
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root, cat = table
    extra = str(tmp_path / "extra.parquet")
    _batch(spark, 2000, 2010, "race_winner").coalesce(1).write.parquet(extra)
    extra_file = [
        os.path.join(extra, f)
        for f in os.listdir(extra)
        if f.endswith(".parquet")
    ][0]
    dst = os.path.join(root, "race-winner.parquet")

    def competitor():
        os.replace(extra_file, dst)
        SnapshotCatalog(root).append([dst])

    racing = _RacingCas(os.path.join(root, "_snapshots"), competitor)
    sink = snapshot_ingest_sink(root, backend=racing)
    sink(_batch(spark, 3000, 3050), 7)

    head = cat.manifest(cat.current_version())
    assert head["stream_batch_id"] == 7
    df = cat.read(spark)
    assert df.count() == 600 + 10 + 50  # base + winner's append + batch
    assert df.filter(F.col("metric_name") == "race_winner").count() == 10
    # replay after all that: still a no-op
    sink(_batch(spark, 3000, 3050), 7)
    assert cat.read(spark).count() == 660


class _CrashingCas(LocalFsCas):
    """Dies at commit time N times — the crash-between-move-and-commit
    window of the reference's staged-upload story."""

    def __init__(self, directory: str, crashes: int):
        super().__init__(directory)
        self.crashes = crashes

    def put_if_absent(self, key: str, data: bytes) -> None:
        if self.crashes > 0 and key != "v000000.json":
            self.crashes -= 1
            raise RuntimeError("simulated crash before commit")
        super().put_if_absent(key, data)


def test_sink_crash_then_replay_does_not_duplicate(spark, table):
    """Crash AFTER the files moved into root but BEFORE the CAS commit:
    the replay overwrites the same deterministic paths and commits once —
    even when commit_new_files adopted the orphans in between."""
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root, cat = table
    crashing = _CrashingCas(os.path.join(root, "_snapshots"), crashes=1)
    sink = snapshot_ingest_sink(root, backend=crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(_batch(spark, 4000, 4030), 1)
    # orphaned batch files are in root, manifest unaware of them
    orphans = [f for f in os.listdir(root) if f.startswith("stream-00000001")]
    assert orphans and cat.read(spark).count() == 600

    # recovery path A: an engine ingest's commit_new_files adopts them ...
    cat.commit_new_files()
    assert cat.read(spark).count() == 630
    # ... and the replayed batch recognizes its own files (same paths)
    sink(_batch(spark, 4000, 4030), 1)
    assert cat.read(spark).count() == 630
    assert cat.manifest(cat.current_version())["stream_batch_id"] == 1
    # a second replay is a pure head-check no-op
    sink(_batch(spark, 4000, 4030), 1)
    assert cat.read(spark).count() == 630


def test_sink_crash_replay_without_adoption(spark, table):
    """Crash before commit, nothing adopts the orphans, replay runs: the
    deterministic names mean the rerun REPLACES the orphaned files, so
    exactly one copy of the batch ever becomes visible."""
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root, cat = table
    crashing = _CrashingCas(os.path.join(root, "_snapshots"), crashes=1)
    with pytest.raises(RuntimeError):
        snapshot_ingest_sink(root, backend=crashing)(_batch(spark, 5000, 5025), 2)

    snapshot_ingest_sink(root)(_batch(spark, 5000, 5025), 2)
    assert cat.read(spark).count() == 625
    # a later commit_new_files finds nothing unregistered
    cat.commit_new_files()
    assert cat.read(spark).count() == 625


# ---------------------------------------------------------------------------
# VERDICT r8 item 7: vacuum reclaims crash debris, never committed data
# ---------------------------------------------------------------------------


def test_vacuum_reclaims_stage_orphans(spark, table):
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root, cat = table
    sink = snapshot_ingest_sink(root)
    sink(_batch(spark, 6000, 6020), 0)

    # crash debris: a stage dir for the ALREADY-COMMITTED batch, a staged
    # rewrite whose version was taken, and a renamed-but-never-committed
    # data dir from a lost compaction race
    head = cat.current_version()
    for d, fname in [
        (f"_stream-stage-{0:08d}", "leftover.parquet"),
        (f"_staged-v{head:06d}", "part-0.parquet"),
        (f"_data-v{head:06d}", "part-0.parquet"),
    ]:
        os.makedirs(os.path.join(root, d), exist_ok=True)
        with open(os.path.join(root, d, fname), "w") as f:
            f.write("junk")

    before = cat.read(spark).count()
    deleted = cat.vacuum(keep_last=2)
    assert any("_stream-stage-" in p for p in deleted)
    assert any("_staged-v" in p for p in deleted)
    assert any("_data-v" in p for p in deleted)
    for d in (f"_stream-stage-{0:08d}", f"_staged-v{head:06d}", f"_data-v{head:06d}"):
        assert not os.path.exists(os.path.join(root, d))
    assert cat.read(spark).count() == before  # committed data untouched


def test_vacuum_spares_inflight_and_referenced_dirs(spark, table):
    root, cat = table
    cat.compact(spark, target_files=1)  # head data now lives in _data-v1
    head = cat.current_version()
    # an in-flight writer stages at head+1 and a future stream batch
    inflight = [f"_staged-v{head + 1:06d}", f"_stream-stage-{99:08d}"]
    for d in inflight:
        os.makedirs(os.path.join(root, d))
        with open(os.path.join(root, d, "x.parquet"), "w") as f:
            f.write("busy")
    cat.vacuum(keep_last=1)
    for d in inflight:
        assert os.path.exists(os.path.join(root, d)), d
    # the referenced compaction output survives, obviously
    assert cat.read(spark).count() == 600


# ---------------------------------------------------------------------------
# ADVICE low #5: LocalFsCas tmp-file collision between threads
# ---------------------------------------------------------------------------


def test_localfs_cas_threads_race_cleanly(tmp_path):
    """Eight threads, one key: exactly one winner, seven SnapshotConflict,
    no FileNotFoundError from a shared tmp path, winner's bytes intact."""
    cas = LocalFsCas(str(tmp_path / "cas"))
    barrier = threading.Barrier(8)
    results: list[object] = [None] * 8

    def run(i: int) -> None:
        barrier.wait()
        try:
            cas.put_if_absent("v000001.json", f"writer-{i}".encode())
            results[i] = "won"
        except SnapshotConflict:
            results[i] = "conflict"
        except Exception as exc:  # the r8 bug surfaced here
            results[i] = exc

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1, results
    assert results.count("conflict") == 7, results
    winner = results.index("won")
    assert cas.get("v000001.json") == f"writer-{winner}".encode()
    # no tmp debris
    assert [k for k in os.listdir(cas.dir) if ".tmp." in k] == []


# ---------------------------------------------------------------------------
# VERDICT r8 item 3: object-store conditional-PUT backend + loser retries
# ---------------------------------------------------------------------------


class _FakeS3Error(Exception):
    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class _FakeS3Client:
    """Duck-typed boto3 S3 client: conditional PUT via If-None-Match."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.lock = threading.Lock()

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*", "backend must always PUT conditionally"
        with self.lock:
            if Key in self.objects:
                raise _FakeS3Error("PreconditionFailed")
            self.objects[Key] = Body

    def get_object(self, Bucket, Key):
        import io

        with self.lock:
            return {"Body": io.BytesIO(self.objects[Key])}

    def delete_object(self, Bucket, Key):
        with self.lock:
            self.objects.pop(Key, None)

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        with self.lock:
            keys = sorted(k for k in self.objects if k.startswith(Prefix))
        return {
            "Contents": [{"Key": k} for k in keys],
            "IsTruncated": False,
        }


def test_object_store_cas_conditional_put(spark, tmp_path):
    client = _FakeS3Client()
    cas = ObjectStoreCas("bkt", prefix="tables/metrics/_snapshots", client=client)
    cas.put_if_absent("v000000.json", b"{}")
    with pytest.raises(SnapshotConflict):
        cas.put_if_absent("v000000.json", b"other")
    assert cas.get("v000000.json") == b"{}"
    assert cas.list_keys() == ["v000000.json"]
    assert "tables/metrics/_snapshots/v000000.json" in client.objects
    cas.delete("v000000.json")
    assert cas.list_keys() == []
    # 409 while a concurrent conditional write is in flight is also a loss
    class _Conflicting(_FakeS3Client):
        def put_object(self, **kw):
            raise _FakeS3Error("ConditionalRequestConflict")

    with pytest.raises(SnapshotConflict):
        ObjectStoreCas("bkt", client=_Conflicting()).put_if_absent("k", b"")


def test_snapshot_catalog_on_object_store_cas(spark, tmp_path):
    """The full catalog lifecycle over the object-store protocol: commit,
    append, two-writer race with exactly one loser."""
    root = str(tmp_path / "tbl")
    _batch(spark, 0, 100).coalesce(2).write.parquet(root)
    client = _FakeS3Client()
    a = SnapshotCatalog(root, backend=ObjectStoreCas("b", "s", client=client))
    b = SnapshotCatalog(root, backend=ObjectStoreCas("b", "s", client=client))
    a.init_from_directory()
    assert b.current_version() == 0
    head_files = a.files(0)
    assert a.commit(head_files, 0) == 1
    with pytest.raises(SnapshotConflict):
        b.commit(head_files, 0)
    assert b.read(spark).count() == 100


def test_compact_loser_retries_and_replans(spark, table, tmp_path):
    """Two maintenance writers race: with retries the loser re-reads the
    winner's head and compacts THAT snapshot — the interleaved append's
    rows are in the retried output (metadata/s3.rs:181-260 semantics)."""
    root, cat = table
    extra_dir = str(tmp_path / "x")
    _batch(spark, 9000, 9010, "late_append").coalesce(1).write.parquet(extra_dir)
    extra = [
        os.path.join(extra_dir, f)
        for f in os.listdir(extra_dir)
        if f.endswith(".parquet")
    ][0]
    dst = os.path.join(root, "late-append.parquet")

    def competitor():
        os.replace(extra, dst)
        SnapshotCatalog(root).append([dst])

    racing = SnapshotCatalog(
        root, backend=_RacingCas(os.path.join(root, "_snapshots"), competitor)
    )
    # without retries the loser surfaces the conflict ...
    with pytest.raises(SnapshotConflict):
        racing.compact(spark, target_files=1)
    # ... with retries it re-plans and the new head holds ALL rows
    v = racing.compact(spark, target_files=1, retries=2)
    assert v == racing.current_version()
    df = racing.read(spark)
    assert df.count() == 610
    assert df.filter(F.col("metric_name") == "late_append").count() == 10
    assert len(racing.files(v)) == 1  # the retried rewrite includes the append


def test_merge_upsert_loser_retries(spark, table, tmp_path):
    root, cat = table
    extra_dir = str(tmp_path / "y")
    _batch(spark, 9100, 9105, "mid_append").coalesce(1).write.parquet(extra_dir)
    extra = [
        os.path.join(extra_dir, f)
        for f in os.listdir(extra_dir)
        if f.endswith(".parquet")
    ][0]
    dst = os.path.join(root, "mid-append.parquet")

    def competitor():
        os.replace(extra, dst)
        SnapshotCatalog(root).append([dst])

    racing = SnapshotCatalog(
        root, backend=_RacingCas(os.path.join(root, "_snapshots"), competitor)
    )
    updates = _batch(spark, 0, 3, "rewritten")
    v = racing.merge_upsert(spark, updates, key_cols=["id"], retries=2)
    df = racing.read(spark)
    assert df.count() == 605  # 600 base (3 rewritten in place) + 5 appended
    assert df.filter(F.col("metric_name") == "rewritten").count() == 3
    assert df.filter(F.col("metric_name") == "mid_append").count() == 5
    assert v == racing.current_version()


# ---------------------------------------------------------------------------
# jobs CLI: snapshot-compact (with retries) and vacuum
# ---------------------------------------------------------------------------


def test_jobs_snapshot_compact_and_vacuum_cli(spark, table, capsys):
    from cardinalsin_spark import jobs

    root, cat = table
    rc = jobs.main(
        ["snapshot-compact", "--path", root, "--target-files", "2"]
    )
    assert rc == 0
    assert "-> v1 (2 files)" in capsys.readouterr().out
    assert cat.read(spark).count() == 600

    # crash debris + an old version for vacuum to reclaim
    os.makedirs(os.path.join(root, "_stream-stage-00000000"), exist_ok=True)
    with open(
        os.path.join(root, "_stream-stage-00000000", "x.parquet"), "w"
    ) as f:
        f.write("junk")
    # vacuum only reclaims stream stages when a head carries the marker
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    snapshot_ingest_sink(root)(_batch(spark, 7000, 7005), 3)
    rc = jobs.main(["vacuum", "--path", root, "--keep-last", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "files reclaimed" in out
    assert not os.path.exists(os.path.join(root, "_stream-stage-00000000"))
    assert cat.read(spark).count() == 605


# ---------------------------------------------------------------------------
# The works: every storage feature interacting on one table
# ---------------------------------------------------------------------------


def test_storage_tier_end_to_end(spark, tmp_path):
    """One table through the full lifecycle: batch ingest -> streamed
    micro-batches (with a replay) -> compaction -> post-compaction ingest
    -> bloom sidecar -> point lookup == engine view -> merge upsert ->
    vacuum -> pinned time travel. Every step must keep point lookups,
    manifest reads and the row multiset consistent."""
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex
    from cardinalsin_spark.streaming.live import snapshot_ingest_sink

    root = str(tmp_path / "life")
    _batch(spark, 0, 300, "base").repartition(3).write.parquet(root)
    cat = SnapshotCatalog(root)
    cat.init_from_directory()

    sink = snapshot_ingest_sink(root)
    sink(_batch(spark, 1000, 1050, "streamed"), 0)
    sink(_batch(spark, 1050, 1080, "streamed"), 1)
    sink(_batch(spark, 1050, 1080, "streamed"), 1)  # replay: no-op
    assert cat.read(spark).count() == 380

    v_before_compact = cat.current_version()
    cat.compact(spark, target_files=2, retries=2)
    assert cat.manifest(cat.current_version())["stream_batch_id"] == 1

    # post-compaction ingest + a third stream batch land on the manifest
    extra_dir = str(tmp_path / "x")
    _batch(spark, 2000, 2010, "late").coalesce(1).write.parquet(extra_dir)
    extra = [
        os.path.join(extra_dir, f)
        for f in os.listdir(extra_dir)
        if f.endswith(".parquet")
    ][0]
    dst = os.path.join(root, "late.parquet")
    os.replace(extra, dst)
    cat.append([dst])
    sink(_batch(spark, 3000, 3005, "streamed"), 2)
    assert cat.read(spark).count() == 395

    # bloom sidecar over the CURRENT manifest; point lookups match the
    # engine view for pre-compaction, compacted and post-sidecar data
    idx = ChunkBloomIndex(root, column="metric_name")
    idx.build(spark)
    sink(_batch(spark, 4000, 4002, "post_sidecar"), 3)  # sidecar now stale
    from cardinalsin_spark.engine import CardinalSin

    eng = CardinalSin(spark, root)
    for metric, expect in [
        ("base", 300), ("streamed", 85), ("late", 10), ("post_sidecar", 2),
    ]:
        assert eng.point_lookup(metric).count() == expect, metric

    # keyed merge rewrites only key-holding files; replay guard survives
    cat.merge_upsert(
        spark, _batch(spark, 0, 5, "rewritten"), key_cols=["id"], retries=2
    )
    sink(_batch(spark, 4000, 4002, "post_sidecar"), 3)  # replay after merge
    df = cat.read(spark)
    assert df.count() == 397
    assert df.filter(F.col("metric_name") == "rewritten").count() == 5

    # vacuum: old generations + stage debris reclaimed, pinned head intact
    head = cat.current_version()
    deleted = cat.vacuum(keep_last=1)
    assert deleted
    assert cat.versions() == [head]
    assert cat.read(spark).count() == 397
    assert eng.point_lookup("rewritten").count() == 5
    # the pre-compaction version is gone; time travel to the head works
    with pytest.raises(Exception):
        cat.read(spark, v_before_compact).collect()


def test_jobs_route_through_manifest_on_snapshot_tables(spark, tmp_path, capsys):
    """Same staleness class as the point_lookup ADVICE bug, in the jobs
    CLI: downsample/zorder must read the manifest (root reads skip
    _data-v* after compaction), and the in-place Hive compact/retention
    jobs must loud-reject on manifest-managed tables instead of
    rewriting files pinned snapshots still reference."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    root = str(tmp_path / "store")
    write_metrics(
        normalize_to_metrics(
            _batch(spark, 0, 600).withColumn(
                "ts_ns", F.unix_micros("timestamp") * 1000
            ),
            "ts_ns",
            "metric_name",
            "value",
        ),
        root,
        mode="overwrite",
    )
    cat = SnapshotCatalog(root)
    cat.init_from_directory()
    cat.compact(spark, target_files=1)
    cat.vacuum(keep_last=1)  # root now holds ONLY _data-v* + the manifest

    out = str(tmp_path / "rollup")
    rc = jobs.main(
        ["downsample", "--path", root, "--out", out,
         "--older-than-days", "0", "--resolution-s", "300"]
    )
    assert rc == 0
    rolled = spark.read.parquet(out)
    # a root read would have seen ZERO files -> empty rollup
    assert rolled.agg(F.sum("count_value")).first()[0] == 600

    for cmd in (
        ["compact", "--path", root],
        ["retention", "--path", root, "--days", "0"],
    ):
        rc = jobs.main(cmd)
        assert rc == 2
        assert "snapshot-managed" in capsys.readouterr().out
    assert cat.read(spark).count() == 600  # nothing was touched

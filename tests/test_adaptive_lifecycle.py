"""Index lifecycle (Invisible → Visible → Deprecated) + column promoter.

Mirrors reference ``adaptive_index/lifecycle.rs`` (state machine,
would-have-helped promotion at 100, 48 h drop, 30 d retirement) and
``column_promoter.rs:60-139`` (backfill job bookkeeping), plus the
Spark-side payoffs the reference leaves as comments: writer job specs and
a real ``element_at`` backfill transform.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalsin_spark.adaptive import (
    ColumnPromoter,
    IndexLifecycleManager,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def _manager(clock=None):
    return IndexLifecycleManager(clock=clock or FakeClock())


def test_created_index_is_invisible():
    m = _manager()
    idx = m.create_invisible_index("user", "inverted")
    inv = m.invisible_indexes()
    assert [e.id for e in inv] == [idx]
    assert m.visible_indexes() == []


def test_promotion_at_100_would_have_helped():
    m = _manager()
    idx = m.create_invisible_index("user", "inverted")
    for _ in range(99):
        m.record_query_columns({"user"})
    assert m.check_visibility() == []  # 99 < 100
    m.record_query_columns({"user", "host"})
    assert m.check_visibility() == [idx]
    assert [e.id for e in m.visible_indexes()] == [idx]


def test_unhelpful_index_dropped_after_delay():
    clock = FakeClock()
    m = _manager(clock)
    m.create_invisible_index("user", "inverted")
    m.record_query_columns({"other_col"})  # never helps
    clock.advance(48 * 3600 + 1)
    assert m.check_visibility() == []
    assert m.invisible_indexes() == []  # removed, not promoted


def test_usage_counter_only_for_visible():
    m = _manager()
    idx = m.create_invisible_index("user", "inverted")
    for _ in range(100):
        m.record_query_columns({"user"})
    m.check_visibility()
    m.record_query_columns({"user"})
    (e,) = m.visible_indexes()
    assert e.id == idx
    assert e.usage_count == 1
    assert e.would_have_helped == 100  # frozen at promotion


def test_retirement_after_30_days_unused():
    clock = FakeClock()
    m = _manager(clock)
    idx = m.create_invisible_index("user", "inverted")
    for _ in range(100):
        m.record_query_columns({"user"})
    m.check_visibility()
    clock.advance(30 * 86400 + 1)
    assert m.retirement_check() == [idx]
    assert m.visible_indexes() == []
    # deprecated indexes stop accruing usage
    m.record_query_columns({"user"})
    assert m.retirement_check() == []


def test_recent_usage_defers_retirement():
    clock = FakeClock()
    m = _manager(clock)
    m.create_invisible_index("user", "inverted")
    for _ in range(100):
        m.record_query_columns({"user"})
    m.check_visibility()
    clock.advance(29 * 86400)
    m.record_query_columns({"user"})  # touch
    clock.advance(2 * 86400)  # 31 d after creation, 2 d after use
    assert m.retirement_check() == []


def test_writer_job_specs_by_index_type():
    m = _manager()
    for col, kind in [
        ("user", "inverted"),
        ("latency", "range"),
        ("trace_id", "bloom_filter"),
    ]:
        m.create_invisible_index(col, kind)
        for _ in range(100):
            m.record_query_columns({col})
    m.check_visibility()
    specs = {s["action"]: s for s in m.writer_job_specs(time_column="ts")}
    assert specs["write_partitioned"]["partition_by"] == ["user"]
    assert specs["write_zordered"]["a"] == "latency"
    assert specs["write_zordered"]["b"] == "ts"
    assert specs["build_chunk_bloom"]["column"] == "trace_id"
    assert specs["build_chunk_bloom"]["job"][:1] == ["bloom"]


def test_bloom_spec_is_executable(spark, tmp_path):
    """The bloom recommendation's job spec drives the REAL sidecar build —
    recommendation → jobs CLI → ChunkBloomIndex prunes (the same
    advice-executes property the zorder rewrite has)."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.chunk_bloom import ChunkBloomIndex
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    (
        spark.range(0, 400)
        .select(
            F.concat(F.lit("m"), (F.col("id") % 4)).alias("metric_name"),
            "id",
        )
        .repartition(4, F.col("id") % 4)
        .write.parquet(root)
    )
    m = _manager()
    m.create_invisible_index("metric_name", "bloom_filter")
    for _ in range(100):
        m.record_query_columns({"metric_name"})
    m.check_visibility()
    (spec,) = [
        s for s in m.writer_job_specs() if s["action"] == "build_chunk_bloom"
    ]
    rc = jobs.main(spec["job"] + ["--path", root])
    assert rc == 0
    idx = ChunkBloomIndex(root, column=spec["column"])
    assert idx.read_matching(spark, "m1").count() == 100


def test_create_from_recommendations_roundtrip():
    m = _manager()
    recs = [
        {"column": "user", "index_type": "inverted", "score": 5.0},
        {"column": "latency", "index_type": "range", "score": 3.0},
    ]
    ids = m.create_from_recommendations(recs)
    assert len(ids) == 2
    assert {e.column for e in m.invisible_indexes()} == {"user", "latency"}


def test_record_query_parses_optimized_plan(spark):
    """The plan-harvest path must count only columns that survive Catalyst
    in a Filter node — same parse as QueryStatsCollector.record."""
    m = _manager()
    m.create_invisible_index("a", "inverted")
    m.create_invisible_index("b", "inverted")
    df = spark.createDataFrame([(1, 2), (3, 4)], "a int, b int")
    m.record_query(df.filter(F.col("a") > 1).select("b"), ["a", "b"])
    helped = {e.column: e.would_have_helped for e in m.invisible_indexes()}
    assert helped["a"] == 1
    assert helped["b"] == 0


# -- column promoter --------------------------------------------------------


def test_promote_column_job_bookkeeping():
    p = ColumnPromoter()
    job_id = p.promote_column("service", "inverted")
    j = p.get_job(job_id)
    assert j.status == "pending"
    assert [x.id for x in p.pending_jobs()] == [job_id]
    j.total_chunks, j.total_rows = 4, 400
    p.update_progress(job_id, processed_chunks=2, processed_rows=200)
    assert p.get_job(job_id).percentage() == 50.0
    p.complete_job(job_id)
    assert p.get_job(job_id).status == "completed"
    assert p.pending_jobs() == []


def test_promote_column_failure_path():
    p = ColumnPromoter()
    job_id = p.promote_column("service", "inverted")
    p.fail_job(job_id)
    assert p.get_job(job_id).status == "failed"


def test_backfill_materializes_label_column(spark):
    """The backfill transform must surface labels['name'] as a dedicated
    top-level column (dual-write shape), leaving other columns intact."""
    p = ColumnPromoter()
    job_id = p.promote_column("service", "inverted")
    df = spark.createDataFrame(
        [(1, {"service": "api", "zone": "a"}), (2, {"zone": "b"})],
        "id int, labels map<string,string>",
    )
    out = p.backfill(job_id, df, labels_col="labels")
    rows = {r.id: r.service for r in out.collect()}
    assert rows == {1: "api", 2: None}
    assert p.get_job(job_id).status == "in_progress"

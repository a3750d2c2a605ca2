"""Write path + catalog + compaction behavior tests (side-effectful, so
pytest-only — no SQL oracle)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators.compaction import (
    compact_partition,
    l0_compaction_candidates,
    leveled_compaction_groups,
    retention_candidates,
)
from cardinalsin_spark.sources.catalog import (
    chunk_stats,
    prune_chunks_by_stats,
    prune_chunks_by_time,
)
from cardinalsin_spark.sources.ingest import (
    normalize_to_metrics,
    register_metrics,
    route_value_types,
    write_metrics,
)
from cardinalsin_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def metrics_path(spark, sf_dir, tmp_path_factory):
    """events → metrics schema → partitioned write, shared by tests."""
    path = str(tmp_path_factory.mktemp("metrics_store") / "metrics")
    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(
        ev, ts_col="ts_ns", name_col="event_type", value_col="value",
        label_cols={"user": "user_id"},
    )
    write_metrics(m, path, mode="overwrite")
    return path


def test_value_routing(spark):
    df = spark.createDataFrame(
        [(1.5,), (3.0,), (-2.0,), (0.0,), (None,)], "value double"
    )
    out = route_value_types(df).collect()
    got = {r.value: (r.value_f64, r.value_i64, r.value_u64) for r in out}
    assert got[1.5] == (1.5, None, None)
    assert got[3.0] == (None, None, 3)
    assert got[-2.0] == (None, -2, None)
    assert got[0.0] == (None, None, 0)
    assert got[None] == (None, None, None)


def test_partitioned_layout_and_roundtrip(spark, metrics_path, sf_dir):
    # Hive layout date=/hour= exists (the reference's time index as dirs)
    dates = [d for d in os.listdir(metrics_path) if d.startswith("date=")]
    assert len(dates) >= 28  # ~30 days of events
    hours = os.listdir(os.path.join(metrics_path, dates[0]))
    assert any(h.startswith("hour=") for h in hours)

    df = register_metrics(spark, metrics_path)
    ev_count = load_table(spark, sf_dir, "events").count()
    assert df.count() == ev_count
    # exactly one value column non-null per row
    bad = df.filter(
        (F.col("value_f64").isNotNull().cast("int")
         + F.col("value_i64").isNotNull().cast("int")
         + F.col("value_u64").isNotNull().cast("int")) != 1
    ).count()
    assert bad == 0


def test_partition_pruning_plan(spark, metrics_path):
    """A date-filtered query must scan only matching partitions — the Spark
    replacement for the reference's 99% chunk elimination claim."""
    from cardinalsin_spark.plans.inspect import plan_string

    df = spark.read.parquet(metrics_path)
    pruned = df.filter(F.col("date") == "2024-01-05")
    plan = plan_string(pruned, "formatted")
    assert "PartitionFilters" in plan and "date" in plan
    n_files = pruned.select(F.input_file_name()).distinct().count()
    total_files = df.select(F.input_file_name()).distinct().count()
    assert n_files < total_files / 10


def test_sorted_within_files(spark, metrics_path):
    """sort-on-write clustering: timestamps are nondecreasing within files."""
    df = spark.read.parquet(metrics_path).select(
        F.input_file_name().alias("f"), F.col("ts_ns")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    out = (
        df.withColumn("prev", F.lag("ts_ns").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts_ns") < F.col("prev")))
        .count()
    )
    assert out == 0


def test_empty_table_fallback(spark, tmp_path):
    df = register_metrics(spark, str(tmp_path / "nope"))
    assert df.count() == 0
    assert "metric_name" in df.columns  # default schema present


def test_chunk_stats_and_time_pruning(spark, metrics_path):
    chunks = chunk_stats(spark, metrics_path)
    assert chunks.count() > 100  # one per partition file
    assert chunks.filter(F.col("min_timestamp") > F.col("max_timestamp")).count() == 0
    # prune to a 1-day window
    import datetime as dt

    day_start = int(dt.datetime(2024, 1, 5, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    day_end = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    kept = prune_chunks_by_time(chunks, day_start, day_end)
    assert 0 < kept.count() <= 25  # ≤ 24 hour-files (+1 boundary)


def test_stats_pruning_semantics(spark):
    chunks = spark.createDataFrame(
        [("a", 0, 10), ("b", 20, 30), ("c", 5, 25)],
        "chunk_path string, vmin long, vmax long",
    )
    eq = prune_chunks_by_stats(chunks, "vmin", "vmax", "=", 15)
    assert {r.chunk_path for r in eq.collect()} == {"c"}
    lt = prune_chunks_by_stats(chunks, "vmin", "vmax", "<", 6)
    assert {r.chunk_path for r in lt.collect()} == {"a", "c"}
    ne = prune_chunks_by_stats(chunks, "vmin", "vmax", "!=", 15)
    assert ne.count() == 3  # conservative


def test_l0_candidates_and_leveled_groups(spark):
    hour_ns = 3_600 * 10**9
    rows = []
    # 20 files in hour 0 (triggers), 3 files in hour 1 (doesn't)
    for i in range(20):
        rows.append((f"h0_{i:02d}", i * 10**9, i * 10**9 + 1, 100, 1000, 0))
    for i in range(3):
        rows.append((f"h1_{i}", hour_ns + i, hour_ns + i + 1, 100, 1000, 0))
    # level-1 chunks: 5 x 900MB → target 2GB → groups of ~2
    for i in range(5):
        rows.append((f"l1_{i}", i * hour_ns, (i + 1) * hour_ns, 10_000, 900 * 1024**2, 1))
    chunks = spark.createDataFrame(
        rows,
        "chunk_path string, min_timestamp long, max_timestamp long,"
        "row_count long, size_bytes long, level int",
    )
    cand = l0_compaction_candidates(chunks, trigger_files=15).collect()
    assert len(cand) == 1 and cand[0].n_files == 20 and cand[0].hour_bucket == 0

    groups = leveled_compaction_groups(chunks, level=1).collect()
    assert all(g.n_files >= 2 for g in groups)
    assert sum(g.n_files for g in groups) >= 4  # 5 chunks, ≥2 per group → 2+2(+1 dropped or grouped)


def test_retention(spark):
    chunks = spark.createDataFrame(
        [("old", 0, 100, 1, 1, 0), ("new", 200, 300, 1, 1, 0)],
        "chunk_path string, min_timestamp long, max_timestamp long,"
        "row_count long, size_bytes long, level int",
    )
    out = retention_candidates(chunks, cutoff_ns=150).collect()
    assert [r.chunk_path for r in out] == ["old"]


def test_compact_partition_merges_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "m2")
    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(ev, "ts_ns", "event_type", "value")
    # force many small files: repartition wide before write
    out = m.withColumn("date", F.to_date("timestamp")).withColumn(
        "hour", F.hour("timestamp")
    )
    out.repartition(16).write.partitionBy("date", "hour").parquet(path)
    # pick the partition with the most files (low-sf hours can be 1-row)
    best = None
    for d in os.listdir(path):
        if not d.startswith("date="):
            continue
        for h in os.listdir(os.path.join(path, d)):
            part = os.path.join(path, d, h)
            n = len([f for f in os.listdir(part) if f.endswith(".parquet")])
            if best is None or n > best[2]:
                best = (d.split("=")[1], int(h.split("=")[1]), n)
    date, hour, before = best
    part = os.path.join(path, f"date={date}", f"hour={hour}")
    assert before > 1
    pre_rows = spark.read.parquet(part).count()
    merged = compact_partition(spark, path, date, hour)
    assert merged == before
    after_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(after_files) == 1
    assert spark.read.parquet(part).count() == pre_rows


def test_split_by_time_partitions_exactly(spark, sf_dir):
    """Reference ingester/mod.rs:455-500: batch split at a timestamp point.
    Halves are disjoint, exhaustive, and the boundary row goes right."""
    from pyspark.sql import functions as F

    from cardinalsin_spark.sources.ingest import split_by_time
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # pick an EXISTING median-ish ts so the boundary case is exercised
    # (percentile_approx would round int64 ns through its double sketch)
    n_half = ev.count() // 2
    split_ns = ev.orderBy("ts_ns").offset(n_half).limit(1).first().ts_ns
    before, after = split_by_time(ev, split_ns)
    n_b, n_a, n = before.count(), after.count(), ev.count()
    assert n_b + n_a == n and n_b > 0 and n_a > 0
    assert before.filter(F.col("ts_ns") >= split_ns).count() == 0
    assert after.filter(F.col("ts_ns") < split_ns).count() == 0
    # the boundary row itself lands on the 'after' side
    assert after.filter(F.col("ts_ns") == split_ns).count() == \
        ev.filter(F.col("ts_ns") == split_ns).count() > 0


def test_write_metrics_max_records_per_file(spark, sf_dir, tmp_path):
    """maxRecordsPerFile rolls files at the cap (the L0 file-size knob)
    while keeping each file timestamp-sorted."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    path = str(tmp_path / "capped")
    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(ev, "ts_ns", "event_type", "value")
    write_metrics(m, path, mode="overwrite", max_records_per_file=5)
    files = []
    for root, _dirs, names in os.walk(path):
        files += [os.path.join(root, f) for f in names if f.endswith(".parquet")]
    assert files
    capped_partitions = 0
    for f in files:
        t = pq.read_table(f, columns=["timestamp"])
        assert t.num_rows <= 5
        if t.num_rows == 5:
            capped_partitions += 1
        ts = t.column("timestamp").to_pylist()
        assert ts == sorted(ts)  # still sorted within the rolled file
    assert capped_partitions > 0  # the cap actually triggered somewhere


def test_downsample_cascade_reaggregates_exactly(spark, sf_dir):
    """Rollup cascade correctness: 60s rollups re-aggregated to 3600s must
    equal the direct 3600s rollup on every re-aggregable moment (sum,
    count, min, max — and avg recomputed from sum/count). This is the
    property that lets a retention policy replace raw data with rollups
    and still serve coarser queries exactly."""
    from cardinalsin_spark.functions.core import time_bucket
    from cardinalsin_spark.operators.compaction import downsample
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    fine = downsample(ev, 60, ["event_type"], ts_col="ts", value_col="vc")
    cascaded = (
        fine.groupBy(
            time_bucket("bucket", 3600).alias("bucket"), "event_type"
        )
        .agg(
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sum_value").alias("sum_value"),
            F.sum("count_value").alias("count_value"),
        )
    )
    direct = downsample(ev, 3600, ["event_type"], ts_col="ts", value_col="vc")

    c = {
        (r.bucket, r.event_type): (r.min_value, r.max_value, r.sum_value,
                                   r.count_value)
        for r in cascaded.collect()
    }
    d = {
        (r.bucket, r.event_type): (r.min_value, r.max_value, r.sum_value,
                                   r.count_value)
        for r in direct.collect()
    }
    assert c == d and len(c) > 0
    # avg recomputed from the cascaded moments equals the direct avg
    for r in direct.collect():
        mn, mx, s, n = c[(r.bucket, r.event_type)]
        assert s / n == r.avg_value


def test_write_metrics_auto_granularity(spark, sf_dir, tmp_path):
    """auto drops to date= layout when hour partitions would be tiny
    (sparse fixture), keeps date=/hour= for dense data, and the explicit
    default stays hour for layout-contract stability."""
    import os

    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(ev, "ts_ns", "event_type", "value")

    sparse = str(tmp_path / "sparse")
    gran = write_metrics(m, sparse, mode="overwrite", granularity="auto")
    assert gran == "date"
    top = os.listdir(sparse)
    assert any(d.startswith("date=") for d in top)
    date_dir = next(d for d in top if d.startswith("date="))
    assert not any(
        h.startswith("hour=") for h in os.listdir(os.path.join(sparse, date_dir))
    )

    # dense: all rows forced into a couple of hours -> auto keeps hour
    import pyspark.sql.functions as F

    dense_m = m.withColumn(
        "timestamp",
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + (F.col("ts_ns") % 7_200) * 1_000_000)
        ),
    )
    dense = str(tmp_path / "dense")
    gran2 = write_metrics(
        dense_m, dense, mode="overwrite", granularity="auto",
        min_rows_per_hour=100,
    )
    assert gran2 == "hour"
    ddir = next(d for d in os.listdir(dense) if d.startswith("date="))
    assert any(
        h.startswith("hour=") for h in os.listdir(os.path.join(dense, ddir))
    )

    # explicit default unchanged
    explicit = str(tmp_path / "explicit")
    assert write_metrics(m, explicit, mode="overwrite") == "hour"


def test_compact_whole_date_partition(spark, sf_dir, tmp_path):
    """Date-granularity tables (write_metrics auto mode) compact per
    date= partition; hour-partitioned dates refuse the flattening."""
    import os

    import pytest as _pytest

    from cardinalsin_spark.operators.compaction import compact_partition
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    m = normalize_to_metrics(ev, "ts_ns", "event_type", "value")
    path = str(tmp_path / "datestore")
    # two writes -> >1 file per date partition
    assert write_metrics(m, path, mode="overwrite", granularity="auto") == "date"
    write_metrics(m, path, mode="append", granularity="date")

    date_dir = next(d for d in os.listdir(path) if d.startswith("date="))
    date = date_dir.split("=", 1)[1]
    before = spark.read.parquet(path).count()
    merged = compact_partition(spark, path, date)
    assert merged >= 2
    assert spark.read.parquet(path).count() == before
    files = [
        f for f in os.listdir(os.path.join(path, date_dir))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1

    # hour-layout refusal
    hour_path = str(tmp_path / "hourstore")
    write_metrics(m, hour_path, mode="overwrite", granularity="hour")
    hdir = next(d for d in os.listdir(hour_path) if d.startswith("date="))
    with _pytest.raises(ValueError, match="hour-partitioned"):
        compact_partition(spark, hour_path, hdir.split("=", 1)[1])


def test_write_zordered_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """A Z-ordered rewrite must tighten per-file bounding boxes on BOTH
    clustering columns; a single-column sort leaves the other column's
    per-file span at ~full range. This is the row-group-pruning win the
    adaptive recommender's 'range' advice promises."""
    import pyspark.sql.functions as F

    from cardinalsin_spark.operators.compaction import write_zordered
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    n_files = 8

    zpath = str(tmp_path / "zordered")
    write_zordered(ev, zpath, "user_id", "value", target_files=n_files)

    spath = str(tmp_path / "valuesorted")
    (
        ev.repartitionByRange(n_files, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite").parquet(spath)
    )

    def spans(path, col):
        df = spark.read.parquet(path).withColumn(
            "_f", F.input_file_name()
        )
        rows = (
            df.groupBy("_f")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r.span for r in rows) / len(rows)

    full_uid = ev.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    z_uid, s_uid = spans(zpath, "user_id"), spans(spath, "user_id")
    z_val = spans(zpath, "value")
    full_val = ev.agg(F.max("value") - F.min("value")).collect()[0][0]

    # value-sorted files know nothing about user_id: ~full span
    assert s_uid > 0.8 * full_uid
    # z-ordered files are materially tighter on BOTH dimensions
    assert z_uid < 0.8 * s_uid, (z_uid, s_uid, full_uid)
    assert z_val < 0.8 * full_val, (z_val, full_val)

"""Named regression tests for the round-1/2 ADVICE findings: downsample CLI,
exact ns derivation, integer ns bucketing, out-of-partition compaction tmp
dirs, and malformed remote-write payload isolation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.test_ingest_adapters import _write_request


def _store(spark, sf_dir, path: str) -> None:
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    write_metrics(
        normalize_to_metrics(ev, "ts_ns", "event_type", "value"),
        path,
        mode="overwrite",
    )


def test_jobs_downsample_cli(spark, sf_dir, tmp_path, capsys):
    """ADVICE r1: the downsample subcommand crashed with a TypeError (missing
    series_cols) and referenced a nonexistent `value` column. End-to-end:
    store → CLI → rollup parquet with the expected schema and sane values."""
    from cardinalsin_spark import jobs

    path, out = str(tmp_path / "store"), str(tmp_path / "rollup")
    _store(spark, sf_dir, path)

    # fixture data is from 2024 → everything is older than 30 days
    rc = jobs.main(
        ["downsample", "--path", path, "--out", out,
         "--older-than-days", "30", "--resolution-s", "300"]
    )
    assert rc == 0
    assert "downsampled to 300s buckets" in capsys.readouterr().out

    rolled = spark.read.parquet(out)
    assert {"bucket", "metric_name", "avg_value", "min_value", "max_value",
            "sum_value", "count_value"} <= set(rolled.columns)
    n = rolled.count()
    assert 0 < n < spark.read.parquet(path).count()  # it actually rolled up
    # sum/count must re-aggregate to the exact global mean
    g = rolled.agg(
        (F.sum("sum_value") / F.sum("count_value")).alias("mean")
    ).collect()[0]
    direct = (
        spark.read.parquet(path)
        .agg(F.avg(F.coalesce("value_f64", "value_i64", "value_u64")).alias("mean"))
        .collect()[0]
    )
    assert abs(g.mean - direct.mean) < 1e-9


def test_normalize_ts_ns_exact_from_timestamp(spark):
    """ADVICE r1: deriving ts_ns via cast("double")*1e9 loses up to ~256 ns
    at the current epoch. unix_micros math must be exact on the µs grid."""
    from cardinalsin_spark.sources.ingest import normalize_to_metrics

    # epoch micros chosen so the double round-trip is inexact:
    # 1_700_000_000_000_001 µs → *1e-6 s → *1e9 ns ≠ …001000 under doubles
    micros = [1_700_000_000_000_001, 1_700_000_000_999_999, 1_812_345_678_123_457]
    df = spark.createDataFrame(
        [Row(i=i, m=m) for i, m in enumerate(micros)]
    ).select("i", F.timestamp_micros("m").alias("ts"), F.lit("m").alias("name"),
             F.lit(1.5).alias("v"))
    out = normalize_to_metrics(df, "ts", "name", "v")
    rows = out.select("ts_ns").collect()
    assert sorted(r.ts_ns for r in rows) == sorted(m * 1000 for m in micros)


def test_time_bucket_ns_integer_exact(spark):
    """ADVICE r1: float division on int64 ns (>2^53) mis-buckets boundary
    values — a value 1 ns below an hour boundary must floor DOWN."""
    from cardinalsin_spark.functions.core import time_bucket_ns

    step = 3_600 * 10**9
    k = 500_000  # epoch ~2027, where double ulp is ~256 ns
    vals = [k * step - 1, k * step, k * step + 1]
    df = spark.createDataFrame([Row(ts_ns=v) for v in vals])
    got = {
        r.ts_ns: r.b
        for r in df.select("ts_ns", time_bucket_ns("ts_ns", step).alias("b")).collect()
    }
    assert got[k * step - 1] == (k - 1) * step
    assert got[k * step] == k * step
    assert got[k * step + 1] == k * step


def test_compact_tmp_never_inside_partition_tree(spark, sf_dir, tmp_path):
    """ADVICE r1: staging the rewrite at <root>/date=D/hour=N.compact.tmp
    breaks Hive partition inference if the job dies pre-swap. The tmp dir
    must live under an underscore-prefixed path Spark's listing ignores."""
    from cardinalsin_spark.operators.compaction import compact_partition

    path = str(tmp_path / "store")
    _store(spark, sf_dir, path)
    # fragment one partition so compaction has work
    dates = sorted(
        d for d in os.listdir(path) if d.startswith("date=")
    )
    date_dir = dates[0]
    hours = sorted(h for h in os.listdir(os.path.join(path, date_dir))
                   if h.startswith("hour="))
    date = date_dir.split("=", 1)[1]
    hour = int(hours[0].split("=", 1)[1])
    part = os.path.join(path, date_dir, hours[0])
    frag = spark.read.parquet(part)
    frag.repartition(4).write.mode("overwrite").parquet(part + "_frag")
    import shutil

    shutil.rmtree(part)
    shutil.move(part + "_frag", part)

    # leave a stale tmp from a "crashed" prior run — must not break anything
    stale = os.path.join(path, "_compaction_tmp", f"date={date}.hour={hour}")
    os.makedirs(stale, exist_ok=True)

    before = spark.read.parquet(path).count()
    merged = compact_partition(spark, path, date, hour)
    assert merged >= 2
    # no tmp dirs anywhere inside the date= partition tree
    for root, dirs, _files in os.walk(path):
        for d in dirs:
            if root != path:
                assert ".compact.tmp" not in d and d != "_compaction_tmp", (
                    os.path.join(root, d)
                )
    # table still reads, same row count, even with _compaction_tmp present
    os.makedirs(stale, exist_ok=True)
    assert spark.read.parquet(path).count() == before


def test_remote_write_malformed_payload_isolated(spark):
    """ADVICE r1: one truncated/garbage payload must not fail the whole
    mapInPandas ingest job — it is counted and skipped (or raised on demand)."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request,
        remote_write_flatten,
    )

    good = _write_request(
        [({"__name__": "up", "job": "api"}, [(1.0, 1_700_000_000_000)])]
    )
    truncated = good[: len(good) // 2]
    garbage = b"\xff" * 16
    # pure-python: malformed inputs raise cleanly, never IndexError
    for bad in (truncated, garbage, b"\x0a"):  # 0x0a = field1/wt2, no length
        with pytest.raises(ValueError):
            decode_write_request(bad)

    payloads = spark.createDataFrame(
        [Row(payload=bytearray(good)), Row(payload=bytearray(truncated)),
         Row(payload=bytearray(garbage))]
    )
    rows = remote_write_flatten(payloads).collect()
    assert len(rows) == 1 and rows[0].metric_name == "up"

    with pytest.raises(Exception):  # Py4J wraps the ValueError
        remote_write_flatten(payloads, on_error="raise").collect()

    with pytest.raises(ValueError):
        remote_write_flatten(payloads, on_error="explode")


# ---------------------------------------------------------------------------
# Round-3 ADVICE fixes (round 4): int64 overflow in the exact decision
# chains, and the extrapolatedRate negative-first-sample guard.
# ---------------------------------------------------------------------------


def _metric_rows(spark, values, t0_us=1_700_000_000_000_000, step_us=500_000):
    rows = [
        Row(m=t0_us + i * step_us, metric_name="m", value=float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows).select(
        F.timestamp_micros("m").alias("timestamp"),
        "metric_name",
        "value",
        (F.col("m") * 1000).alias("ts_ns"),
    )


def test_zscore_outliers_no_int64_wrap(spark):
    """ADVICE r3: the decision rule computed znum² and z²·d in int64,
    wrapping once |v·n| passes ~3e9 (n≈3000 at |v|=1e6). 4000 samples of
    1e6 cents plus one 5e6 spike: znum² ≈ 2.6e20 ≫ 2^63. The flagged set
    must be exactly the spike (DECIMAL(38,0) chain)."""
    from cardinalsin_spark.operators.timeseries import zscore_outliers

    values = [1_000_000] * 4000 + [5_000_000]
    df = _metric_rows(spark, values)
    out = zscore_outliers(df, step_seconds=3600, z=3).collect()
    assert [r.value_int for r in out] == [5_000_000]
    # float cross-check of the reported z-score
    import statistics

    mean = statistics.fmean(values)
    sd = statistics.pstdev(values)
    assert abs(out[0].zscore - (5_000_000 - mean) / sd) < 1e-6


def test_predict_linear_no_int64_wrap(spark):
    """ADVICE r3: num = n·Σxy − Σx·Σy was formed in int64 before the
    DECIMAL cast; with ms offsets and 1e6-cent values it wraps at a few
    thousand samples. 5000 samples on a linear ramp: the prediction must
    extrapolate the ramp, not wrap."""
    from cardinalsin_spark.operators.timeseries import predict_linear_bucketed

    n = 5000
    # y = 1_000_000 + 2 * (x_ms / 500) → slope 4e-3/ms over the hour bucket
    values = [1_000_000 + 2 * i for i in range(n)]
    df = _metric_rows(spark, values, step_us=500_000)
    out = predict_linear_bucketed(
        df, step_seconds=3600, predict_ahead_s=600
    ).collect()
    assert len(out) == 1
    # exact line: x = ms offset in the bucket; t0 sits 800s into its hour
    # (1.7e9 s mod 3600 = 800), so y = 996_800 + 0.004·x and the
    # prediction evaluates at x_eval_ms = (3600 + 600)·1000
    expected = 996_800 + 0.004 * 4_200_000
    assert abs(out[0].predicted - expected) < 1.0


def test_rate_extrapolated_negative_first_sample_skips_zero_clamp(spark):
    """ADVICE r3: upstream extrapolatedRate applies the counter zero-clamp
    only when samples[0].F >= 0; a negative first sample must NOT shrink
    (or negate) the extrapolation window."""
    from cardinalsin_spark.operators.timeseries import rate_extrapolated

    # negative first sample, rising: deltas sum = 30, vf = -10 < 0
    values = [-10.0, 0.0, 20.0]
    t0 = 1_700_000_000_000_000  # µs; bucket-aligned? not necessarily — fine
    df = _metric_rows(spark, values, t0_us=t0, step_us=600_000_000)
    out = rate_extrapolated(df, step_seconds=3600).collect()
    assert len(out) == 1
    # replicate upstream chain WITHOUT the zero clamp
    import math

    ts = [(t0 + i * 600_000_000) * 1000 for i in range(3)]
    bstart = (ts[0] // (3600 * 10**9)) * 3600 * 10**9
    sampled = float(ts[2] - ts[0])
    avg_dur = sampled / 2.0
    dur_start = float(ts[0] - bstart)
    dur_end = float(bstart + 3600 * 10**9 - ts[2])
    thr = avg_dur * 1.1
    ext_start = dur_start if dur_start < thr else avg_dur / 2.0
    ext_end = dur_end if dur_end < thr else avg_dur / 2.0
    factor = (sampled + ext_start + ext_end) / sampled
    expected = 30.0 * factor / 3600.0
    assert math.isclose(out[0].rate, expected, rel_tol=1e-12)


def test_symlinked_base_path_still_direct(spark, tmp_path):
    """ADVICE r11 item 2: a refresh job that reached the base through a
    symlink must not make a direct rollup look like a cascade tier — the
    chain walk compares realpaths, so the rollup stays eligible."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    real = str(tmp_path / "metrics")
    link = str(tmp_path / "metrics-link")
    src = spark.range(0, 500).select(
        (F.lit(1_704_067_200_000_000_000) + F.col("id") * F.lit(10**9)).alias(
            "ts_ns"
        ),
        F.lit("m").alias("name"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), real,
                  mode="overwrite")
    SnapshotCatalog(real).init_from_directory()
    os.symlink(real, link)
    # the refresh stamps rollup_base_root through the SYMLINK...
    link_eng = CardinalSin(spark, link)
    fine = str(tmp_path / "r300")
    link_eng.refresh_rollup(fine, 300, series_cols=["metric_name"])
    # ...and the serving engine references the base by its REAL path
    eng = CardinalSin(spark, real)
    eng.attach_rollup(fine)
    st = eng.rollup_status()[0]
    assert st["eligible"], st
    assert eng._route_rollups(), "symlinked base root must still route"


def test_attach_rollup_empty_log_is_valueerror(spark, tmp_path):
    """ADVICE r11 item 3: a rollup dir with an existing-but-empty
    _snapshots log must raise the explanatory ValueError from
    attach_rollup, not a FileNotFoundError from the manifest read."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    src = spark.range(0, 100).select(
        (F.lit(1_704_067_200_000_000_000) + F.col("id") * F.lit(10**9)).alias(
            "ts_ns"
        ),
        F.lit("m").alias("name"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    SnapshotCatalog(path).init_from_directory()
    eng = CardinalSin(spark, path)
    hollow = tmp_path / "hollow-rollup"
    (hollow / "_snapshots").mkdir(parents=True)  # log dir exists, no commits
    with pytest.raises(ValueError, match="rollup_base_version|manifest"):
        eng.attach_rollup(str(hollow), 300)
    with pytest.raises(ValueError, match="resolution|manifest"):
        eng.attach_rollup(str(hollow))


def test_rollup_complete_covenant(spark, tmp_path):
    """ADVICE r12 item 2: a rollup maintained with a row-FILTERING
    transform would silently shrink DISTINCT/metadata results (and bucket
    aggregates) while passing every column/freshness guard.  The refresh
    now records a ``rollup_complete`` covenant in the manifest; the
    engine excludes incomplete rollups from ALL transparent-serving doors
    (rollup_status explains), completeness is sticky across incremental
    refreshes, and a rebuild-arm refresh with a declared-complete
    transform restores it."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.rollup import refresh_rollup
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    START = 1_704_067_200

    def src(lo, hi):
        return spark.range(lo, hi).select(
            (
                F.lit(START * 1_000_000_000)
                + (F.col("id") % 3600) * F.lit(10**9)
            ).alias("ts_ns"),
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("name"),
            (F.col("id") % 97).cast("double").alias("v"),
        )

    path = str(tmp_path / "metrics")
    write_metrics(normalize_to_metrics(src(0, 3000), "ts_ns", "name", "v"),
                  path, mode="overwrite")
    cat = SnapshotCatalog(path)
    cat.init_from_directory()

    # a FILTERING transform without the completeness declaration
    filtering = lambda df: df.withColumn("value", value_expr()).filter(
        F.col("metric_name") == "s0"
    )  # noqa: E731
    bad_root = str(tmp_path / "ru_bad")
    refresh_rollup(spark, cat, bad_root, 300, ["metric_name"],
                   transform=filtering)
    assert SnapshotCatalog(bad_root).manifest()["rollup_complete"] is False

    eng = CardinalSin(spark, path).attach_rollup(bad_root, 300)
    st = eng.rollup_status()[0]
    assert not st["eligible"] and "rollup_complete" in st["reason"], st
    assert eng._route_rollups() == []
    # every door answers from raw — label_values must see BOTH series
    # even over grid-aligned bounds (the exact ADVICE failure shape)
    vals = [r[0] for r in
            eng.label_values("metric_name", None, START, START + 599).collect()]
    assert vals == ["s0", "s1"]
    assert eng._maybe_route_metadata(["metric_name"], None, START,
                                     START + 599) is None

    # the engine's own value-reshape refresh declares completeness → routes
    good_root = str(tmp_path / "ru_good")
    eng2 = CardinalSin(spark, path)
    eng2.refresh_rollup(good_root, 300, series_cols=["metric_name"])
    assert SnapshotCatalog(good_root).manifest()["rollup_complete"] is True
    eng2.attach_rollup(good_root)
    assert eng2.rollup_status()[0]["eligible"]
    assert eng2._maybe_route_metadata(["metric_name"], None, START,
                                      START + 599) is not None

    # stickiness: an incremental refresh with a now-complete transform
    # cannot launder away rows the filtering history already dropped...
    import shutil

    stage = str(tmp_path / "extra-stage")
    # strictly-later disjoint buckets: the refresh must take the MERGE
    # arm (an overlap would trip the counter-segment probe into the
    # rebuild arm, which legitimately restores completeness)
    later = spark.range(0, 500).select(
        (
            F.lit((START + 7200) * 1_000_000_000) + F.col("id") * F.lit(10**9)
        ).alias("ts_ns"),
        F.lit("s0").alias("name"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    normalize_to_metrics(later, "ts_ns", "name", "v").coalesce(
        1
    ).write.parquet(stage)
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            shutil.move(os.path.join(stage, f),
                        os.path.join(path, f"extra-{i:04d}.parquet"))
    cat.commit_new_files()
    complete = lambda df: df.withColumn("value", value_expr())  # noqa: E731
    refresh_rollup(spark, cat, bad_root, 300, ["metric_name"],
                   transform=complete, transform_complete=True)
    assert SnapshotCatalog(bad_root).manifest()["rollup_complete"] is False
    # ...but a rebuild-arm refresh (rewrite-shaped base diff) re-sketches
    # the full head and restores the covenant
    cat.compact(spark, target_files=1)
    refresh_rollup(spark, cat, bad_root, 300, ["metric_name"],
                   transform=complete, transform_complete=True)
    assert SnapshotCatalog(bad_root).manifest()["rollup_complete"] is True


def test_cascade_inherits_completeness_covenant(spark, tmp_path):
    """r13 review finding 1: a cascade must never launder the
    completeness covenant away — a coarse tier folded from an incomplete
    fine tier is itself incomplete (moment cascades AND sketch
    cascades), and the engine excludes it from transparent serving."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.quantile_sketch import (
        cascade_quantile_sketch,
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.operators.rollup import (
        cascade_rollup,
        refresh_rollup,
    )
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    START = 1_704_067_200
    src = spark.range(0, 2000).select(
        (
            F.lit(START * 1_000_000_000) + (F.col("id") % 3600) * F.lit(10**9)
        ).alias("ts_ns"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("name"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    path = str(tmp_path / "metrics")
    write_metrics(normalize_to_metrics(src, "ts_ns", "name", "v"), path,
                  mode="overwrite")
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    filtering = lambda df: df.withColumn("value", value_expr()).filter(
        F.col("metric_name") == "s0"
    )  # noqa: E731

    # moment cascade: incomplete fine -> incomplete coarse
    fine = str(tmp_path / "r300")
    refresh_rollup(spark, cat, fine, 300, ["metric_name"],
                   transform=filtering)
    assert SnapshotCatalog(fine).manifest()["rollup_complete"] is False
    coarse = str(tmp_path / "r3600")
    cascade_rollup(spark, fine, coarse, 3600, ["metric_name"])
    assert SnapshotCatalog(coarse).manifest()["rollup_complete"] is False
    eng = CardinalSin(spark, path).attach_rollup(coarse)
    st = eng.rollup_status()[0]
    assert not st["eligible"] and "rollup_complete" in st["reason"], st

    # sketch cascade: same inheritance
    sfine = str(tmp_path / "qs300")
    refresh_quantile_sketch(spark, cat, sfine, 300, ["metric_name"], 0.01,
                            transform=filtering)
    assert SnapshotCatalog(sfine).manifest()["rollup_complete"] is False
    scoarse = str(tmp_path / "qs3600")
    cascade_quantile_sketch(spark, sfine, scoarse, 3600, ["metric_name"],
                            0.01)
    assert SnapshotCatalog(scoarse).manifest()["rollup_complete"] is False
    eng2 = CardinalSin(spark, path)
    eng2.attach_quantile_sketch(scoarse, 3600, alpha=0.01)
    st = eng2.sketch_status()[0]
    assert not st["eligible"] and "rollup_complete" in st["reason"], st


def test_union_refuses_custom_transform(spark, tmp_path):
    """r13 review finding 4: the fresh='union' delta arms shape the CDC
    delta with the engine's CANONICAL value reshape — a table maintained
    with a custom (even row-preserving) transform must refuse union
    serving rather than mix incompatible values; the canonical reshape
    (transform_canonical=True) keeps serving."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.rollup import refresh_rollup
    from cardinalsin_spark.schema import value_expr
    from cardinalsin_spark.sources.ingest import normalize_to_metrics, write_metrics
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    START = 1_704_067_200

    def src(lo, hi):
        return spark.range(lo, hi).select(
            (
                F.lit(START * 1_000_000_000) + F.col("id") * F.lit(10**9)
            ).alias("ts_ns"),
            F.lit("s0").alias("name"),
            (F.col("id") % 7).cast("double").alias("v"),
        )

    path = str(tmp_path / "metrics")
    write_metrics(normalize_to_metrics(src(0, 1200), "ts_ns", "name", "v"),
                  path, mode="overwrite")
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    # a CUSTOM value reshape: row-preserving (complete) but NOT the
    # canonical value_expr the union delta arm applies
    scaled = lambda df: df.withColumn(
        "value", value_expr() / F.lit(1000.0)
    )  # noqa: E731
    ru = str(tmp_path / "ru_custom")
    refresh_rollup(spark, cat, ru, 300, ["metric_name"], transform=scaled,
                   transform_complete=True)
    assert SnapshotCatalog(ru).manifest()["rollup_transform"] == "custom"
    eng = CardinalSin(spark, path).attach_rollup(ru, fresh="union")
    # stale it with an append
    import os
    import shutil

    stage = str(tmp_path / "stage")
    normalize_to_metrics(src(1200, 1500), "ts_ns", "name", "v").coalesce(
        1
    ).write.parquet(stage)
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            shutil.move(os.path.join(stage, f),
                        os.path.join(path, f"x-{i}.parquet"))
    cat.commit_new_files()
    st = eng.rollup_status()[0]
    assert not st["eligible"] and "custom transform" in st["reason"], st
    assert eng._route_rollups() == []
    # the canonical twin keeps union-serving on the same base state
    eng2 = CardinalSin(spark, path)
    ru2 = str(tmp_path / "ru_canon")
    # refresh from the PRE-append state is gone; bootstrap now and
    # append again so the rollup genuinely lags
    eng2.refresh_rollup(ru2, 300, series_cols=["metric_name"])
    stage2 = str(tmp_path / "stage2")
    normalize_to_metrics(src(1500, 1800), "ts_ns", "name", "v").coalesce(
        1
    ).write.parquet(stage2)
    for i, f in enumerate(sorted(os.listdir(stage2))):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            shutil.move(os.path.join(stage2, f),
                        os.path.join(path, f"y-{i}.parquet"))
    cat.commit_new_files()
    eng2.attach_rollup(ru2, fresh="union")
    st2 = eng2.rollup_status()[0]
    assert st2["eligible"] and "rollup ∪ downsampled delta" in st2["reason"]


def test_from_sketch_rejects_sample_column_args(spark, tmp_path):
    """r13 review finding 7: from_sketch=True must loud-reject
    ts_col/value_col (the docstring's promise), not silently ignore
    them."""
    from cardinalsin_spark.operators.quantile_sketch import (
        refresh_quantile_sketch,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    fake = SnapshotCatalog(str(tmp_path / "nothing"))
    with pytest.raises(FileNotFoundError):
        refresh_quantile_sketch(
            spark, fake, str(tmp_path / "out"), 600, ["metric_name"],
            from_sketch=True,
        )
    # the column-arg rejection fires before any base read
    import os

    os.makedirs(str(tmp_path / "nothing"), exist_ok=True)
    with pytest.raises(ValueError, match="ts_col/value_col"):
        refresh_quantile_sketch(
            spark, _FakeBase(), str(tmp_path / "out"), 600, ["metric_name"],
            from_sketch=True, ts_col="event_ts",
        )


class _FakeBase:
    root = "/nonexistent"

    def current_version(self):
        return 0

    def manifest(self, v):
        return {"rollup_resolution_s": 300, "sketch_alpha": 0.01,
                "rollup_complete": True}


# ---------------------------------------------------------------------------
# ADVICE r13 regressions
# ---------------------------------------------------------------------------

START_R14 = 1_704_067_200  # 2024-01-01 00:00:00 UTC


def _r14_src(spark, lo, hi, name="s0"):
    return spark.range(lo, hi).select(
        (
            F.lit(START_R14 * 1_000_000_000) + F.col("id") * F.lit(10**9)
        ).alias("ts_ns"),
        F.lit(name).alias("name"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def _r14_append(spark, path, cat, lo, hi, tag):
    import os
    import shutil

    from cardinalsin_spark.sources.ingest import normalize_to_metrics

    stage = path + f"_stage_{tag}"
    normalize_to_metrics(
        _r14_src(spark, lo, hi), "ts_ns", "name", "v"
    ).coalesce(1).write.parquet(stage)
    moved = 0
    # walk: robust to a hive-partitioned staging layout (r14 review —
    # a flat listdir would silently move nothing and the test would
    # vacuously pass on unstale data)
    for sroot, _, files in os.walk(stage):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                shutil.move(
                    os.path.join(sroot, f),
                    os.path.join(path, f"{tag}-{moved}.parquet"),
                )
                moved += 1
    assert moved, f"staging write produced no parquet files under {stage}"
    shutil.rmtree(stage, ignore_errors=True)
    cat.commit_new_files()


def test_union_refuses_custom_transform_cascade(spark, tmp_path):
    """ADVICE r13 #1: the union-unsafe (rollup_transform='custom')
    refusal previously guarded only the DIRECT union arm — a stale
    moments-CASCADE tier maintained with a custom transform still served
    under fresh='union' through the invalidation recompute, which folds
    parent rows with NO transform (mixing custom-shaped stored rows with
    canonical recomputed ones). Both union arms must refuse; the
    transform-free cascade twin on the same state keeps serving."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.rollup import refresh_rollup
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "metrics")
    write_metrics(
        normalize_to_metrics(_r14_src(spark, 0, 1200), "ts_ns", "name", "v"),
        path,
        mode="overwrite",
    )
    cat = SnapshotCatalog(path)
    cat.init_from_directory()
    eng = CardinalSin(spark, path)
    fine = str(tmp_path / "ru_fine")
    eng.refresh_rollup(fine, 300, series_cols=["metric_name"])
    # CUSTOM moments transform (row-preserving, hence complete): scales
    # the stored sums — fresh='union' recompute could never reproduce it
    scaled = lambda df: df.withColumn(  # noqa: E731
        "sum_value", F.col("sum_value") / F.lit(1000.0)
    )
    coarse = str(tmp_path / "ru_coarse_custom")
    refresh_rollup(
        spark, SnapshotCatalog(fine), coarse, 3600, ["metric_name"],
        moments=True, transform=scaled, transform_complete=True,
    )
    assert SnapshotCatalog(coarse).manifest()["rollup_transform"] == "custom"
    coarse2 = str(tmp_path / "ru_coarse_clean")
    refresh_rollup(
        spark, SnapshotCatalog(fine), coarse2, 3600, ["metric_name"],
        moments=True,
    )
    # stale both coarse tiers at their parent link: append to metrics,
    # refresh the fine tier (parent chain fresh, coarse tiers lag)
    _r14_append(spark, path, cat, 1200, 1500, "x")
    eng.refresh_rollup(fine, 300, series_cols=["metric_name"])
    probe = CardinalSin(spark, path)
    probe.attach_rollup(coarse, 3600, fresh="union")
    probe.attach_rollup(coarse2, 3600, fresh="union")
    st = {s["path"]: s for s in probe.rollup_status()}
    assert not st[coarse]["eligible"], st[coarse]
    assert "custom transform" in st[coarse]["reason"], st[coarse]
    # the clean twin proves the cascade union arm WOULD have served —
    # i.e. the refusal above is the only thing standing in the way
    assert st[coarse2]["eligible"], st[coarse2]
    assert "recompute" in st[coarse2]["reason"], st[coarse2]
    assert [r for r, _, _ in probe._route_rollups()] == [3600]


def test_qsketch_eviction_state_protocol(tmp_path):
    """ADVICE r13 #2: streaming_quantile_sketch's state store grew one
    key per (metric, bucket) forever under NoTimeout. The evict_after_s
    horizon arms a processing-time timeout — the timed-out invocation
    must drop the key's state and emit nothing; live invocations must
    re-arm the timeout after every update."""
    import pandas as pd

    from cardinalsin_spark.streaming.live import _qsketch_fn_factory

    class _FakeState:
        def __init__(self, exists=False, got=None, timed_out=False):
            self.exists = exists
            self.get = got
            self.hasTimedOut = timed_out
            self.removed = False
            self.updated = None
            self.timeout_ms = None

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    fn = _qsketch_fn_factory(90_000)
    # timed-out invocation: state dropped, nothing emitted
    st = _FakeState(exists=True, got=([3], [7]), timed_out=True)
    assert list(fn(("m", 0), iter([]), st)) == []
    assert st.removed and st.updated is None
    # live invocation: counts fold and the timeout re-arms
    st2 = _FakeState(exists=True, got=([3], [7]))
    out = list(fn(("m", 0), iter([pd.DataFrame({"_slot": [3, 4]})]), st2))
    assert st2.updated == ([3, 4], [8, 1]) and st2.timeout_ms == 90_000
    assert len(out) == 1 and list(out[0]["qcount"]) == [8, 1]
    # the NoTimeout default never touches the timeout API
    fn0 = _qsketch_fn_factory(None)
    st3 = _FakeState(exists=False)
    list(fn0(("m", 0), iter([pd.DataFrame({"_slot": [1]})]), st3))
    assert st3.timeout_ms is None and not st3.removed
    # r14 review finding: a straggler for a bucket ALREADY past the
    # horizon (no live state, bucket end older than evict_ms) is
    # dropped — restarting the key would re-emit a partial count that
    # supersedes the bucket's correct final emission
    import time

    fn2 = _qsketch_fn_factory(90_000, 600 * 1_000_000)
    old_bucket_us = int((time.time() - 3600) * 1e6)
    st4 = _FakeState(exists=False)
    out = list(
        fn2(("m", old_bucket_us), iter([pd.DataFrame({"_slot": [3]})]), st4)
    )
    assert out == [] and st4.updated is None and not st4.removed
    # a CURRENT bucket with no state is simply new — it folds normally
    new_bucket_us = int(time.time() * 1e6)
    st5 = _FakeState(exists=False)
    out = list(
        fn2(("m", new_bucket_us), iter([pd.DataFrame({"_slot": [3]})]), st5)
    )
    assert len(out) == 1 and st5.updated == ([3], [1])


def test_jobs_sketch_cascade_preserves_column_order(spark, tmp_path, capsys):
    """ADVICE r13 #3: the --from-sketch arm derived series columns as a
    sorted set difference, alphabetizing the coarse tier's layout away
    from the fine sketch's metric_name-first order. The tiers must stay
    column-order-identical."""
    from cardinalsin_spark import jobs
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    path = str(tmp_path / "m")
    # a label ("host") that sorts BEFORE metric_name alphabetically
    src = _r14_src(spark, 0, 600).withColumn("host", F.lit("h1"))
    write_metrics(
        normalize_to_metrics(src, "ts_ns", "name", "v",
                             label_cols={"host": "host"}),
        path, mode="overwrite",
    )
    SnapshotCatalog(path).init_from_directory()
    fine, coarse = str(tmp_path / "qs300"), str(tmp_path / "qs3600")
    assert jobs.main(
        ["sketch-refresh", "--path", path, "--out", fine,
         "--resolution-s", "300"]
    ) == 0
    assert jobs.main(
        ["sketch-refresh", "--path", fine, "--out", coarse,
         "--resolution-s", "3600", "--from-sketch"]
    ) == 0
    capsys.readouterr()
    fine_cols = SnapshotCatalog(fine).read(spark).columns
    coarse_cols = SnapshotCatalog(coarse).read(spark).columns
    assert fine_cols.index("metric_name") < fine_cols.index("host")
    assert coarse_cols == fine_cols, (fine_cols, coarse_cols)


def test_quantile_approx_rejected_query_not_logged(spark, tmp_path):
    """ADVICE r13 #4: quantile_approx logged the range to the advisor
    BEFORE rejecting offset/@ modifiers, so erroring queries counted as
    servable quantile workload and skewed recommend_rollups tallies."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import (
        normalize_to_metrics,
        write_metrics,
    )

    path = str(tmp_path / "m")
    write_metrics(
        normalize_to_metrics(_r14_src(spark, 0, 60), "ts_ns", "name", "v"),
        path, mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    with pytest.raises(ValueError, match="offset/@"):
        eng.quantile_approx("s0 offset 5m", 0.9, START_R14,
                            START_R14 + 600, 300)
    assert eng._range_log == []
    assert eng.recommend_rollups() == []
    # a valid evaluation still feeds the advisor
    eng.quantile_approx("s0", 0.9, START_R14, START_R14 + 600 - 1, 300)
    assert len(eng._range_log) == 1 and eng._range_log[0][3] == "quantile"

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

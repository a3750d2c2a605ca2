"""Structured Streaming slice: historical+live merge semantics, windowed
aggregation vs batch equivalence, live filters, and stateful counter
increase across micro-batches.

Streams are driven deterministically: chunk files written in time order,
``availableNow``/``maxFilesPerTrigger`` triggers, memory sinks.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cardinalsin_spark.schema import value_expr
from cardinalsin_spark.sources.ingest import normalize_to_metrics
from cardinalsin_spark.sources.tables import load_table
from cardinalsin_spark.streaming import (
    historical_live_merge,
    live_filter,
    read_metrics_stream,
    stateful_counter_increase,
    windowed_agg,
)


@pytest.fixture(scope="module")
def metrics_df(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return normalize_to_metrics(
        ev, ts_col="ts_ns", name_col="event_type", value_col="value"
    ).cache()


@pytest.fixture(scope="module")
def chunk_dir(metrics_df, tmp_path_factory):
    """Two time-ordered chunk files (early half / late half) — simulates the
    ingester flushing chunks over time."""
    base = tmp_path_factory.mktemp("stream_chunks")
    split = metrics_df.approxQuantile("ts_ns", [0.5], 0.0)[0]
    early = metrics_df.filter(F.col("ts_ns") <= split)
    late = metrics_df.filter(F.col("ts_ns") > split)
    for i, part in enumerate([early, late]):
        d = str(base / f"tmp{i}")
        part.coalesce(1).write.parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = str(base / f"chunk_{i}.parquet")
        os.rename(os.path.join(d, src), dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    for name in os.listdir(base):
        full = os.path.join(base, name)
        if os.path.isdir(full):
            import shutil

            shutil.rmtree(full)
    return str(base)


def _run_stream(sdf, mode: str, tmp_path, trigger_kwargs=None):
    name = f"sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(**(trigger_kwargs or {"availableNow": True}))
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return name


def test_windowed_agg_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    sdf = read_metrics_stream(spark, chunk_dir)
    agg = windowed_agg(sdf, width="1 hour", watermark="1 minute")
    name = _run_stream(agg, "complete", tmp_path)
    got = {
        (r.window.start, r.metric_name): (r.sample_count, r.sum_value)
        for r in spark.table(name).collect()
    }
    expected = (
        metrics_df.withColumn("value", value_expr())
        .groupBy(F.window("timestamp", "1 hour").alias("window"), "metric_name")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert len(got) == len(expected) > 0
    for r in expected:
        n, s = got[(r.window.start, r.metric_name)]
        assert n == r.n
        assert s == pytest.approx(r.s, rel=1e-9)


def test_live_filter_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    pred = "metric_name = 'click' AND value_f64 > 50"
    sdf = live_filter(read_metrics_stream(spark, chunk_dir), pred)
    name = _run_stream(sdf, "append", tmp_path)
    assert spark.table(name).count() == metrics_df.filter(F.expr(pred)).count()


def test_historical_live_merge_no_double_count(spark, metrics_df):
    """Rows present in both stores must count once: live rows below the
    merge timestamp are dropped (reference query/streaming.rs:109-161)."""
    cut = metrics_df.approxQuantile("ts_ns", [0.7], 0.0)[0]
    cut_ts = metrics_df.filter(F.col("ts_ns") == cut).select("timestamp").first()[0]
    historical = metrics_df  # everything flushed so far
    live = metrics_df.filter(
        F.col("ts_ns") >= metrics_df.approxQuantile("ts_ns", [0.4], 0.0)[0]
    )  # overlapping tail
    merged = historical_live_merge(historical, live, cut_ts)
    n_hist = metrics_df.filter(F.col("timestamp") < cut_ts).count()
    n_live = live.filter(F.col("timestamp") >= cut_ts).count()
    assert merged.count() == n_hist + n_live == metrics_df.count()


def test_stateful_counter_increase(spark, metrics_df, chunk_dir, tmp_path):
    """State carries across micro-batches: total emitted increase equals the
    batch lag-window computation (reset-aware) over the full series."""
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    inc = stateful_counter_increase(sdf)
    name = _run_stream(inc, "append", tmp_path)
    got = {
        r.metric_name: r.total
        for r in spark.table(name)
        .groupBy("metric_name")
        .agg(F.sum("batch_increase").alias("total"))
        .collect()
    }
    assert len(got) > 0

    w = Window.partitionBy("metric_name").orderBy("ts_ns", "value")
    expected = {
        r.metric_name: r.total
        for r in metrics_df.withColumn("value", value_expr())
        .withColumn("prev", F.lag("value").over(w))
        .withColumn(
            "inc",
            F.when(F.col("prev").isNull(), F.lit(0.0)).when(
                F.col("value") < F.col("prev"), F.col("value")
            ).otherwise(F.col("value") - F.col("prev")),
        )
        .groupBy("metric_name")
        .agg(F.sum("inc").alias("total"))
        .collect()
    }
    for m, total in expected.items():
        assert got[m] == pytest.approx(total, rel=1e-9), m


def test_streaming_dedup_within_watermark(spark, metrics_df, tmp_path):
    """Dual-write dedup: two chunk files carrying the SAME rows (a dual
    write) collapse to one occurrence per (timestamp, metric_name) —
    reference query/dedup.rs:22-113, state bounded by the watermark here."""
    from cardinalsin_spark.streaming import streaming_dedup

    base = tmp_path / "dup_chunks"
    os.makedirs(base)
    sample = metrics_df.limit(500)
    for i in range(2):  # same rows written twice = dual write
        d = str(tmp_path / f"w{i}")
        sample.coalesce(1).write.parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, src), str(base / f"chunk_{i}.parquet"))
    sdf = read_metrics_stream(spark, str(base))
    dedup = streaming_dedup(sdf)
    name = _run_stream(dedup, "append", tmp_path)
    got = spark.table(name).count()
    expected = sample.select("timestamp", "metric_name").distinct().count()
    assert got == expected
    # sanity: without dedup the stream carries both copies
    assert 2 * sample.count() > got


def test_stream_enrich_matches_batch_join(spark, metrics_df, chunk_dir, tmp_path):
    """Stream-static enrichment: every live row picks up its dimension
    attributes; totals equal the equivalent batch broadcast join."""
    from cardinalsin_spark.streaming import stream_enrich

    dim = spark.createDataFrame(
        [("click", "ui"), ("view", "ui"), ("purchase", "commerce"),
         ("signup", "growth"), ("error", "ops")],
        "metric_name string, category string",
    )
    sdf = stream_enrich(read_metrics_stream(spark, chunk_dir), dim,
                        on=["metric_name"])
    name = _run_stream(sdf, "append", tmp_path)
    got = {
        r.category: r.n
        for r in spark.table(name)
        .groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expected = {
        r.category: r.n
        for r in metrics_df.join(dim, on=["metric_name"], how="left")
        .groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected and sum(got.values()) == metrics_df.count()


def test_stream_interval_join_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """Watermarked stream-stream interval join equals the batch interval
    join: every purchase pairs with same-bucket clicks in the lookback."""
    from cardinalsin_spark.streaming import stream_interval_join

    purchases = read_metrics_stream(spark, chunk_dir).filter(
        F.col("metric_name") == "purchase"
    )
    clicks = read_metrics_stream(spark, chunk_dir).filter(
        F.col("metric_name") == "click"
    )
    # join key: shared hour-of-stream via the date column? use metric-free
    # key: user label is absent in this fixture, so join on the hour bucket
    lk = "30 minutes"
    l2 = purchases.withColumn("hour_key", F.date_trunc("hour", "timestamp"))
    r2 = clicks.withColumn("hour_key", F.date_trunc("hour", "timestamp"))
    joined = stream_interval_join(l2, r2, on=["hour_key"], lookback=lk)
    name = _run_stream(
        joined.select("timestamp", "timestamp_r"), "append", tmp_path
    )
    got = spark.table(name).count()

    lb = metrics_df.filter(F.col("metric_name") == "purchase").withColumn(
        "hour_key", F.date_trunc("hour", "timestamp")
    ).select("hour_key", "timestamp")
    rb = (
        metrics_df.filter(F.col("metric_name") == "click")
        .withColumn("hour_key", F.date_trunc("hour", "timestamp"))
        .select(
            F.col("hour_key").alias("hk2"), F.col("timestamp").alias("ts2")
        )
    )
    expected = lb.join(
        rb,
        (F.col("hour_key") == F.col("hk2"))
        & (F.col("ts2") <= F.col("timestamp"))
        & (F.col("ts2") >= F.col("timestamp") - F.expr(f"INTERVAL {lk}")),
    ).count()
    assert got == expected and expected > 0


def test_wire_ingest_stream_otlp_matches_batch(spark, tmp_path):
    """Streaming OTLP-protobuf ingest (file-source payload stream decoded
    per micro-batch) must produce exactly the batch decoder's rows."""
    from cardinalsin_spark.sources.otlp import otlp_proto_flatten
    from cardinalsin_spark.streaming.live import wire_ingest_stream
    from tests.test_ingest_adapters import (
        _any_string,
        _export_request,
        _metric,
        _number_point,
    )

    p1 = _export_request(
        [("env", _any_string("prod"))],
        [_metric("m1", 5, [_number_point(1_000, as_double=1.5)])],
    )
    p2 = _export_request(
        [],
        [_metric("m2", 7, [_number_point(2_000, as_int=7)]),
         _metric("m3", 9, [])],
    )
    src = str(tmp_path / "payloads")
    batch_df = spark.createDataFrame(
        [(bytearray(p1),), (bytearray(p2),)], "payload binary"
    )
    batch_df.write.parquet(src)

    sdf = wire_ingest_stream(spark, src, wire_format="otlp_proto")
    assert sdf.isStreaming
    query = (
        sdf.writeStream.format("memory")
        .queryName("wire_ingest_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(60)
    got = {
        (r.ts_ns, r.metric_name, r.value)
        for r in spark.sql("SELECT * FROM wire_ingest_t").collect()
    }
    expected = {
        (r.ts_ns, r.metric_name, r.value)
        for r in otlp_proto_flatten(batch_df).collect()
    }
    assert got == expected and len(got) == 2


def test_wire_ingest_stream_remote_write_matches_batch(spark, tmp_path):
    """The remote-write variant of the streaming wire ingest: same
    decode-per-micro-batch contract as the OTLP one."""
    from cardinalsin_spark.sources.remote_write import remote_write_flatten
    from cardinalsin_spark.streaming.live import wire_ingest_stream
    from tests.test_ingest_adapters import _write_request

    payload = _write_request(
        [
            ({"__name__": "cpu", "host": "a"}, [(0.5, 1_000), (0.7, 2_000)]),
            ({"__name__": "mem", "host": "b"}, [(123.0, 3_000)]),
        ]
    )
    src = str(tmp_path / "rw_payloads")
    batch_df = spark.createDataFrame(
        [(bytearray(payload),)], "payload binary"
    )
    batch_df.write.parquet(src)

    sdf = wire_ingest_stream(spark, src, wire_format="remote_write")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("rw_ingest_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.ts_ms, r.metric_name, r.value)
        for r in spark.sql("SELECT * FROM rw_ingest_t").collect()
    }
    want = {
        (r.ts_ms, r.metric_name, r.value)
        for r in remote_write_flatten(batch_df).collect()
    }
    assert got == want and len(got) == 3


def test_streaming_hll_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """HLL mergeability end-to-end: the stream's LAST emitted estimate per
    metric (registers accumulated across micro-batches in the state store)
    must be bit-equal to the batch sketch over the same rows."""
    from cardinalsin_spark.operators.sketches import hll_distinct
    from cardinalsin_spark.streaming import streaming_hll_distinct

    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    est = streaming_hll_distinct(sdf.withColumn("value", value_expr()), "value")
    name = _run_stream(est, "append", tmp_path)
    rows = spark.table(name).collect()
    assert rows
    # last emission per metric = the full-data estimate
    last = {}
    for i, r in enumerate(rows):
        last[r.metric_name] = r
    for metric, r in last.items():
        batch = hll_distinct(
            metrics_df.filter(F.col("metric_name") == metric)
            .withColumn("value", value_expr())
            .select(F.col("value").cast("string").alias("v")),
            "v",
            p=5,
        ).collect()[0]
        assert r.n_distinct_est == batch.n_distinct_est, metric
        assert r.n_registers_hit == batch.n_registers_hit, metric


def test_streaming_heavy_hitters_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """With the candidate cap above the live vocabulary, the stream's final
    top-k per metric equals the batch CMS top-k (counters are additive
    across micro-batches)."""
    from cardinalsin_spark.operators.sketches import cms_estimates
    from cardinalsin_spark.streaming import streaming_heavy_hitters

    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    vals = sdf.withColumn("value", value_expr())
    hh = streaming_heavy_hitters(vals, "value", k=5, candidates=10_000)
    name = _run_stream(hh, "append", tmp_path)
    rows = spark.table(name).collect()
    assert rows
    # keep each metric's LAST emitted top-k (emissions are appended in
    # batch order; later rows overwrite earlier ranks per metric)
    last: dict = {}
    for r in rows:
        last.setdefault(r.metric_name, {})[r.rank] = (r.term, r.cms_est)
    for metric, by_rank in last.items():
        batch = (
            cms_estimates(
                metrics_df.filter(F.col("metric_name") == metric)
                .withColumn("value", value_expr())
                .select(F.col("value").cast("string").alias("term")),
                "term",
            )
            .orderBy(F.desc("cms_est"), F.asc("term"))
            .limit(5)
            .collect()
        )
        want = {i + 1: (r.term, r.cms_est) for i, r in enumerate(batch)}
        assert by_rank == want, metric


def test_stateful_ewma_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """State carries the last ≤8 samples across micro-batches: the final
    emitted EWMA per series must be BIT-equal to the batch dyadic formula
    over that series' last 8 samples (same exact-int num/den, same single
    division)."""
    from cardinalsin_spark.streaming import stateful_ewma

    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    out = stateful_ewma(sdf)
    name = _run_stream(out, "append", tmp_path)
    got = {
        r.metric_name: r.ewma
        for r in spark.table(name)
        .groupBy("metric_name")
        .agg(F.expr("max_by(ewma, last_ts_ns)").alias("ewma"))
        .collect()
    }
    assert len(got) > 0

    K = 8
    pdf = (
        metrics_df.withColumn("value", value_expr())
        .withColumn("vc", F.round(F.col("value") * 100).cast("long"))
        .select("metric_name", "ts_ns", "vc")
        .toPandas()
        .sort_values(["ts_ns", "vc"])
    )
    for m, grp in pdf.groupby("metric_name"):
        vals = [int(v) for v in grp["vc"].dropna()][-K:]
        num = den = 0
        for j, v in enumerate(reversed(vals)):
            w = 1 << (K - 1 - j)
            num += v * w
            den += w
        assert got[m] == num / den / 100.0, m


def test_stateful_ewma_skips_null_samples():
    """A null value sample (NaN after Arrow→pandas) must be skipped, not
    crash the state function (review finding, r5)."""
    import numpy as np
    import pandas as pd

    from cardinalsin_spark.streaming.live import _ewma_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.saved = v

    st = FakeState()
    pdf = pd.DataFrame(
        {
            "series_id": [1, 1, 1],
            "metric_name": ["m", "m", "m"],
            "ts_ns": [10, 20, 30],
            "value_cents": pd.array([100.0, np.nan, 300.0], dtype="float64"),
        }
    )
    rows = list(_ewma_fn((1,), iter([pdf]), st))
    assert len(rows) == 1
    out = rows[0]
    assert out["n_samples"][0] == 2  # the NaN sample skipped
    assert st.saved[0] == [100, 300]
    # ewma of [100(old), 300(new)] with weights 64,128 → exact
    assert out["ewma"][0] == (300 * 128 + 100 * 64) / (128 + 64) / 100.0


def test_streaming_kmv_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """KMV mergeability end-to-end: the stream's LAST emitted estimate and
    kth hash per metric (bottom-k state merged across micro-batches) must
    be bit-equal to the batch sketch over the same rows — INCLUDING on
    null-bearing input (ADVICE r7 #5: the batch sketch used to let a null
    consume a slot while the twin skipped None)."""
    from cardinalsin_spark.operators.sketches import kmv_bottomk
    from cardinalsin_spark.streaming import streaming_kmv_distinct

    k = 8
    # identical nullable value on both sides: every 7th distinct value nulls
    nullable = F.when(
        F.floor(value_expr()) % 7 != 0, value_expr()
    )  # otherwise → NULL
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    est = streaming_kmv_distinct(
        sdf.withColumn("value", nullable), "value", k=k
    )
    name = _run_stream(est, "append", tmp_path)
    rows = spark.table(name).collect()
    assert rows
    last = {}
    for r in rows:
        last[r.metric_name] = r
    nulled = metrics_df.withColumn("value", nullable)
    assert nulled.filter(F.col("value").isNull()).count() > 0  # fixture bites
    batch = kmv_bottomk(
        nulled,
        ["metric_name"],
        "value",
        k=k,
    ).collect()
    by_metric: dict = {}
    for b in batch:
        by_metric.setdefault(b.metric_name, []).append(b)
    assert set(last) == set(by_metric)
    for metric, r in last.items():
        bb = sorted(by_metric[metric], key=lambda x: x.rank)
        assert r.sketch_size == len(bb), metric
        assert r.kth_hash == bb[-1].h, metric
        assert r.n_distinct_est == bb[-1].n_distinct_est, metric


def test_streaming_sessionize_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """Sessionize twin: the last emission per (metric, session_idx) —
    closed sessions as they close, the open session's snapshot every
    batch — must be bit-equal to the batch operator over the same rows,
    including sessions that SPAN the micro-batch boundary."""
    from cardinalsin_spark.operators.timeseries import MetricsCols, sessionize
    from cardinalsin_spark.streaming import streaming_sessionize

    gap_s = 14400  # 4h: several sessions per metric at sf0.001 density
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    name = _run_stream(
        streaming_sessionize(sdf, gap_seconds=gap_s), "append", tmp_path
    )
    rows = spark.table(name).collect()
    assert rows
    last = {}
    for r in rows:  # memory sink preserves emission order; keep the last
        last[(r.metric_name, r.session_idx)] = r

    batch = sessionize(
        metrics_df, gap_s, key_cols=["metric_name"], cols=MetricsCols()
    ).withColumn("start_us", F.unix_micros("session_start")).withColumn(
        "end_us", F.unix_micros("session_end")
    ).collect()
    assert len(batch) > len({b.metric_name for b in batch})  # >1 session/key
    assert set(last) == {(b.metric_name, b.session_idx) for b in batch}
    max_idx = {}
    for b in batch:
        max_idx[b.metric_name] = max(max_idx.get(b.metric_name, -1), b.session_idx)
    for b in batch:
        r = last[(b.metric_name, b.session_idx)]
        assert (r.start_us, r.end_us, r.n_events) == (
            b.start_us, b.end_us, b.n_events
        ), (b.metric_name, b.session_idx)
        # every session except the final open one closed on-stream
        assert r.closed == (b.session_idx != max_idx[b.metric_name])
    # sessions genuinely span the two chunk files: at least one closed
    # session must have been emitted in the SECOND batch (idx > 0 exists)
    assert any(idx > 0 for (_, idx) in last)


def test_streaming_le_buckets_matches_batch(spark, metrics_df, chunk_dir, tmp_path):
    """Histogram-bucket twin: counts merge by addition across micro-batches,
    so the stream's LAST emitted cumulative grid per metric must be
    bit-equal to operators.promql.cumulative_le_buckets over the same
    rows — including on null-bearing input (a NULL sample is no sample on
    BOTH sides; the batch operator used to fall through its when-chain
    and count nulls into +Inf)."""
    from cardinalsin_spark.operators.promql import LE_INF, cumulative_le_buckets
    from cardinalsin_spark.queries import cents
    from cardinalsin_spark.streaming import streaming_le_buckets

    les = [1000, 2500, 5000, 10000, 20000, 50000]
    nullable = F.when(F.floor(value_expr()) % 7 != 0, cents(value_expr()))
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    est = streaming_le_buckets(
        sdf.withColumn("value_cents", nullable), "value_cents", les
    )
    name = _run_stream(est, "append", tmp_path)
    rows = spark.table(name).collect()
    assert rows
    last: dict = {}
    for r in rows:  # memory sink preserves emission order: later wins
        last[(r.metric_name, r.le)] = r.cum
    nulled = metrics_df.withColumn("value_cents", nullable)
    assert nulled.filter(F.col("value_cents").isNull()).count() > 0
    batch = {
        (b.metric_name, b.le): b.cum
        for b in cumulative_le_buckets(
            nulled, ["metric_name"], "value_cents", les
        ).collect()
    }
    assert last == batch
    # the grid is dense: every metric carries every bound + the Inf row
    metrics = {m for m, _ in batch}
    assert len(batch) == len(metrics) * (len(les) + 1)
    assert all((m, LE_INF) in batch for m in metrics)


def test_snapshot_ingest_sink_versions_and_idempotency(
    spark, metrics_df, chunk_dir, tmp_path
):
    """Streaming ingest lands one snapshot version per micro-batch
    (readable per-batch via read_changes), total row count matches the
    source, and a REPLAYED batch (same batch_id re-delivered after a
    crash) commits nothing — the manifest's stream_batch_id makes the
    sink idempotent."""
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog
    from cardinalsin_spark.streaming import snapshot_ingest_sink

    root = str(tmp_path / "snaptbl")
    os.makedirs(root)
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    sink = snapshot_ingest_sink(root)
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    cat = SnapshotCatalog(root)
    versions = cat.versions()
    assert len(versions) == 2  # two chunk files, one batch each
    total = metrics_df.count()
    assert cat.read(spark).count() == total
    per_batch = [
        cat.read_changes(spark, None, 0).count(),
        cat.read_changes(spark, 0, 1).count(),
    ]
    assert sum(per_batch) == total and all(n > 0 for n in per_batch)
    assert cat.manifest(1)["stream_batch_id"] == 1
    # replay the LAST batch: nothing must change (idempotent sink)
    head_before = cat.current_version()
    sink(cat.read_changes(spark, 0, 1), 1)
    assert cat.current_version() == head_before
    # a genuinely new batch commits
    sink(cat.read_changes(spark, 0, 1).limit(5), 2)
    assert cat.current_version() == head_before + 1
    assert cat.read(spark).count() == total + 5


def test_streaming_quantile_sketch_matches_batch(
    spark, metrics_df, chunk_dir, tmp_path
):
    """Quantile-sketch twin (VERDICT r12 item 6, the eighth batch/stream
    twin): slot counts merge by addition across micro-batches, so the
    stream's LAST emitted (slot, count) grid per (metric, bucket) must be
    bit-equal to downsample_quantile_sketch over the same rows — the slot
    is computed Spark-side with the SAME column expression on both paths,
    so libm drift cannot split a value across slots. NULL values count
    under the NULL_SLOT sentinel on both sides (complete-downsample
    property)."""
    from cardinalsin_spark.operators.quantile_sketch import (
        downsample_quantile_sketch,
    )
    from cardinalsin_spark.streaming import streaming_quantile_sketch

    nullable = F.when(F.floor(value_expr()) % 7 != 0, value_expr())
    sdf = read_metrics_stream(spark, chunk_dir, max_files_per_trigger=1)
    est = streaming_quantile_sketch(
        sdf.withColumn("value", nullable), 3600, alpha=0.01
    )
    name = _run_stream(est, "append", tmp_path)
    rows = spark.table(name).collect()
    assert rows
    last: dict = {}
    for r in rows:  # memory sink preserves emission order: later wins
        last[(r.metric_name, r.bucket_us, r.qslot)] = r.qcount
    nulled = metrics_df.withColumn("value", nullable)
    assert nulled.filter(F.col("value").isNull()).count() > 0
    batch = {
        (b.metric_name, b.bucket_us, b.qslot): b.qcount
        for b in downsample_quantile_sketch(
            nulled, 3600, ["metric_name"], 0.01
        )
        .withColumn("bucket_us", F.unix_micros("bucket"))
        .collect()
    }
    assert last == batch
    # the sketch is a COMPLETE downsample: total counts equal ALL rows
    # (null samples under the sentinel), and the sentinel rows carry
    # exactly the null count
    from cardinalsin_spark.operators.quantile_sketch import NULL_SLOT

    assert sum(last.values()) == nulled.count()
    assert sum(
        c for (m, b, s), c in last.items() if s == NULL_SLOT
    ) == nulled.filter(F.col("value").isNull()).count()


def test_qsketch_evict_horizon_validation(spark):
    """r14 review: a sub-step eviction horizon can evict a still-open
    bucket mid-life (the timeout arms from last arrival, not bucket
    close) — refused loudly; >= step passes validation."""
    import pytest

    from cardinalsin_spark.streaming.live import streaming_quantile_sketch

    df = spark.range(1).selectExpr(
        "timestamp_seconds(id) AS timestamp",
        "'m' AS metric_name",
        "cast(id as double) AS value",
    )
    with pytest.raises(ValueError, match="evict_after_s"):
        streaming_quantile_sketch(df, 600, evict_after_s=90)
    # >= step: validation passes (the plan builds; df is batch so we
    # don't execute it)
    streaming_quantile_sketch(df, 600, evict_after_s=600)

"""Topic-filtered broadcast (ref ingester/topic_broadcast.rs): filter
algebra semantics, AND-flattening, batch-level routing + counters, and the
row-level Column compilation agreeing with batch metadata matching."""

from __future__ import annotations

from cardinalsin_spark.streaming.topics import (
    BatchMetadata,
    TopicFilter,
    TopicRouter,
)


def test_filter_matches_semantics():
    md = BatchMetadata(shard_id="s1", tenant_id=7, metrics=("cpu", "mem"))
    assert TopicFilter.all().matches(md)
    assert TopicFilter.shard("s1").matches(md)
    assert not TopicFilter.shard("s2").matches(md)
    assert TopicFilter.tenant(7).matches(md)
    assert not TopicFilter.tenant(8).matches(md)
    # Metrics: ANY batch metric subscribed (ref :56-59)
    assert TopicFilter.metrics(["mem", "disk"]).matches(md)
    assert not TopicFilter.metrics(["disk"]).matches(md)
    assert TopicFilter.shard("s1").and_(TopicFilter.tenant(7)).matches(md)
    assert not TopicFilter.shard("s1").and_(TopicFilter.tenant(8)).matches(md)
    assert TopicFilter.any_of(
        TopicFilter.shard("s2"), TopicFilter.metrics(["cpu"])
    ).matches(md)


def test_and_flattens_like_reference():
    f = (
        TopicFilter.shard("s1")
        .and_(TopicFilter.tenant(1))
        .and_(TopicFilter.metrics(["cpu"]))
    )
    assert f.kind == "and"
    assert [c.kind for c in f.children] == ["shard", "tenant", "metrics"]
    g = TopicFilter.all().and_(f)
    assert [c.kind for c in g.children] == ["all", "shard", "tenant", "metrics"]


def test_router_fanout_and_counters():
    r = TopicRouter()
    r.subscribe("dash", TopicFilter.metrics(["cpu"]))
    r.subscribe("audit", TopicFilter.tenant(1))
    r.subscribe("firehose", TopicFilter.all())
    assert r.receiver_count() == 3

    got = r.route(BatchMetadata("s1", 1, ("cpu",)))
    assert set(got) == {"dash", "audit", "firehose"}
    got = r.route(BatchMetadata("s1", 2, ("mem",)))
    assert set(got) == {"firehose"}

    dash = r.stats("dash")
    assert (dash.delivered, dash.filtered) == (1, 1)
    assert dash.reduction_pct == 50.0
    fire = r.stats("firehose")
    assert (fire.delivered, fire.filtered) == (2, 0)
    assert r.subscription_stats() == {"cpu": 1}
    r.unsubscribe("firehose")
    assert r.receiver_count() == 2


def test_to_column_refines_batch_match(spark):
    """Row-level compile: rows kept by to_column() must be exactly the
    rows a matching batch would deliver after per-row refinement — and a
    batch REJECTED by metadata can contain no matching rows (the
    short-circuit is safe)."""
    rows = [
        ("s1", 1, "cpu", 1.0),
        ("s1", 1, "mem", 2.0),
        ("s1", 2, "cpu", 3.0),
        ("s2", 1, "cpu", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "shard_id string, tenant_id int, metric_name string, value double"
    )
    f = TopicFilter.shard("s1").and_(TopicFilter.metrics(["cpu"]))
    kept = {r.value for r in df.filter(f.to_column()).collect()}
    assert kept == {1.0, 3.0}

    # batch metadata per (shard, tenant) — rejected batches hold no matches
    for (shard, tenant), vals in {
        ("s1", 1): {1.0},
        ("s1", 2): {3.0},
        ("s2", 1): set(),
    }.items():
        md = BatchMetadata(shard, tenant, ("cpu", "mem"))
        batch_rows = {
            r.value
            for r in df.filter(
                (df.shard_id == shard) & (df.tenant_id == tenant)
            ).filter(f.to_column()).collect()
        }
        if not f.matches(md):
            assert batch_rows == set(), (shard, tenant)
        assert batch_rows == vals


def test_streaming_filter_equals_batch(spark, tmp_path):
    """The compiled predicate over a real micro-batch stream must keep
    exactly the rows the same predicate keeps in batch mode."""
    import os

    src = os.path.join(str(tmp_path), "src")
    rows = [
        ("s1", 1, "cpu", 1.0),
        ("s1", 1, "mem", 2.0),
        ("s2", 1, "cpu", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "shard_id string, tenant_id int, metric_name string, value double"
    )
    df.write.mode("overwrite").parquet(src)
    f = TopicFilter.metrics(["cpu"]).and_(TopicFilter.shard("s1"))
    sdf = (
        spark.readStream.schema(df.schema).parquet(src).filter(f.to_column())
    )
    out = os.path.join(str(tmp_path), "out")
    chk = os.path.join(str(tmp_path), "chk")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.value for r in spark.read.parquet(out).collect()}
    assert got == {r.value for r in df.filter(f.to_column()).collect()} == {1.0}


def test_subscription_stats_release_on_unsubscribe_and_resubscribe():
    """Per-metric counts must come back down (review finding, r5): an
    unsubscribe releases them and a same-id re-subscribe replaces rather
    than double-counts."""
    r = TopicRouter()
    r.subscribe("s", TopicFilter.metrics(["m", "n"]))
    assert r.subscription_stats() == {"m": 1, "n": 1}
    r.subscribe("s", TopicFilter.metrics(["m"]))  # replace, same id
    assert r.subscription_stats() == {"m": 1}
    r.unsubscribe("s")
    assert r.subscription_stats() == {}


def test_unknown_filter_kind_raises():
    import pytest

    bad = TopicFilter("nonsense")
    with pytest.raises(ValueError, match="unknown filter kind"):
        bad.matches(BatchMetadata())

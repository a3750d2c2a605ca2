"""Unit semantics for the point-in-time operators: asof_join edge cases
(tolerance, left join, at-equal-timestamp inclusivity), gapfill_locf fill
flags and pre-first-observation nulls, histogram_quantile branch coverage
(+Inf fallback, first-bucket lo=0 interpolation)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cardinalsin_spark.operators.promql import (
    LE_INF,
    histogram_quantile_cumulative,
)
from cardinalsin_spark.operators.timeseries import (
    MetricsCols,
    asof_join,
    gapfill_locf,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 00:00:10"), lv=1.0),
            Row(k="a", ts=_ts("2024-01-01 00:01:00"), lv=2.0),
            Row(k="a", ts=_ts("2024-01-01 00:00:01"), lv=3.0),  # before any right
            Row(k="b", ts=_ts("2024-01-01 00:00:30"), lv=4.0),  # equal-ts match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 00:00:05"), rv=10.0),
            Row(k="a", ts=_ts("2024-01-01 00:00:50"), rv=20.0),
            Row(k="b", ts=_ts("2024-01-01 00:00:30"), rv=30.0),
        ]
    )
    return left, right


def test_asof_inner_backward_and_equal_ts(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on=["k"], ts_col="ts").orderBy("k", "ts")
    rows = [(r.k, r.lv, r.rv) for r in out.collect()]
    # 00:00:01 has no right row at-or-before it -> dropped (inner)
    assert rows == [
        ("a", 1.0, 10.0),   # 00:00:10 -> right 00:00:05
        ("a", 2.0, 20.0),   # 00:01:00 -> right 00:00:50
        ("b", 4.0, 30.0),   # equal timestamps match (at-or-before inclusive)
    ]


def test_asof_left_keeps_unmatched(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on=["k"], ts_col="ts", how="left")
    assert out.count() == 4
    unmatched = out.filter(F.col("asof_ts").isNull()).collect()
    assert [r.lv for r in unmatched] == [3.0]


def test_asof_tolerance_drops_stale_matches(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on=["k"], ts_col="ts", tolerance_s=6)
    rows = {(r.k, r.lv): r.rv for r in out.collect()}
    # 00:00:10 matches 00:00:05 (5s old, inside tolerance);
    # 00:01:00's match 00:00:50 is 10s old -> dropped
    assert rows == {("a", 1.0): 10.0, ("b", 4.0): 30.0}


def test_gapfill_locf_flags_and_leading_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(ts=_ts("2024-01-01 00:05:00"), m="x", v=100),
            Row(ts=_ts("2024-01-01 00:35:00"), m="x", v=300),
        ]
    )
    out = gapfill_locf(
        df,
        600,
        "2024-01-01 00:00:00",
        "2024-01-01 01:00:00",
        agg="avg",
        cols=MetricsCols(ts="ts", name="m", value="v"),
    ).orderBy("bucket")
    rows = [(r.value, r.filled) for r in out.collect()]
    assert rows == [
        (100.0, False),  # 00:00 bucket observed
        (100.0, True),   # 00:10 carried forward
        (100.0, True),
        (300.0, False),  # 00:30 observed
        (300.0, True),
        (300.0, True),
    ]
    # grid is dense: 6 buckets for 1 series
    assert out.count() == 6


def test_gapfill_series_before_first_observation_stays_null(spark):
    df = spark.createDataFrame(
        [Row(ts=_ts("2024-01-01 00:30:00"), m="x", v=7)]
    )
    out = gapfill_locf(
        df,
        600,
        "2024-01-01 00:00:00",
        "2024-01-01 01:00:00",
        cols=MetricsCols(ts="ts", name="m", value="v"),
    ).orderBy("bucket")
    vals = [r.value for r in out.collect()]
    assert vals[:3] == [None, None, None] and vals[3:] == [7.0, 7.0, 7.0]


def test_histogram_quantile_interpolates_in_first_bucket(spark):
    # 10 samples all <= le=100: q50 rank=5 of 10 -> lo=0, interpolation
    # inside [0, 100]: 0 + 100 * (5*10 - 0) / (10*10) = 50
    buckets = spark.createDataFrame(
        [Row(g="a", le=100, cum=10), Row(g="a", le=200, cum=10),
         Row(g="a", le=LE_INF, cum=10)]
    )
    out = histogram_quantile_cumulative(
        buckets, 5, 10, ["g"], out_scale=1_000_000.0
    ).collect()
    assert out[0].value == pytest.approx(50.0)


def test_histogram_quantile_inf_bucket_falls_back_to_highest_finite(spark):
    # ranks beyond the finite buckets -> Prometheus returns the highest
    # finite le
    buckets = spark.createDataFrame(
        [Row(g="a", le=100, cum=1), Row(g="a", le=200, cum=1),
         Row(g="a", le=LE_INF, cum=10)]
    )
    out = histogram_quantile_cumulative(
        buckets, 9, 10, ["g"], out_scale=1_000_000.0
    ).collect()
    assert out[0].value == 200.0


def test_approx_sketches_within_bounds(spark, sf_dir):
    """Sketch operators track exact answers within their documented error:
    HLL++ distinct-series within 3*rsd, quantile sketch p50 within the
    value spread implied by rank accuracy."""
    from cardinalsin_spark.operators.timeseries import (
        approx_distinct_series,
        approx_percentile_bucketed,
    )
    from cardinalsin_spark.queries import _events

    ev = _events(spark, sf_dir)
    exact = ev.select("event_type", "user_id").distinct().count()
    approx = approx_distinct_series(ev, ["event_type", "user_id"], rsd=0.05)
    got = approx.collect()[0].approx_series
    assert abs(got - exact) <= max(3, 3 * 0.05 * exact)

    pct = approx_percentile_bucketed(
        ev, 86400 * 365, [0.5], accuracy=10_000,   # one bucket: whole fixture
        by=["event_type"], cols=MetricsCols.events(),
    ).collect()
    # the sketch guarantee is on RANK (<= 1/accuracy), not value: assert the
    # returned value sits at rank 0.5 ± (1/accuracy + one-neighbor slack)
    for r in pct:
        sub = ev.filter(F.col("event_type") == r.event_type)
        n = sub.count()
        below = sub.filter(F.col("value") <= r.approx_pcts[0]).count()
        assert abs(below / n - 0.5) <= 1 / 10_000 + 2 / n


def test_topk_per_group(spark):
    from pyspark.sql import Row

    from cardinalsin_spark.operators.timeseries import topk_per_group

    df = spark.createDataFrame(
        [Row(g=g, s=s, value=float(v))
         for g, rows in {"a": [5, 3, 9, 1], "b": [2, 8]}.items()
         for s, v in enumerate(rows)]
    )
    out = topk_per_group(df, 2, ["g"], tiebreak=["s"]).collect()
    got = {(r.g, r.value) for r in out}
    assert got == {("a", 9.0), ("a", 5.0), ("b", 8.0), ("b", 2.0)}
    bot = topk_per_group(df, 1, ["g"], bottom=True).collect()
    assert {(r.g, r.value) for r in bot} == {("a", 1.0), ("b", 2.0)}

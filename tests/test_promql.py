"""PromQL parser unit tests — grammar parity with the reference's
``parse_promql`` (``api/query/prometheus_api.rs:744-826``) plus our topk-k
extension."""

from __future__ import annotations

from cardinalsin_spark.operators.promql import (
    discover_label_columns,
    parse_label_matchers,
    parse_promql,
)


def test_plain_selector():
    p = parse_promql("http_requests_total")
    assert p.metric_name == "http_requests_total"
    assert p.label_matchers == [] and p.aggregation is None and p.function is None


def test_selector_with_matchers():
    p = parse_promql('cpu_usage{host="web-1", env!="dev", pod=~"api-.*", svc!~"x"}')
    assert p.metric_name == "cpu_usage"
    ops = [(m.label, m.op, m.value) for m in p.label_matchers]
    assert ops == [
        ("host", "=", "web-1"),
        ("env", "!=", "dev"),
        ("pod", "=~", "api-.*"),
        ("svc", "!~", "x"),
    ]


def test_aggregation_with_by():
    p = parse_promql('sum by (host, env) (cpu_usage{region="us"})')
    assert p.aggregation == "sum"
    assert p.group_by == ["host", "env"]
    assert p.metric_name == "cpu_usage"
    assert p.label_matchers[0].label == "region"


def test_rate_function():
    p = parse_promql("rate(requests_total[5m])")
    assert p.function == "rate"
    assert p.range_seconds == 300.0
    assert p.metric_name == "requests_total"


def test_nested_agg_over_rate():
    p = parse_promql("sum by (host) (rate(requests_total[1h]))")
    assert p.aggregation == "sum"
    assert p.function == "rate"
    assert p.range_seconds == 3600.0
    assert p.group_by == ["host"]


def test_duration_units():
    assert parse_promql("increase(c[30s])").range_seconds == 30.0
    assert parse_promql("delta(c[2h])").range_seconds == 7200.0
    assert parse_promql("deriv(c[1d])").range_seconds == 86400.0


def test_topk_k_extraction():
    p = parse_promql("topk by (host) (5, cpu_usage)")
    assert p.aggregation == "topk" and p.k == 5 and p.metric_name == "cpu_usage"


def test_fallback_whole_string():
    # The reference treats an unparseable string as a bare metric name.
    p = parse_promql("weird-name-with-dashes")
    assert p.metric_name == "weird-name-with-dashes"


def test_discover_label_columns_order():
    p = parse_promql('sum by (env, host) (m{host="a", region="r"})')
    assert discover_label_columns(p) == ["host", "region", "env"]


def test_matcher_parse_empty():
    assert parse_label_matchers("") == []


# ---------------------------------------------------------------------------
# faithful=True dispatch: the transpiler must reach the reset-aware operators
# ---------------------------------------------------------------------------


def _ev(spark, sf_dir):
    from pyspark.sql import functions as F

    from cardinalsin_spark.queries import _events

    return _events(spark, sf_dir).withColumn(
        "user_id", F.col("user_id").cast("string")
    )


def test_faithful_rate_matches_direct_operator(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols, rate_faithful
    from pyspark.sql import functions as F

    ev = _ev(spark, sf_dir)
    cols = MetricsCols(ts="ts", name="event_type", value="value",
                       labels=("user_id",))
    start, end = 1704067200.0, 1706745600.0
    via_promql = promql_range(
        ev, "rate(purchase[600s])", start, end, 600, cols=cols, faithful=True
    )
    direct = rate_faithful(
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("ts") <= F.timestamp_seconds(F.lit(end)))
        ),
        600,
        series=["user_id"],
        cols=cols,
    )
    a = {(r.time_bucket, r.user_id, round(r.value, 9))
         for r in via_promql.collect() if r.value is not None}
    b = {(r.bucket, r.user_id, round(r.rate, 9))
         for r in direct.collect() if r.rate is not None}
    assert a == b and len(a) > 0


def test_faithful_outer_aggregation_sums_series(spark, sf_dir):
    """sum by () (rate(...)) must aggregate the per-series faithful rates —
    PromQL two-level evaluation, not a single collapsed groupBy."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    ev = _ev(spark, sf_dir)
    cols = MetricsCols(ts="ts", name="event_type", value="value",
                       labels=("user_id",))
    start, end = 1704067200.0, 1706745600.0
    per_series = promql_range(
        ev, "rate(purchase[600s])", start, end, 600, cols=cols, faithful=True
    )
    summed = promql_range(
        ev, "sum(rate(purchase[600s]))", start, end, 600, cols=cols,
        faithful=True,
    )
    expected = {}
    for r in per_series.collect():
        if r.value is not None:
            expected[r.time_bucket] = expected.get(r.time_bucket, 0.0) + r.value
    got = {r.time_bucket: r.value for r in summed.collect()
           if r.value is not None}
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-6


def test_faithful_irate_derives_ns_when_missing(spark, sf_dir):
    """A frame without ts_ns still works: the transpiler derives the ns
    column exactly from the timestamp."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    ev = _ev(spark, sf_dir).drop("ts_ns")
    cols = MetricsCols(ts="ts", name="event_type", value="value",
                       labels=("user_id",))
    out = promql_range(
        ev, "irate(click[600s])", 1704067200.0, 1706745600.0, 86400,
        cols=cols, faithful=True,
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {"time_bucket", "event_type", "user_id", "value"} == set(out.columns)


def test_faithful_deriv_runs(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols
    from pyspark.sql import functions as F

    ev = _ev(spark, sf_dir).withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    cols = MetricsCols(ts="ts", name="event_type", value="value_cents",
                       labels=("user_id",))
    out = promql_range(
        ev, "deriv(view[1h])", 1704067200.0, 1706745600.0, 86400,
        cols=cols, faithful=True,
    )
    assert out.count() > 0


# ---------------------------------------------------------------------------
# binary ops with vector matching (superset — the reference has none)
# ---------------------------------------------------------------------------


def test_binop_split_precedence_and_nesting():
    from cardinalsin_spark.operators.promql import _split_top_level_binop

    l, op, on, gm, carry, r = _split_top_level_binop("sum(a) / sum(b)")
    assert (l, op, on, r) == ("sum(a)", "/", None, "sum(b)")
    assert gm is None and carry == []
    # +- binds looser: rightmost top-level + wins over /
    l, op, on, gm, carry, r = _split_top_level_binop("a / b + c")
    assert (l, op, r) == ("a / b", "+", "c") and on is None
    # operators inside parens/brackets/braces are not split points
    assert _split_top_level_binop('rate(requests_total[5m])') is None
    assert _split_top_level_binop('m{x="a / b"}') is None
    # dash-in-name fallback is not an operator (no surrounding whitespace)
    assert _split_top_level_binop("weird-name-with-dashes") is None


def test_binop_on_modifier():
    from cardinalsin_spark.operators.promql import _split_top_level_binop

    l, op, on, gm, carry, r = _split_top_level_binop("sum(a) / on(user_id, host) sum(b)")
    assert op == "/" and on == ["user_id", "host"] and r == "sum(b)"
    assert gm is None

    l, op, on, gm, carry, r = _split_top_level_binop(
        "m / on(host) group_left(env) sum by (host) (n)"
    )
    assert gm == "group_left" and carry == ["env"]
    assert r == "sum by (host) (n)"


def test_binop_vector_match_on(spark, sf_dir):
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    ev = _ev(spark, sf_dir)
    cols = MetricsCols(ts="ts", name="event_type", value="value",
                       labels=("user_id",))
    start, end = 1704067200.0, 1706745600.0
    ratio = promql_range(
        ev,
        "sum by (user_id) (purchase) / on(user_id) sum by (user_id) (view)",
        start, end, 86400, cols=cols,
    )
    rows = ratio.collect()
    assert len(rows) > 0
    assert set(ratio.columns) == {"time_bucket", "user_id", "value"}
    # spot-check one row against directly computed sums
    r0 = rows[0]
    direct = (
        ev.filter(
            (F.col("ts") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("ts") <= F.timestamp_seconds(F.lit(end)))
        )
        .groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 86400).cast("long") * 86400
            ).alias("b"),
            "event_type",
            "user_id",
        )
        .agg(F.sum("value").alias("v"))
    )
    p = direct.filter(
        (F.col("b") == r0.time_bucket)
        & (F.col("event_type") == "purchase")
        & (F.col("user_id") == r0.user_id)
    ).first().v
    v = direct.filter(
        (F.col("b") == r0.time_bucket)
        & (F.col("event_type") == "view")
        & (F.col("user_id") == r0.user_id)
    ).first().v
    assert abs(r0.value - p / v) < 1e-9


def test_over_time_family_parses():
    for fn in ("sum", "avg", "min", "max", "count", "stddev", "last"):
        p = parse_promql(f"{fn}_over_time(m[10m])")
        assert p.function == f"{fn}_over_time" and p.range_seconds == 600.0


def test_quantile_param_extraction():
    p = parse_promql("quantile by (host) (0.95, http_latency)")
    assert p.aggregation == "quantile" and p.q == 0.95
    assert p.group_by == ["host"] and p.metric_name == "http_latency"


def test_count_values_label_extraction():
    p = parse_promql('count_values("version", build_info)')
    assert p.aggregation == "count_values" and p.dst_label == "version"
    assert p.metric_name == "build_info"


def test_offset_modifier_parses_everywhere():
    p = parse_promql("purchase offset 5m")
    assert p.metric_name == "purchase" and p.offset_seconds == 300.0
    p = parse_promql("delta(purchase[30m] offset 1h)")
    assert p.function == "delta" and p.offset_seconds == 3600.0
    assert p.range_seconds == 1800.0
    p = parse_promql("sum by (u) (purchase offset 1d)")
    assert p.aggregation == "sum" and p.offset_seconds == 86400.0


def test_offset_range_realigns_buckets(spark, sf_dir):
    """delta(...[30m] offset 1h) over [start,end] equals delta(...[30m])
    over [start-1h,end-1h] with buckets shifted forward by 1h."""
    import pyspark.sql.functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV, _events_promql

    ev = _events_promql(spark, sf_dir)
    start, end = 1704067200.0, 1704671999.0
    shifted = promql_range(
        ev, "delta(purchase[30m] offset 1h)", start, end, 1800, cols=EV
    )
    base = promql_range(
        ev, "delta(purchase[30m])", start - 3600, end - 3600, 1800, cols=EV
    ).withColumn(
        "time_bucket",
        F.timestamp_seconds(F.unix_timestamp("time_bucket") + F.lit(3600)),
    )
    a = {(r.time_bucket, r.value) for r in shifted.collect()}
    b = {(r.time_bucket, r.value) for r in base.collect()}
    assert a == b and len(a) > 0


def test_label_replace_non_matching_rows_unchanged(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    out = promql_range(
        ev,
        'label_replace(sum by (user_id) (purchase), "tier", "u$1",'
        ' "user_id", "(1[0-9])")',
        1704067200.0,
        1704671999.0,
        86400,
        cols=EV_CENTS,
    ).collect()
    assert len(out) > 0
    for r in out:
        if len(r.user_id) == 2 and r.user_id.startswith("1"):
            assert r.tier == "u" + r.user_id
        else:
            assert r.tier == ""  # no match -> dst absent (empty)


def test_label_join_concatenates(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    out = promql_range(
        ev,
        'label_join(sum by (user_id) (purchase), "key", "-",'
        ' "event_type", "user_id")',
        1704067200.0,
        1704671999.0,
        86400,
        cols=EV_CENTS,
    ).limit(5).collect()
    assert all(r.key == f"{r.event_type}-{r.user_id}" for r in out)


def test_absent_present_metric_is_empty(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV, _events_promql

    ev = _events_promql(spark, sf_dir)
    assert (
        promql_instant(ev, "absent(purchase)", time_s=1706745600.0, cols=EV).count()
        == 0
    )
    assert (
        promql_instant(ev, "absent(nope)", time_s=1706745600.0, cols=EV).count() == 1
    )


def test_parse_predict_linear_and_histq():
    from cardinalsin_spark.operators.promql import parse_promql

    p = parse_promql('predict_linear(http_reqs{job="api"}[1h], 1800)')
    assert p.function == "predict_linear"
    assert p.range_seconds == 3600.0 and p.predict_ahead_s == 1800
    assert p.metric_name == "http_reqs"

    h = parse_promql('histogram_quantile(0.9, latency_bucket{app="x"})')
    assert h.function == "histogram_quantile"
    assert h.q == 0.9 and h.q_str == "0.9"
    assert h.metric_name == "latency_bucket"

    r = parse_promql("sum(resets(click[6h]))")
    assert r.aggregation == "sum" and r.function == "resets"
    assert r.range_seconds == 21600.0


def test_histogram_quantile_through_instant_transpiler(spark):
    """histogram_quantile(0.5, m_bucket) over a synthetic cumulative family:
    the latest sample per (series, le) feeds the exact quantile algorithm;
    stale earlier samples must be ignored."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 1, 0)
    rows = []
    # stale scrape at t0 (would give a different quantile), fresh at t1:
    for ts, cums in [(t0, [2, 2, 2]), (t1, [10, 18, 20])]:
        for le, cum in zip(["100", "200", "+Inf"], cums):
            rows.append(
                Row(timestamp=ts, metric_name="lat_bucket", le=le, value=cum)
            )
    df = spark.createDataFrame(rows)
    out = promql_instant(
        df,
        "histogram_quantile(0.5, lat_bucket)",
        time_s=1704067260.0,
        cols=MetricsCols(),
    ).collect()
    # rank = 0.5*20 = 10 -> first bucket (cum 10 >= 10): lo=0, hi=100,
    # interp = 0 + 100*(10-0)/10 = 100
    assert len(out) == 1
    assert out[0].value == 100.0


def test_scalar_wrappers(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1706745600.0
    base = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "sum by (user_id) (purchase)", time_s=t, cols=EV_CENTS
        ).collect()
    }
    lo = min(base.values())

    cmin = {
        r.user_id: r.value
        for r in promql_instant(
            ev, f"clamp_min(sum by (user_id) (purchase), {lo + 1})",
            time_s=t, cols=EV_CENTS,
        ).collect()
    }
    assert min(cmin.values()) == lo + 1
    assert all(cmin[u] == max(v, lo + 1) for u, v in base.items())

    # clamp with min > max -> empty vector (PromQL)
    empty = promql_instant(
        ev, "clamp(sum by (user_id) (purchase), 10, 5)", time_s=t, cols=EV_CENTS
    )
    assert empty.count() == 0

    sgn = promql_instant(
        ev, "sgn(sum by (user_id) (purchase))", time_s=t, cols=EV_CENTS
    ).collect()
    assert {r.value for r in sgn} == {1.0}

    srt = promql_instant(
        ev, "sort(sum by (user_id) (purchase))", time_s=t, cols=EV_CENTS
    ).collect()
    vals = [r.value for r in srt]
    assert vals == sorted(vals)

    fl = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "floor(sum by (user_id) (purchase))", time_s=t, cols=EV_CENTS
        ).collect()
    }
    import math
    assert all(fl[u] == float(math.floor(v)) for u, v in base.items())


def test_without_clause_complements_by(spark, sf_dir):
    """`agg without (l)` groups on every series label except l — with the
    events frame's single user_id label, `sum without (user_id)` must equal
    the ungrouped `sum`, and `sum without ()`-style keeps unlisted labels."""
    from cardinalsin_spark.operators.promql import parse_promql, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    p = parse_promql("sum without (user_id) (purchase)")
    assert p.aggregation == "sum" and p.group_mode == "without"
    assert p.group_by == ["user_id"]

    ev = _events_promql(spark, sf_dir)
    lo, hi = 1704067200.0, 1704671999.0
    without = promql_range(
        ev, "sum without (user_id) (purchase)", lo, hi, 86400, cols=EV_CENTS
    ).collect()
    plain = promql_range(
        ev, "sum (purchase)", lo, hi, 86400, cols=EV_CENTS
    ).collect()
    assert {(r.time_bucket, r.value) for r in without} == {
        (r.time_bucket, r.value) for r in plain
    }
    assert len(without) > 0

    # faithful path: outer aggregation honors the complement too
    fw = promql_range(
        ev, "sum without (user_id) (rate(purchase[600s]))",
        lo, hi, 600, cols=EV_CENTS, faithful=True,
    )
    assert "user_id" not in fw.columns
    assert fw.count() > 0


def test_scalar_comparison_filter_and_bool(spark, sf_dir):
    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1706745600.0
    base = promql_instant(
        ev, "sum by (user_id) (purchase)", time_s=t, cols=EV_CENTS
    ).collect()
    thresh = sorted(r.value for r in base)[len(base) // 2]

    filt = promql_instant(
        ev, f"sum by (user_id) (purchase) > {thresh}", time_s=t, cols=EV_CENTS
    ).collect()
    assert len(filt) == sum(1 for r in base if r.value > thresh)
    assert all(r.value > thresh for r in filt)

    boolv = promql_instant(
        ev, f"sum by (user_id) (purchase) <= bool {thresh}",
        time_s=t, cols=EV_CENTS,
    ).collect()
    assert len(boolv) == len(base)
    assert {r.value for r in boolv} <= {0.0, 1.0}
    assert sum(r.value for r in boolv) == sum(
        1 for r in base if r.value <= thresh
    )


def test_group_left_many_to_one(spark, sf_dir):
    """`rate per series / on(time...) group_left total per bucket`: the
    many side keeps its labels; each series' share of the per-type total
    sums to 1 per (bucket, type)."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    lo, hi = 1704067200.0, 1704671999.0
    out = promql_range(
        ev,
        "sum by (user_id) (purchase) / on() group_left sum (purchase)",
        lo, hi, 86400, cols=EV_CENTS,
    )
    rows = out.collect()
    assert "user_id" in out.columns and len(rows) > 0
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.time_bucket, []).append(r.value)
    for shares in by_bucket.values():
        assert abs(sum(shares) - 1.0) < 1e-9


def test_extrapolated_rate_through_transpiler(spark, sf_dir):
    """faithful='extrapolated' upgrades rate to the upstream
    extrapolatedRate algorithm through the same entry point; the direct
    operator call must agree exactly."""
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import rate_extrapolated
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    from cardinalsin_spark.operators.timeseries import MetricsCols

    # type-level series (no user label): sf0.001 per-user series are too
    # sparse for >= 2 samples per bucket
    cols = MetricsCols(ts="ts", name="event_type", value="value_cents")
    ev = _events_promql(spark, sf_dir)
    lo, hi = 1704067200.0, 1706745600.0
    via_transpiler = promql_range(
        ev, "rate(click[86400s])", lo, hi, 86400, cols=cols,
        faithful="extrapolated",
    )
    direct = rate_extrapolated(
        ev.filter(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.timestamp_seconds(F.lit(lo)))
            & (F.col("ts") <= F.timestamp_seconds(F.lit(hi)))
        ),
        86400,
        cols=cols,
    )
    a = {r.time_bucket: r.value for r in via_transpiler.collect()}
    b = {r.bucket: r.rate for r in direct.collect()}
    assert a == b and len(a) > 0

    # plain faithful=True still uses the simpler bucket-width division
    simple = promql_range(
        ev, "rate(click[86400s])", lo, hi, 86400, cols=cols, faithful=True
    )
    c = {r.time_bucket: r.value for r in simple.collect()}
    assert c != a


def test_transpile_holt_winters(spark):
    """holt_winters(m[1h], 0.3, 0.3) parses factors + range and routes to
    the faithful double-exponential-smoothing operator."""
    from cardinalsin_spark.operators.promql import parse_promql

    p = parse_promql('holt_winters(http_requests{env="prod"}[1h], 0.3, 0.3)')
    assert p.function == "holt_winters"
    assert p.range_seconds == 3600.0
    assert p.hw_sf == 0.3 and p.hw_tf == 0.3
    assert p.metric_name == "http_requests"
    p2 = parse_promql("double_exponential_smoothing(m[5m], 0.5, 0.1)")
    assert p2.function == "holt_winters" and p2.range_seconds == 300.0


def test_transpile_quantile_over_time(spark):
    from cardinalsin_spark.operators.promql import parse_promql

    p = parse_promql('quantile_over_time(0.95, latency{env="prod"}[5m])')
    assert p.function == "quantile_over_time"
    assert p.q == 0.95 and p.range_seconds == 300.0
    assert p.metric_name == "latency"


def test_subquery_two_level_evaluation(spark, sf_dir):
    """max_over_time(rate(m[300s])[3600s:300s]) == manual two-level
    evaluation: inner faithful rate at 300s, outer max per hour."""
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    outer = promql_range(
        ev, "max_over_time(rate(purchase[300s])[3600s:300s])",
        start_s=1704067200.0, end_s=1706745600.0, step_s=3600,
        cols=EV_CENTS, faithful=True,
    )
    inner = promql_range(
        ev, "rate(purchase[300s])",
        start_s=1704067200.0, end_s=1706745600.0, step_s=300,
        cols=EV_CENTS, faithful=True,
    )
    manual = (
        inner.groupBy(
            F.timestamp_seconds(
                (F.unix_seconds("time_bucket") / 3600).cast("long") * 3600
            ).alias("time_bucket"),
            "event_type",
            "user_id",
        )
        .agg(F.max("value").alias("value"))
    )
    got = {tuple(r) for r in outer.collect()}
    want = {tuple(r) for r in manual.collect()}
    assert got == want and got


def test_group_aggregation_returns_ones(spark, sf_dir):
    """PromQL `group by (l) (m)`: constant 1 per output group."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    df = promql_range(
        _events_promql(spark, sf_dir),
        "group by (user_id) (purchase)",
        start_s=1704067200.0, end_s=1706745600.0, step_s=86400,
        cols=EV_CENTS,
    )
    rows = df.collect()
    assert rows and all(r.value == 1.0 for r in rows)


def test_absent_over_time_grid(spark, sf_dir):
    """absent_over_time emits exactly the empty buckets of the query grid:
    an impossible selector yields EVERY bucket; a matching one yields the
    complement of the present set."""
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    start, end, step = 1704067200.0, 1704110400.0, 3600  # 12 hours
    n_buckets = int(end // step) - int(start // step) + 1
    nothing = promql_range(
        ev, 'absent_over_time(no_such_metric[3600s])',
        start_s=start, end_s=end, step_s=step, cols=EV_CENTS,
    )
    assert nothing.count() == n_buckets
    some = promql_range(
        ev, "absent_over_time(purchase[3600s])",
        start_s=start, end_s=end, step_s=step, cols=EV_CENTS,
    )
    present = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("ts") <= F.timestamp_seconds(F.lit(end)))
        )
        .select(F.expr(f"timestamp_seconds((unix_seconds(ts) div {step}) * {step})"))
        .distinct()
        .count()
    )
    assert some.count() == n_buckets - present


def test_scalar_sqrt_wrapper(spark, sf_dir):
    import math

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    base = promql_instant(
        _events_promql(spark, sf_dir), "sum(purchase)",
        time_s=1706745600.0, cols=EV_CENTS,
    ).collect()
    wrapped = promql_instant(
        _events_promql(spark, sf_dir), "sqrt(sum(purchase))",
        time_s=1706745600.0, cols=EV_CENTS,
    ).collect()
    assert wrapped and all(
        w.value == math.sqrt(b.value) for b, w in zip(base, wrapped)
    )


def test_present_over_time(spark, sf_dir):
    """present_over_time: 1 per bucket holding any sample — the positive
    complement of absent_over_time on the same grid."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    start, end, step = 1704067200.0, 1704110400.0, 3600
    n_buckets = int(end // step) - int(start // step) + 1
    present = promql_range(
        ev, "present_over_time(purchase[3600s])",
        start_s=start, end_s=end, step_s=step, cols=EV_CENTS,
    )
    rows = present.collect()
    assert rows and all(r.value == 1.0 for r in rows)
    absent = promql_range(
        ev, "absent_over_time(purchase[3600s])",
        start_s=start, end_s=end, step_s=step, cols=EV_CENTS,
    )
    # present buckets x distinct series + absent buckets partition the grid
    present_buckets = {r.time_bucket for r in rows}
    absent_buckets = {r.time_bucket for r in absent.collect()}
    assert not (present_buckets & absent_buckets)
    assert len(present_buckets) + len(absent_buckets) == n_buckets


def test_time_component_functions(spark, sf_dir):
    """minute/hour/day_of_week/day_of_month/day_of_year/month/year/
    days_in_month over
    timestamp(m): the value is reinterpreted as an epoch-seconds time and
    the UTC component extracted (promql/functions.go funcHour family).
    Verified against Python's datetime on every sample."""
    import datetime as dt

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t_eval = 1706745600.0
    base = promql_instant(
        ev, "timestamp(purchase)", time_s=t_eval, cols=EV_CENTS
    ).collect()
    assert len(base) == 1
    epoch = base[0].value
    d = dt.datetime.fromtimestamp(int(epoch), dt.timezone.utc)
    # 0 = Sunday in PromQL's day_of_week
    expected = {
        "minute": float(d.minute),
        "hour": float(d.hour),
        "day_of_week": float((d.weekday() + 1) % 7),
        "day_of_month": float(d.day),
        "day_of_year": float(d.timetuple().tm_yday),
        "month": float(d.month),
        "year": float(d.year),
        "days_in_month": float(
            ((d.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
             - dt.timedelta(days=1)).day
        ),
    }
    for fn, want in expected.items():
        got = promql_instant(
            ev, f"{fn}(timestamp(purchase))", time_s=t_eval, cols=EV_CENTS
        ).collect()
        assert len(got) == 1 and got[0].value == want, (fn, got[0].value, want)


def test_vector_scalar_arithmetic(spark, sf_dir):
    """`expr * 2` and `1 - expr`-style literal operands fold into the value
    column (no join): verified against the unwrapped query."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    kw = dict(start_s=1704067200.0, end_s=1704153600.0, step_s=3600,
              cols=EV_CENTS)
    base = {
        tuple(r)[:-1]: r.value
        for r in promql_range(ev, "sum by (user_id) (purchase)", **kw).collect()
    }
    assert base
    doubled = promql_range(
        ev, "sum by (user_id) (purchase) * 2", **kw
    ).collect()
    assert all(r.value == base[tuple(r)[:-1]] * 2 for r in doubled)
    flipped = promql_range(
        ev, "0 - sum by (user_id) (purchase)", **kw
    ).collect()
    assert all(r.value == -base[tuple(r)[:-1]] for r in flipped)


def test_round_wrapper(spark, sf_dir):
    """round(v, to_nearest) follows upstream's floor(v·inv + 0.5)/inv
    formulation — verified against the Python replay on every sample."""
    import math

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t_eval = 1706745600.0
    base = promql_instant(
        ev, "avg by (user_id) (purchase)", time_s=t_eval, cols=EV_CENTS
    ).collect()
    assert base
    for spec, n in (("round(avg by (user_id) (purchase))", 1.0),
                    ('round(avg by (user_id) (purchase), "50")', 50.0)):
        got = promql_instant(ev, spec, time_s=t_eval, cols=EV_CENTS).collect()
        key = lambda r: r.user_id
        gb = {key(r): r.value for r in got}
        for b in base:
            inv = 1.0 / n
            assert gb[key(b)] == math.floor(b.value * inv + 0.5) / inv


def test_timestamp_respects_offset(spark, sf_dir):
    """timestamp(m offset 3600s): the evaluation window shifts back one
    hour and buckets re-align onto the query grid, while the emitted value
    stays the sample's own (unshifted) epoch time — so each bucket's value
    equals the no-offset query's value from one bucket earlier."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    kw = dict(start_s=1704070800.0, end_s=1704153600.0, step_s=3600,
              cols=EV_CENTS)
    plain = {
        r.time_bucket: r.value
        for r in promql_range(ev, "timestamp(purchase)", **kw).collect()
    }
    shifted = promql_range(
        ev, "timestamp(purchase offset 3600s)", **kw
    ).collect()
    assert shifted
    import datetime as dt

    hits = 0
    for r in shifted:
        prev_bucket = r.time_bucket - dt.timedelta(seconds=3600)
        if prev_bucket in plain:
            assert r.value == plain[prev_bucket], r
            hits += 1
    assert hits > 0


def test_binop_without_spaces(spark, sf_dir):
    """`a / b` and `a/b` must parse identically (whitespace is only
    significant for '-', which can appear inside metric names)."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    kw = dict(start_s=1704067200.0, end_s=1704153600.0, step_s=3600,
              cols=EV_CENTS)
    kw["step_s"] = 86400
    kw["end_s"] = 1706745600.0
    spaced = promql_range(
        ev, "sum by (user_id) (purchase) / sum by (user_id) (view)", **kw
    ).collect()
    tight = promql_range(
        ev, "sum by (user_id) (purchase)/sum by (user_id) (view)", **kw
    ).collect()
    assert spaced and [tuple(r) for r in tight] == [tuple(r) for r in spaced]


def test_offset_inside_quoted_value_is_data(spark):
    """The literal text 'offset 5m' inside a matcher value must not be
    treated as an offset modifier."""
    from cardinalsin_spark.operators.promql import parse_promql

    p = parse_promql('m{note="retry offset 5m"}')
    assert p.offset_seconds == 0.0
    assert p.label_matchers[0].value == "retry offset 5m"
    # a real offset after the selector still parses
    p2 = parse_promql('m{note="retry offset 5m"} offset 3m')
    assert p2.offset_seconds == 180.0
    assert p2.label_matchers[0].value == "retry offset 5m"


def test_absent_over_time_with_offset(spark, sf_dir):
    """absent_over_time(m[1h] offset 24h) shifts the probe window back a
    day: each grid bucket reports the previous day's absence."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    kw = dict(step_s=3600, cols=EV_CENTS)
    plain = {
        r.time_bucket
        for r in promql_range(
            ev, "absent_over_time(purchase[3600s])",
            start_s=1704067200.0, end_s=1704153600.0, **kw
        ).collect()
    }
    import datetime as dt

    shifted = {
        r.time_bucket - dt.timedelta(seconds=86400)
        for r in promql_range(
            ev, "absent_over_time(purchase[3600s] offset 86400s)",
            start_s=1704067200.0 + 86400, end_s=1704153600.0 + 86400, **kw
        ).collect()
    }
    assert shifted == plain


def test_time_components_negative_epoch(spark, sf_dir):
    """Pre-1970 epochs wrap correctly (pmod, not sign-of-dividend %)."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant

    rows = [Row(ts=dt.datetime(2024, 1, 1), event_type="m",
                value_cents=-3600.0, user_id="1")]
    df = spark.createDataFrame(rows)
    from cardinalsin_spark.queries import EV_CENTS

    got = promql_instant(df, "hour(m)", cols=EV_CENTS).collect()
    assert got[0].value == 23.0


def test_instant_binary_ops(spark, sf_dir):
    """Instant vector-vector and vector-scalar binary ops: `sum(a)/sum(b)`
    joins on shared labels (metric name dropped), scalars fold — formerly
    this mis-parsed as one garbage aggregation and returned empty."""
    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1706745600.0
    s_p = promql_instant(ev, "sum(purchase)", time_s=t, cols=EV_CENTS).collect()
    s_v = promql_instant(ev, "sum(view)", time_s=t, cols=EV_CENTS).collect()
    ratio = promql_instant(
        ev, "sum(purchase) / sum(view)", time_s=t, cols=EV_CENTS
    ).collect()
    assert len(ratio) == 1
    assert ratio[0].value == s_p[0].value / s_v[0].value
    by = promql_instant(
        ev,
        "sum by (user_id) (purchase) / sum by (user_id) (view)",
        time_s=t,
        cols=EV_CENTS,
    ).collect()
    assert by and all(r.value > 0 for r in by)
    halved = promql_instant(
        ev, "sum(purchase) / 2", time_s=t, cols=EV_CENTS
    ).collect()
    assert halved[0].value == s_p[0].value / 2
    # negative comparison scalar still parses as a comparison, not a binop
    neg = promql_instant(
        ev, "sum(purchase) > -5", time_s=t, cols=EV_CENTS
    ).collect()
    assert len(neg) == 1 and neg[0].value == s_p[0].value


def test_transcendental_convenience_tier(spark, sf_dir):
    """exp/ln/log2/log10 — the libm-dependent convenience tier, kept out of
    every oracle-checked registry path (determinism doctrine) but available
    to users like upstream PromQL. Values must agree with Python's libm to
    ~1 ulp (JVM Math vs glibc genuinely differ in the last bit on this
    host — the measured reason this tier is fenced off from value-hash
    oracles), and the off-domain shims must return PromQL's -Inf/NaN where
    Spark's log functions would return NULL."""
    import math

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1706745600.0
    base = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "sum by (user_id) (purchase)", time_s=t, cols=EV_CENTS
        ).collect()
    }
    for fn, pyfn in [
        ("ln", math.log),
        ("log2", math.log2),
        ("log10", math.log10),
    ]:
        got = {
            r.user_id: r.value
            for r in promql_instant(
                ev, f"{fn}(sum by (user_id) (purchase))", time_s=t,
                cols=EV_CENTS,
            ).collect()
        }
        for u, v in base.items():
            assert math.isclose(got[u], pyfn(v), rel_tol=1e-15), (fn, u)
    got = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "exp(sgn(sum by (user_id) (purchase)))", time_s=t,
            cols=EV_CENTS,
        ).collect()
    }
    for u in base:
        assert math.isclose(got[u], math.e, rel_tol=1e-15), u

    # off-domain: ln(0) = -Inf, ln(-x) = NaN (upstream funcLog semantics)
    import datetime as dt

    from cardinalsin_spark.operators.timeseries import MetricsCols

    rows = [
        Row(timestamp=dt.datetime(2024, 1, 1), metric_name="mz", value=0.0),
        Row(timestamp=dt.datetime(2024, 1, 1), metric_name="mn", value=-4.0),
        Row(timestamp=dt.datetime(2024, 1, 1), metric_name="mp", value=4.0),
    ]
    df = spark.createDataFrame(rows)

    def val(expr):
        (r,) = promql_instant(
            df, expr, time_s=1704067200.0, cols=MetricsCols()
        ).collect()
        return r.value

    assert val("log2(mp)") == 2.0
    assert val("log2(mz)") == float("-inf")
    assert math.isnan(val("log2(mn)"))
    assert val("ln(mz)") == float("-inf")
    assert math.isnan(val("log10(mn)"))


def test_mad_expr_property(spark):
    """Property check of the collected-array MAD aggregate against an
    independent numpy computation (percentile_cont 0.5 interpolation on
    both sides), over assorted integer-grid shapes incl. n=1, ties, and
    negatives."""
    import numpy as np
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import _mad_expr

    rng = np.random.default_rng(11)
    cases = [
        [5],
        [3, 9],
        [1, 1, 1, 1],
        [-7, 0, 7],
        list(rng.integers(-1000, 1000, size=17)),
        list(rng.integers(-5, 5, size=100)),
    ]
    rows = [
        Row(g=i, v=int(x)) for i, vals in enumerate(cases) for x in vals
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.g: r.mad
        for r in df.groupBy("g").agg(
            F.expr(_mad_expr("v")).alias("mad")
        ).collect()
    }

    def pcont_median(a):
        a = np.sort(np.asarray(a, dtype=np.float64))
        n = len(a)
        return (a[(n - 1) // 2] + a[n // 2]) / 2.0

    for i, vals in enumerate(cases):
        med = pcont_median(vals)
        expect = pcont_median([abs(v - med) for v in vals])
        assert got[i] == expect, (i, got[i], expect)


def test_at_modifier_pins_evaluation_time(spark):
    """`m @ t` evaluates at fixed epoch t regardless of the query's own
    evaluation time; composes with offset and aggregation; quoted '@' in
    a matcher value stays data."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import parse_promql, promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t1 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 1, 2, 0, 0, 0)
    df = spark.createDataFrame(
        [
            Row(timestamp=t1, metric_name="m", value=10.0),
            Row(timestamp=t2, metric_name="m", value=20.0),
        ]
    )
    cols = MetricsCols()
    e1 = 1704067200.0  # t1 epoch
    e2 = e1 + 86400.0

    def val(expr, time_s=None):
        (r,) = promql_instant(df, expr, time_s=time_s, cols=cols).collect()
        return r.value

    # without @: latest sample at the query's eval time
    assert val("m", time_s=e2) == 20.0
    # @ pins to t1 even when the query evaluates at t2
    assert val(f"m @ {int(e1)}", time_s=e2) == 10.0
    # @ alone supplies the eval time
    assert val(f"m @ {int(e1)}") == 10.0
    # composes with offset: eval at t2 minus 1d → t1's sample
    assert val(f"m @ {int(e2)} offset 1d") == 10.0
    # nested inside an aggregation
    assert val(f"sum(m @ {int(e1)})", time_s=e2) == 10.0
    # quoted '@ 123' in a matcher value is data, not a modifier
    p = parse_promql('m{note=" @ 123"}')
    assert p.at_seconds is None


def test_trig_convenience_tier(spark):
    """sin/cos/tan/arcs/hyperbolics/deg/rad — convenience tier like
    exp/ln: ~1 ulp vs Python libm, NaN off-domain for asin/acos."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    df = spark.createDataFrame(
        [
            Row(timestamp=dt.datetime(2024, 1, 1), metric_name="half", value=0.5),
            Row(timestamp=dt.datetime(2024, 1, 1), metric_name="two", value=2.0),
        ]
    )
    cols = MetricsCols()

    def val(expr):
        (r,) = promql_instant(
            df, expr, time_s=1704067200.0, cols=cols
        ).collect()
        return r.value

    for fn, pyfn in [
        ("sin", math.sin), ("cos", math.cos), ("tan", math.tan),
        ("asin", math.asin), ("acos", math.acos), ("atan", math.atan),
        ("sinh", math.sinh), ("cosh", math.cosh), ("tanh", math.tanh),
        ("deg", math.degrees), ("rad", math.radians),
    ]:
        assert math.isclose(val(f"{fn}(half)"), pyfn(0.5), rel_tol=1e-15), fn
    assert math.isnan(val("asin(two)"))  # off-domain → NaN, like Go
    assert math.isclose(val("deg(rad(two))"), 2.0, rel_tol=1e-15)


def test_mod_pow_atan2_binops(spark):
    """The full PromQL arithmetic operator set: % (exact fmod — oracle
    tier), ^ (right-associative) and atan2 (keyword binop, * tier) —
    the latter two convenience tier like exp/ln. Precedence: + - looser
    than * / % atan2, looser than ^."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(timestamp=t, metric_name="m", host="a", value=10.0),
            Row(timestamp=t, metric_name="m", host="b", value=-7.0),
            Row(timestamp=t, metric_name="n", host="a", value=3.0),
            Row(timestamp=t, metric_name="n", host="b", value=2.0),
        ]
    )
    cols = MetricsCols()

    def vals(expr):
        out = promql_instant(df, expr, time_s=1704067200.0, cols=cols)
        return {r.host: r.value for r in out.select("host", "value").collect()}

    m = "sum by (host) (m)"
    n = "sum by (host) (n)"
    # vector % scalar: fmod, sign of the dividend (Go math.Mod semantics)
    assert vals(f"{m} % 3") == {"a": math.fmod(10.0, 3.0), "b": math.fmod(-7.0, 3.0)}
    assert vals(f"{m} % 3")["b"] == -1.0
    # vector-vector % matches on shared labels
    assert vals(f"{m} % {n}") == {"a": 1.0, "b": -1.0}
    # scalar-left
    assert vals(f"20 % {n}") == {"a": 2.0, "b": 0.0}
    # ^ is right-associative: 2^n^2 with n=3 → 2^(3^2) = 512 on host a
    assert vals(f"2 ^ {n} ^ 2")["a"] == 512.0
    # precedence: % binds tighter than +, looser than ^
    assert vals(f"{m} + {n} % 2") == {"a": 11.0, "b": -7.0}
    assert vals(f"{n} ^ 2 % 5") == {"a": 4.0, "b": 4.0}
    # atan2 as a keyword binop on matched series (convenience tier)
    got = vals(f"{m} atan2 {n}")
    assert math.isclose(got["a"], math.atan2(10.0, 3.0), rel_tol=1e-15)
    assert math.isclose(got["b"], math.atan2(-7.0, 2.0), rel_tol=1e-15)
    # a metric name CONTAINING atan2 is not split
    assert vals("sum by (host) (m) + 0") == {"a": 10.0, "b": -7.0}

    from cardinalsin_spark.operators.promql import _split_top_level_binop

    assert _split_top_level_binop("my_atan2_metric") is None
    assert _split_top_level_binop("atan2_total") is None


def test_negative_offset_loud_reject():
    """`offset -5m` (feature-gated upstream) and malformed offsets used to
    silently merge into the metric name and match nothing; they must raise.
    Quoted occurrences stay data."""
    import pytest

    from cardinalsin_spark.operators.promql import parse_promql

    for expr in (
        "purchase offset -5m",
        "rate(m[5m] offset -1h)",
        "sum(m offset -30s)",
    ):
        with pytest.raises(ValueError, match="offset"):
            parse_promql(expr)
    assert parse_promql("purchase offset 5m").offset_seconds == 300.0
    assert parse_promql('m{note=" offset -5m"}').offset_seconds == 0.0


def test_subquery_default_resolution(spark, sf_dir):
    """`fn_over_time(expr[W:])` — resolution omitted: falls back to the
    range query's own step (the transpiler's analogue of Prometheus's
    global evaluation interval), so `[7200s:]` at step 1800 must equal
    the explicit `[7200s:1800s]`."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)

    def run(expr):
        return promql_range(
            ev, expr, 1704067200.0, 1704240000.0, 1800, cols=EV_CENTS
        ).collect()

    implicit = run("avg_over_time(sum by (user_id) (purchase)[7200s:])")
    explicit = run("avg_over_time(sum by (user_id) (purchase)[7200s:1800s])")
    assert implicit == explicit and len(implicit) > 0


def test_at_modifier_range_function_pinned_semantics(spark, sf_dir):
    """Range-FUNCTION expressions with @ (supported since r8, VERDICT r7
    item 4): the function evaluates once over [pin − range, pin] and the
    result replicates across the grid — every step identical, equal to
    the same function evaluated on a 1-bucket grid ending at the pin.
    A pin without a [range], and faithful mode, still fail loudly."""
    import pytest

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    pin = 1704153600  # 2024-01-02
    out = promql_range(
        ev,
        f"sum_over_time(view[86400s] @ {pin})",
        1704067200.0,
        1704070800.0,
        600,
        cols=EV_CENTS,
    ).collect()
    assert len(out) == 7  # 7 grid steps, one series
    assert len({r.value for r in out}) == 1
    # equal to the sum over the closed pinned window, computed directly
    from pyspark.sql import functions as F

    ref = ev.filter(
        (F.col("event_type") == "view")
        & (F.col("ts") >= F.timestamp_seconds(F.lit(pin - 86400)))
        & (F.col("ts") <= F.timestamp_seconds(F.lit(pin)))
    ).agg(F.sum("value_cents").alias("s")).first()
    assert out[0].value == float(ref.s)

    with pytest.raises(ValueError, match="faithful"):
        promql_range(
            ev, f"rate(view[600s] @ {pin})", 1704067200.0, 1704070800.0,
            600, cols=EV_CENTS, faithful=True,
        )


def test_at_pinned_range_replicates_instant_vector(spark, sf_dir):
    """`sum by (l) (m @ t)` as a RANGE query: every grid step evaluates at
    the pin, so each series is constant across the grid and equals the
    instant result at t (PromQL @-on-range semantics)."""
    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    start_s, end_s, step = 1704067200.0, 1704070800.0, 600
    rng = promql_range(
        ev,
        "sum by (user_id) (purchase @ 1704499200)",
        start_s,
        end_s,
        step,
        cols=EV_CENTS,
    ).collect()
    inst = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "sum by (user_id) (purchase @ 1704499200)", cols=EV_CENTS
        ).collect()
    }
    n_buckets = int(end_s // step) - int(start_s // step) + 1
    assert len(rng) == n_buckets * len(inst)
    for r in rng:
        assert r.value == inst[r.user_id]
    assert len({r.time_bucket for r in rng}) == n_buckets


def test_at_start_end_sugar(spark, sf_dir):
    """`@ start()` / `@ end()` resolve to the query range bounds; for
    instant queries both are the evaluation time; quoted occurrences are
    data; with no eval time the pin drops (default @ now)."""
    from cardinalsin_spark.operators.promql import (
        _resolve_at_bounds,
        promql_instant,
        promql_range,
    )
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    # textual resolution
    assert _resolve_at_bounds("m @ start()", 10.0, 20.0) == "m @ 10"
    assert _resolve_at_bounds("m @ end()", 10.0, 20.5) == "m @ 20.5"
    assert _resolve_at_bounds("m @ start()", None, None) == "m"
    assert (
        _resolve_at_bounds('m{note=" @ start()"}', 10.0, 20.0)
        == 'm{note=" @ start()"}'
    )

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0
    base = promql_instant(
        ev, 'sum by (user_id) (signup{user_id=~"1.*"})', time_s=t, cols=EV_CENTS
    ).collect()
    for sugar in ("start()", "end()"):
        got = promql_instant(
            ev,
            f'sum by (user_id) (signup{{user_id=~"1.*"}} @ {sugar})',
            time_s=t,
            cols=EV_CENTS,
        ).collect()
        assert got == base, sugar

    # range: `m @ end()` equals the explicit numeric pin at end_s
    start_s, end_s, step = 1704067200.0, 1704070800.0, 600
    a = promql_range(
        ev, "sum by (user_id) (purchase @ end())", start_s, end_s, step,
        cols=EV_CENTS,
    ).collect()
    b = promql_range(
        ev, f"sum by (user_id) (purchase @ {int(end_s)})", start_s, end_s,
        step, cols=EV_CENTS,
    ).collect()
    assert a == b and len(a) > 0


def test_set_operators_partition_and_semantics(spark, sf_dir):
    """`and`/`unless` partition the lhs exactly; `or` adds only rhs groups
    absent from lhs; on(...) overrides the shared-label match; quoted
    ` and ` inside a matcher value is data, not an operator."""
    from cardinalsin_spark.operators.promql import (
        _split_top_level_setop,
        promql_instant,
        promql_range,
    )
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    def rows(expr):
        return promql_instant(ev, expr, time_s=t, cols=EV_CENTS).collect()

    lhs = rows("sum by (user_id) (purchase)")
    kept = rows(
        'sum by (user_id) (purchase) and sum by (user_id) (signup{user_id=~"1.*"})'
    )
    dropped = rows(
        'sum by (user_id) (purchase) unless sum by (user_id) (signup{user_id=~"1.*"})'
    )
    assert len(kept) + len(dropped) == len(lhs)
    assert {r.user_id for r in kept} | {r.user_id for r in dropped} == {
        r.user_id for r in lhs
    }
    # and/unless keep lhs values untouched
    by_uid = {r.user_id: r.value for r in lhs}
    assert all(by_uid[r.user_id] == r.value for r in kept + dropped)

    both = rows("sum by (user_id) (purchase) or sum by (user_id) (error)")
    err = rows("sum by (user_id) (error)")
    lhs_uids = {r.user_id for r in lhs}
    expect_extra = {r.user_id for r in err} - lhs_uids
    assert len(both) == len(lhs) + len(expect_extra)
    assert all(
        r.event_type == "purchase" for r in both if r.user_id in lhs_uids
    )

    # explicit on(...) matching
    on_kept = rows(
        "sum by (user_id) (purchase) and on(user_id) sum by (user_id) (error)"
    )
    assert {r.user_id for r in on_kept} == lhs_uids & {r.user_id for r in err}

    # quoted operator text is data
    assert _split_top_level_setop('m{note=" x and y "}') is None
    # range shape carries time_bucket into the match key
    rng = promql_range(
        ev,
        "sum by (user_id) (purchase) unless sum by (user_id) (purchase)",
        1704067200.0,
        1706745600.0,
        86400,
        cols=EV_CENTS,
    )
    assert rng.count() == 0  # self-unless is empty per (bucket, labels)


def test_ignoring_matching_modifier(spark):
    """`ignoring(env)` must equal the complementary `on(host)` for both
    arithmetic and set operators; ignoring an unshared label is a no-op."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import (
        Ignoring,
        _split_top_level_binop,
        promql_instant,
    )
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t = dt.datetime(2024, 1, 1)
    rows = []
    for host in ("a", "b"):
        for env in ("prod", "dev"):
            rows.append(Row(timestamp=t, metric_name="used", host=host,
                            env=env, value=10.0 if host == "a" else 30.0))
        rows.append(Row(timestamp=t, metric_name="total", host=host,
                        env="prod", value=40.0))
    df = spark.createDataFrame(rows)
    cols = MetricsCols()
    ts = 1704067200.0

    # parse: ignoring() lands in the on_labels slot as an Ignoring marker
    _, _, on, _, _, _ = _split_top_level_binop(
        "sum by (host, env) (used) / ignoring(env) sum by (host) (total)"
    )
    assert isinstance(on, Ignoring) and list(on) == ["env"]

    def run(expr):
        return sorted(
            (tuple(sorted((k, v) for k, v in r.asDict().items()
                          if k != "value")), r.value)
            for r in promql_instant(df, expr, time_s=ts, cols=cols).collect()
        )

    via_on = run("sum by (host, env) (used) / on(host) sum by (host) (total)")
    via_ign = run(
        "sum by (host, env) (used) / ignoring(env) sum by (host) (total)"
    )
    assert via_on == via_ign and len(via_on) == 4
    vals = {dict(k)["host"]: v for k, v in via_ign}
    assert vals == {"a": 0.25, "b": 0.75}

    # set op: ignoring an unshared label equals the unmodified match
    plain = run("sum by (host) (used) and sum by (host) (total)")
    ign = run("sum by (host) (used) and ignoring(nosuch) sum by (host) (total)")
    assert plain == ign and len(plain) == 2


def test_vector_comparison_binops(spark, sf_dir):
    """Vector-vector comparisons: filter semantics partition the matched
    set, `bool` yields 0/1 for every matched pair with the metric name
    dropped, scalar rhs on the RANGE grid filters without a join, and the
    splitter respects quotes/braces."""
    from cardinalsin_spark.operators.promql import (
        _split_top_level_cmp,
        promql_instant,
        promql_range,
    )
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    def rows(expr):
        return promql_instant(ev, expr, time_s=t, cols=EV_CENTS).collect()

    gt = rows("sum by (user_id) (purchase) > sum by (user_id) (view)")
    le = rows("sum by (user_id) (purchase) <= sum by (user_id) (view)")
    p = rows("sum by (user_id) (purchase)")
    v_uids = {r.user_id for r in rows("sum by (user_id) (view)")}
    matched = [r for r in p if r.user_id in v_uids]
    assert len(gt) + len(le) == len(matched)
    by_uid = {r.user_id: r.value for r in p}
    assert all(r.value == by_uid[r.user_id] for r in gt)  # lhs values kept

    bo = rows("sum by (user_id) (purchase) > bool sum by (user_id) (view)")
    assert len(bo) == len(matched)
    assert sum(1 for r in bo if r.value == 1.0) == len(gt)
    assert all(r.value in (0.0, 1.0) for r in bo)
    assert "event_type" not in bo[0].asDict()  # bool drops the metric name

    # matcher-internal != never splits; quoted operator text is data
    assert _split_top_level_cmp('m{env!="dev"}') is None
    assert _split_top_level_cmp('m{note=" a > b "}') is None

    # range: scalar rhs filters the grid; self->= keeps everything
    r0 = promql_range(
        ev, "sum by (user_id) (purchase)", 1704067200.0, 1706745600.0,
        604800, cols=EV_CENTS,
    )
    r_ge = promql_range(
        ev,
        "sum by (user_id) (purchase) >= sum by (user_id) (purchase)",
        1704067200.0, 1706745600.0, 604800, cols=EV_CENTS,
    )
    assert r_ge.count() == r0.count() > 0
    r_cut = promql_range(
        ev, "sum by (user_id) (purchase) > 13000", 1704067200.0, 1706745600.0,
        604800, cols=EV_CENTS,
    )
    assert 0 < r_cut.count() < r0.count()


def test_scalar_function(spark, sf_dir):
    """scalar(v): folds a 1-sample vector like a literal; NaN when the
    vector has != 1 samples; standalone form yields one unlabeled sample;
    range queries reject it loudly."""
    import math

    import pytest

    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    total = promql_instant(ev, "sum(purchase)", time_s=t, cols=EV_CENTS)
    (tr,) = total.collect()
    (sr,) = promql_instant(
        ev, "scalar(sum(purchase))", time_s=t, cols=EV_CENTS
    ).collect()
    assert sr.value == float(tr.value) and list(sr.asDict()) == ["value"]

    per_user = {
        r.user_id: r.value
        for r in promql_instant(
            ev, "sum by (user_id) (purchase)", time_s=t, cols=EV_CENTS
        ).collect()
    }
    folded = promql_instant(
        ev,
        "sum by (user_id) (purchase) / scalar(sum(purchase))",
        time_s=t,
        cols=EV_CENTS,
    ).collect()
    assert len(folded) == len(per_user)
    for r in folded:
        assert r.value == per_user[r.user_id] / float(tr.value)
    # scalar on the left folds too
    left = promql_instant(
        ev,
        "scalar(sum(purchase)) - sum by (user_id) (purchase)",
        time_s=t,
        cols=EV_CENTS,
    ).collect()
    for r in left:
        assert r.value == float(tr.value) - per_user[r.user_id]

    # multi-sample inner vector → NaN
    (nan_r,) = promql_instant(
        ev, "scalar(sum by (user_id) (purchase))", time_s=t, cols=EV_CENTS
    ).collect()
    assert math.isnan(nan_r.value)

    # range-grid scalar() is per-step since r8 (VERDICT r7 item 5): the
    # fold ratio at each step equals the two direct per-step aggregates
    lo, hi, stp = 1704067200.0, 1706745600.0, 86400
    ratio = promql_range(
        ev, "sum(purchase) / scalar(sum(view))", lo, hi, stp, cols=EV_CENTS
    ).collect()
    p = {
        r.time_bucket: float(r.value)
        for r in promql_range(
            ev, "sum(purchase)", lo, hi, stp, cols=EV_CENTS
        ).collect()
    }
    v = {
        r.time_bucket: float(r.value)
        for r in promql_range(
            ev, "sum(view)", lo, hi, stp, cols=EV_CENTS
        ).collect()
    }
    assert ratio and len(ratio) == len(p)
    for r in ratio:
        assert r.value == p[r.time_bucket] / v[r.time_bucket]


def test_range_fn_at_pin_and_per_step_scalar(spark, sf_dir):
    """VERDICT r7 items 4+5: `rate(m[w] @ t)` in a range query evaluates
    the function once over [t-w, t] and replicates it across the grid;
    `scalar(v)` in a range query is per-STEP (one value per time_bucket,
    NaN where the step's vector has != 1 samples), both standalone and as
    a binop fold on either side."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    lo, hi, step = 1704067200.0, 1704070800.0, 600
    pin = 1705276800

    # pinned range function: constant across the grid, equal to the
    # manual (max-min) over the pinned window
    out = promql_range(
        ev, f"increase(purchase[86400s] @ {pin})", lo, hi, step, cols=EV_CENTS
    ).collect()
    n_steps = int(hi // step) - int(lo // step) + 1
    assert len(out) == n_steps
    assert len({r.value for r in out}) == 1  # constant per step
    window = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.timestamp_seconds(F.lit(pin - 86400)))
        & (F.col("ts") <= F.timestamp_seconds(F.lit(pin)))
    ).agg((F.max("value_cents") - F.min("value_cents")).alias("d")).first()
    assert out[0].value == float(window.d)

    # faithful mode + pinned function: loud, not silently-different
    with pytest.raises(ValueError, match="faithful"):
        promql_range(
            ev, f"rate(purchase[300s] @ {pin})", lo, hi, step,
            cols=EV_CENTS, faithful=True,
        )

    # standalone per-step scalar: sum(purchase) per bucket where the inner
    # vector has exactly one sample; multi-series inner → NaN per step
    sc = promql_range(ev, "scalar(sum(purchase))", lo, hi, step, cols=EV_CENTS)
    rows = sc.collect()
    assert [str(r.time_bucket) for r in rows] == sorted(
        str(r.time_bucket) for r in rows
    )
    direct = {
        r.time_bucket: float(r.value)
        for r in promql_range(
            ev, "sum(purchase)", lo, hi, step, cols=EV_CENTS
        ).collect()
    }
    for r in rows:
        if r.time_bucket in direct:
            assert r.value == direct[r.time_bucket]
        else:
            assert math.isnan(r.value)  # empty step → NaN, not missing
    # multi-series inner: NaN exactly where the step holds != 1 samples
    multi = promql_range(
        ev, "scalar(sum by (user_id) (purchase))", lo, hi, step, cols=EV_CENTS
    ).collect()
    inner = promql_range(
        ev, "sum by (user_id) (purchase)", lo, hi, step, cols=EV_CENTS
    ).collect()
    by_bucket: dict = {}
    for r in inner:
        by_bucket.setdefault(r.time_bucket, []).append(float(r.value))
    assert multi
    for r in multi:
        samples = by_bucket.get(r.time_bucket, [])
        if len(samples) == 1:
            assert r.value == samples[0], r
        else:
            assert math.isnan(r.value), r

    # binop fold on both sides, per step
    share = promql_range(
        ev, "sum by (user_id) (purchase) / scalar(sum(purchase))",
        lo, hi, step, cols=EV_CENTS,
    ).collect()
    assert share
    from collections import defaultdict

    per_bucket = defaultdict(float)
    for r in share:
        per_bucket[r.time_bucket] += r.value
    assert all(abs(v - 1.0) < 1e-9 for v in per_bucket.values())
    flipped = promql_range(
        ev, "scalar(sum(purchase)) * sum by (user_id) (purchase)",
        lo, hi, step, cols=EV_CENTS,
    ).collect()
    direct_by = {
        (r.time_bucket, r.user_id): r.value
        for r in promql_range(
            ev, "sum by (user_id) (purchase)", lo, hi, step, cols=EV_CENTS
        ).collect()
    }
    for r in flipped:
        key = (r.time_bucket, r.user_id)
        assert r.value == direct[r.time_bucket] * direct_by[key]


def test_vector_literal_and_empty_key_setops(spark, sf_dir):
    """`vector(s)` is a one-sample label-free vector (per-step constant on
    the range grid), and set ops with NO shared label columns match on the
    empty label set: `sum(m) or vector(0)` is the aggregate when data
    exists and the literal otherwise; on the range grid empty steps
    gap-fill per bucket."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    (v,) = promql_instant(ev, "vector(2.5)", time_s=t, cols=EV_CENTS).collect()
    assert v.value == 2.5 and list(v.asDict()) == ["value"]

    (real,) = promql_instant(ev, "sum(purchase)", time_s=t, cols=EV_CENTS).collect()
    (kept,) = promql_instant(
        ev, "sum(purchase) or vector(0)", time_s=t, cols=EV_CENTS
    ).collect()
    assert kept.value == real.value  # lhs nonempty: literal never fires
    (filled,) = promql_instant(
        ev, 'sum(purchase{user_id="no_such_user"}) or vector(0)',
        time_s=t, cols=EV_CENTS,
    ).collect()
    assert filled.value == 0.0
    # and / unless against the (always nonempty) literal
    (a,) = promql_instant(
        ev, "sum(purchase) and vector(1)", time_s=t, cols=EV_CENTS
    ).collect()
    assert a.value == real.value
    assert (
        promql_instant(
            ev, "sum(purchase) unless vector(1)", time_s=t, cols=EV_CENTS
        ).count()
        == 0
    )

    # range grid: empty steps gap-fill with the literal, per bucket
    lo, hi, step = 1704067200.0, 1704081600.0, 1800
    filled_rng = promql_range(
        ev, "sum(purchase) or vector(0)", lo, hi, step, cols=EV_CENTS
    ).collect()
    direct = {
        r.time_bucket: float(r.value)
        for r in promql_range(
            ev, "sum(purchase)", lo, hi, step, cols=EV_CENTS
        ).collect()
    }
    n_steps = int(hi // step) - int(lo // step) + 1
    assert len(filled_rng) == n_steps
    for r in filled_rng:
        assert float(r.value) == direct.get(r.time_bucket, 0.0)


def test_time_function_instant_and_per_step(spark, sf_dir):
    """`time()`: the evaluation timestamp as a scalar — instant queries
    fold it as the pinned time_s (loud without one), range queries per
    grid step (each bucket's own epoch); `time() - timestamp(v)` is the
    staleness idiom."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    (one,) = promql_instant(ev, "time()", time_s=t, cols=EV_CENTS).collect()
    assert one.value == t
    with pytest.raises(ValueError, match="evaluation time"):
        promql_instant(ev, "time()", cols=EV_CENTS)

    (real,) = promql_instant(ev, "sum(purchase)", time_s=t, cols=EV_CENTS).collect()
    (diff,) = promql_instant(
        ev, "time() - sum(purchase)", time_s=t, cols=EV_CENTS
    ).collect()
    assert diff.value == t - real.value

    lo, hi, step = 1704067200.0, 1704081600.0, 1800
    grid = promql_range(ev, "time()", lo, hi, step, cols=EV_CENTS).collect()
    assert [r.value for r in grid] == [
        float(b * step) for b in range(int(lo // step), int(hi // step) + 1)
    ]
    stale = promql_range(
        ev, "time() - timestamp(purchase)", lo, hi, step, cols=EV_CENTS
    ).collect()
    latest = {
        r.time_bucket: float(r.value)
        for r in promql_range(
            ev, "timestamp(purchase)", lo, hi, step, cols=EV_CENTS
        ).collect()
    }
    import datetime as dt

    assert stale
    for r in stale:
        epoch = r.time_bucket.replace(tzinfo=dt.timezone.utc).timestamp()
        assert r.value == epoch - latest[r.time_bucket]
        assert -step <= r.value <= 0  # bucket-start labeling convention

    with pytest.raises(ValueError, match="time\\(\\) comparisons"):
        promql_range(ev, "purchase > time()", lo, hi, step, cols=EV_CENTS)


def test_cmp_numeric_left_and_setop_paren_edges(spark, sf_dir):
    """ADVICE r7 #3/#4 regressions: a numeric literal on the LEFT of a
    comparison flips onto the vector side (`5 < m` == `m > 5`) instead of
    silently parsing a metric named "5"; set-op keywords end at any
    non-identifier char (`a or(b)` == `a or (b)`); parenthesized operands
    evaluate as their inner expression; scalar-scalar comparison raises."""
    import pytest as _pytest

    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    def rows(expr):
        return sorted(
            (r.user_id, r.value)
            for r in promql_instant(ev, expr, time_s=t, cols=EV_CENTS).collect()
        )

    base = rows("sum by (user_id) (purchase)")
    assert base  # fixture sanity
    thresh = sorted(v for _, v in base)[len(base) // 2]

    # numeric-left comparison == flipped numeric-right comparison (instant)
    assert rows(f"{int(thresh)} < sum by (user_id) (purchase)") == rows(
        f"sum by (user_id) (purchase) > {int(thresh)}"
    )
    assert rows(f"{int(thresh)} >= sum by (user_id) (purchase)") == rows(
        f"sum by (user_id) (purchase) <= {int(thresh)}"
    )
    # ... and on the range grid
    lo, hi, step = 1704067200.0, 1706745600.0, 86400
    a = promql_range(
        ev, f"{int(thresh)} < sum by (user_id) (purchase)", lo, hi, step,
        cols=EV_CENTS,
    ).collect()
    b = promql_range(
        ev, f"sum by (user_id) (purchase) > {int(thresh)}", lo, hi, step,
        cols=EV_CENTS,
    ).collect()
    assert a == b and len(a) > 0

    # scalar-scalar comparison: loud, not empty
    with _pytest.raises(ValueError, match="scalar-scalar"):
        promql_instant(ev, "5 < 3", time_s=t, cols=EV_CENTS)

    # keyword-paren set ops parse identically to the spaced form
    spaced = rows(
        "sum by (user_id) (purchase) and (sum by (user_id) (view))"
    )
    tight = rows("sum by (user_id) (purchase) and(sum by (user_id) (view))")
    assert spaced == tight and len(spaced) > 0
    assert rows(
        "sum by (user_id) (purchase) unless(sum by (user_id) (view))"
    ) == rows("sum by (user_id) (purchase) unless (sum by (user_id) (view))")
    assert rows("sum by (user_id) (purchase) or(sum by (user_id) (view))") == rows(
        "sum by (user_id) (purchase) or (sum by (user_id) (view))"
    )

    # parenthesized operands/expressions evaluate as their inner expression
    assert rows("(sum by (user_id) (purchase))") == base
    assert rows(
        f"sum by (user_id) (purchase) and (sum by (user_id) (purchase) > {int(thresh)})"
    ) == rows(f"sum by (user_id) (purchase) > {int(thresh)}")

    # a metric whose name merely STARTS with a keyword is not split
    from cardinalsin_spark.operators.promql import _split_top_level_setop

    assert _split_top_level_setop("m andromeda") is None
    assert _split_top_level_setop("orders or android") is not None  # real op


def test_splitter_fuzz_never_crashes_and_reassembles():
    """Property test over the three top-level splitters: on randomly
    composed expressions (quotes, braces, nested parens, operator words
    inside strings) they must never throw, never split inside
    parens/quotes, and any split must reassemble to the original text
    modulo the operator token and surrounding whitespace."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cardinalsin_spark.operators.promql import (
        _split_top_level_binop,
        _split_top_level_cmp,
        _split_top_level_setop,
    )

    atom = st.sampled_from([
        "m", "rate(m[5m])", 'm{a="x and y", b!="p > q"}',
        "sum by (h) (m)", 'm{note=" or "}', "scalar(sum(m))",
        "histogram_quantile(0.9, m_bucket)", "m offset 5m", "m @ 123",
        "(m > 3)", "(sum by (h) (m))", "5",
        # subquery grammar (round 8): both directions + parenthesized inner
        "sum_over_time(m[1h:10m])", "rate(m[1h:10m])",
        "max_over_time((a / b)[2h:1h])", "increase((m)[1d:6h])",
        # round 9: fraction grammar + fractional thresholds/bounds,
        # per-step topk convention
        "histogram_fraction(1, 5, m_bucket)",
        "histogram_fraction(0.05, 0.15, m_bucket)",
        "histogram_quantile(0.99, m_bucket{le=\"0.5\"})",
        "topk by (h) (3, m)",
        # round 10: exp-bucket family routing, bare-brace/__name__
        # selectors, faithful instant range functions
        "histogram_quantile(0.5, rt_exp_bucket)",
        "histogram_fraction(0, 2, rt_exp_bucket)",
        '{__name__=~"m.*"}',
        "resets(m[10m])", "deriv(m[4m])", "predict_linear(m[4m], 60)",
    ])
    op = st.sampled_from([
        " + ", " - ", " * ", " / ", " % ", " ^ ", " atan2 ",
        " and ", " or ", " unless ",
        " > ", " <= ", " == ", " > bool ", " and on(h) ",
    ])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(atom, min_size=1, max_size=4), st.lists(op, max_size=3))
    def check(atoms, ops):
        expr = atoms[0]
        for i, o in enumerate(ops):
            expr = expr + o + atoms[(i + 1) % len(atoms)]
        for splitter in (
            _split_top_level_setop,
            _split_top_level_cmp,
            _split_top_level_binop,
        ):
            res = splitter(expr)  # must not throw
            if res is None:
                continue
            left, right = res[0], res[-1]
            assert left and right
            # split pieces are genuine substrings (no mangling)
            assert expr.strip().startswith(left)
            assert expr.strip().endswith(right)
            # never split inside a paren/brace/bracket group
            for piece in (left, right):
                depth = 0
                in_str = None
                for ch in piece:
                    if in_str:
                        if ch == in_str:
                            in_str = None
                    elif ch in "\"'":
                        in_str = ch
                    elif ch in "({[":
                        depth += 1
                    elif ch in ")}]":
                        depth -= 1
                assert depth == 0 and in_str is None, (piece, expr)

    check()


def test_histogram_fraction_interpolation():
    """histogram_fraction over a hand-built cumulative-bucket frame:
    interpolated thresholds, boundary-aligned thresholds, an hi landing
    in the +Inf bucket, the full range, and the lo>=hi guard."""
    import pytest

    from cardinalsin_spark.operators.promql import (
        LE_INF,
        histogram_fraction_cumulative,
    )
    from cardinalsin_spark.session import get_spark

    spark = get_spark()
    rows = [("g", 10, 2), ("g", 20, 5), ("g", 40, 9), ("g", LE_INF, 10)]
    b = spark.createDataFrame(rows, "grp string, le long, cum long")

    def frac(lo, hi):
        (r,) = histogram_fraction_cumulative(b, lo, hi, ["grp"]).collect()
        return r.value

    assert frac(15, 30) == 0.35  # F(30)=7, F(15)=3.5, total 10
    assert frac(10, 20) == 0.3  # boundary-aligned: exact cum difference
    assert frac(20, 100) == 0.5  # hi beyond max finite le -> F=total
    assert frac(0, 100) == 1.0
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_fraction_cumulative(b, 30, 15, ["grp"])


def test_cmp_group_left_modifier(spark, sf_dir):
    """group_left on a comparison filter keeps the (many) lhs samples
    passing the per-group comparison — and the unsupported variants
    (group_right, label-carry) fail loudly instead of silently parsing
    'group_left ...' as a selector (the pre-r8 behavior)."""
    import pytest

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1705276800.0

    plain = promql_instant(
        ev, "sum by (user_id) (purchase) > on(user_id) sum by (user_id) (view)",
        time_s=t, cols=EV_CENTS,
    ).collect()
    modified = promql_instant(
        ev,
        "sum by (user_id) (purchase) > on(user_id) group_left "
        "sum by (user_id) (view)",
        time_s=t, cols=EV_CENTS,
    ).collect()
    assert plain == modified and len(plain) > 0

    with pytest.raises(ValueError, match="group_right"):
        promql_instant(
            ev,
            "sum by (user_id) (purchase) > on(user_id) group_right "
            "sum by (user_id) (view)",
            time_s=t, cols=EV_CENTS,
        )
    with pytest.raises(ValueError, match="label-carry"):
        promql_instant(
            ev,
            "sum by (user_id) (purchase) > on(user_id) group_left(event_type) "
            "sum by (user_id) (view)",
            time_s=t, cols=EV_CENTS,
        )


def test_range_fn_over_subquery(spark, sf_dir):
    """rate/increase/delta over a subquery: inner expr evaluates on the
    resolution grid, the outer window applies the reference's MAX−MIN
    form per W bucket. Verified against a hand-built two-level
    computation; irate/deriv and faithful variants loud-reject; an
    expression that no grammar branch recognizes raises instead of
    silently filtering on a nonsense metric name."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    kw = dict(
        start_s=1704067200.0,
        end_s=1704067200.0 + 86400 * 8,
        step_s=2 * 86400,
        cols=EV_CENTS,
    )
    got = {
        (r.time_bucket, r.event_type): r.value
        for r in promql_range(ev, "increase(purchase[2d:1d])", **kw).collect()
    }
    assert got
    import datetime as _dt

    inner = promql_range(ev, "purchase", **{**kw, "step_s": 86400})
    two_day = {}
    for r in inner.collect():
        epoch = r.time_bucket.replace(tzinfo=_dt.timezone.utc).timestamp()
        b = _dt.datetime.fromtimestamp(
            (int(epoch) // 172800) * 172800, _dt.timezone.utc
        ).replace(tzinfo=None)
        two_day.setdefault((b, r.event_type), []).append(r.value)
    want = {k: max(v) - min(v) for k, v in two_day.items()}
    assert got == want
    rate = {
        (r.time_bucket, r.event_type): r.value
        for r in promql_range(ev, "rate(purchase[2d:1d])", **kw).collect()
    }
    assert rate == {k: v / (2 * 86400.0) for k, v in want.items()}
    import pytest as _pt

    with _pt.raises(ValueError, match="over a subquery"):
        promql_range(ev, "deriv(purchase[2d:1d])", **kw)
    with _pt.raises(ValueError, match="faithful"):
        promql_range(ev, "rate(purchase[2d:1d])", **{**kw, "faithful": True})
    with _pt.raises(ValueError, match="unparseable"):
        promql_range(ev, "rate(purchase[2d:1d]", **kw)  # unbalanced residue


def test_parse_fallback_rejects_expression_residue():
    """The leaf parser's reference fallback (whole string = metric name)
    must only accept name-shaped residue: matrix selectors, unbalanced
    fragments, operator/quote/whitespace leftovers raise instead of
    silently filtering on a nonsense metric name. Weird-but-plausible
    names (dashes — the reference's lax model, pinned by
    test_fallback_whole_string — colons, dunders) still pass through."""
    import pytest as _pt

    from cardinalsin_spark.operators.promql import parse_promql

    for bad in ["m[5m]", "rate(m[5m]", "a|b", "m~x", "''", "m n", "m^2y"]:
        with _pt.raises(ValueError, match="unparseable"):
            parse_promql(bad)
    for good in ["valid_name", "name:with:colons", "__name__", "-m", "m-n"]:
        assert parse_promql(good).metric_name == good
    # quoted matcher values keep their operator-looking content
    p = parse_promql('m{label="va[l-u/e"}')
    assert p.metric_name == "m" and p.label_matchers[0].value == "va[l-u/e"


def test_instant_subquery(spark, sf_dir):
    """Instant-query subqueries: `avg_over_time(purchase[2d:1d])` at T
    aggregates the inner 1d-grid points over the closed [T−2d, T] window,
    one row per series — verified against the hand-built inner range;
    rate over a subquery divides the MAX−MIN spread by W. Missing
    resolution and unpinned time loud-reject."""
    import pytest as _pt

    from cardinalsin_spark.operators.promql import promql_instant, promql_range
    from cardinalsin_spark.queries import EV_CENTS, _events_promql

    ev = _events_promql(spark, sf_dir)
    t = 1704067200.0 + 86400 * 10
    got = promql_instant(
        ev, "avg_over_time(purchase[2d:1d])", time_s=t, cols=EV_CENTS
    ).collect()
    assert len(got) == 1
    inner = promql_range(
        ev, "purchase", start_s=t - 2 * 86400, end_s=t, step_s=86400,
        cols=EV_CENTS,
    ).collect()
    vals = [r.value for r in inner]
    assert got[0].value == sum(vals) / len(vals)
    rate = promql_instant(
        ev, "rate(purchase[2d:1d])", time_s=t, cols=EV_CENTS
    ).collect()
    assert rate[0].value == (max(vals) - min(vals)) / (2 * 86400.0)
    with _pt.raises(ValueError, match="explicit resolution"):
        promql_instant(ev, "avg_over_time(purchase[2d:])", time_s=t, cols=EV_CENTS)
    with _pt.raises(ValueError, match="evaluation time"):
        promql_instant(ev, "avg_over_time(purchase[2d:1d])", time_s=None, cols=EV_CENTS)


def test_histogram_quantile_through_range_transpiler(spark):
    """histogram_quantile(0.5, m_bucket) on the range grid: per step the
    latest cumulative count per (series, le) feeds the exact quantile —
    previously this fell to the default AVG arm, which averaged
    cumulative counts ACROSS le buckets (the reference's silent
    degradation; a wrong answer, not a degraded one)."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 1, 0)
    rows = []
    for ts, cums in [(t0, [10, 18, 20]), (t1, [10, 38, 40])]:
        for le, cum in zip(["100", "200", "+Inf"], cums):
            rows.append(
                Row(timestamp=ts, metric_name="lat_bucket", le=le,
                    value=float(cum))
            )
    df = spark.createDataFrame(rows)
    out = promql_range(
        df,
        "histogram_quantile(0.5, lat_bucket)",
        1704067200.0,
        1704067260.0,
        60,
        MetricsCols(),
    ).collect()
    assert [r.time_bucket for r in out] == [t0, t1]
    # step 0: rank 10 -> first bucket: 100*(10-0)/10 = 100
    assert out[0].value == 100.0
    # step 1: rank 20 -> (100,200]: 100 + 100*(20-10)/28 = 135.714285
    assert out[1].value == 135.714285  # floored onto the 1e-6 grid


def test_histogram_fraction_through_transpilers(spark):
    """histogram_fraction(lo, hi, m_bucket) now parses in both query
    modes (previously only the direct-API operator existed; the PromQL
    spelling loud-rejected). Hand check: cums [10, 18, 20] at bounds
    [100, 200, +Inf] -> n(<=150) = 10 + 50*8/100 = 14, n(<=50) = 5,
    fraction = (14-5)/20 = 0.45."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import (
        promql_instant,
        promql_range,
    )
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(timestamp=t0, metric_name="lat_bucket", le=le, value=float(cum))
        for le, cum in zip(["100", "200", "+Inf"], [10, 18, 20])
    ]
    df = spark.createDataFrame(rows)
    inst = promql_instant(
        df, "histogram_fraction(50, 150, lat_bucket)",
        time_s=1704067200.0, cols=MetricsCols(),
    ).collect()
    assert len(inst) == 1 and inst[0].value == 0.45
    rng = promql_range(
        df, "histogram_fraction(50, 150, lat_bucket)",
        1704067200.0, 1704067200.0, 60, MetricsCols(),
    ).collect()
    assert len(rng) == 1 and rng[0].value == 0.45
    # loud-rejects, not silent wrong answers
    import pytest as _pytest

    with _pytest.raises(ValueError, match="finer than 1e-6"):
        promql_instant(
            df, "histogram_fraction(0.0000001, 150, lat_bucket)",
            time_s=1704067200.0, cols=MetricsCols(),
        )
    with _pytest.raises(ValueError, match="lo < hi"):
        promql_instant(
            df, "histogram_fraction(150, 50, lat_bucket)",
            time_s=1704067200.0, cols=MetricsCols(),
        )


def test_histogram_functions_fractional_le_bounds(spark):
    """Real Prometheus instrumentation uses seconds-unit bounds ("0.1",
    "0.25"); the le label now converts to exact micros so fractional
    bounds run on the same exact-integer interpolation (previously the
    long cast raised). Hand check on cums [10, 18, 20] at bounds
    [0.1, 0.2, +Inf]: p50 rank 10 -> first bucket -> 0.1;
    fraction(0.05, 0.15) = (14-5)/20 = 0.45."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(timestamp=t0, metric_name="lat_bucket", le=le, value=float(cum))
        for le, cum in zip(["0.1", "0.2", "+Inf"], [10, 18, 20])
    ]
    df = spark.createDataFrame(rows)
    q = promql_instant(
        df, "histogram_quantile(0.5, lat_bucket)",
        time_s=1704067200.0, cols=MetricsCols(),
    ).collect()
    assert len(q) == 1 and q[0].value == 0.1
    fr = promql_instant(
        df, "histogram_fraction(0.05, 0.15, lat_bucket)",
        time_s=1704067200.0, cols=MetricsCols(),
    ).collect()
    assert len(fr) == 1 and fr[0].value == 0.45


def test_range_topk_and_count_values_are_real(spark):
    """topk/bottomk/count_values on the range grid previously fell to the
    generic aggregation arm's AVG fallback (one averaged row per step —
    the reference's degradation); now each step ranks per-series values /
    counts distinct values, matching the instant path's semantics."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 1, 0)
    rows = []
    for ts, vals in [(t0, [1.0, 2.0, 3.0, 4.0]), (t1, [9.0, 2.0, 3.0, 4.0])]:
        for svc, v in zip(["a", "b", "c", "d"], vals):
            rows.append(
                Row(timestamp=ts, metric_name="m", svc=svc, value=v)
            )
    df = spark.createDataFrame(rows)
    top = promql_range(
        df, "topk by (svc) (2, m)", 1704067200.0, 1704067260.0, 60, MetricsCols()
    ).collect()
    by_step = {}
    for r in top:
        by_step.setdefault(r.time_bucket, []).append((r.svc, r.value))
    assert by_step[t0] == [("d", 4.0), ("c", 3.0)]
    assert by_step[t1] == [("a", 9.0), ("d", 4.0)]  # ranking moves per step

    bot = promql_range(
        df, "bottomk by (svc) (1, m)", 1704067200.0, 1704067260.0, 60, MetricsCols()
    ).collect()
    assert [(r.time_bucket, r.svc, r.value) for r in bot] == [
        (t0, "a", 1.0), (t1, "b", 2.0),
    ]

    cv = promql_range(
        df, 'count_values("v", m)', 1704067200.0, 1704067260.0, 60,
        MetricsCols(),
    ).collect()
    got = {(r.time_bucket, r.v): r.value for r in cv}
    assert got[(t0, 1.0)] == 1 and got[(t1, 9.0)] == 1
    assert got[(t0, 4.0)] == 1 and got[(t1, 3.0)] == 1
    assert len([k for k in got if k[0] == t0]) == 4


def test_bare_brace_and_name_matcher_selectors(spark):
    """The standard Prometheus multi-metric idiom `{__name__=~"..."}`:
    __name__ is the metric-name pseudo-label, an equality __name__
    promotes to the metric name, `{}` loud-rejects."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import (
        parse_promql,
        promql_instant,
    )
    from cardinalsin_spark.operators.timeseries import MetricsCols

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(timestamp=t0, metric_name=n, svc=s, value=v)
        for n, s, v in [
            ("api_req", "a", 3.0), ("api_err", "a", 1.0), ("web_req", "b", 9.0),
        ]
    ]
    df = spark.createDataFrame(rows)

    # engine convention: metric_name stays in every aggregation's output
    # identity, so a multi-metric selector sums PER MATCHED METRIC
    out = promql_instant(
        df, 'sum({__name__=~"api_.*"})', time_s=1704067200.0,
        cols=MetricsCols(),
    ).collect()
    got = {r.metric_name: r.value for r in out}
    assert got == {"api_req": 3.0, "api_err": 1.0}

    # regex name + ordinary label matcher combine
    out = promql_instant(
        df, 'sum({__name__=~"api_.*", svc="a"})', time_s=1704067200.0,
        cols=MetricsCols(),
    ).collect()
    assert {r.metric_name: r.value for r in out} == {
        "api_req": 3.0, "api_err": 1.0,
    }
    out = promql_instant(
        df, 'sum({__name__=~".*_req", svc=~"a|b"})', time_s=1704067200.0,
        cols=MetricsCols(),
    ).collect()
    assert {r.metric_name: r.value for r in out} == {
        "api_req": 3.0, "web_req": 9.0,
    }

    # equality __name__ promotes to the metric name
    p = parse_promql('{__name__="api_req", svc="a"}')
    assert p.metric_name == "api_req"
    assert [(m.label, m.op) for m in p.label_matchers] == [("svc", "=")]

    # __name__ never becomes a label column (grouping still works)
    from cardinalsin_spark.operators.promql import discover_label_columns

    assert discover_label_columns(
        parse_promql('{__name__=~"api_.*", svc="a"}')
    ) == ["svc"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="matches everything"):
        parse_promql("{}")


def test_instant_range_vector_functions(spark):
    """rate/increase/avg_over_time at an INSTANT — the canonical alert
    query — evaluate over [T − range, T] with the reference's function
    semantics. Previously these fell through to the latest-sample
    selector branch (rate(c[5m]) returned the raw last sample — a silent
    wrong answer)."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    rows = [
        Row(timestamp=dt.datetime(2024, 1, 1, 0, m), metric_name="c",
            svc="a", value=float(v))
        for m, v in [(0, 10.0), (2, 20.0), (4, 40.0)]
    ]
    df = spark.createDataFrame(rows)
    t = 1704067200.0 + 300  # 00:05, window covers all three samples

    def val(q):
        out = promql_instant(df, q, time_s=t, cols=MetricsCols()).collect()
        assert len(out) == 1
        return out[0].value

    assert val("rate(c[5m])") == (40.0 - 10.0) / 300  # MAX-MIN reference mode
    assert val("increase(c[5m])") == 30.0
    assert val("avg_over_time(c[5m])") == (10 + 20 + 40) / 3
    assert val("max_over_time(c[5m])") == 40.0
    assert val("count_over_time(c[5m])") == 3
    assert val("last_over_time(c[5m])") == 40.0
    # window bounds respected: [T-2m-eps] sees only the last two samples
    assert val("increase(c[3m])") == 20.0
    # offset shifts the window
    assert val("increase(c[3m] offset 2m)") == 10.0
    # matcher labels survive as output columns
    out = promql_instant(
        df, 'rate(c{svc="a"}[5m])', time_s=t, cols=MetricsCols()
    ).collect()
    assert out[0].svc == "a" and out[0].value == 0.1
    # unpinned instant has no window end: loud, not empty
    import pytest as _pytest

    with _pytest.raises(ValueError, match="evaluation time"):
        promql_instant(df, "rate(c[5m])", cols=MetricsCols())


def test_instant_resets_deriv_faithful(spark):
    """VERDICT r9 item 5: resets/changes/idelta/deriv/predict_linear at an
    INSTANT evaluate the real PromQL semantics (closed forms below) — the
    old path silently returned the window AVG, a wrong answer with no
    reference analogue to excuse it."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols

    # counter with one reset, one repeat: 10, 20, 20, 5, 15
    vals = [10.0, 20.0, 20.0, 5.0, 15.0]
    rows = [
        Row(timestamp=dt.datetime(2024, 1, 1, 0, m), metric_name="c",
            value=v)
        for m, v in zip(range(0, 10, 2), vals)
    ]
    df = spark.createDataFrame(rows)
    t = 1704067200.0 + 600  # 00:10

    def val(q):
        out = promql_instant(df, q, time_s=t, cols=MetricsCols()).collect()
        assert len(out) == 1, q
        return out[0].value

    assert val("resets(c[10m])") == 1.0  # only 20 -> 5 drops
    assert val("changes(c[10m])") == 3.0  # 10->20, 20->5, 5->15
    assert val("idelta(c[10m])") == 10.0  # 15 - 5
    # deriv over an exact line y = 2x + 10 (x = seconds since first
    # sample): slope exactly 2/120 per second... use a clean line instead
    line = [
        Row(timestamp=dt.datetime(2024, 1, 1, 0, m), metric_name="g",
            value=float(100 + 60 * m))  # 1 unit per second
        for m in (0, 2, 4)
    ]
    gdf = spark.createDataFrame(line)
    gt = 1704067200.0 + 240
    gout = promql_instant(
        gdf, "deriv(g[4m])", time_s=gt, cols=MetricsCols()
    ).collect()
    assert len(gout) == 1 and gout[0].value == 1.0  # exact slope
    # predict_linear: the same line extrapolated 60s past T —
    # value(T) = 100 + 240 = 340, +60s -> 400
    pout = promql_instant(
        gdf, "predict_linear(g[4m], 60)", time_s=gt, cols=MetricsCols()
    ).collect()
    assert len(pout) == 1 and pout[0].value == 400.0
    # single-sample windows: resets/changes = 0, idelta/deriv emit nothing
    one = spark.createDataFrame(line[:1])
    assert promql_instant(
        one, "resets(g[4m])", time_s=gt, cols=MetricsCols()
    ).collect()[0].value == 0.0
    assert promql_instant(
        one, "idelta(g[4m])", time_s=gt, cols=MetricsCols()
    ).count() == 0
    assert promql_instant(
        one, "deriv(g[4m])", time_s=gt, cols=MetricsCols()
    ).count() == 0
    # @-pinned range mode replicates the faithful value across the grid
    from cardinalsin_spark.operators.promql import promql_range

    rng = promql_range(
        gdf, f"deriv(g[4m] @ {int(gt)})", gt, gt + 120, 60,
        cols=MetricsCols(),
    ).collect()
    assert len(rng) == 3 and all(r.value == 1.0 for r in rng)

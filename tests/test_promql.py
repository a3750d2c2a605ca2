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

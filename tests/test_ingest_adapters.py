"""OTLP/JSON and Prometheus remote-write adapters: wire-format decode,
label pivoting, histogram collapse, value-type routing."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.sources.otlp import otlp_json_flatten, otlp_to_metrics
from cardinalsin_spark.sources.remote_write import (
    decode_write_request,
    remote_write_to_metrics,
)


# --- tiny test-side protobuf encoder (wire format only) ---------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field_no: int, payload: bytes) -> bytes:  # length-delimited
    return _varint(field_no << 3 | 2) + _varint(len(payload)) + payload


def _label(name: str, value: str) -> bytes:
    return _ld(1, name.encode()) + _ld(2, value.encode())


def _sample(value: float, ts_ms: int) -> bytes:
    return (
        _varint(1 << 3 | 1)
        + struct.pack("<d", value)
        + _varint(2 << 3 | 0)
        + _varint(ts_ms & (1 << 64) - 1)
    )


def _write_request(series: list[tuple[dict, list[tuple[float, int]]]]) -> bytes:
    out = b""
    for labels, samples in series:
        ts = b"".join(_ld(1, _label(k, v)) for k, v in labels.items())
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        out += _ld(1, ts)
    return out


def test_decode_write_request_roundtrip():
    payload = _write_request(
        [
            ({"__name__": "cpu", "host": "a"}, [(1.5, 1000), (7.0, 2000)]),
            ({"__name__": "mem", "host": "b", "env": "prod"}, [(-3.0, 1500)]),
        ]
    )
    rows = decode_write_request(payload)
    assert (1000, "cpu", 1.5, {"host": "a"}) in rows
    assert (2000, "cpu", 7.0, {"host": "a"}) in rows
    assert (1500, "mem", -3.0, {"host": "b", "env": "prod"}) in rows


def test_remote_write_to_metrics(spark):
    payload = _write_request(
        [
            ({"__name__": "cpu", "host": "a"}, [(1.5, 1000)]),
            ({"__name__": "req_total", "host": "b"}, [(42.0, 2000)]),
            ({"__name__": "delta", "host": "c"}, [(-2.0, 3000)]),
        ]
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    out = remote_write_to_metrics(df)
    rows = {r.metric_name: r for r in out.collect()}
    assert rows["cpu"].value_f64 == 1.5 and rows["cpu"].host == "a"
    # integral non-negative → u64 routing (reference semantics)
    assert rows["req_total"].value_u64 == 42 and rows["req_total"].value_f64 is None
    assert rows["delta"].value_i64 == -2
    assert rows["cpu"].ts_ns == 1000 * 1_000_000


def _otlp_payload() -> str:
    return json.dumps(
        {
            "resourceMetrics": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service", "value": {"stringValue": "api"}},
                            {"key": "env", "value": {"stringValue": "prod"}},
                        ]
                    },
                    "scopeMetrics": [
                        {
                            "metrics": [
                                {
                                    "name": "latency",
                                    "gauge": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "1700000000000000000",
                                                "asDouble": 12.5,
                                                "attributes": [
                                                    {
                                                        "key": "env",
                                                        "value": {
                                                            "stringValue": "canary"
                                                        },
                                                    }
                                                ],
                                            }
                                        ]
                                    },
                                },
                                {
                                    "name": "requests",
                                    "sum": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "1700000000000000001",
                                                "asInt": "17",
                                            }
                                        ]
                                    },
                                },
                                {
                                    "name": "sizes",
                                    "histogram": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "1700000000000000002",
                                                "sum": 99.5,
                                                "count": "4",
                                            }
                                        ]
                                    },
                                },
                                {
                                    "name": "durations",
                                    "histogram": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "1700000000000000003",
                                                "count": "6",
                                            }
                                        ]
                                    },
                                },
                            ]
                        }
                    ],
                }
            ]
        }
    )


def test_otlp_flatten(spark):
    df = spark.createDataFrame([(_otlp_payload(),)], "payload string")
    flat = otlp_json_flatten(df)
    rows = {r.metric_name: r for r in flat.collect()}
    assert rows["latency"].value == 12.5
    # point attribute wins over resource attribute on conflict
    assert rows["latency"].labels["env"] == "canary"
    assert rows["latency"].labels["service"] == "api"
    assert rows["requests"].value == 17.0
    assert rows["sizes"].value == 99.5  # histogram → sum
    assert rows["durations"].value == 6.0  # no sum → count
    assert rows["requests"].ts_ns == 1700000000000000001


def test_otlp_to_metrics_label_pivot(spark):
    df = spark.createDataFrame([(_otlp_payload(),)], "payload string")
    out = otlp_to_metrics(df)
    assert {"service", "env"} <= set(out.columns)
    rows = {r.metric_name: r for r in out.collect()}
    assert rows["latency"].env == "canary"
    assert rows["requests"].value_u64 == 17
    assert rows["latency"].value_f64 == 12.5
    # value routed exactly once
    n_bad = out.filter(
        (F.col("value_f64").isNotNull().cast("int")
         + F.col("value_i64").isNotNull().cast("int")
         + F.col("value_u64").isNotNull().cast("int")) != 1
    ).count()
    assert n_bad == 0


# ---------------------------------------------------------------------------
# InfluxDB line protocol
# ---------------------------------------------------------------------------


def test_line_protocol_multi_field_and_routing(spark):
    from cardinalsin_spark.sources.line_protocol import lines_to_metrics

    lines = spark.createDataFrame(
        [
            ("cpu,host=a,region=us usage=0.5,count=3i 1700000000000000100",),
            ("mem value=12.5 1700000000000000000",),
            ("disk,host=b free=-42i",),
        ],
        "line string",
    )
    rows = {r.metric_name: r for r in lines_to_metrics(lines, default_ts_ns=7).collect()}
    # multi-field lines explode into measurement_field names
    assert set(rows) == {"cpu_usage", "cpu_count", "mem", "disk_free"}
    assert rows["cpu_usage"].value_f64 == 0.5 and rows["cpu_usage"].value_i64 is None
    assert rows["cpu_count"].value_u64 == 3          # 3i -> unsigned int column
    assert rows["disk_free"].value_i64 == -42        # negative int routes to i64
    assert rows["mem"].metric_name == "mem"          # bare `value` keeps the name
    assert rows["cpu_usage"].ts_ns == 1700000000000000100
    assert rows["disk_free"].ts_ns == 7              # missing ts -> default
    assert dict(rows["cpu_usage"].tags) == {"host": "a", "region": "us"}
    assert dict(rows["mem"].tags) == {}


def test_line_protocol_malformed_isolation(spark):
    from cardinalsin_spark.sources.line_protocol import (
        lines_to_metrics,
        malformed_count,
    )

    lines = spark.createDataFrame(
        [
            ("ok value=1 5",),
            ("no_fields_section",),
            ("fields without=equals none",),  # 3 sections but ts not numeric
            ("esc\\aped,x=1 v=2 3",),         # escapes out of subset
            ("ok2 v=notanumber 5",),          # unparseable field value
        ],
        "line string",
    )
    good = lines_to_metrics(lines).collect()
    assert [r.metric_name for r in good] == ["ok"]
    assert malformed_count(lines) == 4


def test_line_protocol_roundtrip_property(spark):
    """Generated valid lines parse back to their exact components."""
    import random

    rnd = random.Random(42)
    cases = []
    for i in range(50):
        meas = f"m{i}"
        tags = {f"t{j}": f"v{rnd.randint(0, 9)}" for j in range(rnd.randint(0, 3))}
        fields = {
            f"f{j}": (rnd.randint(-100, 100) if rnd.random() < 0.5
                      else round(rnd.uniform(-10, 10), 3))
            for j in range(rnd.randint(1, 3))
        }
        ts = rnd.randint(1, 2**60)
        tag_s = "".join(f",{k}={v}" for k, v in tags.items())
        field_s = ",".join(
            f"{k}={v}i" if isinstance(v, int) else f"{k}={v}"
            for k, v in fields.items()
        )
        cases.append((f"{meas}{tag_s} {field_s} {ts}", meas, tags, fields, ts))

    from cardinalsin_spark.sources.line_protocol import lines_to_metrics

    df = spark.createDataFrame([(c[0],) for c in cases], "line string")
    got = lines_to_metrics(df).collect()
    n_fields = sum(len(c[3]) for c in cases)
    assert len(got) == n_fields
    by_name = {}
    for r in got:
        by_name.setdefault(r.metric_name, []).append(r)
    for line, meas, tags, fields, ts in cases:
        for fname, fval in fields.items():
            key = f"{meas}_{fname}" if fname != "value" else meas
            match = [r for r in by_name[key] if r.ts_ns == ts]
            assert len(match) == 1, (line, key)
            r = match[0]
            assert dict(r.tags) == tags
            if isinstance(fval, int):
                stored = r.value_u64 if fval >= 0 else r.value_i64
                assert stored == fval
            else:
                assert r.value_f64 == fval


def test_line_protocol_to_store_to_promql(spark, tmp_path):
    """Full ingest path: line protocol → metrics store → PromQL instant
    query over the re-registered table."""
    from cardinalsin_spark.operators.promql import promql_instant
    from cardinalsin_spark.operators.timeseries import MetricsCols
    from cardinalsin_spark.sources.ingest import register_metrics, write_metrics
    from cardinalsin_spark.sources.line_protocol import lines_to_metrics

    base_ns = 1704067200 * 10**9
    lines = spark.createDataFrame(
        [(f"cpu,host=h{i % 2} usage={i}.5 {base_ns + i * 10**9}",)
         for i in range(10)],
        "line string",
    )
    m = lines_to_metrics(lines).withColumn(
        "host", F.map_values("tags")[0]
    ).drop("tags")
    path = str(tmp_path / "lp_store")
    write_metrics(m, path, mode="overwrite")

    stored = register_metrics(spark, path, "lp_metrics")
    got = promql_instant(
        stored.withColumn("value", F.coalesce("value_f64", "value_i64")),
        'sum by (host) (cpu_usage)',
        time_s=1704067200.0 + 3600,
        cols=MetricsCols(ts="timestamp", name="metric_name", value="value"),
    ).collect()
    by_host = {r.host: r.value for r in got}
    assert by_host == {
        "h0": sum(i + 0.5 for i in range(0, 10, 2)),
        "h1": sum(i + 0.5 for i in range(1, 10, 2)),
    }


# --- OTLP protobuf wire decode ----------------------------------------------


def _fixed64(field_no: int, v: int) -> bytes:
    return _varint(field_no << 3 | 1) + struct.pack("<Q", v & (1 << 64) - 1)


def _double(field_no: int, v: float) -> bytes:
    return _varint(field_no << 3 | 1) + struct.pack("<d", v)


def _any_string(s: str) -> bytes:
    return _ld(1, s.encode())


def _any_bool(b: bool) -> bytes:
    return _varint(2 << 3 | 0) + _varint(1 if b else 0)


def _any_int(i: int) -> bytes:
    return _varint(3 << 3 | 0) + _varint(i & (1 << 64) - 1)


def _kv(key: str, any_value: bytes) -> bytes:
    return _ld(1, key.encode()) + _ld(2, any_value)


def _number_point(ts_ns: int, *, as_double=None, as_int=None, attrs=()) -> bytes:
    out = _fixed64(3, ts_ns)
    if as_double is not None:
        out += _double(4, as_double)
    if as_int is not None:
        out += _varint(6 << 3 | 1) + struct.pack("<q", as_int)
    for k, av in attrs:
        out += _ld(7, _kv(k, av))
    return out


def _histo_point(ts_ns: int, count: int, s=None, attr_field=9, attrs=()) -> bytes:
    out = _fixed64(3, ts_ns) + _fixed64(4, count)
    if s is not None:
        out += _double(5, s)
    for k, av in attrs:
        out += _ld(attr_field, _kv(k, av))
    return out


def _metric(name: str, data_field: int, points: list[bytes]) -> bytes:
    data = b"".join(_ld(1, p) for p in points)
    return _ld(1, name.encode()) + _ld(data_field, data)


def _export_request(resource_attrs, metrics: list[bytes]) -> bytes:
    resource = b"".join(_ld(1, _kv(k, av)) for k, av in resource_attrs)
    scope = b"".join(_ld(2, m) for m in metrics)
    rm = _ld(1, resource) + _ld(2, scope)
    return _ld(1, rm)


def test_otlp_proto_decode_all_point_kinds():
    """Gauge/sum (double + int values), histogram sum-collapse, histogram
    count-fallback, exponential histogram, summary (sum defaults 0) — the
    reference's flatten rules (api/ingest/otlp.rs:100-246)."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request

    payload = _export_request(
        [("env", _any_string("prod"))],
        [
            _metric("g", 5, [_number_point(1_000, as_double=1.5)]),
            _metric("c", 7, [_number_point(2_000, as_int=-7)]),
            _metric("h_sum", 9, [_histo_point(3_000, count=10, s=99.5)]),
            _metric("h_nosum", 9, [_histo_point(4_000, count=10)]),
            _metric("eh", 10, [_histo_point(5_000, count=3, s=42.0, attr_field=1)]),
            _metric("smry", 11, [_histo_point(6_000, count=5, attr_field=7)]),
        ],
    )
    rows = decode_export_metrics_request(payload)
    by_name = {r[1]: r for r in rows}
    assert by_name["g"][:3] == (1_000, "g", 1.5)
    assert by_name["c"][:3] == (2_000, "c", -7.0)
    assert by_name["h_sum"][2] == 99.5       # sum wins
    assert by_name["h_nosum"][2] == 10.0     # count fallback
    assert by_name["eh"][2] == 42.0
    assert by_name["smry"][2] == 0.0         # proto3 scalar default
    assert all(r[3]["env"] == "prod" for r in rows)


def test_otlp_proto_label_merge_and_any_values():
    """Point attributes override resource attributes; bool/int AnyValues
    stringify like the reference."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request

    payload = _export_request(
        [("env", _any_string("prod")), ("flag", _any_bool(True))],
        [
            _metric(
                "m",
                5,
                [
                    _number_point(
                        1,
                        as_double=1.0,
                        attrs=[("env", _any_string("point-wins")),
                               ("n", _any_int(-3))],
                    )
                ],
            )
        ],
    )
    (row,) = decode_export_metrics_request(payload)
    assert row[3] == {"env": "point-wins", "flag": "true", "n": "-3"}


def test_otlp_proto_to_metrics_spark(spark):
    """End-to-end through mapInPandas: wire bytes → wide metrics frame with
    routed value types, matching the OTLP/JSON adapter's contract."""
    from cardinalsin_spark.sources.otlp import otlp_proto_to_metrics

    payload = _export_request(
        [("env", _any_string("prod"))],
        [
            _metric("gauge_f", 5, [_number_point(1_500_000_000, as_double=2.25)]),
            _metric("ctr", 7, [_number_point(2_500_000_000, as_int=41)]),
        ],
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    out = otlp_proto_to_metrics(df).orderBy("metric_name").collect()
    assert [r.metric_name for r in out] == ["ctr", "gauge_f"]
    ctr, gauge = out[0], out[1]
    assert gauge.value_f64 == 2.25 and gauge.env == "prod"
    # 41.0 is integer-lossless → routed to the integer column
    assert (ctr.value_i64 == 41 or ctr.value_u64 == 41)
    assert gauge.ts_ns == 1_500_000_000


def test_otlp_proto_malformed_isolated(spark):
    """One junk payload must not fail the job (skip + accumulator), and
    on_error='raise' must propagate."""
    from cardinalsin_spark.sources.otlp import otlp_proto_flatten

    good = _export_request(
        [], [_metric("m", 5, [_number_point(1, as_double=1.0)])]
    )
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(b"\xff\xff\xff"),)], "payload binary"
    )
    rows = otlp_proto_flatten(df).collect()
    assert len(rows) == 1 and rows[0].metric_name == "m"
    with pytest.raises(Exception):
        otlp_proto_flatten(df, on_error="raise").collect()


# --- OTLP classic-histogram bucket preservation (VERDICT r8 item 4) ----------


def _packed_fixed64s(field_no: int, vals: list[int]) -> bytes:
    return _ld(field_no, b"".join(struct.pack("<Q", v) for v in vals))


def _packed_doubles(field_no: int, vals: list[float]) -> bytes:
    return _ld(field_no, b"".join(struct.pack("<d", v) for v in vals))


def _histo_point_buckets(
    ts_ns: int, count: int, s, counts: list[int], bounds: list[float],
    attrs=(),
) -> bytes:
    out = _fixed64(3, ts_ns) + _fixed64(4, count)
    if s is not None:
        out += _double(5, s)
    out += _packed_fixed64s(6, counts) + _packed_doubles(7, bounds)
    for k, av in attrs:
        out += _ld(9, _kv(k, av))
    return out


def test_otlp_proto_histogram_buckets_decode():
    """histogram_buckets=True expands a classic histogram point to the
    Prometheus exposition shape: cumulative _bucket rows per bound with
    shortest-spelling le labels, +Inf, _count, _sum — resource and point
    attributes merged as usual."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request

    payload = _export_request(
        [("env", _any_string("prod"))],
        [
            _metric(
                "lat",
                9,
                [
                    _histo_point_buckets(
                        7_000, count=9, s=17.5,
                        counts=[3, 0, 4, 2], bounds=[1.0, 2.5, 5.0],
                        attrs=[("svc", _any_string("api"))],
                    )
                ],
            )
        ],
    )
    rows = decode_export_metrics_request(payload, histogram_buckets=True)
    got = {(r[1], r[3].get("le")): r[2] for r in rows}
    assert got == {
        ("lat_bucket", "1"): 3.0,
        ("lat_bucket", "2.5"): 3.0,
        ("lat_bucket", "5"): 7.0,
        ("lat_bucket", "+Inf"): 9.0,
        ("lat_count", None): 9.0,
        ("lat_sum", None): 17.5,
    }
    assert all(r[0] == 7_000 for r in rows)
    assert all(r[3]["env"] == "prod" and r[3]["svc"] == "api" for r in rows)
    # default mode still collapses (reference parity path untouched)
    collapsed = decode_export_metrics_request(payload)
    assert [(r[1], r[2]) for r in collapsed] == [("lat", 17.5)]


def test_otlp_json_histogram_buckets_matches_proto_twin(spark):
    """The OTLP/JSON bucket expansion (pure DataFrame ops) and the wire
    decoder produce identical row sets for the same histogram point."""
    import json as _json

    from cardinalsin_spark.sources.otlp import (
        decode_export_metrics_request,
        otlp_json_flatten,
    )

    payload_json = _json.dumps(
        {
            "resourceMetrics": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "env", "value": {"stringValue": "prod"}}
                        ]
                    },
                    "scopeMetrics": [
                        {
                            "metrics": [
                                {
                                    "name": "lat",
                                    "histogram": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "7000",
                                                "count": "9",
                                                "sum": 17.5,
                                                "bucketCounts": [
                                                    "3", "0", "4", "2"
                                                ],
                                                "explicitBounds": [1.0, 2.5, 5.0],
                                                "attributes": [
                                                    {
                                                        "key": "svc",
                                                        "value": {
                                                            "stringValue": "api"
                                                        },
                                                    }
                                                ],
                                            }
                                        ]
                                    },
                                }
                            ]
                        }
                    ],
                }
            ]
        }
    )
    df = spark.createDataFrame([(payload_json,)], "payload string")
    got = {
        (r.ts_ns, r.metric_name, r.value, tuple(sorted(r.labels.items())))
        for r in otlp_json_flatten(df, histogram_buckets=True).collect()
    }
    proto_payload = _export_request(
        [("env", _any_string("prod"))],
        [
            _metric(
                "lat", 9,
                [
                    _histo_point_buckets(
                        7_000, count=9, s=17.5,
                        counts=[3, 0, 4, 2], bounds=[1.0, 2.5, 5.0],
                        attrs=[("svc", _any_string("api"))],
                    )
                ],
            )
        ],
    )
    expect = {
        (ts, name, val, tuple(sorted(labels.items())))
        for ts, name, val, labels in decode_export_metrics_request(
            proto_payload, histogram_buckets=True
        )
    }
    assert got == expect


def test_otlp_histogram_buckets_to_quantile_end_to_end(spark, tmp_path):
    """The full path the reference advertises but cannot serve: OTLP
    protobuf histogram → per-le bucket rows → metrics table →
    promql_instant histogram_quantile, parity-checked against a DuckDB
    oracle computing the same exact-integer interpolation over the same
    bucket rows."""
    import duckdb

    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.operators.promql import LE_INF
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.otlp import otlp_proto_to_metrics

    ts_ns = 1_700_000_000_000_000_000
    payload = _export_request(
        [],
        [
            _metric(
                "http_ms", 9,
                [
                    _histo_point_buckets(
                        ts_ns, count=100, s=12_345.0,
                        counts=[55, 30, 10, 5],
                        bounds=[100.0, 200.0, 500.0],
                    )
                ],
            )
        ],
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    wide = otlp_proto_to_metrics(df, histogram_buckets=True)
    path = str(tmp_path / "metrics")
    write_metrics(wide, path, mode="overwrite")

    eng = CardinalSin(spark, path)
    out = eng.promql_instant(
        "histogram_quantile(0.9, http_ms_bucket)",
        time_s=ts_ns / 1e9,
    ).collect()
    assert len(out) == 1
    got = out[0].value

    oracle = duckdb.sql(
        f"""
        WITH b(le, cum) AS (VALUES (100, 55), (200, 85), (500, 95),
                                   ({LE_INF}, 100)),
        ann AS (
          SELECT le, cum, max(cum) OVER () AS total,
                 coalesce(lag(cum) OVER w, 0) AS prev_cum,
                 lag(le) OVER w AS prev_le
          FROM b WINDOW w AS (ORDER BY le)
        ),
        hit AS (
          SELECT *, row_number() OVER (ORDER BY le) AS rn
          FROM ann WHERE 10 * cum >= 9 * total AND total > 0
        )
        SELECT CAST(CASE WHEN le >= {LE_INF} THEN prev_le * 1000000
               WHEN cum - prev_cum > 0 THEN
                 (coalesce(prev_le, 0) * 10 * (cum - prev_cum)
                  + (le - coalesce(prev_le, 0)) * (9 * total - 10 * prev_cum))
                 * 1000000 // (10 * (cum - prev_cum))
               ELSE NULL END AS BIGINT) / 1000000.0 AS value
        FROM hit WHERE rn = 1
        """
    ).fetchone()[0]
    assert got == oracle  # exact, both floored onto the 1e-6 grid
    # sanity: 0.9·100 = rank 90 lands in (200, 500]: 200 + 300·(90−85)/10
    assert got == 350.0


# --- OTLP exponential-histogram bucket preservation ---------------------------


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _exp_span(offset: int, counts: list[int]) -> bytes:
    return (
        _varint(1 << 3 | 0) + _varint(_zz(offset))
        + _ld(2, b"".join(_varint(c) for c in counts))
    )


def _exp_histo_point(
    ts_ns: int, count: int, s, scale: int, zero: int,
    pos=None, neg=None, attrs=(),
) -> bytes:
    out = _fixed64(3, ts_ns) + _fixed64(4, count)
    if s is not None:
        out += _double(5, s)
    out += _varint(6 << 3 | 0) + _varint(_zz(scale))
    out += _fixed64(7, zero)
    if pos is not None:
        out += _ld(8, _exp_span(*pos))
    if neg is not None:
        out += _ld(9, _exp_span(*neg))
    for k, av in attrs:
        out += _ld(1, _kv(k, av))
    return out


def test_otlp_proto_exp_histogram_buckets_decode():
    """Exponential histograms expand to scale/idx/sign bucket rows plus
    zero/count/sum; zigzag scale and offsets decode (negative scale,
    negative offset), zero-count buckets are skipped."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request

    payload = _export_request(
        [("env", _any_string("prod"))],
        [
            _metric(
                "lat", 10,
                [
                    _exp_histo_point(
                        9_000, count=10, s=21.5, scale=-1, zero=2,
                        pos=(-2, [3, 0, 4]), neg=(0, [1]),
                    )
                ],
            )
        ],
    )
    rows = decode_export_metrics_request(payload, histogram_buckets=True)
    got = {
        (r[1], r[3].get("sign"), r[3].get("idx")): (r[2], r[3].get("scale"))
        for r in rows
    }
    assert got == {
        ("lat_exp_bucket", "pos", "-2"): (3.0, "-1"),
        ("lat_exp_bucket", "pos", "0"): (4.0, "-1"),  # zero-count idx -1 skipped
        ("lat_exp_bucket", "neg", "0"): (1.0, "-1"),
        ("lat_exp_zero", None, None): (2.0, "-1"),
        ("lat_count", None, None): (10.0, None),
        ("lat_sum", None, None): (21.5, None),
    }
    assert all(r[3]["env"] == "prod" for r in rows)
    # default mode still collapses to sum (reference parity)
    collapsed = decode_export_metrics_request(payload)
    assert [(r[1], r[2]) for r in collapsed] == [("lat", 21.5)]


def test_otlp_json_exp_histogram_matches_proto_twin(spark):
    import json as _json

    from cardinalsin_spark.sources.otlp import (
        decode_export_metrics_request,
        otlp_json_flatten,
    )

    payload_json = _json.dumps(
        {
            "resourceMetrics": [
                {
                    "resource": {"attributes": []},
                    "scopeMetrics": [
                        {
                            "metrics": [
                                {
                                    "name": "lat",
                                    "exponentialHistogram": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": "9000",
                                                "count": "10",
                                                "sum": 21.5,
                                                "scale": -1,
                                                "zeroCount": "2",
                                                "positive": {
                                                    "offset": -2,
                                                    "bucketCounts": ["3", "0", "4"],
                                                },
                                                "negative": {
                                                    "offset": 0,
                                                    "bucketCounts": ["1"],
                                                },
                                            }
                                        ]
                                    },
                                }
                            ]
                        }
                    ],
                }
            ]
        }
    )
    df = spark.createDataFrame([(payload_json,)], "payload string")
    got = {
        (r.ts_ns, r.metric_name, r.value, tuple(sorted(r.labels.items())))
        for r in otlp_json_flatten(df, histogram_buckets=True).collect()
    }
    proto = _export_request(
        [],
        [
            _metric(
                "lat", 10,
                [
                    _exp_histo_point(
                        9_000, count=10, s=21.5, scale=-1, zero=2,
                        pos=(-2, [3, 0, 4]), neg=(0, [1]),
                    )
                ],
            )
        ],
    )
    expect = {
        (ts, name, val, tuple(sorted(labels.items())))
        for ts, name, val, labels in decode_export_metrics_request(
            proto, histogram_buckets=True
        )
    }
    assert got == expect
    # default JSON mode now collapses exp histograms like the wire path
    # (previously the JSON flatten dropped them entirely)
    collapsed = otlp_json_flatten(df).collect()
    assert [(r.metric_name, r.value) for r in collapsed] == [("lat", 21.5)]


def test_exp_histogram_quantile_operator(spark):
    """Deterministic check at scale 0 (bounds are exact powers of two):
    zero=2, (1,2]:4, (2,4]:4 -> total 10; p50 rank 5 lands in (1,2] with
    3/4 consumed -> 1.75 exactly; p10 rank 1 is inside the zero bucket."""
    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import exp_histogram_quantile

    rows = [
        Row(g="a", scale=0, idx=0, sign="pos", cnt=4.0),
        Row(g="a", scale=0, idx=1, sign="pos", cnt=4.0),
        Row(g="a", scale=0, idx=None, sign="zero", cnt=2.0),
    ]
    df = spark.createDataFrame(rows)
    p50 = exp_histogram_quantile(df, 0.5, ["g"]).collect()
    assert len(p50) == 1 and p50[0].value == 1.75
    p10 = exp_histogram_quantile(df, 0.1, ["g"]).collect()
    assert p10[0].value == 0.0
    # negative buckets order below zero: all-negative + zero, p50 in neg
    rows_n = [
        Row(g="b", scale=0, idx=0, sign="neg", cnt=4.0),  # [-2, -1)
        Row(g="b", scale=0, idx=None, sign="zero", cnt=4.0),
    ]
    p25 = exp_histogram_quantile(
        spark.createDataFrame(rows_n), 0.25, ["g"]
    ).collect()
    # rank 2 consumes half the (-2,-1] bucket: -2 + 1*0.5 = -1.5
    assert p25[0].value == -1.5


def test_exp_histogram_ingest_to_engine_quantile(spark, tmp_path):
    """OTLP exponential histogram -> bucket-preserving ingest -> metrics
    table -> engine.exp_histogram_quantile: p50 of zero=2, (1,2]:4,
    (2,4]:4 is exactly 1.75 (scale 0 -> exact powers of two)."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.otlp import otlp_proto_to_metrics

    ts_ns = 1_700_000_000_000_000_000
    payload = _export_request(
        [("svc", _any_string("api"))],
        [
            _metric(
                "rt", 10,
                [
                    _exp_histo_point(
                        ts_ns, count=10, s=16.0, scale=0, zero=2,
                        pos=(0, [4, 4]),
                    )
                ],
            )
        ],
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    wide = otlp_proto_to_metrics(df, histogram_buckets=True)
    path = str(tmp_path / "m")
    write_metrics(wide, path, mode="overwrite")
    eng = CardinalSin(spark, path)
    out = eng.exp_histogram_quantile("rt", 0.5, time_s=ts_ns / 1e9).collect()
    assert len(out) == 1
    assert out[0].value == 1.75
    assert out[0].svc == "api"


# --- Prometheus remote-write 2.0 (symbol-table format) ------------------------


def _write_request_v2(
    series: list[tuple[dict, list[tuple[float, int]]]]
) -> bytes:
    """Encode io.prometheus.write.v2.Request: request-level interned
    symbols (symbols[0] = "") + packed labels_refs pairs per series."""
    symbols = [""]
    sym_idx: dict[str, int] = {"": 0}

    def ref(s: str) -> int:
        if s not in sym_idx:
            sym_idx[s] = len(symbols)
            symbols.append(s)
        return sym_idx[s]

    ts_bufs = []
    for labels, samples in series:
        refs = []
        for k, v in labels.items():
            refs.extend((ref(k), ref(v)))
        ts = _ld(1, b"".join(_varint(r) for r in refs))
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        ts_bufs.append(ts)
    out = b"".join(_ld(4, s.encode()) for s in symbols)
    out += b"".join(_ld(5, ts) for ts in ts_bufs)
    return out


def test_decode_write_request_v2_roundtrip():
    from cardinalsin_spark.sources.remote_write import decode_write_request_v2

    payload = _write_request_v2(
        [
            ({"__name__": "cpu", "host": "a"}, [(1.5, 1000), (7.0, 2000)]),
            ({"__name__": "mem", "host": "b", "env": "prod"}, [(-3.0, 1500)]),
        ]
    )
    rows = decode_write_request_v2(payload)
    assert (1000, "cpu", 1.5, {"host": "a"}) in rows
    assert (2000, "cpu", 7.0, {"host": "a"}) in rows
    assert (1500, "mem", -3.0, {"host": "b", "env": "prod"}) in rows
    # symbol interning is real: repeated label names/values dedupe
    assert payload.count(b"host") == 1


def test_remote_write_v2_matches_v1_rows():
    """The same logical series through both wire formats decode to the
    same row set."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request,
        decode_write_request_v2,
    )

    series = [
        ({"__name__": "m", "a": "x", "b": "y"}, [(2.25, 10), (3.5, 20)]),
        ({"__name__": "n", "a": "x"}, [(41.0, 30)]),
    ]
    v1 = decode_write_request(_write_request(series))
    v2 = decode_write_request_v2(_write_request_v2(series))
    key = lambda r: (r[0], r[1], r[2], tuple(sorted(r[3].items())))  # noqa: E731
    assert sorted(map(key, v1)) == sorted(map(key, v2))


def test_remote_write_auto_sniff(spark):
    """version="auto" routes mixed v1/v2 payloads per request; the field
    sets are disjoint so a well-formed request cannot misroute."""
    from cardinalsin_spark.sources.remote_write import remote_write_flatten

    v1 = _write_request([({"__name__": "one", "s": "v1"}, [(1.0, 100)])])
    v2 = _write_request_v2([({"__name__": "two", "s": "v2"}, [(2.0, 200)])])
    df = spark.createDataFrame(
        [(bytearray(v1),), (bytearray(v2),)], "payload binary"
    )
    rows = remote_write_flatten(df, version="auto").collect()
    got = {(r.metric_name, r.labels["s"], r.value) for r in rows}
    assert got == {("one", "v1", 1.0), ("two", "v2", 2.0)}
    # explicit version=2 on a v2 payload
    only2 = remote_write_flatten(
        spark.createDataFrame([(bytearray(v2),)], "payload binary"),
        version=2,
    ).collect()
    assert [r.metric_name for r in only2] == ["two"]
    # odd labels_refs loud-reject under on_error="raise"
    import pytest as _pytest

    bad = b"".join(
        [_ld(4, b""), _ld(4, b"x"), _ld(5, _ld(1, _varint(1)))]
    )
    with _pytest.raises(Exception):
        remote_write_flatten(
            spark.createDataFrame([(bytearray(bad),)], "payload binary"),
            version=2,
            on_error="raise",
        ).collect()


# --- native histograms (remote-write 2.0 field 3 / prompb field 4) -----------


def _zzv(v: int) -> bytes:  # zigzag varint
    return _varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _bucket_span(offset: int, length: int) -> bytes:
    return _varint(1 << 3 | 0) + _zzv(offset)[0:] + _varint(2 << 3 | 0) + _varint(length)


def _native_histogram(
    count: int | None = None,
    s: float | None = None,
    schema: int = 0,
    zero: float | int = 0,
    pos_spans: list[tuple[int, int]] = (),
    pos_deltas: list[int] = (),
    pos_counts: list[float] = (),
    neg_spans: list[tuple[int, int]] = (),
    neg_deltas: list[int] = (),
    ts_ms: int = 0,
    custom_values: list[float] = (),
) -> bytes:
    out = b""
    if count is not None:
        out += _varint(1 << 3 | 0) + _varint(count)
    if s is not None:
        out += _varint(3 << 3 | 1) + struct.pack("<d", s)
    out += _varint(4 << 3 | 0) + _zzv(schema)
    if isinstance(zero, float):
        out += _varint(7 << 3 | 1) + struct.pack("<d", zero)
    elif zero:
        out += _varint(6 << 3 | 0) + _varint(zero)
    for off, ln in neg_spans:
        out += _ld(8, _bucket_span(off, ln))
    if neg_deltas:
        out += _ld(9, b"".join(_zzv(d) for d in neg_deltas))
    for off, ln in pos_spans:
        out += _ld(11, _bucket_span(off, ln))
    if pos_deltas:
        out += _ld(12, b"".join(_zzv(d) for d in pos_deltas))
    if pos_counts:
        out += _ld(13, b"".join(struct.pack("<d", c) for c in pos_counts))
    out += _varint(15 << 3 | 0) + _varint(ts_ms & (1 << 64) - 1)
    if custom_values:
        out += _ld(16, b"".join(struct.pack("<d", b) for b in custom_values))
    return out


def _v2_with_histogram(labels: dict, histo: bytes) -> bytes:
    symbols = [""]
    refs = []
    for k, v in labels.items():
        for sym in (k, v):
            if sym not in symbols:
                symbols.append(sym)
        refs.extend((symbols.index(k), symbols.index(v)))
    ts = _ld(1, b"".join(_varint(r) for r in refs)) + _ld(3, histo)
    return b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)


def test_v2_native_histogram_rows():
    """write.v2 native histogram (schema 0: zero=2, (1,2]:4, (2,4]:4)
    decodes to the OTLP exp-bucket row shape: native index n shifts to
    otlp idx n-1, counts are NON-cumulative, count/sum series emitted."""
    from cardinalsin_spark.sources.remote_write import decode_write_request_v2

    h = _native_histogram(
        count=10, s=16.0, schema=0, zero=2,
        pos_spans=[(1, 2)], pos_deltas=[4, 0], ts_ms=1000,
    )
    rows = decode_write_request_v2(
        _v2_with_histogram({"__name__": "rt", "svc": "api"}, h)
    )
    by = {}
    for ts, name, v, labels in rows:
        assert ts == 1000
        by.setdefault(name, []).append((v, labels))
    assert sorted(
        (lbl["idx"], v) for v, lbl in by["rt_exp_bucket"]
    ) == [("0", 4.0), ("1", 4.0)]
    for v, lbl in by["rt_exp_bucket"]:
        assert lbl["sign"] == "pos" and lbl["scale"] == "0"
        assert lbl["svc"] == "api"
    assert by["rt_exp_zero"] == [(2.0, {"svc": "api", "scale": "0"})]
    assert by["rt_count"] == [(10.0, {"svc": "api"})]
    assert by["rt_sum"] == [(16.0, {"svc": "api"})]


def test_v1_native_histogram_matches_v2():
    """The identical Histogram message rides prompb field 4 — both wire
    formats produce the same row set (incl. float-histogram counts and
    negative buckets)."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request,
        decode_write_request_v2,
    )

    h = _native_histogram(
        s=3.25, schema=1, zero=1.0,
        pos_spans=[(0, 2), (2, 1)], pos_counts=[2.0, 1.0, 4.0],
        neg_spans=[(2, 1)], neg_deltas=[3], ts_ms=2000,
    )
    labels = {"__name__": "lat", "env": "prod"}
    ts_v1 = _ld(1, _label("__name__", "lat")) + _ld(1, _label("env", "prod"))
    ts_v1 += _ld(4, h)
    v1 = decode_write_request(_ld(1, ts_v1))
    v2 = decode_write_request_v2(_v2_with_histogram(labels, h))
    key = lambda r: (r[0], r[1], r[2], tuple(sorted(r[3].items())))  # noqa: E731
    assert sorted(map(key, v1)) == sorted(map(key, v2))
    # count omitted on the wire -> derived zero + buckets total
    cnt = [r for r in v1 if r[1] == "lat_count"]
    assert cnt[0][2] == 1.0 + 2.0 + 1.0 + 4.0 + 3.0
    # sparse spans produce the right absolute indexes (native -> otlp -1):
    # pos spans (0,2)+(2,1) -> native 0,1,4 -> idx -1,0,3
    idxs = sorted(
        (r[3]["sign"], r[3]["idx"]) for r in v1 if r[1] == "lat_exp_bucket"
    )
    assert idxs == [("neg", "1"), ("pos", "-1"), ("pos", "0"), ("pos", "3")]


def test_native_histogram_nhcb_out_of_spec_loud_rejects(spark):
    """NHCB (schema -53) now DECODES when well-formed; out-of-spec
    payloads still loud-reject: no custom_values bounds, non-increasing
    bounds, negative-side buckets, a used zero bucket, a bucket index
    past +Inf — and out-of-spec exponential schemas stay rejected."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request_v2,
        remote_write_flatten,
    )

    # no custom_values at all (the r10 reject case stays a reject)
    h = _native_histogram(count=3, schema=-53, pos_spans=[(0, 1)], pos_deltas=[3])
    payload = _v2_with_histogram({"__name__": "x"}, h)
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    with pytest.raises(Exception, match="NHCB|custom_values"):
        remote_write_flatten(df, version=2, on_error="raise").collect()
    # default on_error="skip" isolates the payload instead
    assert remote_write_flatten(df, version=2).count() == 0
    bad = [
        _native_histogram(  # non-increasing bounds
            schema=-53, pos_spans=[(0, 2)], pos_deltas=[1, 1],
            custom_values=[2.0, 2.0],
        ),
        _native_histogram(  # negative-side buckets
            schema=-53, pos_spans=[(0, 1)], pos_deltas=[1],
            neg_spans=[(0, 1)], neg_deltas=[1], custom_values=[1.0],
        ),
        _native_histogram(  # zero bucket in use
            schema=-53, zero=2, pos_spans=[(0, 1)], pos_deltas=[1],
            custom_values=[1.0],
        ),
        _native_histogram(  # index past the +Inf bucket
            schema=-53, pos_spans=[(3, 1)], pos_deltas=[1],
            custom_values=[1.0, 2.0],
        ),
        _native_histogram(schema=9, pos_spans=[(0, 1)], pos_deltas=[1]),
    ]
    for hb in bad:
        with pytest.raises(ValueError, match="NHCB|schema"):
            decode_write_request_v2(_v2_with_histogram({"__name__": "x"}, hb))


def test_nhcb_decodes_to_classic_le_rows():
    """NHCB decode (VERDICT r10 missing #2): schema -53 + custom_values
    is the wire twin of a classic histogram — rows come out CUMULATIVE
    per le with the classic _bucket/_count/_sum naming and +Inf, le
    spelled Prometheus-style; prompb field 4 and write.v2 field 3 agree;
    sparse spans fill gap buckets with the running cumulative."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request,
        decode_write_request_v2,
    )

    # bounds [0.5, 1, 2.5] -> buckets (..,0.5] (0.5,1] (1,2.5] (2.5,+Inf)
    # counts:      3        0 (gap)    5         2     via sparse spans
    h = _native_histogram(
        count=10, s=14.25, schema=-53,
        pos_spans=[(0, 1), (1, 2)], pos_deltas=[3, 2, -3],
        ts_ms=1000, custom_values=[0.5, 1.0, 2.5],
    )
    labels = {"__name__": "lat", "env": "prod"}
    rows = decode_write_request_v2(_v2_with_histogram(labels, h))
    by = {}
    for ts, name, v, lbl in rows:
        assert ts == 1000
        by.setdefault(name, []).append((v, lbl))
    got = sorted((lbl["le"], v) for v, lbl in by["lat_bucket"])
    assert got == [("+Inf", 10.0), ("0.5", 3.0), ("1", 3.0), ("2.5", 8.0)]
    for _, lbl in by["lat_bucket"]:
        assert lbl["env"] == "prod" and "scale" not in lbl
    assert by["lat_count"] == [(10.0, {"env": "prod"})]
    assert by["lat_sum"] == [(14.25, {"env": "prod"})]
    # prompb (v1) twin: identical rows off the identical message
    ts_v1 = _ld(1, _label("__name__", "lat")) + _ld(1, _label("env", "prod"))
    ts_v1 += _ld(4, h)
    key = lambda r: (r[0], r[1], r[2], tuple(sorted(r[3].items())))  # noqa: E731
    assert sorted(map(key, decode_write_request(_ld(1, ts_v1)))) == sorted(
        map(key, rows)
    )
    # float-count (gauge) NHCB variant decodes the same shape
    hf = _native_histogram(
        s=1.0, schema=-53, pos_spans=[(0, 2)], pos_counts=[1.5, 2.5],
        ts_ms=1000, custom_values=[1.0],
    )
    rf = decode_write_request_v2(_v2_with_histogram({"__name__": "g"}, hf))
    assert sorted(
        (lbl["le"], v) for ts, n, v, lbl in rf if n == "g_bucket"
    ) == [("+Inf", 4.0), ("1", 1.5)]


def test_nhcb_to_engine_histogram_quantile(spark, tmp_path):
    """End-to-end round-trip: NHCB payload -> remote_write_to_metrics ->
    metrics table -> promql histogram_quantile == the closed-form classic
    interpolation (rank 5 inside (1,2] over cum 2->6: 1.75)."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.remote_write import remote_write_to_metrics

    h = _native_histogram(
        count=10, s=16.0, schema=-53,
        pos_spans=[(0, 3)], pos_deltas=[2, 2, 0],
        ts_ms=1_700_000_000_000, custom_values=[1.0, 2.0],
    )
    payload = _v2_with_histogram({"__name__": "rt", "svc": "api"}, h)
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    wide = remote_write_to_metrics(df, version=2)
    path = str(tmp_path / "m")
    write_metrics(wide, path, mode="overwrite")
    eng = CardinalSin(spark, path)
    out = eng.promql_instant(
        "histogram_quantile(0.5, rt_bucket)", time_s=1_700_000_000.0
    ).collect()
    assert len(out) == 1
    assert out[0].value == 1.75


def test_v2_native_histogram_to_engine_quantile(spark, tmp_path):
    """End-to-end: write.v2 native histogram -> remote_write_to_metrics ->
    metrics table -> engine.exp_histogram_quantile. Same closed form as
    the OTLP twin: p50 of zero=2, (1,2]:4, (2,4]:4 is exactly 1.75."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.remote_write import remote_write_to_metrics

    h = _native_histogram(
        count=10, s=16.0, schema=0, zero=2,
        pos_spans=[(1, 2)], pos_deltas=[4, 0], ts_ms=1_700_000_000_000,
    )
    payload = _v2_with_histogram({"__name__": "rt", "svc": "api"}, h)
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    wide = remote_write_to_metrics(df, version=2)
    path = str(tmp_path / "m")
    write_metrics(wide, path, mode="overwrite")
    eng = CardinalSin(spark, path)
    out = eng.exp_histogram_quantile("rt", 0.5, time_s=1_700_000_000.0).collect()
    assert len(out) == 1
    assert out[0].value == 1.75
    assert out[0].svc == "api"


def test_histogram_quantile_promql_text_routes_exp_family(spark, tmp_path):
    """VERDICT r9 item 4: `histogram_quantile(phi, {base}_exp_bucket)` in
    PromQL TEXT routes to exp_histogram_quantile — bit-identical to the
    engine API on the same OTLP fixture — in both query modes; mixed/
    multi-metric selectors and non-exp frames loud-reject."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.otlp import otlp_proto_to_metrics

    ts_ns = 1_700_000_000_000_000_000
    payload = _export_request(
        [("svc", _any_string("api"))],
        [
            _metric(
                "rt", 10,
                [
                    _exp_histo_point(
                        ts_ns, count=10, s=16.0, scale=0, zero=2,
                        pos=(0, [4, 4]),
                    )
                ],
            )
        ],
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    wide = otlp_proto_to_metrics(df, histogram_buckets=True)
    path = str(tmp_path / "m")
    write_metrics(wide, path, mode="overwrite")
    eng = CardinalSin(spark, path)
    t = ts_ns / 1e9
    via_text = eng.promql_instant(
        "histogram_quantile(0.5, rt_exp_bucket)", time_s=t
    ).collect()
    via_api = eng.exp_histogram_quantile("rt", 0.5, time_s=t).collect()
    assert len(via_text) == 1 and via_text[0].value == 1.75
    assert [r.asDict() for r in via_text] == [r.asDict() for r in via_api]
    # matchers on series labels still apply on the routed path
    assert (
        eng.promql_instant(
            'histogram_quantile(0.5, rt_exp_bucket{svc="nope"})', time_s=t
        ).count()
        == 0
    )
    # range grid: the per-step latest state reproduces the same quantile
    # at every step covering the sample
    rng = eng.promql_range(
        "histogram_quantile(0.5, rt_exp_bucket)", t, t + 120, 60
    ).collect()
    assert len(rng) == 1  # only the sample's own step has state
    assert rng[0].value == 1.75
    # multi-metric selector loud-rejects (classic vs exp is undecidable)
    with pytest.raises(ValueError, match="single named bucket family"):
        eng.promql_instant(
            'histogram_quantile(0.5, {__name__=~"rt.*bucket"})', time_s=t
        )
    # offset modifier on the exp route loud-rejects
    with pytest.raises(ValueError, match="offset"):
        eng.promql_instant(
            "histogram_quantile(0.5, rt_exp_bucket offset 5m)", time_s=t
        )


def test_histogram_quantile_exp_route_needs_exp_columns(spark):
    """A frame without scale/idx/sign cannot carry an exp family —
    loud-reject instead of an empty (or wrong) answer."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_instant

    df = spark.createDataFrame(
        [
            Row(
                timestamp=dt.datetime(2024, 1, 1),
                metric_name="x_exp_bucket",
                value=1.0,
            )
        ]
    )
    with pytest.raises(ValueError, match="scale"):
        promql_instant(df, "histogram_quantile(0.5, x_exp_bucket)")


def test_histogram_fraction_promql_text_routes_exp_family(spark, tmp_path):
    """histogram_fraction(lo, hi, {base}_exp_bucket) routes to
    exp_histogram_fraction: closed forms on the scale-0 fixture (exact
    powers of two), both query modes, multi-metric loud-reject."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.sources.ingest import write_metrics
    from cardinalsin_spark.sources.otlp import otlp_proto_to_metrics

    ts_ns = 1_700_000_000_000_000_000
    payload = _export_request(
        [("svc", _any_string("api"))],
        [
            _metric(
                "rt", 10,
                [
                    _exp_histo_point(
                        ts_ns, count=10, s=16.0, scale=0, zero=2,
                        pos=(0, [4, 4]),
                    )
                ],
            )
        ],
    )
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    path = str(tmp_path / "m")
    write_metrics(
        otlp_proto_to_metrics(df, histogram_buckets=True), path,
        mode="overwrite",
    )
    eng = CardinalSin(spark, path)
    t = ts_ns / 1e9
    # zero=2 (point mass at 0), (1,2]:4, (2,4]:4 — total 10
    # (0, 2]: the two whole buckets below/at 2 minus the zero mass -> 4/10
    got = eng.promql_instant(
        "histogram_fraction(0, 2, rt_exp_bucket)", time_s=t
    ).collect()
    assert len(got) == 1 and got[0].value == 0.4
    # (0, 3]: + half of (2,4] by linear interpolation -> 6/10
    got = eng.promql_instant(
        "histogram_fraction(0, 3, rt_exp_bucket)", time_s=t
    ).collect()
    assert got[0].value == 0.6
    # range grid: same per-step state
    rng = eng.promql_range(
        "histogram_fraction(0, 2, rt_exp_bucket)", t, t + 120, 60
    ).collect()
    assert len(rng) == 1 and rng[0].value == 0.4
    # multi-metric selector loud-rejects
    with pytest.raises(ValueError, match="single named bucket family"):
        eng.promql_instant(
            'histogram_fraction(0, 2, {__name__=~"rt.*"})', time_s=t
        )


def test_v2_created_timestamp_zero_injection(spark):
    """Remote-write 2.0 created_timestamp (TimeSeries field 6): with
    created_zero=True a counter born before its first sample gets a
    synthetic zero at CT, so rate/increase see the rise from birth;
    off by default; never injected at/after the first sample."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request_v2,
        remote_write_flatten,
    )

    def v2_with_ct(labels, samples, ct_ms):
        symbols = [""]
        refs = []
        for k, v in labels.items():
            for sym in (k, v):
                if sym not in symbols:
                    symbols.append(sym)
            refs.extend((symbols.index(k), symbols.index(v)))
        ts = _ld(1, b"".join(_varint(r) for r in refs))
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        ts += _varint(6 << 3 | 0) + _varint(ct_ms)
        return b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)

    payload = v2_with_ct(
        {"__name__": "req_total", "svc": "a"}, [(5.0, 1000), (9.0, 2000)],
        ct_ms=400,
    )
    # default: wire fidelity, no synthetic rows
    assert len(decode_write_request_v2(payload)) == 2
    rows = decode_write_request_v2(payload, created_zero=True)
    assert (400, "req_total", 0.0, {"svc": "a"}) in rows
    assert len(rows) == 3
    # CT at/after the first sample: the counter had already advanced —
    # no injection
    late = v2_with_ct({"__name__": "m"}, [(5.0, 1000)], ct_ms=1000)
    assert len(decode_write_request_v2(late, created_zero=True)) == 1
    # flatten plumb-through
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    got = remote_write_flatten(df, version=2, created_zero=True).collect()
    assert sorted(r.ts_ms for r in got) == [400, 1000, 2000]
    assert [r.value for r in got if r.ts_ms == 400] == [0.0]


def test_otlp_start_time_zero_injection(spark):
    """OTLP start-time zero injection (the CT-zero twin): monotonic
    CUMULATIVE sums whose start_time_unix_nano predates the first sample
    get ONE synthetic zero per series at start; gauges, delta sums,
    non-monotonic sums and repeated per-point start_times never inject;
    the JSON twin loud-rejects the flag."""
    from cardinalsin_spark.sources.otlp import (
        decode_export_metrics_request,
        otlp_json_flatten,
        otlp_proto_flatten,
        otlp_to_metrics,
    )

    def sum_metric(name, points, temporality=2, monotonic=True):
        data = b"".join(_ld(1, p) for p in points)
        data += _varint(2 << 3 | 0) + _varint(temporality)
        data += _varint(3 << 3 | 0) + _varint(1 if monotonic else 0)
        return _ld(1, name.encode()) + _ld(7, data)

    def pt(ts_ns, v, start_ns):
        return _fixed64(2, start_ns) + _number_point(ts_ns, as_double=v)

    t0, t1, t2 = 1_000, 2_000, 3_000
    payload = _export_request(
        [],
        [
            sum_metric("c", [pt(t1, 5.0, t0), pt(t2, 9.0, t0)]),
            sum_metric("d", [pt(t1, 5.0, t0)], temporality=1),  # DELTA
            sum_metric("g", [pt(t1, 5.0, t0)], monotonic=False),
            _metric("gauge", 5, [pt(t1, 7.0, t0)]),
            sum_metric("late", [pt(t1, 5.0, t1)]),  # start == first ts
        ],
    )
    # default: wire fidelity — no synthetic rows
    base = decode_export_metrics_request(payload)
    assert not any(ts == t0 for ts, *_ in base)
    rows = decode_export_metrics_request(payload, start_zero=True)
    zeros = [(ts, n, v) for ts, n, v, _ in rows if ts == t0]
    assert zeros == [(t0, "c", 0.0)]  # ONE zero despite two points
    assert len(rows) == len(base) + 1
    # flatten plumb-through
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    got = otlp_proto_flatten(df, start_zero=True).collect()
    assert sorted(r.value for r in got if r.metric_name == "c") == [
        0.0, 5.0, 9.0
    ]
    # JSON twin loud-rejects instead of silently ignoring the flag
    jdf = spark.createDataFrame([("{}",)], "payload string")
    with pytest.raises(ValueError, match="wire-format-only"):
        otlp_json_flatten(jdf, start_zero=True)
    with pytest.raises(ValueError, match="wire-format-only"):
        otlp_to_metrics(jdf, start_zero=True)


def test_ct_zero_injection_dedupes_across_payloads(spark):
    """ADVICE r10: CT/start-zero injection is per payload, but a scraper
    resends the same created_timestamp every request — the flatten step
    must keep exactly ONE synthetic zero per (series, ts) across
    payloads while leaving real samples untouched (duplicate real
    samples are the store's normal at-least-once shape)."""
    from cardinalsin_spark.sources.otlp import otlp_proto_flatten
    from cardinalsin_spark.sources.remote_write import remote_write_flatten

    def v2_with_ct(labels, samples, ct_ms):
        symbols = [""]
        refs = []
        for k, v in labels.items():
            for sym in (k, v):
                if sym not in symbols:
                    symbols.append(sym)
            refs.extend((symbols.index(k), symbols.index(v)))
        ts = _ld(1, b"".join(_varint(r) for r in refs))
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        ts += _varint(6 << 3 | 0) + _varint(ct_ms)
        return b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)

    pa = v2_with_ct(
        {"__name__": "req_total", "svc": "a"}, [(5.0, 1000), (9.0, 2000)],
        ct_ms=400,
    )
    pb = v2_with_ct(
        {"__name__": "req_total", "svc": "b"}, [(3.0, 1500)], ct_ms=700
    )
    df = spark.createDataFrame(
        [(bytearray(pa),), (bytearray(pa),), (bytearray(pa),),
         (bytearray(pb),), (bytearray(pb),)],
        "payload binary",
    )
    got = remote_write_flatten(df, version=2, created_zero=True).collect()
    zeros = sorted(
        (r.ts_ms, dict(r.labels)["svc"]) for r in got if r.value == 0.0
    )
    assert zeros == [(400, "a"), (700, "b")]  # one per series, not per payload
    # real samples keep wire fidelity: 3x + 2x duplicates survive
    assert sorted(r.ts_ms for r in got if r.value != 0.0) == (
        [1000] * 3 + [1500] * 2 + [2000] * 3
    )
    # schema is unchanged by the internal flag column
    assert remote_write_flatten(df, version=2, created_zero=True).columns == [
        "ts_ms", "metric_name", "value", "labels"
    ]

    # OTLP twin: repeated ExportMetricsServiceRequest payloads
    def sum_metric(name, points):
        data = b"".join(_ld(1, p) for p in points)
        data += _varint(2 << 3 | 0) + _varint(2)
        data += _varint(3 << 3 | 0) + _varint(1)
        return _ld(1, name.encode()) + _ld(7, data)

    def pt(ts_ns, v, start_ns):
        return _fixed64(2, start_ns) + _number_point(ts_ns, as_double=v)

    payload = _export_request(
        [], [sum_metric("c", [pt(2_000, 5.0, 1_000), pt(3_000, 9.0, 1_000)])]
    )
    odf = spark.createDataFrame(
        [(bytearray(payload),), (bytearray(payload),)], "payload binary"
    )
    orows = otlp_proto_flatten(odf, start_zero=True).collect()
    assert len([r for r in orows if r.value == 0.0]) == 1
    assert sorted(r.ts_ns for r in orows if r.value != 0.0) == (
        [2_000] * 2 + [3_000] * 2
    )
    assert otlp_proto_flatten(odf, start_zero=True).columns == [
        "ts_ns", "metric_name", "value", "labels"
    ]


def test_v2_metadata_and_exemplars(spark):
    """write.v2 TimeSeries fields the sample decoder ignores: Metadata
    (field 5: type enum + help/unit symbol refs) and Exemplars (field 4:
    labels_refs + value + ts) decode into their own frames — metadata
    dedupes across scrapes, exemplars keep series AND exemplar labels
    (trace_id lives in the latter)."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request_v2,
        decode_write_request_v2_meta,
        remote_write_exemplars,
        remote_write_metadata,
    )

    symbols = ["", "__name__", "req_total", "svc", "a",
               "Total requests.", "requests", "trace_id", "abc123"]

    def sym(s):
        return symbols.index(s)

    refs = [sym("__name__"), sym("req_total"), sym("svc"), sym("a")]
    ts = _ld(1, b"".join(_varint(r) for r in refs))
    ts += _ld(2, _sample(5.0, 1000))
    # exemplar: trace_id=abc123, value 4.25 at t=900
    ex = _ld(1, b"".join(_varint(r) for r in
                         (sym("trace_id"), sym("abc123"))))
    ex += _varint(2 << 3 | 1) + struct.pack("<d", 4.25)
    ex += _varint(3 << 3 | 0) + _varint(900)
    ts += _ld(4, ex)
    # metadata: COUNTER(1), help/unit refs
    md = _varint(1 << 3 | 0) + _varint(1)
    md += _varint(3 << 3 | 0) + _varint(sym("Total requests."))
    md += _varint(4 << 3 | 0) + _varint(sym("requests"))
    ts += _ld(5, md)
    payload = b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)

    # the sample decoder is unaffected by fields 4/5
    assert decode_write_request_v2(payload) == [
        (1000, "req_total", 5.0, {"svc": "a"})
    ]
    (series,) = decode_write_request_v2_meta(payload)
    assert series["metric_name"] == "req_total"
    assert series["labels"] == {"svc": "a"}
    assert series["type"] == "counter"
    assert series["help"] == "Total requests."
    assert series["unit"] == "requests"
    assert series["exemplars"] == [(900, 4.25, {"trace_id": "abc123"})]

    # DataFrame twins: metadata dedupes across repeated scrapes,
    # exemplars keep one row per exemplar per payload
    df = spark.createDataFrame(
        [(bytearray(payload),), (bytearray(payload),)], "payload binary"
    )
    meta = remote_write_metadata(df).collect()
    assert [(r.metric_name, r.type, r.help, r.unit) for r in meta] == [
        ("req_total", "counter", "Total requests.", "requests")
    ]
    ex_rows = remote_write_exemplars(df).collect()
    assert len(ex_rows) == 2
    assert all(
        r.ts_ms == 900
        and r.value == 4.25
        and dict(r.labels) == {"svc": "a"}
        and dict(r.exemplar_labels) == {"trace_id": "abc123"}
        for r in ex_rows
    )
    # unknown type enum loud-rejects
    bad_md = _varint(1 << 3 | 0) + _varint(99)
    bad_ts = _ld(1, b"".join(_varint(r) for r in refs)) + _ld(5, bad_md)
    bad = b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, bad_ts)
    with pytest.raises(ValueError, match="metric type"):
        decode_write_request_v2_meta(bad)
    # series with neither metadata nor exemplars are omitted
    plain_ts = _ld(1, b"".join(_varint(r) for r in refs)) + _ld(
        2, _sample(1.0, 1)
    )
    plain = b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, plain_ts)
    assert decode_write_request_v2_meta(plain) == []


def test_v1_request_level_metadata(spark):
    """prompb (v1) metadata rides the REQUEST (WriteRequest field 3,
    MetricMetadata with inline strings) — decodes to the same canonical
    (metric_name, type, help, unit) rows as the v2 per-series form, and
    remote_write_metadata(version='auto') sniffs both in one feed."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request_metadata,
        remote_write_metadata,
    )

    def v1_md(fam, mtype, help_, unit):
        m = _varint(1 << 3 | 0) + _varint(mtype)
        m += _ld(2, fam.encode()) + _ld(4, help_.encode())
        m += _ld(5, unit.encode())
        return _ld(3, m)

    payload = v1_md("http_seconds", 3, "Latency.", "seconds") + v1_md(
        "up", 2, "Scrape health.", ""
    )
    assert decode_write_request_metadata(payload) == [
        ("http_seconds", "histogram", "Latency.", "seconds"),
        ("up", "gauge", "Scrape health.", ""),
    ]
    with pytest.raises(ValueError, match="metric type"):
        decode_write_request_metadata(v1_md("x", 42, "", ""))
    # auto-sniff: one v1 payload + one v2 payload in the same frame
    symbols = ["", "__name__", "req_total", "Total.", "requests"]
    md2 = _varint(1 << 3 | 0) + _varint(1)
    md2 += _varint(3 << 3 | 0) + _varint(3) + _varint(4 << 3 | 0) + _varint(4)
    ts2 = _ld(1, _varint(1) + _varint(2)) + _ld(5, md2)
    v2 = b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts2)
    df = spark.createDataFrame(
        [(bytearray(payload),), (bytearray(v2),)], "payload binary"
    )
    got = sorted(
        (r.metric_name, r.type, r.help, r.unit)
        for r in remote_write_metadata(df, version="auto").collect()
    )
    assert got == [
        ("http_seconds", "histogram", "Latency.", "seconds"),
        ("req_total", "counter", "Total.", "requests"),
        ("up", "gauge", "Scrape health.", ""),
    ]


def test_ct_zero_store_level_idempotence(spark, tmp_path):
    """VERDICT r11 watch #1: the flatten-level CT-zero dedup covers one
    job's payloads; TWO ingest jobs decoding the same series' CT must
    still land exactly one synthetic (ts=CT, 0) row in the STORE —
    ``append_ct_idempotent`` anti-joins the flagged rows against the
    committed table.  Real samples keep at-least-once fidelity (both
    jobs' copies land)."""
    from cardinalsin_spark.sources.remote_write import (
        append_ct_idempotent,
        remote_write_to_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    def v2_with_ct(labels, samples, ct_ms):
        symbols = [""]
        refs = []
        for k, v in labels.items():
            for sym in (k, v):
                if sym not in symbols:
                    symbols.append(sym)
            refs.extend((symbols.index(k), symbols.index(v)))
        ts = _ld(1, b"".join(_varint(r) for r in refs))
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        ts += _varint(6 << 3 | 0) + _varint(ct_ms)
        return b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)

    pa = v2_with_ct(
        {"__name__": "req_total", "svc": "a"}, [(5.0, 1000)], ct_ms=400
    )
    pb = v2_with_ct(
        {"__name__": "req_total", "svc": "b"}, [(3.0, 1500)], ct_ms=700
    )
    payloads = spark.createDataFrame(
        [(bytearray(pa),), (bytearray(pb),)], "payload binary"
    )
    import os as _os

    root = str(tmp_path / "store")
    _os.makedirs(root)
    cat = SnapshotCatalog(root)

    def job():
        m = remote_write_to_metrics(
            payloads, label_keys=["svc"], version=2, created_zero=True,
            keep_injected_flag=True,
        )
        return append_ct_idempotent(spark, cat, m)

    assert job() == 0
    assert job() == 1  # second job decodes the SAME CTs
    rows = cat.read(spark).collect()
    zeros = sorted(
        (r.timestamp, r.svc)
        for r in rows
        if (r.value_u64 or r.value_f64 or 0) == 0 and r.value_u64 is not None
        or (r.value_f64 == 0.0)
    )
    # exactly ONE zero per (series, CT) across both jobs
    import datetime as dt

    # collected timestamps are tz-naive under the UTC session timezone
    ct_a = dt.datetime(1970, 1, 1, 0, 0, 0, 400000)
    ct_b = dt.datetime(1970, 1, 1, 0, 0, 0, 700000)
    assert zeros == [(ct_a, "a"), (ct_b, "b")]
    # real samples: both jobs' copies land (at-least-once by design)
    reals = sorted(
        (r.svc, float(r.value_u64 if r.value_u64 is not None else r.value_f64))
        for r in rows
        if not (
            (r.value_u64 is not None and r.value_u64 == 0)
            or r.value_f64 == 0.0
        )
    )
    assert reals == [("a", 5.0), ("a", 5.0), ("b", 3.0), ("b", 3.0)]
    # a committed REAL sample at a CT instant suppresses a later
    # synthetic zero for that series too
    pc = v2_with_ct(
        {"__name__": "req_total", "svc": "a"}, [(2.0, 400)], ct_ms=400
    )
    m = remote_write_to_metrics(
        spark.createDataFrame([(bytearray(pc),)], "payload binary"),
        label_keys=["svc"], version=2, created_zero=True,
        keep_injected_flag=True,
    )
    append_ct_idempotent(spark, cat, m)
    at_ct = [
        r
        for r in cat.read(spark).collect()
        if r.svc == "a" and r.timestamp == ct_a
    ]
    # the original zero + the new real sample; no SECOND zero
    vals = sorted(
        float(r.value_u64 if r.value_u64 is not None else r.value_f64)
        for r in at_ct
    )
    assert vals == [0.0, 2.0]


def test_ct_idempotence_survives_label_evolution(spark, tmp_path):
    """Review r12: the store reads with mergeSchema, so batch N+1 may
    carry a label column the committed table lacks (and vice versa).
    The CT anti-join must align on the UNION of label keys with
    null-safe equality — a new-label batch neither crashes nor
    suppresses a different committed series' zero."""
    from cardinalsin_spark.sources.remote_write import (
        append_ct_idempotent,
        remote_write_flatten,
        remote_write_to_metrics,
    )
    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    import os as _os

    def v2_with_ct(labels, samples, ct_ms):
        symbols = [""]
        refs = []
        for k, v in labels.items():
            for sym in (k, v):
                if sym not in symbols:
                    symbols.append(sym)
            refs.extend((symbols.index(k), symbols.index(v)))
        ts = _ld(1, b"".join(_varint(r) for r in refs))
        ts += b"".join(_ld(2, _sample(v, t)) for v, t in samples)
        ts += _varint(6 << 3 | 0) + _varint(ct_ms)
        return b"".join(_ld(4, s.encode()) for s in symbols) + _ld(5, ts)

    root = str(tmp_path / "store")
    _os.makedirs(root)
    cat = SnapshotCatalog(root)
    # batch 1: labels {svc} only
    p1 = v2_with_ct({"__name__": "m", "svc": "a"}, [(5.0, 1000)], ct_ms=400)
    m1 = remote_write_to_metrics(
        spark.createDataFrame([(bytearray(p1),)], "payload binary"),
        label_keys=["svc"], version=2, created_zero=True,
        keep_injected_flag=True,
    )
    append_ct_idempotent(spark, cat, m1)
    # batch 2: a NEW label column 'instance', same svc + same CT — the
    # (svc=a, instance=i1) series is DIFFERENT from committed (svc=a):
    # its zero must land; re-sending batch 1's series must not
    p2 = v2_with_ct(
        {"__name__": "m", "svc": "a", "instance": "i1"},
        [(7.0, 1200)], ct_ms=400,
    )
    m2 = remote_write_to_metrics(
        spark.createDataFrame(
            [(bytearray(p2),), (bytearray(p1),)], "payload binary"
        ),
        label_keys=["svc", "instance"], version=2, created_zero=True,
        keep_injected_flag=True,
    )
    append_ct_idempotent(spark, cat, m2)
    rows = cat.read(spark).collect()
    zeros = sorted(
        (r.svc, getattr(r, "instance", None) or "")
        for r in rows
        if (r.value_u64 == 0 if r.value_u64 is not None else r.value_f64 == 0.0)
    )
    # one zero per series: (a, <null>) from batch 1, (a, i1) from batch 2
    assert zeros == [("a", ""), ("a", "i1")]
    # flag without CT injection is a loud error, not a silent no-column
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_injected_flag"):
        remote_write_flatten(
            spark.createDataFrame([(bytearray(p1),)], "payload binary"),
            version=2, created_zero=False, keep_injected_flag=True,
        )

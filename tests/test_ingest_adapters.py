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

"""OTLP (OpenTelemetry Protocol) metrics ingestion — wire protobuf + JSON.

The reference ingests OTLP protobuf and flattens gauge/sum/histogram/
exponential-histogram/summary data points to metrics rows, collapsing
histograms to their ``sum`` (or ``count`` when no sum is present)
(reference ``api/ingest/otlp.rs:100-246``); resource+point attributes
become label columns (``api/ingest/otlp.rs:249-295``).

Two adapters share one flatten contract (``ts_ns, metric_name, value,
labels``) and one pivot path:

- **OTLP/JSON** (the protocol's public JSON mapping): pure DataFrame ops —
  ``from_json`` → nested ``explode`` → attribute maps. Everything stays
  JVM-side/whole-stage-codegen.
- **OTLP protobuf** (``ExportMetricsServiceRequest`` wire bytes, the format
  a real collector pipeline emits): hand-rolled varint/field walk in
  ``mapInPandas`` — the same discipline as the Prometheus remote-write
  adapter (``sources/remote_write.py``), whose ``_fields`` walker it
  reuses. Field numbers follow the public opentelemetry-proto
  (metrics/v1/metrics.proto, common/v1/common.proto).

Attribute keys become label columns dynamically (schema-on-ingest), same as
the reference's converters.
"""

from __future__ import annotations

import base64
import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardinalsin_spark.sources.ingest import route_value_types
from cardinalsin_spark.sources.remote_write import _fields, _read_varint

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# OTLP/JSON schema, trimmed to the fields the flattening consumes. Numbers
# arrive as JSON numbers or strings (timeUnixNano is a string in OTLP/JSON);
# strings are used here and cast after extraction.
_ATTR = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value",
                T.StructType(
                    [
                        T.StructField("stringValue", T.StringType()),
                        T.StructField("intValue", T.StringType()),
                        T.StructField("doubleValue", T.DoubleType()),
                        T.StructField("boolValue", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )
)

_NUMBER_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("attributes", _ATTR),
    ]
)

_HISTO_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("count", T.StringType()),
        # classic-histogram bucket shape (bucketCounts are strings in
        # OTLP/JSON, like every 64-bit integer); absent on summary points
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
        T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
        T.StructField("attributes", _ATTR),
    ]
)

_EXP_SPAN = T.StructType(
    [
        T.StructField("offset", T.IntegerType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
    ]
)

_EXP_HISTO_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("count", T.StringType()),
        T.StructField("scale", T.IntegerType()),
        T.StructField("zeroCount", T.StringType()),
        T.StructField("positive", _EXP_SPAN),
        T.StructField("negative", _EXP_SPAN),
        T.StructField("attributes", _ATTR),
    ]
)

_METRIC = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "gauge",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_NUMBER_POINT))]),
        ),
        T.StructField(
            "sum",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_NUMBER_POINT))]),
        ),
        T.StructField(
            "histogram",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_HISTO_POINT))]),
        ),
        T.StructField(
            "exponentialHistogram",
            T.StructType(
                [T.StructField("dataPoints", T.ArrayType(_EXP_HISTO_POINT))]
            ),
        ),
        T.StructField(
            "summary",
            T.StructType([T.StructField("dataPoints", T.ArrayType(_HISTO_POINT))]),
        ),
    ]
)

OTLP_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _ATTR)]),
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "metrics", T.ArrayType(_METRIC)
                                        )
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attr_map(attrs: F.Column) -> F.Column:
    """attributes array → map<string,string> (first non-null value rep)."""
    return F.map_from_entries(
        F.transform(
            attrs,
            lambda a: F.struct(
                a["key"].alias("key"),
                F.coalesce(
                    a["value"]["stringValue"],
                    a["value"]["intValue"],
                    a["value"]["doubleValue"].cast("string"),
                    a["value"]["boolValue"].cast("string"),
                ).alias("value"),
            ),
        )
    )


def otlp_json_flatten(
    payloads: DataFrame,
    json_col: str = "payload",
    histogram_buckets: bool = False,
    start_zero: bool = False,
) -> DataFrame:
    """OTLP/JSON payload strings → (ts_ns, metric_name, value, labels map).

    One output row per data point. Histogram/summary points collapse to
    ``sum`` (fallback ``count``) exactly like the reference. Resource
    attributes merge under point attributes (point wins on key conflict).

    ``histogram_buckets=True`` is the SUPERSET mode the reference lacks
    (it always collapses, ``api/ingest/otlp.rs:176-246``): classic
    histogram data points expand to the Prometheus exposition shape —
    one ``{name}_bucket`` row per explicit bound carrying the CUMULATIVE
    count with an ``le`` label (shortest-spelling bound, ``+Inf`` row
    included), plus ``{name}_count`` and (when present) ``{name}_sum``
    rows — exactly what ``histogram_quantile``/``histogram_fraction``
    consume downstream. Exponential histograms and summaries still
    collapse (they carry no explicit bounds). All expansion is
    DataFrame-side (posexplode + aggregate over the bucket arrays), no
    Python in the loop."""
    if start_zero:
        raise ValueError(
            "start_zero (start-time zero injection) is wire-format-only: "
            "use otlp_proto_flatten/otlp_proto_to_metrics — the JSON "
            "column-algebra twin does not implement it, and silently "
            "ignoring the flag would under-report counter increases"
        )
    parsed = payloads.select(
        F.from_json(F.col(json_col), OTLP_JSON_SCHEMA).alias("p")
    )
    rm = parsed.select(F.explode("p.resourceMetrics").alias("rm"))
    metrics = rm.select(
        _attr_map(F.coalesce(F.col("rm.resource.attributes"), F.array())).alias(
            "res_attrs"
        ),
        F.explode("rm.scopeMetrics").alias("sm"),
    ).select("res_attrs", F.explode("sm.metrics").alias("m"))

    def number_points(kind: str) -> DataFrame:
        return (
            metrics.filter(F.col(f"m.{kind}").isNotNull())
            .select(
                "res_attrs",
                F.col("m.name").alias("metric_name"),
                F.explode(F.col(f"m.{kind}.dataPoints")).alias("dp"),
            )
            .select(
                "res_attrs",
                "metric_name",
                F.col("dp.timeUnixNano").cast("long").alias("ts_ns"),
                F.coalesce(
                    F.col("dp.asDouble"), F.col("dp.asInt").cast("double")
                ).alias("value"),
                _attr_map(F.coalesce(F.col("dp.attributes"), F.array())).alias(
                    "attrs"
                ),
            )
        )

    def histo_points(kind: str) -> DataFrame:
        # collapse to sum, else count (reference api/ingest/otlp.rs:176-246)
        return (
            metrics.filter(F.col(f"m.{kind}").isNotNull())
            .select(
                "res_attrs",
                F.col("m.name").alias("metric_name"),
                F.explode(F.col(f"m.{kind}.dataPoints")).alias("dp"),
            )
            .select(
                "res_attrs",
                "metric_name",
                F.col("dp.timeUnixNano").cast("long").alias("ts_ns"),
                F.coalesce(
                    F.col("dp.sum"), F.col("dp.count").cast("double")
                ).alias("value"),
                _attr_map(F.coalesce(F.col("dp.attributes"), F.array())).alias(
                    "attrs"
                ),
            )
        )

    def histogram_bucket_rows() -> DataFrame:
        base = (
            metrics.filter(F.col("m.histogram").isNotNull())
            .select(
                "res_attrs",
                F.col("m.name").alias("metric_name"),
                F.explode(F.col("m.histogram.dataPoints")).alias("dp"),
            )
            .select(
                "res_attrs",
                "metric_name",
                F.col("dp.timeUnixNano").cast("long").alias("ts_ns"),
                F.col("dp.count").cast("long").alias("_cnt"),
                F.col("dp.sum").alias("_sum"),
                F.coalesce(
                    F.col("dp.bucketCounts").cast("array<long>"),
                    F.array().cast("array<long>"),
                ).alias("_bc"),
                F.coalesce(
                    F.col("dp.explicitBounds"),
                    F.array().cast("array<double>"),
                ).alias("_bounds"),
                _attr_map(F.coalesce(F.col("dp.attributes"), F.array())).alias(
                    "attrs"
                ),
            )
            # the point's count wins when set (the spec requires it to
            # equal sum(bucket_counts)); a zero/absent count falls back
            # to the bucket total — same rule as the wire decoder
            .withColumn(
                "_total",
                F.when(
                    F.col("_cnt").isNotNull() & (F.col("_cnt") > 0),
                    F.col("_cnt"),
                ).otherwise(F.expr("aggregate(_bc, 0L, (a, x) -> a + x)")),
            )
        )
        le_str = F.expr(
            "CASE WHEN _b = floor(_b) AND abs(_b) < 9e18"
            " THEN CAST(CAST(_b AS BIGINT) AS STRING)"
            " ELSE CAST(_b AS STRING) END"
        )
        per_bound = (
            base.select(
                "res_attrs",
                "metric_name",
                "ts_ns",
                "attrs",
                "_bc",
                F.posexplode("_bounds").alias("_pos", "_b"),
            )
            .select(
                "res_attrs",
                F.concat("metric_name", F.lit("_bucket")).alias("metric_name"),
                "ts_ns",
                # cumulative count <= bound: prefix-sum of the per-bucket
                # counts (a short bucket array stalls the prefix, same as
                # the wire decoder)
                F.expr(
                    "CAST(aggregate(slice(_bc, 1, _pos + 1), 0L,"
                    " (a, x) -> a + x) AS DOUBLE)"
                ).alias("value"),
                F.map_concat(
                    "attrs", F.create_map(F.lit("le"), le_str)
                ).alias("attrs"),
            )
        )
        inf_rows = base.select(
            "res_attrs",
            F.concat("metric_name", F.lit("_bucket")).alias("metric_name"),
            "ts_ns",
            F.col("_total").cast("double").alias("value"),
            F.map_concat(
                "attrs", F.create_map(F.lit("le"), F.lit("+Inf"))
            ).alias("attrs"),
        )
        count_rows = base.select(
            "res_attrs",
            F.concat("metric_name", F.lit("_count")).alias("metric_name"),
            "ts_ns",
            F.col("_total").cast("double").alias("value"),
            "attrs",
        )
        sum_rows = base.filter(F.col("_sum").isNotNull()).select(
            "res_attrs",
            F.concat("metric_name", F.lit("_sum")).alias("metric_name"),
            "ts_ns",
            F.col("_sum").alias("value"),
            "attrs",
        )
        return (
            per_bound.unionByName(inf_rows)
            .unionByName(count_rows)
            .unionByName(sum_rows)
            .select("res_attrs", "metric_name", "ts_ns", "value", "attrs")
        )

    def exp_histogram_bucket_rows() -> DataFrame:
        base = (
            metrics.filter(F.col("m.exponentialHistogram").isNotNull())
            .select(
                "res_attrs",
                F.col("m.name").alias("metric_name"),
                F.explode(
                    F.col("m.exponentialHistogram.dataPoints")
                ).alias("dp"),
            )
            .select(
                "res_attrs",
                "metric_name",
                F.col("dp.timeUnixNano").cast("long").alias("ts_ns"),
                F.col("dp.count").cast("long").alias("_cnt"),
                F.col("dp.sum").alias("_sum"),
                F.coalesce(F.col("dp.scale"), F.lit(0)).alias("_scale"),
                F.coalesce(
                    F.col("dp.zeroCount").cast("long"), F.lit(0)
                ).alias("_zero"),
                F.coalesce(F.col("dp.positive.offset"), F.lit(0)).alias(
                    "_pos_off"
                ),
                F.coalesce(
                    F.col("dp.positive.bucketCounts").cast("array<long>"),
                    F.array().cast("array<long>"),
                ).alias("_pos_bc"),
                F.coalesce(F.col("dp.negative.offset"), F.lit(0)).alias(
                    "_neg_off"
                ),
                F.coalesce(
                    F.col("dp.negative.bucketCounts").cast("array<long>"),
                    F.array().cast("array<long>"),
                ).alias("_neg_bc"),
                _attr_map(
                    F.coalesce(F.col("dp.attributes"), F.array())
                ).alias("attrs"),
            )
            .withColumn(
                "_total",
                F.when(
                    F.col("_cnt").isNotNull() & (F.col("_cnt") > 0),
                    F.col("_cnt"),
                ).otherwise(
                    F.col("_zero")
                    + F.expr("aggregate(_pos_bc, 0L, (a, x) -> a + x)")
                    + F.expr("aggregate(_neg_bc, 0L, (a, x) -> a + x)")
                ),
            )
        )

        def sign_rows(sign: str, off_col: str, bc_col: str) -> DataFrame:
            return (
                base.select(
                    "res_attrs",
                    "metric_name",
                    "ts_ns",
                    "attrs",
                    "_scale",
                    F.col(off_col).alias("_off"),
                    F.posexplode(bc_col).alias("_pos", "_c"),
                )
                .filter(F.col("_c") > 0)
                .select(
                    "res_attrs",
                    F.concat("metric_name", F.lit("_exp_bucket")).alias(
                        "metric_name"
                    ),
                    "ts_ns",
                    F.col("_c").cast("double").alias("value"),
                    F.map_concat(
                        "attrs",
                        F.create_map(
                            F.lit("scale"),
                            F.col("_scale").cast("string"),
                            F.lit("idx"),
                            (F.col("_off") + F.col("_pos")).cast("string"),
                            F.lit("sign"),
                            F.lit(sign),
                        ),
                    ).alias("attrs"),
                )
            )

        zero_rows = base.select(
            "res_attrs",
            F.concat("metric_name", F.lit("_exp_zero")).alias("metric_name"),
            "ts_ns",
            F.col("_zero").cast("double").alias("value"),
            F.map_concat(
                "attrs",
                F.create_map(
                    F.lit("scale"), F.col("_scale").cast("string")
                ),
            ).alias("attrs"),
        )
        count_rows = base.select(
            "res_attrs",
            F.concat("metric_name", F.lit("_count")).alias("metric_name"),
            "ts_ns",
            F.col("_total").cast("double").alias("value"),
            "attrs",
        )
        sum_rows = base.filter(F.col("_sum").isNotNull()).select(
            "res_attrs",
            F.concat("metric_name", F.lit("_sum")).alias("metric_name"),
            "ts_ns",
            F.col("_sum").alias("value"),
            "attrs",
        )
        return (
            sign_rows("pos", "_pos_off", "_pos_bc")
            .unionByName(sign_rows("neg", "_neg_off", "_neg_bc"))
            .unionByName(zero_rows)
            .unionByName(count_rows)
            .unionByName(sum_rows)
            .select("res_attrs", "metric_name", "ts_ns", "value", "attrs")
        )

    histo = (
        histogram_bucket_rows()
        if histogram_buckets
        else histo_points("histogram")
    )
    # exponential histograms: the reference's flatten DROPS them on the
    # JSON path and sum-collapses on the wire path; here JSON collapses
    # identically to the wire decoder, and bucket mode expands to
    # scale/idx/sign rows feeding exp_histogram_quantile
    exp = (
        exp_histogram_bucket_rows()
        if histogram_buckets
        else histo_points("exponentialHistogram")
    )
    points = (
        number_points("gauge")
        .unionByName(number_points("sum"))
        .unionByName(histo)
        .unionByName(exp)
        .unionByName(histo_points("summary"))
    )
    return points.select(
        "ts_ns",
        "metric_name",
        "value",
        # union of keys; point attribute wins over resource attribute
        F.map_zip_with(
            "res_attrs", "attrs", lambda k, res, pt: F.coalesce(pt, res)
        ).alias("labels"),
    )


def _flat_to_metrics(flat: DataFrame, label_keys: list[str] | None) -> DataFrame:
    """Shared pivot: flat (ts_ns, metric_name, value, labels) rows → wide
    metrics frame with attribute keys as label columns and routed value
    types. ``label_keys=None`` discovers the key set with a distributed
    ``map_keys``+distinct aggregation (schema-on-ingest, like the reference
    building its Arrow schema from whatever attributes arrive)."""
    if label_keys is None:
        label_keys = sorted(
            r[0]
            for r in flat.select(
                F.explode(F.map_keys("labels")).alias("k")
            ).distinct().collect()
        )
    out = flat.select(
        F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")).alias("timestamp"),
        "ts_ns",
        "metric_name",
        "value",
        *[F.col("labels").getItem(k).alias(k) for k in label_keys],
    )
    return route_value_types(out).drop("value")


def otlp_to_metrics(
    payloads: DataFrame,
    label_keys: list[str] | None = None,
    json_col: str = "payload",
    histogram_buckets: bool = False,
    start_zero: bool = False,
) -> DataFrame:
    """Full OTLP/JSON ingest: flatten, pivot labels, route value types.
    ``histogram_buckets=True`` preserves classic-histogram buckets as
    per-``le`` rows (see :func:`otlp_json_flatten`) so the ingested table
    answers ``histogram_quantile``/``histogram_fraction`` directly.
    ``start_zero`` loud-rejects (see :func:`otlp_json_flatten`)."""
    if start_zero:
        raise ValueError(
            "start_zero is wire-format-only: use otlp_proto_to_metrics"
        )
    return _flat_to_metrics(
        otlp_json_flatten(payloads, json_col, histogram_buckets), label_keys
    )


# ---------------------------------------------------------------------------
# OTLP protobuf wire decode
# ---------------------------------------------------------------------------
#
# Message/field map (public opentelemetry-proto):
#   ExportMetricsServiceRequest { repeated ResourceMetrics resource_metrics=1 }
#   ResourceMetrics  { Resource resource=1; repeated ScopeMetrics scope_metrics=2 }
#   Resource         { repeated KeyValue attributes=1 }
#   ScopeMetrics     { repeated Metric metrics=2 }
#   Metric           { string name=1; oneof data: gauge=5 sum=7 histogram=9
#                      exponential_histogram=10 summary=11 }
#   Gauge/Sum        { repeated NumberDataPoint data_points=1 }
#   NumberDataPoint  { fixed64 time_unix_nano=3; oneof: double as_double=4,
#                      sfixed64 as_int=6; repeated KeyValue attributes=7 }
#   HistogramDataPoint { fixed64 time_unix_nano=3; fixed64 count=4;
#                      optional double sum=5; repeated KeyValue attributes=9 }
#   ExponentialHistogramDataPoint { same 3/4/5; attributes=1 }
#   SummaryDataPoint { fixed64 time_unix_nano=3; fixed64 count=4;
#                      double sum=5 (non-optional, default 0); attributes=7 }
#   KeyValue         { string key=1; AnyValue value=2 }
#   AnyValue         { oneof: string=1 bool=2 int=3 double=4 array=5
#                      kvlist=6 bytes=7 }


def _any_value_to_string(buf: bytes) -> str:
    """AnyValue → string, mirroring the reference's collapse
    (``api/ingest/otlp.rs:any_value_to_string``): strings pass through,
    bool → "true"/"false", ints/doubles stringified, bytes → base64.
    Nested array/kvlist values render as base64 of their encoded bytes
    (documented deviation: the reference uses Rust's Debug format, which
    has no portable equivalent — both are stable, opaque renderings)."""
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            return val.decode("utf-8")
        if fno == 2 and wt == 0:
            return "true" if val else "false"
        if fno == 3 and wt == 0:
            iv = val - (1 << 64) if val >= 1 << 63 else val
            return str(iv)
        if fno == 4 and wt == 1:
            d = struct.unpack("<d", val)[0]
            return repr(d)
        if fno in (5, 6) and wt == 2:
            return base64.b64encode(val).decode("ascii")
        if fno == 7 and wt == 2:
            return base64.b64encode(val).decode("ascii")
    return ""


def _key_values(buf: bytes) -> tuple[str, str]:
    key = ""
    sval = ""
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            key = val.decode("utf-8")
        elif fno == 2 and wt == 2:
            sval = _any_value_to_string(val)
    return key, sval


def _fixed64_i64(raw: bytes) -> int:
    """fixed64 → i64 (the reference casts time_unix_nano `as i64`)."""
    u = struct.unpack("<Q", raw)[0]
    return u - (1 << 64) if u >= 1 << 63 else u


def _decode_number_point(buf: bytes) -> tuple[int, float, dict, int]:
    ts = 0
    start_ns = 0
    value = float("nan")  # no value field → NaN, like the reference
    attrs: dict[str, str] = {}
    for fno, wt, val in _fields(buf):
        if fno == 2 and wt == 1:
            start_ns = _fixed64_i64(val)
        elif fno == 3 and wt == 1:
            ts = _fixed64_i64(val)
        elif fno == 4 and wt == 1:
            value = struct.unpack("<d", val)[0]
        elif fno == 6 and wt == 1:
            value = float(struct.unpack("<q", val)[0])
        elif fno == 7 and wt == 2:
            k, v = _key_values(val)
            attrs[k] = v
    return ts, value, attrs, start_ns


def _packed_fixed64(val: bytes) -> list[int]:
    return [
        struct.unpack_from("<Q", val, i)[0] for i in range(0, len(val), 8)
    ]


def _packed_double(val: bytes) -> list[float]:
    return [
        struct.unpack_from("<d", val, i)[0] for i in range(0, len(val), 8)
    ]


def _fmt_le(bound: float) -> str:
    """Prometheus-style shortest bound spelling for the ``le`` label:
    integral bounds render without a decimal point (``1.0`` → ``"1"``),
    everything else as Python's shortest round-trip repr (``0.5``)."""
    s = repr(float(bound))
    return s[:-2] if s.endswith(".0") else s


def _decode_histogram_point_full(
    buf: bytes,
) -> tuple[int, int, float | None, list[int], list[float], dict]:
    """Classic HistogramDataPoint with buckets preserved: (ts, count, sum,
    bucket_counts, explicit_bounds, attrs). bucket_counts (fixed64, field
    6) and explicit_bounds (double, field 7) arrive packed (one
    length-delimited blob of 8-byte values) or, from pre-proto3
    serializers, unpacked — both accepted."""
    ts = 0
    count = 0
    s: float | None = None
    counts: list[int] = []
    bounds: list[float] = []
    attrs: dict[str, str] = {}
    for fno, wt, val in _fields(buf):
        if fno == 3 and wt == 1:
            ts = _fixed64_i64(val)
        elif fno == 4 and wt == 1:
            count = struct.unpack("<Q", val)[0]
        elif fno == 5 and wt == 1:
            s = struct.unpack("<d", val)[0]
        elif fno == 6 and wt == 2:
            counts.extend(_packed_fixed64(val))
        elif fno == 6 and wt == 1:
            counts.append(struct.unpack("<Q", val)[0])
        elif fno == 7 and wt == 2:
            bounds.extend(_packed_double(val))
        elif fno == 7 and wt == 1:
            bounds.append(struct.unpack("<d", val)[0])
        elif fno == 9 and wt == 2:
            k, v = _key_values(val)
            attrs[k] = v
    return ts, count, s, counts, bounds, attrs


def _histogram_bucket_rows(
    name: str,
    ts: int,
    count: int,
    s: float | None,
    counts: list[int],
    bounds: list[float],
    labels: dict,
) -> list[tuple[int, str, float, dict]]:
    """Prometheus exposition shape for one histogram point: cumulative
    ``{name}_bucket`` rows per bound + ``+Inf``, ``{name}_count``, and
    ``{name}_sum`` when present. The point's ``count`` wins as the total
    when set (the spec requires count == sum(bucket_counts)); a
    zero/absent count falls back to the bucket total."""
    rows: list[tuple[int, str, float, dict]] = []
    cum = 0
    for i, bound in enumerate(bounds):
        if i < len(counts):
            cum += counts[i]
        rows.append(
            (ts, f"{name}_bucket", float(cum), {**labels, "le": _fmt_le(bound)})
        )
    total = sum(counts) if counts else cum
    if count > 0:
        total = count
    rows.append((ts, f"{name}_bucket", float(total), {**labels, "le": "+Inf"}))
    rows.append((ts, f"{name}_count", float(total), dict(labels)))
    if s is not None:
        rows.append((ts, f"{name}_sum", s, dict(labels)))
    return rows


def _zigzag(v: int) -> int:
    """Decode a zigzag-encoded sint32/sint64 varint value."""
    return (v >> 1) ^ -(v & 1)


def _packed_varints(val: bytes) -> list[int]:
    out: list[int] = []
    i = 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(v)
    return out


def _decode_exp_bucket_span(buf: bytes) -> tuple[int, list[int]]:
    """ExponentialHistogramDataPoint.Buckets: (offset, bucket_counts).
    offset is zigzag sint32; bucket_counts are packed (or unpacked)
    varint uint64."""
    offset = 0
    counts: list[int] = []
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 0:
            offset = _zigzag(val)
        elif fno == 2 and wt == 2:
            counts.extend(_packed_varints(val))
        elif fno == 2 and wt == 0:
            counts.append(val)
    return offset, counts


def _decode_exp_histogram_point_full(
    buf: bytes,
) -> tuple[int, int, float | None, int, int, tuple, tuple, dict]:
    """ExponentialHistogramDataPoint with buckets preserved: (ts, count,
    sum, scale, zero_count, (pos_offset, pos_counts), (neg_offset,
    neg_counts), attrs). Field numbers per public opentelemetry-proto:
    attributes=1, time=3, count=4, sum=5, scale=6 (zigzag sint32),
    zero_count=7 (fixed64), positive=8, negative=9."""
    ts = 0
    count = 0
    s: float | None = None
    scale = 0
    zero = 0
    pos: tuple[int, list[int]] = (0, [])
    neg: tuple[int, list[int]] = (0, [])
    attrs: dict[str, str] = {}
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            k, v = _key_values(val)
            attrs[k] = v
        elif fno == 3 and wt == 1:
            ts = _fixed64_i64(val)
        elif fno == 4 and wt == 1:
            count = struct.unpack("<Q", val)[0]
        elif fno == 5 and wt == 1:
            s = struct.unpack("<d", val)[0]
        elif fno == 6 and wt == 0:
            scale = _zigzag(val)
        elif fno == 7 and wt == 1:
            zero = struct.unpack("<Q", val)[0]
        elif fno == 8 and wt == 2:
            pos = _decode_exp_bucket_span(val)
        elif fno == 9 and wt == 2:
            neg = _decode_exp_bucket_span(val)
    return ts, count, s, scale, zero, pos, neg, attrs


def _exp_histogram_bucket_rows(
    name: str,
    ts: int,
    count: int,
    s: float | None,
    scale: int,
    zero: int,
    pos: tuple[int, list[int]],
    neg: tuple[int, list[int]],
    labels: dict,
) -> list[tuple[int, str, float, dict]]:
    """Exponential-histogram point → per-bucket rows: one
    ``{name}_exp_bucket`` row per non-empty bucket carrying the
    NON-cumulative count with ``scale``/``idx``/``sign`` labels (bucket
    ``idx`` covers ``(2^(idx/2^scale), 2^((idx+1)/2^scale)]`` for
    ``sign=pos``, mirrored for ``neg``), plus ``{name}_exp_zero``
    (zero-bucket count, same ``scale``), ``{name}_count`` and
    ``{name}_sum``. Feeds ``operators.promql.exp_histogram_quantile``."""
    rows: list[tuple[int, str, float, dict]] = []
    base = {**labels, "scale": str(scale)}
    for sign, (offset, counts) in (("pos", pos), ("neg", neg)):
        for i, c in enumerate(counts):
            if c == 0:
                continue
            rows.append(
                (
                    ts,
                    f"{name}_exp_bucket",
                    float(c),
                    {**base, "idx": str(offset + i), "sign": sign},
                )
            )
    rows.append((ts, f"{name}_exp_zero", float(zero), dict(base)))
    total = count if count > 0 else zero + sum(pos[1]) + sum(neg[1])
    rows.append((ts, f"{name}_count", float(total), dict(labels)))
    if s is not None:
        rows.append((ts, f"{name}_sum", s, dict(labels)))
    return rows


def _decode_histo_point(buf: bytes, attr_field: int, sum_optional: bool) -> tuple[int, float, dict]:
    ts = 0
    count = 0
    s: float | None = None
    attrs: dict[str, str] = {}
    for fno, wt, val in _fields(buf):
        if fno == 3 and wt == 1:
            ts = _fixed64_i64(val)
        elif fno == 4 and wt == 1:
            count = struct.unpack("<Q", val)[0]
        elif fno == 5 and wt == 1:
            s = struct.unpack("<d", val)[0]
        elif fno == attr_field and wt == 2:
            k, v = _key_values(val)
            attrs[k] = v
    if sum_optional:
        value = s if s is not None else float(count)  # histogram collapse
    else:
        value = s if s is not None else 0.0  # summary: proto3 scalar default
    return ts, value, attrs


# Metric.data oneof field → (decoder, decoder args)
_POINT_KINDS: dict[int, tuple] = {
    5: ("number", None),  # gauge
    7: ("number", None),  # sum
    9: ("histo", (9, True)),  # histogram: attributes=9, sum optional
    10: ("histo", (1, True)),  # exponential histogram: attributes=1
    11: ("histo", (7, False)),  # summary: attributes=7, sum defaults 0
}


def _decode_metric(
    buf: bytes, res_labels: dict, histogram_buckets: bool = False,
    start_zero: bool = False, _flag_injected: bool = False,
) -> list[tuple]:
    name = ""
    point_bufs: list[tuple[int, bytes]] = []
    # Sum envelope metadata (aggregation_temporality=2, is_monotonic=3):
    # start-zero injection only makes sense for MONOTONIC CUMULATIVE sums
    # — a counter born at start_time; gauges/delta sums never inject
    sum_temporality = 0
    sum_monotonic = False
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            name = val.decode("utf-8")
        elif fno in _POINT_KINDS and wt == 2:
            for dfno, dwt, dval in _fields(val):
                if dfno == 1 and dwt == 2:  # data_points
                    point_bufs.append((fno, dval))
                elif fno == 7 and dfno == 2 and dwt == 0:
                    sum_temporality = dval
                elif fno == 7 and dfno == 3 and dwt == 0:
                    sum_monotonic = bool(dval)
    rows = []
    injected: set = set()  # one zero per (series, start) even though
    # every cumulative point repeats the same start_time; cross-PAYLOAD
    # repeats are deduped DataFrame-side in otlp_proto_flatten (ADVICE
    # r10), which is what _flag_injected marks rows for
    inj_idx: set[int] = set()
    for kind_field, pbuf in point_bufs:
        if histogram_buckets and kind_field == 9:
            ts, count, s, counts, bounds, attrs = (
                _decode_histogram_point_full(pbuf)
            )
            rows.extend(
                _histogram_bucket_rows(
                    name, ts, count, s, counts, bounds,
                    {**res_labels, **attrs},
                )
            )
            continue
        if histogram_buckets and kind_field == 10:
            ts, count, s, scale, zero, pos, neg, attrs = (
                _decode_exp_histogram_point_full(pbuf)
            )
            rows.extend(
                _exp_histogram_bucket_rows(
                    name, ts, count, s, scale, zero, pos, neg,
                    {**res_labels, **attrs},
                )
            )
            continue
        kind, args = _POINT_KINDS[kind_field]
        if kind == "number":
            ts, value, attrs, start_ns = _decode_number_point(pbuf)
            if (
                start_zero
                and kind_field == 7  # Sum
                and sum_monotonic
                and sum_temporality == 2  # CUMULATIVE
                and 0 < start_ns < ts
            ):
                # CT-zero injection (the remote-write 2.0
                # created_timestamp semantics on the OTLP side): the
                # counter was born at start_time strictly before this
                # sample, so rate/increase should see its rise from zero
                key = (start_ns, tuple(sorted(attrs.items())))
                if key not in injected:
                    injected.add(key)
                    inj_idx.add(len(rows))
                    rows.append(
                        (start_ns, name, 0.0, {**res_labels, **attrs})
                    )
        else:
            ts, value, attrs = _decode_histo_point(pbuf, *args)
        rows.append((ts, name, value, {**res_labels, **attrs}))
    if _flag_injected:
        return [(*r, i in inj_idx) for i, r in enumerate(rows)]
    return rows


def decode_export_metrics_request(
    payload: bytes, histogram_buckets: bool = False,
    start_zero: bool = False, _flag_injected: bool = False,
) -> list[tuple]:
    """One ExportMetricsServiceRequest → [(ts_ns, metric_name, value,
    labels), ...] with point attributes overriding resource attributes
    (reference ``api/ingest/otlp.rs:merge_labels``).
    ``histogram_buckets=True`` expands classic histogram points to
    cumulative per-``le`` rows instead of the sum/count collapse (see
    :func:`otlp_json_flatten`)."""
    rows = []
    for fno, wt, rm in _fields(payload):
        if fno != 1 or wt != 2:  # ResourceMetrics
            continue
        res_labels: dict[str, str] = {}
        scope_bufs: list[bytes] = []
        for f2, w2, v2 in _fields(rm):
            if f2 == 1 and w2 == 2:  # Resource
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 2:
                        k, v = _key_values(v3)
                        res_labels[k] = v
            elif f2 == 2 and w2 == 2:  # ScopeMetrics
                scope_bufs.append(v2)
        # two-pass so resource labels apply even if the serializer wrote
        # scope_metrics before resource (field order is not guaranteed)
        for sm in scope_bufs:
            for f3, w3, mbuf in _fields(sm):
                if f3 == 2 and w3 == 2:  # Metric
                    rows.extend(
                        _decode_metric(
                            mbuf, res_labels, histogram_buckets, start_zero,
                            _flag_injected,
                        )
                    )
    return rows


def otlp_proto_flatten(
    payloads: DataFrame,
    bytes_col: str = "payload",
    on_error: str = "skip",
    histogram_buckets: bool = False,
    start_zero: bool = False,
) -> DataFrame:
    """binary ExportMetricsServiceRequest payloads → flat point rows.

    Same error-isolation contract as ``remote_write_flatten``: one
    malformed payload must not fail the ingest job; skipped payloads count
    in the ``otlp_decode_errors`` accumulator.

    ``start_zero=True`` opts monotonic CUMULATIVE sums into start-time
    zero injection — the remote-write 2.0 created_timestamp semantics on
    the OTLP side: a counter whose ``start_time_unix_nano`` strictly
    predates its first sample gets one synthetic zero there, so
    rate/increase see the rise from birth. Wire-format path only (the
    JSON twin loud-rejects the flag). Injected zeros are deduped ACROSS
    payloads here (ADVICE r10): every scrape repeats the same
    start_time, and without this dedup each request would stack another
    (ts=start, 0.0) row — inflating ``count_over_time``/``avg`` windows
    spanning the start. Real samples are never touched."""
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
    acc = payloads.sparkSession.sparkContext.accumulator(0)
    schema = "ts_ns long, metric_name string, value double, labels map<string,string>"
    if start_zero:
        schema += ", _ct_injected boolean"

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for payload in pdf[bytes_col]:
                try:
                    rows.extend(
                        decode_export_metrics_request(
                            bytes(payload), histogram_buckets, start_zero,
                            _flag_injected=start_zero,
                        )
                    )
                except (ValueError, UnicodeDecodeError, struct.error):
                    if on_error == "raise":
                        raise
                    acc.add(1)
            cols = ["ts_ns", "metric_name", "value", "labels"]
            if start_zero:
                cols.append("_ct_injected")
            yield pd.DataFrame(rows, columns=cols)

    flat = payloads.select(bytes_col).mapInPandas(fn, schema)
    if not start_zero:
        return flat
    lk = F.to_json(F.array_sort(F.map_entries("labels")))
    inj = (
        flat.filter(F.col("_ct_injected"))
        .withColumn("_lk", lk)
        .dropDuplicates(["ts_ns", "metric_name", "_lk"])
        .drop("_lk")
    )
    return (
        flat.filter(~F.col("_ct_injected"))
        .unionByName(inj)
        .drop("_ct_injected")
    )


def otlp_proto_to_metrics(
    payloads: DataFrame,
    label_keys: list[str] | None = None,
    bytes_col: str = "payload",
    histogram_buckets: bool = False,
    start_zero: bool = False,
) -> DataFrame:
    """Full OTLP protobuf ingest: wire decode, pivot labels, route value
    types — the wire-true twin of :func:`otlp_to_metrics`."""
    return _flat_to_metrics(
        otlp_proto_flatten(
            payloads, bytes_col, histogram_buckets=histogram_buckets,
            start_zero=start_zero,
        ),
        label_keys,
    )

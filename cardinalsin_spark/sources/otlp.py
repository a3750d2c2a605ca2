"""OTLP (OpenTelemetry Protocol) metrics ingestion — the OTLP/JSON flavor.

The reference ingests OTLP protobuf and flattens gauge/sum/histogram/
exponential-histogram/summary data points to metrics rows, collapsing
histograms to their ``sum`` (or ``count`` when no sum is present)
(reference ``api/ingest/otlp.rs:100-246``); resource+point attributes
become label columns (``api/ingest/otlp.rs:249-295``).

This adapter consumes OTLP/JSON (the protocol's public JSON mapping) with
pure DataFrame ops: ``from_json`` → nested ``explode`` → attribute maps via
``map_from_entries``. Everything stays JVM-side/whole-stage-codegen — no
Python row handling — so ingest parallelizes over any payload volume.
Attribute keys become label columns dynamically (schema-on-ingest), same as
the reference's converters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardinalsin_spark.sources.ingest import route_value_types

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


def otlp_json_flatten(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """OTLP/JSON payload strings → (ts_ns, metric_name, value, labels map).

    One output row per data point. Histogram/summary points collapse to
    ``sum`` (fallback ``count``) exactly like the reference. Resource
    attributes merge under point attributes (point wins on key conflict).
    """
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

    points = (
        number_points("gauge")
        .unionByName(number_points("sum"))
        .unionByName(histo_points("histogram"))
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


def otlp_to_metrics(
    payloads: DataFrame,
    label_keys: list[str] | None = None,
    json_col: str = "payload",
) -> DataFrame:
    """Full OTLP ingest: flatten, then pivot attribute keys to label
    columns (labels-as-columns model) and route value types.

    ``label_keys=None`` discovers the key set with a distributed
    ``map_keys``+distinct aggregation (schema-on-ingest, like the reference
    building its Arrow schema from whatever attributes arrive)."""
    flat = otlp_json_flatten(payloads, json_col)
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
    out = route_value_types(out)
    return out.drop("value")

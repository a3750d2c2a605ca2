"""The wide ``metrics`` table schema — labels-as-columns data model.

Mirrors the reference's Arrow schema (reference ``schema/metrics.rs:236-275``):
fixed core fields ``timestamp``/``metric_name``/``value_f64``/``value_i64``/
``value_u64`` plus one nullable string column per label. The reference encodes
labels by cardinality tier (Dictionary(UInt16|UInt32) vs plain Utf8,
``schema/metrics.rs:44-52, 111-124``); in Spark/Parquet dictionary encoding is
chosen automatically by the writer, so the tier only survives as metadata we
keep for documentation and for adaptive-index-style recommendations.

Spark has no unsigned 64-bit integer, so ``value_u64`` maps to ``LongType``
(documented lossy above 2^63-1; the reference's own Prometheus value routing,
``api/ingest/prometheus.rs:405-430``, only emits u64 for non-negative ints
that fit i64 in practice).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class MetricType(Enum):
    """Reference ``schema/metrics.rs:19-29``."""

    GAUGE = "gauge"
    COUNTER = "counter"
    HISTOGRAM = "histogram"
    SUMMARY = "summary"

    @property
    def primary_value_column(self) -> str:
        # Reference schema/metrics.rs:33-40: Counter → u64, rest → f64.
        return "value_u64" if self is MetricType.COUNTER else "value_f64"


class LabelCardinality(Enum):
    """Reference ``schema/metrics.rs:44-52`` — drives physical encoding there;
    here it is advisory (Parquet dict encoding is automatic)."""

    LOW = "low"  # ≤ 1_000 uniques
    MEDIUM = "medium"  # ≤ 100_000
    HIGH = "high"  # > 100_000 — deliberately unindexed

    @classmethod
    def for_unique_count(cls, n: int) -> "LabelCardinality":
        if n <= 1_000:
            return cls.LOW
        if n <= 100_000:
            return cls.MEDIUM
        return cls.HIGH


# Reference default label set, schema/metrics.rs:169-198.
DEFAULT_LABELS: dict[str, LabelCardinality] = {
    "host": LabelCardinality.MEDIUM,
    "service": LabelCardinality.LOW,
    "env": LabelCardinality.LOW,
    "region": LabelCardinality.LOW,
    "instance": LabelCardinality.MEDIUM,
    "pod": LabelCardinality.HIGH,
    "trace_id": LabelCardinality.HIGH,
}

CORE_FIELDS = [
    StructField("timestamp", TimestampType(), nullable=False),
    StructField("ts_ns", LongType(), nullable=False),
    StructField("metric_name", StringType(), nullable=False),
    StructField("value_f64", DoubleType(), nullable=True),
    StructField("value_i64", LongType(), nullable=True),
    StructField("value_u64", LongType(), nullable=True),
]

CORE_COLUMNS = [f.name for f in CORE_FIELDS]


def metrics_schema(labels: dict[str, LabelCardinality] | None = None) -> StructType:
    """Build the wide schema: core fields + one nullable string per label."""
    labels = DEFAULT_LABELS if labels is None else labels
    return StructType(
        CORE_FIELDS + [StructField(name, StringType(), True) for name in labels]
    )


def label_columns(schema: StructType) -> list[str]:
    """Every non-core column is a label (labels-as-columns model)."""
    core = set(CORE_COLUMNS) | {"date", "hour"}  # partition cols are not labels
    return [f.name for f in schema.fields if f.name not in core]


def value_expr() -> F.Column:
    """The canonical value read: COALESCE over the three typed value columns,
    cast to double — reference ``api/query/prometheus_api.rs:26-27``."""
    return F.coalesce(
        F.col("value_f64"),
        F.col("value_i64").cast("double"),
        F.col("value_u64").cast("double"),
    ).alias("value")


def series_id_expr(labels: list[str]) -> F.Column:
    """Stable 64-bit series identity: xxhash64 over metric_name + all label
    columns. At 1B-series cardinality, windows/joins partition on this single
    long instead of N string columns, bounding shuffle-key width (SURVEY §7
    "hard parts")."""
    return F.xxhash64(
        F.col("metric_name"),
        *[F.coalesce(F.col(c), F.lit("\x00")) for c in labels],
    ).alias("series_id")

"""Reusable column expressions — time bucketing and PromQL label matchers.

All expressions are built-in Catalyst functions (JVM-side, codegen-friendly);
no Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Tumbling-bucket start for ``ts``: floor(epoch/step)*step as timestamp.

    This is the reference's integer-floor bucketing
    ``time_bucket = (timestamp / step) * step`` (reference
    ``api/query/prometheus_api.rs:971-1001``) expressed on epoch seconds.
    Stays inside whole-stage codegen (no UDF), and is a deterministic
    function of the row → safe under AQE re-computation.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = c.cast("double")
    return F.timestamp_seconds(
        (F.floor(epoch / F.lit(step_seconds)) * F.lit(step_seconds)).cast("long")
    )


def time_bucket_ns(ts_ns: Column | str, step_ns: int) -> Column:
    """Nanosecond bucketing on a raw ``bigint`` ns column — exact integer
    semantics of the reference (``api/query/prometheus_api.rs:971``)."""
    c = F.col(ts_ns) if isinstance(ts_ns, str) else ts_ns
    # Pure int64 arithmetic: ns epochs exceed 2^53, so a float division
    # here would mis-bucket values near step boundaries. c - (c % step)
    # == (c div step) * step for the same truncate-toward-zero semantics
    # in Spark, DuckDB, and the reference's integer division.
    return c - (c % F.lit(step_ns))


def label_matcher(col: Column | str, op: str, value: str) -> Column:
    """PromQL label matcher → boolean column.

    Mirrors the reference's matcher→SQL translation
    (``api/query/prometheus_api.rs:705-741``):
    ``=`` equality, ``!=`` inequality, ``=~`` regex match, ``!~`` regex
    non-match. Regexes are anchored like PromQL (full-string match).
    """
    c = F.col(col) if isinstance(col, str) else col
    if op == "=":
        return c == F.lit(value)
    if op == "!=":
        return c != F.lit(value)
    anchored = f"^(?:{value})$"
    if op == "=~":
        return c.rlike(anchored)
    if op == "!~":
        return ~c.rlike(anchored) | c.isNull()
    raise ValueError(f"unknown matcher op: {op!r}")

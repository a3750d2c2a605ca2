"""Reusable column expressions — time bucketing and PromQL label matchers.

All expressions are built-in Catalyst functions (JVM-side, codegen-friendly);
no Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def final_order(df: DataFrame, *cols, fuse: bool = True) -> DataFrame:
    """Deterministic ordering of a FINAL, result-sized frame without a
    RangePartitioning exchange (OPTIMIZATION r15, guide §2.4: "an
    orderBy used only to make output deterministic" is an accidental
    shuffle — it costs a SAMPLING pass over the entire sort input plus a
    second shuffle of it, two extra AQE job waves per query). The rows
    and their global order are IDENTICAL to ``orderBy(*cols)``; they are
    just produced in one partition — the shape a result served to a
    client takes anyway, and the same single post-shuffle partition AQE
    already coalesces these grid-/cardinality-bounded results to.

    ``fuse=True``  → ``coalesce(1)``: the sort fuses into the final
    stage. Use when that stage is a bounded aggregate (its single task
    reads the shuffled partial-agg output — exactly what AQE's coalesced
    1-partition read does for result-sized data).

    ``fuse=False`` → ``repartition(1)``: keeps the upstream stage's
    parallelism (use above windows / per-row scoring stages whose work
    must stay distributed) at the cost of one tiny round-robin exchange
    of the RESULT rows only.

    NOT for corpus-sized outputs (per-document / per-row transforms
    whose row count scales with the input): those keep the distributed
    ``orderBy``.
    """
    one = df.coalesce(1) if fuse else df.repartition(1)
    return one.sortWithinPartitions(*cols)

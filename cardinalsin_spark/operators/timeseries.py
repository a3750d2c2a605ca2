"""Time-series operators over a metrics-shaped DataFrame.

These are the operators the reference actually implements on top of its SQL
engine: time-bucketed aggregation, PromQL-ish rate/increase/delta, latest
point, top-k, distinct labels/series, first-wins dedup (SURVEY §2.4/§2.6/
§2.10; reference ``api/query/prometheus_api.rs`` and ``query/dedup.rs``).

Every operator is pure DataFrame algebra — no ``collect()``, no Python UDFs —
so Catalyst handles pushdown/pruning and all aggregations get map-side
partial aggregation. Per-series operators key windows on the narrow
``series`` columns the caller passes (or a precomputed ``series_id``) to
bound shuffle-key width at high cardinality.

Scale notes (100 TB posture):
- ``bucket_agg``/``instant_agg`` are single-shuffle hash aggregations with
  map-side combine; skew on hot metric names is handled by AQE.
- ``latest_point_per_series`` / ``rate_faithful`` use window functions whose
  partition key is the series tuple — at 1B series the shuffle is wide but
  each partition is tiny; prefer ``series_id`` (xxhash64) as the key.
- ``dedup_first_wins`` is a windowed rank within (timestamp, metric_name) —
  equivalent row-count to a groupBy, deterministic unlike ``dropDuplicates``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cardinalsin_spark.functions.core import time_bucket

# Aggregations the reference's PromQL layer supports
# (api/query/prometheus_api.rs:756-779): sum/avg/count/min/max/stddev
# (stdvar/topk/bottomk parsed but degraded there; we do them correctly).
_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,
    "stdvar": F.var_samp,
}


@dataclass(frozen=True)
class MetricsCols:
    """Column bindings for a metrics-shaped DataFrame.

    Defaults match the canonical wide table; the driver's ``events`` table
    binds ``ts``/``event_type``/``value`` (FIXTURES.md F4).
    """

    ts: str = "timestamp"
    name: str = "metric_name"
    value: str = "value"
    labels: tuple[str, ...] = field(default=())

    @classmethod
    def events(cls) -> "MetricsCols":
        return cls(ts="ts", name="event_type", value="value", labels=("user_id",))


def _agg_expr(agg: str, value_col: str) -> Column:
    try:
        return _AGG_FNS[agg](F.col(value_col))
    except KeyError:
        raise ValueError(f"unsupported aggregation {agg!r}") from None


def bucket_agg(
    df: DataFrame,
    step_seconds: int,
    agg: str = "avg",
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    value_alias: str = "value",
) -> DataFrame:
    """PromQL range-query aggregation: ``agg(value)`` per
    ``(time_bucket, metric_name, *by)`` — reference
    ``api/query/prometheus_api.rs:1016-1087``.

    One shuffle, map-side partial agg. Output columns:
    ``bucket, <name>, *by, <value_alias>`` ordered by bucket then name.
    """
    by = by or []
    keys = [time_bucket(cols.ts, step_seconds).alias("bucket"), F.col(cols.name)] + [
        F.col(b) for b in by
    ]
    return (
        df.groupBy(*keys)
        .agg(_agg_expr(agg, cols.value).alias(value_alias))
        .orderBy("bucket", cols.name, *by)
    )


def instant_agg(
    df: DataFrame,
    agg: str = "avg",
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    value_alias: str = "value",
) -> DataFrame:
    """PromQL instant aggregation: one row per (metric_name, *by) with the
    aggregate over the whole (pre-filtered) range and ``MAX(timestamp)`` as
    the sample time, ordered by value desc — reference
    ``api/query/prometheus_api.rs:899-929``."""
    by = by or []
    return (
        df.groupBy(cols.name, *by)
        .agg(
            _agg_expr(agg, cols.value).alias(value_alias),
            F.max(cols.ts).alias("sample_time"),
        )
        .orderBy(F.desc(value_alias), cols.name, *by)
    )


def rate_bucketed(
    df: DataFrame,
    step_seconds: int,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Reference ``rate()``: per-bucket ``(MAX(v)-MIN(v)) / range_seconds``
    (``api/query/prometheus_api.rs:969-983``). Known approximation — no
    counter-reset handling; see :func:`rate_faithful` for the real thing."""
    by = by or []
    keys = [time_bucket(cols.ts, step_seconds).alias("bucket"), F.col(cols.name)] + [
        F.col(b) for b in by
    ]
    return (
        df.groupBy(*keys)
        .agg(
            (
                (F.max(cols.value) - F.min(cols.value)) / F.lit(float(step_seconds))
            ).alias("rate")
        )
        .orderBy("bucket", cols.name, *by)
    )


def increase_bucketed(
    df: DataFrame,
    step_seconds: int,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    alias: str = "increase",
) -> DataFrame:
    """Reference ``increase``/``delta``: per-bucket ``MAX(v)-MIN(v)``
    (``api/query/prometheus_api.rs:984-997``)."""
    by = by or []
    keys = [time_bucket(cols.ts, step_seconds).alias("bucket"), F.col(cols.name)] + [
        F.col(b) for b in by
    ]
    return (
        df.groupBy(*keys)
        .agg((F.max(cols.value) - F.min(cols.value)).alias(alias))
        .orderBy("bucket", cols.name, *by)
    )


def delta_bucketed(
    df: DataFrame,
    step_seconds: int,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    return increase_bucketed(df, step_seconds, by, cols, alias="delta")


def _reset_aware_deltas(
    df: DataFrame, series: list[str], cols: MetricsCols
) -> DataFrame:
    """Append ``_delta``: per-series sample-to-sample increase, counter-reset
    aware (a drop means reset → the post-reset value itself is the increase,
    per Prometheus semantics). One window shuffle keyed on the series tuple."""
    w = Window.partitionBy(cols.name, *series).orderBy(cols.ts)
    prev = F.lag(cols.value).over(w)
    step_delta = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col(cols.value) >= prev, F.col(cols.value) - prev).otherwise(
            F.col(cols.value)  # counter reset: increase = new value
        )
    )
    return df.withColumn("_delta", step_delta)


def rate_faithful(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Counter-reset-aware per-bucket rate — the semantics the reference
    *ducked* (SURVEY §7 "hard parts").

    Per series (metric_name + series cols), order by time, take positive
    sample-to-sample deltas, then sum per bucket and divide by the bucket
    width.

    Plan shape: one window shuffle partitioned by series, then one hash agg —
    series-keyed, so partitions stay small at high cardinality.
    """
    series = series or []
    with_delta = _reset_aware_deltas(df, series, cols)
    keys = [time_bucket(cols.ts, step_seconds).alias("bucket"), F.col(cols.name)] + [
        F.col(s) for s in series
    ]
    return (
        with_delta.groupBy(*keys)
        .agg((F.sum("_delta") / F.lit(float(step_seconds))).alias("rate"))
        .orderBy("bucket", cols.name, *series)
    )


def increase_faithful(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Counter-reset-aware per-bucket increase: the sum of per-series
    reset-aware deltas, without the rate division — PromQL ``increase``
    semantics where the reference degrades to MAX−MIN
    (``api/query/prometheus_api.rs:984-997``). Same plan shape as
    :func:`rate_faithful` (one series-keyed window + one hash agg)."""
    series = series or []
    with_delta = _reset_aware_deltas(df, series, cols)
    keys = [time_bucket(cols.ts, step_seconds).alias("bucket"), F.col(cols.name)] + [
        F.col(s) for s in series
    ]
    return (
        with_delta.groupBy(*keys)
        .agg(F.sum("_delta").alias("increase"))
        .orderBy("bucket", cols.name, *series)
    )


def irate_faithful(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL-faithful ``irate``: per (bucket, series), the rate between the
    LAST TWO samples — reset-aware — instead of the reference's AVG fallback
    (``api/query/prometheus_api.rs:998-1012``).

    Numerics: delta is computed on the raw value column (pass integer units
    for exactness). Besides the float ``irate``, the output carries the exact
    integer pair ``delta``/``dt_ns`` so callers that need bit-identical
    cross-engine results (the oracle harness) can do the division on an
    integer grid instead of trusting float rounding — a plain
    ``round(delta*1e9/dt, 6)`` can land on a half-ulp boundary where two
    engines' ``round`` disagree. Buckets with <2 samples produce no row
    (PromQL returns nothing there too). Plan: one window shuffle keyed
    (bucket, series), then a filter — no aggregation needed.
    """
    series = series or []
    bucket = time_bucket(cols.ts, step_seconds).alias("bucket")
    # Integer value columns keep the exact-int delta contract (delta: long);
    # float value columns keep their fractional delta (delta: double) —
    # an unconditional cast("long") would silently truncate gauge deltas.
    _int_types = {"bigint", "int", "smallint", "tinyint"}
    value_is_integral = dict(df.dtypes).get(cols.value) in _int_types
    base = df.select(
        bucket,
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_ts_ns"),
        F.col(cols.value).alias("_v"),
    )
    w = Window.partitionBy("bucket", cols.name, *series).orderBy("_ts_ns")
    prev_v = F.lag("_v").over(w)
    prev_ts = F.lag("_ts_ns").over(w)
    wdesc = Window.partitionBy("bucket", cols.name, *series).orderBy(
        F.desc("_ts_ns")
    )
    # delta MUST read the materialized _prev_v column: a lag expression
    # placed after the rn==1 filter would window over the filtered rows
    delta = F.when(
        F.col("_v") >= F.col("_prev_v"), F.col("_v") - F.col("_prev_v")
    ).otherwise(F.col("_v"))  # counter reset
    return (
        base.withColumn("_prev_v", prev_v)
        .withColumn("_prev_ts", prev_ts)
        .withColumn("_rn", F.row_number().over(wdesc))
        .filter((F.col("_rn") == 1) & F.col("_prev_v").isNotNull())
        .withColumn("delta", delta.cast("long") if value_is_integral else delta)
        .withColumn("dt_ns", F.col("_ts_ns") - F.col("_prev_ts"))
        .withColumn(
            "irate",
            (F.col("delta") * F.lit(1_000_000_000)).cast("double")
            / F.col("dt_ns").cast("double"),
        )
        .select("bucket", cols.name, *series, "delta", "dt_ns", "irate")
        .orderBy("bucket", cols.name, *series)
    )


def deriv_bucketed(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL-faithful ``deriv``: per-bucket least-squares slope (per
    second) of value over time — the reference falls back to AVG
    (``api/query/prometheus_api.rs:998-1012``).

    Exact-integer formulation: x = ms offset inside the bucket (int), y =
    the raw value column (pass integer units); slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) with the sums and num/den on DECIMAL(38,0) — int64
    would wrap silently once n·Σxy passes 2⁶³ (a few thousand samples per
    series at |y| = 10⁶ cents) while the DuckDB oracle promotes to
    HUGEINT; DECIMAL(38,0) is exact to ~10³⁸, far past any real bucket.
    One float division at the end, ×1000 to convert per-ms → per-second.
    Bit-deterministic across engines.
    """
    series = series or []
    step_ns = step_seconds * 10**9
    # x = ms offset within the bucket; explicit floor so the SQL oracle's
    # float-division path lands on the identical integer
    x_ms = F.floor((F.col(ts_ns_col) % F.lit(step_ns)) / F.lit(1_000_000.0)).cast(
        "long"
    )
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        F.col(cols.name),
        *[F.col(s) for s in series],
        x_ms.alias("_x"),
        F.col(cols.value).cast("long").alias("_y"),
    )
    dec = "decimal(38,0)"
    agg = base.groupBy("bucket", cols.name, *series).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast(dec)).alias("_sx"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
        F.sum((F.col("_x") * F.col("_y")).cast(dec)).alias("_sxy"),
        F.sum((F.col("_x") * F.col("_x")).cast(dec)).alias("_sx2"),
    )
    num = F.col("_n").cast(dec) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n").cast(dec) * F.col("_sx2") - F.col("_sx") * F.col("_sx")
    return (
        agg.filter((F.col("_n") >= 2) & (den > 0))
        .withColumn(
            "deriv", num.cast("double") * F.lit(1000.0) / den.cast("double")
        )
        .select("bucket", cols.name, *series, "deriv")
        .orderBy("bucket", cols.name, *series)
    )


def latest_point(df: DataFrame, cols: MetricsCols = MetricsCols()) -> DataFrame:
    """Instant-query latest sample: ``ORDER BY timestamp DESC LIMIT 1``
    (reference ``api/query/prometheus_api.rs:931-935``)."""
    return df.orderBy(F.desc(cols.ts)).limit(1)


def latest_point_per_series(
    df: DataFrame,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest sample per series via row_number window — the per-series variant
    the reference lacks. ``tiebreak`` columns (desc) make equal-timestamp
    rows deterministic; pass a unique id column when available."""
    series = series or []
    order = [F.desc(cols.ts)] + [F.desc(t) for t in (tiebreak or [cols.value])]
    w = Window.partitionBy(cols.name, *series).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(cols.name, *series)
    )


def topk(
    df: DataFrame,
    k: int,
    agg: str = "avg",
    by: list[str] | None = None,
    bottom: bool = False,
    cols: MetricsCols = MetricsCols(),
    value_alias: str = "value",
) -> DataFrame:
    """PromQL ``topk``/``bottomk`` done *correctly* (the reference parses but
    degrades them to un-limited aggregation, ``api/query/prometheus_api.rs:757,
    899-929``): aggregate per (metric_name, *by), order, LIMIT k.

    limit-after-sort compiles to TakeOrderedAndProject — each partition keeps
    only k rows before the single-stage gather, no full sort at scale.
    """
    by = by or []
    aggregated = df.groupBy(cols.name, *by).agg(
        _agg_expr(agg, cols.value).alias(value_alias)
    )
    order = (
        [F.asc(value_alias)] if bottom else [F.desc(value_alias)]
    ) + [F.asc(cols.name)] + [F.asc(b) for b in by]
    return aggregated.orderBy(*order).limit(k)


def distinct_label_values(
    df: DataFrame, label: str, with_filter: Column | None = None
) -> DataFrame:
    """``SELECT DISTINCT label`` (+ optional matchers/time filter), sorted —
    reference ``api/query/prometheus_api.rs:360-405``. Partial-distinct runs
    map-side, so the shuffle carries only unique values."""
    if with_filter is not None:
        df = df.filter(with_filter)
    return df.select(label).filter(F.col(label).isNotNull()).distinct().orderBy(label)


def distinct_series(
    df: DataFrame,
    series_cols: list[str],
    with_filter: Column | None = None,
) -> DataFrame:
    """``SELECT DISTINCT <label cols>`` — reference
    ``api/query/prometheus_api.rs:428-535``."""
    if with_filter is not None:
        df = df.filter(with_filter)
    return df.select(*series_cols).distinct().orderBy(*series_cols)


def dedup_first_wins(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """Row-level dedup on ``keys``, keeping the first row per key in
    ``order_by`` order — reference dual-write dedup keeps the first
    occurrence per ``(timestamp, metric_name)`` (``query/dedup.rs:22-113``).

    The reference's "first" is arrival order (single-stream); distributed
    execution has no arrival order, so determinism requires an explicit
    ``order_by`` tiebreaker. Implemented as a row_number window (one shuffle
    on the dedup keys; at 100 TB dedup runs within time-bucketed partitions
    so keys are already co-located after the scan).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
    tolerance_s: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: attach to every left row the latest right row with
    ``right.ts <= left.ts`` per join key (the canonical time-series
    point-in-time join; DuckDB/Pandas call it ASOF JOIN — the reference's
    engine has no native equivalent, its PromQL layer sidesteps the need).

    Distributed via the union + last-observation window trick, NOT a range
    join: tag both sides, union, and run ``last(value, ignorenulls=True)``
    over (key, ts, side) with right rows sorting before left rows at equal
    timestamps (at-or-before semantics). ONE shuffle on the join key and a
    linear scan per partition — no |left|x|right| candidate blowup, no
    broadcast requirement, so it survives both sides being 100 TB facts.
    Skewed keys are handled by AQE like any other window shuffle.

    ``right`` must be pre-projected to ``on + [ts_col] + right_value_cols``
    with names that don't collide with left columns. Ties inside the right
    side on (key, ts) are resolved by the LAST value column ordering — pass
    pre-deduped right frames for full determinism (same caveat as DuckDB's
    ASOF JOIN). ``tolerance_s`` drops matches older than the window;
    ``how="left"`` keeps unmatched left rows with nulls.
    """
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in set(on) | {ts_col}
        ]
    fill_cols = [right_ts_alias, *right_value_cols]
    r = (
        right.select(*on, ts_col, *right_value_cols)
        .withColumn(right_ts_alias, F.col(ts_col))
        .withColumn("_asof_side", F.lit(0))
    )
    l = left.withColumn("_asof_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in fill_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("_asof_side") == 1).drop("_asof_side")
    if tolerance_s is not None:
        in_tol = (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(right_ts_alias))
        ) <= int(tolerance_s * 1_000_000)
        keep = F.when(in_tol, True).otherwise(False)
        if how == "inner":
            out = out.filter(keep)
        else:
            out = out.select(
                *[
                    F.when(keep, F.col(c)).alias(c) if c in fill_cols else c
                    for c in out.columns
                ]
            )
    if how == "inner":
        out = out.filter(F.col(right_ts_alias).isNotNull())
    return out


def gapfill_locf(
    df: DataFrame,
    step_seconds: int,
    start: str,
    end: str,
    agg: str = "avg",
    cols: MetricsCols = MetricsCols(),
    value_alias: str = "value",
) -> DataFrame:
    """Gap-filled bucketed aggregation with last-observation-carried-forward
    (TimescaleDB's ``time_bucket_gapfill`` + ``locf``; PromQL's range
    evaluation implies the same staleness-fill the reference approximates
    by AVG buckets, ``api/query/prometheus_api.rs:969-1012``).

    Shape: (1) one hash-agg shuffle for the bucket aggregation, (2) the
    dense (series x bucket) grid built with ``sequence`` + ``explode`` ON
    EXECUTORS from the distinct-series frame (never a driver-side loop —
    at 1B series the grid is a thin column-wise blowup of the series list,
    partitioned by series), (3) a left join of grid to aggregates
    co-partitioned on (series, bucket), (4) a LOCF window per series.
    Buckets before a series' first observation stay NULL (same as
    TimescaleDB locf without a lookback prefix).

    ``start``/``end`` are 'YYYY-MM-DD HH:MM:SS' UTC strings; the grid is
    [start, end) on the ``step_seconds`` grid.
    """
    series = [cols.name]
    bucket = time_bucket(cols.ts, step_seconds).alias("bucket")
    in_range = (F.col(cols.ts) >= F.lit(start).cast("timestamp")) & (
        F.col(cols.ts) < F.lit(end).cast("timestamp")
    )
    agged = (
        df.filter(in_range)
        .groupBy(bucket, *series)
        .agg(_agg_expr(agg, cols.value).alias("_agg_v"))
    )
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    grid = (
        agged.select(*series)
        .distinct()
        .select(
            *series,
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp") - step,
                    step,
                )
            ).alias("bucket"),
        )
    )
    joined = grid.join(agged, on=["bucket", *series], how="left")
    w = (
        Window.partitionBy(*series)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("filled", F.col("_agg_v").isNull())
        .withColumn(value_alias, F.last("_agg_v", ignorenulls=True).over(w))
        .drop("_agg_v")
        .select("bucket", *series, value_alias, "filled")
    )


def resets_changes_bucketed(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL ``resets()`` and ``changes()`` per bucket, summed over
    ``by`` groups — `sum by (<by>) (resets(m[step]))`. The reference parses
    both but degrades them to AVG (``api/query/prometheus_api.rs:998-1012``).

    resets = count of samples strictly below their predecessor (counter
    reset); changes = count of value changes. Exact integer outputs. One
    window shuffle keyed (bucket, series) + one partial-aggregated groupBy.
    Ties on ts_ns break on the value column so both engines see the same
    neighbor order.
    """
    series = series or []
    by = by or [cols.name]
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_tns"),
        F.col(cols.value).alias("_v"),
    )
    w = Window.partitionBy("bucket", cols.name, *series).orderBy("_tns", "_v")
    prev = F.lag("_v").over(w)
    flagged = base.withColumn(
        "_reset", F.when(F.col("_v") < prev, 1).otherwise(0)
    ).withColumn("_change", F.when(F.col("_v") != prev, 1).otherwise(0))
    return (
        flagged.groupBy("bucket", *by)
        .agg(
            F.sum("_reset").alias("resets"),
            F.sum("_change").alias("changes"),
        )
        .orderBy("bucket", *by)
    )


def predict_linear_bucketed(
    df: DataFrame,
    step_seconds: int,
    predict_ahead_s: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL ``predict_linear(m[step], t)``: least-squares extrapolation to
    ``predict_ahead_s`` past each bucket's end (the reference AVG-falls-back,
    ``api/query/prometheus_api.rs:998-1012``).

    The whole chain — the Σx/Σy/Σxy/Σx² sums AND num/den — runs on
    DECIMAL(38,0): with x up to 3.6·10⁶ ms and cent values, ``n·Σxy``
    passes 2⁶³ at a few thousand samples per (bucket, series), where int64
    wraps silently while the DuckDB oracle promotes to HUGEINT (the r3
    ADVICE divergence; the old code only cast the later product). The
    prediction ``ŷ = (Σy·den + num·(n·x_eval − Σx)) / (n·den)`` is floored
    to a 10⁻⁶ grid before ONE float division, so both engines produce the
    identical long — the same discipline as the faithful irate. Output
    column ``predicted`` is in the raw value units.
    """
    series = series or []
    step_ns = step_seconds * 10**9
    x_eval_ms = (step_seconds + predict_ahead_s) * 1000
    x_ms = F.floor((F.col(ts_ns_col) % F.lit(step_ns)) / F.lit(1_000_000.0)).cast(
        "long"
    )
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        F.col(cols.name),
        *[F.col(s) for s in series],
        x_ms.alias("_x"),
        F.col(cols.value).cast("long").alias("_y"),
    )
    dec = "decimal(38,0)"
    agg = base.groupBy("bucket", cols.name, *series).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast(dec)).alias("_sx"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
        # per-row products fit int64 easily (x ≤ 3.6e6 ms, y = cents);
        # the SUMS are what pass 2^63 — cast before summing
        F.sum((F.col("_x") * F.col("_y")).cast(dec)).alias("_sxy"),
        F.sum((F.col("_x") * F.col("_x")).cast(dec)).alias("_sx2"),
    )
    num = F.col("_n").cast(dec) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n").cast(dec) * F.col("_sx2") - F.col("_sx") * F.col("_sx")
    micro = F.expr(
        "(CAST(_sy AS DECIMAL(38,0)) * _den"
        f" + CAST(_num AS DECIMAL(38,0)) * (CAST(_n AS DECIMAL(38,0)) * {x_eval_ms} - _sx))"
        " * 1000000 div (CAST(_n AS DECIMAL(38,0)) * _den)"
    )
    return (
        agg.filter((F.col("_n") >= 2) & (den > 0))
        .withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn("predicted", micro.cast("double") / F.lit(1_000_000.0))
        .select("bucket", cols.name, *series, "predicted")
        .orderBy("bucket", cols.name, *series)
    )


def stddev_bucketed_exact(
    df: DataFrame,
    step_seconds: int,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """PromQL ``stddev``/``stdvar`` aggregation per bucket with exact-int
    internals: D = n·Σx² − (Σx)² on int64, stdvar_pop = D/n², stddev =
    sqrt(D)/n. sqrt and the two divisions are IEEE-deterministic on exact
    inputs, so results hash-match across engines with no rounding step.
    Values must be integer units (cents)."""
    by = by or [cols.name]
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        *[F.col(b) for b in by],
        F.col(cols.value).cast("long").alias("_y"),
    )
    agg = base.groupBy("bucket", *by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sy2"),
    )
    d = F.col("_n") * F.col("_sy2") - F.col("_sy") * F.col("_sy")
    return (
        agg.withColumn("_d", d)
        .withColumn(
            "stddev", F.sqrt(F.col("_d").cast("double")) / F.col("_n").cast("double")
        )
        .withColumn(
            "stdvar",
            F.col("_d").cast("double")
            / (F.col("_n").cast("double") * F.col("_n").cast("double")),
        )
        .select("bucket", *by, "stddev", "stdvar")
        .orderBy("bucket", *by)
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_cols: list[str],
    cols: MetricsCols = MetricsCols(),
    order_tiebreak: list[str] | None = None,
    sort: bool = True,
) -> DataFrame:
    """Gap-based sessionization: per key, a new session starts when the gap
    to the previous event exceeds ``gap_seconds`` (the batch analogue of
    Structured Streaming's session windows, ``streaming/live.py``
    session-window path; classic event-analytics operator the reference
    lacks).

    Two windows over ONE shuffle on the key: lag to flag session starts,
    running sum to number them; then a partial-aggregated groupBy for the
    per-session stats. Gap arithmetic is exact integer µs. ``order_tiebreak``
    columns make the ordering total when timestamps can tie.
    """
    tiebreak = order_tiebreak or []
    w = Window.partitionBy(*key_cols).orderBy(cols.ts, *tiebreak)
    us = F.unix_micros(F.col(cols.ts))
    gap_us = gap_seconds * 1_000_000
    new_sess = F.when(
        us - F.lag(us).over(w) > F.lit(gap_us), 1
    ).otherwise(0)
    numbered = df.withColumn("_new", new_sess).withColumn(
        "session_idx",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    out = (
        numbered.groupBy(*key_cols, "session_idx")
        .agg(
            F.min(cols.ts).alias("session_start"),
            F.max(cols.ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                f"(unix_micros(max({cols.ts})) - unix_micros(min({cols.ts})))"
                " div 1000000"
            ).alias("duration_s"),
        )
    )
    # ``sort=False`` for mid-pipeline consumers (joins/aggregations over
    # the sessions): Catalyst does NOT eliminate a sort below a join, so
    # the default ordering would be a wasted full range shuffle of every
    # session row (OPTIMIZATION r15, guide §2.4)
    return out.orderBy(*key_cols, "session_idx") if sort else out


def idelta_faithful(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL ``idelta``: the SIGNED difference of the last two samples per
    (bucket, series) — a gauge function, so unlike irate there is no
    counter-reset clamp (reference AVG-falls-back,
    ``api/query/prometheus_api.rs:998-1012``). Exact integer output for
    integer value columns. Same single-window plan as irate_faithful."""
    series = series or []
    bucket = time_bucket(cols.ts, step_seconds).alias("bucket")
    base = df.select(
        bucket,
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_ts_ns"),
        F.col(cols.value).alias("_v"),
    )
    w = Window.partitionBy("bucket", cols.name, *series).orderBy("_ts_ns")
    wdesc = Window.partitionBy("bucket", cols.name, *series).orderBy(
        F.desc("_ts_ns")
    )
    return (
        base.withColumn("_prev_v", F.lag("_v").over(w))
        .withColumn("_rn", F.row_number().over(wdesc))
        .filter((F.col("_rn") == 1) & F.col("_prev_v").isNotNull())
        .select(
            "bucket",
            cols.name,
            *series,
            (F.col("_v") - F.col("_prev_v")).alias("idelta"),
        )
        .orderBy("bucket", cols.name, *series)
    )


def approx_distinct_series(
    df: DataFrame,
    series_cols: list[str],
    rsd: float = 0.05,
    by: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog++ series-cardinality estimate (`approx_count_distinct`),
    optionally grouped — the sketch path for cardinality dashboards at
    100 TB, where the exact ``distinct_series`` shuffle carries every
    unique series tuple and this carries a fixed-size sketch per group.
    Max ~rsd relative error; pair with the exact operator when the answer
    feeds a decision rather than a chart."""
    target = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in series_cols])
    agg = F.approx_count_distinct(target, rsd=rsd).alias("approx_series")
    if by:
        return df.groupBy(*by).agg(agg).orderBy(*by)
    return df.agg(agg)


def approx_percentile_bucketed(
    df: DataFrame,
    step_seconds: int,
    percentages: list[float],
    accuracy: int = 10_000,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Bucketed approximate percentiles via Spark's mergeable quantile
    sketch (``approx_percentile``) — the map-side-combinable alternative to
    exact ``percentile`` whose per-group state is O(accuracy), not O(rows).
    At 100 TB exact percentile materializes every value per group through
    the shuffle; the sketch keeps the same plan shape with bounded state.
    Error ≤ 1/accuracy of rank."""
    by = by or [cols.name]
    return (
        df.groupBy(time_bucket(cols.ts, step_seconds).alias("bucket"), *by)
        .agg(
            F.percentile_approx(
                cols.value, F.array(*[F.lit(p) for p in percentages]),
                F.lit(accuracy),
            ).alias("approx_pcts")
        )
        .orderBy("bucket", *by)
    )


def zscore_outliers(
    df: DataFrame,
    step_seconds: int,
    z: int = 3,
    by: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Per-bucket z-score anomaly detection with an EXACT integer decision
    rule: a sample is an outlier iff ``(v·n − Σv)² > z²·(n·Σv² − (Σv)²)``
    — algebraically ``|v − mean| > z·stddev_pop`` with no float compare, so
    the flagged set is bit-identical across engines. The reported
    ``zscore`` is one float division of exact ints by one sqrt
    (IEEE-deterministic). Values must be integer units (cents).

    Plan: partition-wide window aggregates on (bucket, group) — ONE
    shuffle, no join of the stats back; then a filter. The decision chain
    (znum², z²·d) runs on DECIMAL(38,0): int64 would wrap silently once
    |v·n| passes ~3·10⁹ (n ≈ 3000 at |v| = 10⁶) while the DuckDB oracle
    promotes to HUGEINT — the r3 ADVICE divergence. DECIMAL(38,0) is
    exact to |v|·n ≤ 10¹⁹ (znum² ≤ 10³⁸), far past any real group.
    """
    by = by or [cols.name]
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        *[F.col(b) for b in by],
        F.col(cols.ts).alias("_ts"),
        F.col(cols.value).cast("long").alias("_v"),
    )
    # window sums stay int64 (the hot per-row path; exact while Σv² < 2^63
    # — n ≤ 10⁶ samples per group at |v| ≤ 10⁶, documented bound); only the
    # DECISION products are decimal — they're what overflowed in r3
    dec = "decimal(38,0)"
    w = Window.partitionBy("bucket", *by)
    st = (
        base.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_sy", F.sum("_v").over(w))
        .withColumn("_sy2", F.sum(F.col("_v") * F.col("_v")).over(w))
    )
    znum = F.col("_v").cast(dec) * F.col("_n") - F.col("_sy").cast(dec)
    d = F.col("_n").cast(dec) * F.col("_sy2").cast(dec) - F.col(
        "_sy"
    ).cast(dec) * F.col("_sy").cast(dec)
    return (
        st.filter((F.col("_n") >= 2) & (d > 0) & (znum * znum > F.lit(z * z) * d))
        .select(
            "bucket",
            *by,
            F.col("_ts").alias(cols.ts),
            F.col("_v").alias("value_int"),
            (znum.cast("double") / F.sqrt(d.cast("double"))).alias("zscore"),
        )
        .orderBy("bucket", *by, cols.ts, "value_int")
    )


def holt_winters_bucketed(
    df: DataFrame,
    step_seconds: int,
    sf: float = 0.3,
    tf: float = 0.3,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL ``holt_winters`` / ``double_exponential_smoothing`` per
    (bucket, series): the upstream algorithm (promql/functions.go
    funcHoltWinters) — level/trend smoothing over the window's ordered
    samples, returning the final smoothed value. ``sf`` = level factor,
    ``tf`` = trend factor. The reference AVG-degrades every unknown
    function (``api/query/prometheus_api.rs:998-1012``); this is the real
    recursion.

    The fold is inherently sequential PER SERIES but embarrassingly
    parallel ACROSS series: one groupBy collects each bucket's samples
    into an ordered array (bucket sample counts are bounded by
    step/scrape-interval — a few thousand elements, not corpus-scale),
    then a single ``aggregate()`` lambda folds (s0, s1, trend) exactly as
    upstream: step i=1 keeps the initial trend b₀ = v₂ − v₁
    (calcTrendValue(0)); later steps blend tf·(s1−s0) + (1−tf)·b. The
    identical float-op chain is spelled in the DuckDB oracle (list_reduce
    with the seed struct prepended, since its 2-arg form has no init), so
    results hash-match bit-for-bit. Buckets with <2 samples emit nothing
    (PromQL parity).
    """
    series = series or []
    sfr, one_sf = repr(float(sf)), repr(1.0 - float(sf))
    tfr, one_tf = repr(float(tf)), repr(1.0 - float(tf))
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_tns"),
        F.col(cols.value).cast("double").alias("_v"),
    )
    grouped = base.groupBy("bucket", cols.name, *series).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(_tns, _v))), x -> x._v)"
        ).alias("_vals")
    )
    trend = (
        f"IF(x.i = 1.0D, acc.tr,"
        f" ({tfr} * (acc.s1 - acc.s0)) + ({one_tf} * acc.tr))"
    )
    hw = F.expr(
        f"aggregate("
        f" transform(sequence(2, size(_vals)),"
        f"  i -> named_struct('v', element_at(_vals, i),"
        f"                    'i', CAST(i - 1 AS DOUBLE))),"
        f" named_struct('s0', CAST(0 AS DOUBLE),"
        f"              's1', element_at(_vals, 1),"
        f"              'tr', element_at(_vals, 2) - element_at(_vals, 1)),"
        f" (acc, x) -> named_struct("
        f"   's0', acc.s1,"
        f"   's1', ({sfr} * x.v) + ({one_sf} * (acc.s1 + {trend})),"
        f"   'tr', {trend}),"
        f" acc -> acc.s1)"
    )
    return (
        grouped.filter(F.size("_vals") >= 2)
        .select("bucket", cols.name, *series, hw.alias("hw"))
        .orderBy("bucket", cols.name, *series)
    )


def delta_faithful(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """PromQL ``delta`` for gauges: last sample − first sample per (bucket,
    series), signed, no counter-reset clamp (reference degrades to MAX−MIN,
    ``api/query/prometheus_api.rs:984-997``; documented deviation from
    upstream Prometheus: no extrapolation to the window bounds).

    Pure aggregation — ``max_by``/``min_by`` keyed on (ts, value) structs
    for a deterministic total order — so it map-side combines in ONE
    shuffle with no window at all (cheaper than the lag formulation at any
    scale). Buckets with <2 samples emit nothing (PromQL parity)."""
    series = series or []
    base = df.select(
        time_bucket(cols.ts, step_seconds).alias("bucket"),
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_tns"),
        F.col(cols.value).alias("_v"),
    )
    last = F.expr("max_by(_v, struct(_tns, _v))")
    first = F.expr("min_by(_v, struct(_tns, _v))")
    return (
        base.groupBy("bucket", cols.name, *series)
        .agg(
            (last - first).alias("delta"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .select("bucket", cols.name, *series, "delta")
        .orderBy("bucket", cols.name, *series)
    )


def topk_per_group(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    value_col: str = "value",
    tiebreak: list[str] | None = None,
    bottom: bool = False,
) -> DataFrame:
    """Top-k rows PER GROUP (PromQL's `topk by (...)` semantics — k series
    within each group, not a global limit; the reference degrades topk to
    a plain aggregation with no limit at all,
    ``api/query/prometheus_api.rs:757``).

    One window shuffle on the group key; Spark rewrites rank<=k into a
    group-limit pushed below the final sort, so each partition retains at
    most k rows before any global ordering. Deterministic under value ties
    via the ``tiebreak`` columns."""
    order = [
        F.asc(value_col) if bottom else F.desc(value_col),
        *[F.asc(t) for t in (tiebreak or [])],
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
        .orderBy(*group_cols, *order)
    )


def rate_extrapolated(
    df: DataFrame,
    step_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """UPSTREAM-faithful PromQL rate: the extrapolatedRate algorithm
    (prometheus/promql/functions.go) — reset-aware within-bucket delta sum,
    extrapolated to the bucket boundaries when samples sit close to them
    (within 1.1x the average sample spacing; half a spacing otherwise),
    with the counter zero-clamp (never extrapolate below the first
    sample's implied zero crossing). Strictly closer to upstream than
    :func:`rate_faithful`, which divides the raw delta sum by the bucket
    width; the reference degrades rate to (MAX−MIN)/range entirely
    (``api/query/prometheus_api.rs:969-983``).

    Numerics: every input is an exact int64 (ns timestamps, integer-unit
    values); the extrapolation factor is a fixed chain of float ops on
    those ints, so results are bit-deterministic across engines when the
    oracle spells the same chain. One window shuffle + one hash agg.
    """
    series = series or []
    bucket = time_bucket(cols.ts, step_seconds).alias("bucket")
    base = df.select(
        bucket,
        F.col(cols.name),
        *[F.col(s) for s in series],
        F.col(ts_ns_col).alias("_tns"),
        F.col(cols.value).alias("_v"),
    )
    w = Window.partitionBy("bucket", cols.name, *series).orderBy("_tns", "_v")
    prev = F.lag("_v").over(w)
    delta = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col("_v") >= prev, F.col("_v") - prev).otherwise(F.col("_v"))
    )
    agg = (
        base.withColumn("_delta", delta)
        .groupBy("bucket", cols.name, *series)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_delta").alias("_d"),
            F.min("_tns").alias("_tf"),
            F.max("_tns").alias("_tl"),
            F.expr("min_by(_v, _tns)").alias("_vf"),
        )
        .filter((F.col("_n") >= 2) & (F.col("_tl") > F.col("_tf")))
    )
    range_ns = step_seconds * 10**9
    bstart = F.unix_micros(F.col("bucket")) * F.lit(1_000)
    sampled = (F.col("_tl") - F.col("_tf")).cast("double")
    avg_dur = sampled / (F.col("_n") - F.lit(1)).cast("double")
    dur_start = (F.col("_tf") - bstart).cast("double")
    dur_end = (bstart + F.lit(range_ns) - F.col("_tl")).cast("double")
    threshold = avg_dur * F.lit(1.1)
    ext_start = F.when(dur_start < threshold, dur_start).otherwise(
        avg_dur / F.lit(2.0)
    )
    # counter zero-clamp: never extrapolate past the implied zero crossing.
    # Upstream gates on BOTH delta-sum > 0 AND first sample >= 0
    # (promql/functions.go extrapolatedRate: samples[0].F >= 0) — a
    # negative first sample would otherwise produce a negative
    # durationToZero that shrinks or negates the extrapolation window.
    dur_to_zero = F.when(
        (F.col("_d") > 0) & (F.col("_vf") >= 0),
        sampled * (F.col("_vf").cast("double") / F.col("_d").cast("double")),
    )
    ext_start = F.when(
        dur_to_zero.isNotNull() & (dur_to_zero < ext_start), dur_to_zero
    ).otherwise(ext_start)
    ext_end = F.when(dur_end < threshold, dur_end).otherwise(
        avg_dur / F.lit(2.0)
    )
    factor = (sampled + ext_start + ext_end) / sampled
    rate = (
        F.col("_d").cast("double") * factor / F.lit(float(step_seconds))
    )
    return (
        agg.select(
            "bucket", cols.name, *series, rate.alias("rate")
        )
        .orderBy("bucket", cols.name, *series)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Binned range join on interval OVERLAP (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``).

    Spark plans a pure inequality join as BroadcastNestedLoopJoin —
    quadratic, the one join shape that cannot survive 100 TB. The classic
    fix: explode each interval over the time bins it touches, EQUI-join on
    the bin (hash join, shuffle bounded by bins touched), then apply the
    exact overlap predicate as a residual. A pair sharing k bins would
    surface k times; instead of a distinct shuffle, the pair is emitted
    only at its FIRST shared bin — ``bin == max(l_bin_lo, r_bin_lo)``, the
    same first-match rule as the SimHash band join. Bin width trades
    explode factor against bucket collision width; intervals are expected
    ≪ bin count apart (sessions, incidents, maintenance windows).
    """
    factor = bin_seconds * 1_000_000

    def _binned(df: DataFrame, s: str, e: str, lo: str) -> DataFrame:
        # integer `div`, never float `/`: a double quotient landing an ulp
        # under the exact bin index would truncate into the previous bin
        lo_bin = F.expr(f"unix_micros({s}) div {factor}")
        hi_bin = F.expr(f"unix_micros({e}) div {factor}")
        return df.withColumn(lo, lo_bin).withColumn(
            "_bin", F.explode(F.sequence(lo_bin, hi_bin))
        )

    lb = _binned(left, l_start, l_end, "_l_lo")
    rb = _binned(right, r_start, r_end, "_r_lo")
    return (
        lb.join(rb, "_bin")
        .filter(F.col("_bin") == F.greatest(F.col("_l_lo"), F.col("_r_lo")))
        .filter(
            (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
        )
        .drop("_bin", "_l_lo", "_r_lo")
    )


def time_weighted_avg(
    df: DataFrame,
    bucket_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Time-weighted average per (bucket, series) over irregular samples —
    LOCF integral semantics (TimescaleDB ``time_weight('LOCF')``): each
    sample's value holds until the next sample in the bucket, the last
    one until the bucket end; the average is the integral divided by the
    covered span (first sample → bucket end). Plain AVG over-weights
    burst samples; this is the correct resampling for irregular series.

    Exact arithmetic: weights are µs int64 deltas, the integral is
    Σ value_cents·Δµs (≲ 10⁵·3.6·10⁹ per hour bucket — far inside int64),
    ONE float division at the end. One lead-window + one aggregation on a
    shared (series, bucket) shuffle.
    """
    key = series if series is not None else [cols.name]
    us = F.unix_micros(F.col(cols.ts))
    bucket_us = bucket_seconds * 1_000_000
    b = F.expr(f"unix_micros({cols.ts}) div {bucket_us}")
    w = Window.partitionBy(*key, "_b").orderBy(cols.ts, cols.value)
    staged = (
        df.withColumn("_b", b)
        .withColumn("_us", us)
        .withColumn(
            "_next_us",
            F.coalesce(
                F.lead("_us").over(w), (F.col("_b") + 1) * F.lit(bucket_us)
            ),
        )
    )
    vc = F.col(cols.value)
    return (
        staged.groupBy(*key, "_b")
        .agg(
            F.sum(vc * (F.col("_next_us") - F.col("_us"))).alias("_integral"),
            F.min("_us").alias("_first_us"),
        )
        .select(
            *key,
            F.timestamp_micros(F.col("_b") * F.lit(bucket_us)).alias(
                "time_bucket"
            ),
            (
                F.col("_integral").cast("double")
                / ((F.col("_b") + 1) * F.lit(bucket_us) - F.col("_first_us"))
            ).alias("twa"),
        )
        .orderBy("time_bucket", *key)
    )


def lttb_downsample(
    df: DataFrame,
    bucket_seconds: int,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
) -> DataFrame:
    """Largest-Triangle downsampling, parallel-anchor variant: one
    representative point per (series, bucket) — the sample maximizing the
    triangle area against the NEIGHBOR BUCKET AVERAGES as anchors.

    Classic LTTB (Steinarsson 2013) anchors on the previous bucket's
    *selected* point, a sequential dependency that cannot fan out; the
    standard parallel variant anchors both sides on bucket averages —
    each bucket then selects independently (the same trade visualization
    servers make). Area = |Δx₁·Δy₂ − Δx₂·Δy₁| on integer µs × cents with
    the anchor means cleared of division (multiply through by the
    neighbor counts), so the argmax is exact int64 arithmetic — no float
    tie ambiguity; ties break on (ts, value) via max_by's struct compare.
    Two window passes + one aggregation on a single (series, bucket)
    shuffle plan.
    """
    key = series if series is not None else [cols.name]
    bucket_us = bucket_seconds * 1_000_000
    # x coordinates are BUCKET-RELATIVE µs (< bucket width): summing raw
    # epoch µs would pass 2^63 at ~5000 samples/bucket. Neighbor-bucket
    # sums are re-based onto the center bucket's origin with an exact
    # (Δbucket · width · count) shift when consumed.
    staged = (
        df.withColumn("_b", F.expr(f"unix_micros({cols.ts}) div {bucket_us}"))
        .withColumn(
            "_us",
            F.unix_micros(F.col(cols.ts)) - F.col("_b") * F.lit(bucket_us),
        )
        .withColumn("_vc", F.col(cols.value))
    )
    per_bucket = staged.groupBy(*key, "_b").agg(
        F.sum("_us").alias("_sx"),
        F.sum("_vc").alias("_sy"),
        F.count(F.lit(1)).alias("_n"),
        F.collect_list(F.struct("_us", "_vc")).alias("_pts"),
    )
    w = Window.partitionBy(*key).orderBy("_b")
    shift_p = (F.lag("_b").over(w) - F.col("_b")) * F.lit(bucket_us)
    shift_n = (F.lead("_b").over(w) - F.col("_b")) * F.lit(bucket_us)
    anch = (
        per_bucket.withColumn(
            "_psx", F.lag("_sx").over(w) + shift_p * F.lag("_n").over(w)
        )
        .withColumn("_psy", F.lag("_sy").over(w))
        .withColumn("_pn", F.lag("_n").over(w))
        .withColumn(
            "_nsx", F.lead("_sx").over(w) + shift_n * F.lead("_n").over(w)
        )
        .withColumn("_nsy", F.lead("_sy").over(w))
        .withColumn("_nn", F.lead("_n").over(w))
    )
    # boundary buckets anchor on themselves (degenerate → first/last kept
    # by the tiebreak)
    anch = (
        anch.withColumn("_pn", F.coalesce("_pn", "_n"))
        .withColumn("_psx", F.coalesce("_psx", "_sx"))
        .withColumn("_psy", F.coalesce("_psy", "_sy"))
        .withColumn("_nn", F.coalesce("_nn", "_n"))
        .withColumn("_nsx", F.coalesce("_nsx", "_sx"))
        .withColumn("_nsy", F.coalesce("_nsy", "_sy"))
    )
    # For point (x, y): area ∝ |(x·pn − psx)·(nsy·pn − psy·nn)
    #                          − (nsx·pn − psx·nn)·(y·pn − psy)| / (pn·nn)
    # — DECIMAL(38,0) for the cross products (µs·cents·counts exceeds
    # int64 once buckets hold thousands of samples).
    pick = F.expr(
        "max_by(struct(_us, _vc), struct("
        "  abs((CAST(x._us AS DECIMAL(38,0)) * _pn - _psx)"
        "        * (CAST(_nsy AS DECIMAL(38,0)) * _pn - CAST(_psy AS DECIMAL(38,0)) * _nn)"
        "      - (CAST(_nsx AS DECIMAL(38,0)) * _pn - CAST(_psx AS DECIMAL(38,0)) * _nn)"
        "        * (CAST(x._vc AS DECIMAL(38,0)) * _pn - _psy)),"
        "  x._us, x._vc))"
    )
    exploded = anch.select(
        *key, "_b", "_pn", "_psx", "_psy", "_nn", "_nsx", "_nsy",
        F.explode("_pts").alias("x"),
    ).selectExpr("*", "x._us AS _us", "x._vc AS _vc")
    return (
        exploded.groupBy(*key, "_b")
        .agg(pick.alias("_sel"))
        .select(
            *key,
            F.timestamp_micros(
                F.col("_b") * F.lit(bucket_us) + F.col("_sel._us")
            ).alias(cols.ts),
            F.col("_sel._vc").alias(cols.value),
        )
        .orderBy(cols.ts, *key)
    )


def cusum_alarm(
    df: DataFrame,
    k_units: int,
    h_units: int,
    bucket_seconds: int = 86_400,
    series: list[str] | None = None,
    cols: MetricsCols = MetricsCols(),
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One-sided CUSUM change-point statistic per series, reported per
    bucket: ``S_i = max(0, S_{i-1} + (v_i − k))``, alarm when S_i > h
    (Page 1954 — the classic drift detector).

    The recursion is eliminated with the reflection identity
    ``S_i = P_i − min(0, min_{j≤i} P_j)`` where P is the running prefix
    sum of (v − k): two stacked window functions on ONE series-keyed
    shuffle — no sequential fold, no O(n²) array accumulator, linear at
    any series length. All arithmetic is exact integer units; the
    output is per (series, bucket): max CUSUM, alarm sample count, and
    the bucket-final value.
    """
    key = series if series is not None else [cols.name]
    order = [F.col(cols.ts)] + [F.col(t) for t in (tiebreak or [])]
    w = Window.partitionBy(*key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col(cols.value) - F.lit(k_units)
    staged = (
        df.withColumn("_p", F.sum(d).over(run))
        .withColumn("_rmin", F.least(F.lit(0).cast("long"), F.min("_p").over(run)))
        .withColumn("_s", F.col("_p") - F.col("_rmin"))
    )
    return (
        staged.groupBy(
            *key, time_bucket(cols.ts, bucket_seconds).alias("time_bucket")
        )
        .agg(
            F.max("_s").alias("max_cusum"),
            F.sum((F.col("_s") > F.lit(h_units)).cast("long")).alias("n_alarm"),
            F.expr(f"max_by(_s, struct({cols.ts}"
                   + ("".join(f", {t}" for t in (tiebreak or [])))
                   + "))").alias("final_cusum"),
        )
        .orderBy("time_bucket", *key)
    )


def winsorize_stats(
    df: DataFrame,
    lo_pct: int = 5,
    hi_pct: int = 95,
    group_col: str = "event_type",
    value_col: str = "value_cents",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Rank-based winsorization per group: clamp values to the order
    statistics at ranks ``ceil(pct/100 · n)`` (percentile_disc semantics —
    exact existing values, no interpolation, so the bounds are
    engine-portable integers) and report the clipped-tail counts and the
    winsorized mean. The robust-mean preprocessing step a metrics pipeline
    runs before alerting on outlier-heavy gauges.

    Shape: ONE shuffle on the group key for the ranking window (ties made
    deterministic by the tiebreak column); the per-group bounds frame is
    group-count-sized and broadcast back; the final aggregate reuses the
    same key so AQE coalesces it onto the ranked exchange. All counters
    and the clamped sum are exact int64; the mean is a single final
    division.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(tiebreak_col))
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    bounds = ranked.groupBy(group_col).agg(
        F.max(
            F.when(
                F.col("_rn") <= F.expr(f"({lo_pct} * _n + 99) div 100"),
                F.col(value_col),
            )
        ).alias("lo_cents"),
        F.max(
            F.when(
                F.col("_rn") <= F.expr(f"({hi_pct} * _n + 99) div 100"),
                F.col(value_col),
            )
        ).alias("hi_cents"),
    )
    v = F.col(value_col)
    clamped = F.least(F.greatest(v, F.col("lo_cents")), F.col("hi_cents"))
    return (
        ranked.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo_cents").alias("lo_cents"),
            F.min("hi_cents").alias("hi_cents"),
            F.sum(clamped).alias("win_sum_cents"),
            F.sum((v < F.col("lo_cents")).cast("long")).alias("n_clipped_lo"),
            F.sum((v > F.col("hi_cents")).cast("long")).alias("n_clipped_hi"),
        )
        .withColumn(
            "win_mean",
            F.round(F.col("win_sum_cents") / F.col("n") / F.lit(100.0), 4),
        )
        .orderBy(group_col)
    )

"""Named query registry: each entry pairs a Spark DataFrame implementation
with an equivalent ANSI-SQL oracle (DuckDB dialect-compatible) over the same
parquet tables.

This is the correctness contract (driver: ``__spark_entry__.py``): the Spark
result and the oracle result must match on row count, schema, and
order-insensitive value hash. Conventions:

- Every computed column is aliased identically on both sides.
- Float results whose value depends on accumulation order (sum/avg/stddev/
  percentile) are rounded to a fixed number of decimals on BOTH sides;
  exact results (min/max/count, integer math) are left unrounded.
- Time bucketing uses epoch-floor math written identically in both engines
  (see ``functions.core.time_bucket``).

The ``events`` table plays the metrics role (FIXTURES.md F4):
ts → timestamp, event_type → metric_name, value → value, user_id → label.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cardinalsin_spark.functions.core import (
    final_order,
    label_matcher,
    time_bucket,
)


def _final_order_wide(df: DataFrame, *cols) -> DataFrame:
    """``final_order`` with ``fuse=False`` in ``DataFrame.transform``
    position: for results whose LAST stage is a join/window/union that
    must keep its parallelism — the single-partition collapse happens in
    a separate tiny round-robin exchange of the RESULT rows only."""
    return final_order(df, *cols, fuse=False)
from cardinalsin_spark.operators.timeseries import (
    MetricsCols,
    bucket_agg,
    dedup_first_wins,
    distinct_label_values,
    distinct_series,
    increase_bucketed,
    instant_agg,
    latest_point_per_series,
    rate_bucketed,
    rate_faithful,
    topk,
)

EV = MetricsCols.events()

# DuckDB-side epoch-floor bucket, identical semantics to functions.core.time_bucket.
def _sql_bucket(step: int, ts: str = "ts") -> str:
    return (
        f"TIMESTAMP '1970-01-01' + INTERVAL (CAST(floor(epoch({ts})/{step})*{step} "
        f"AS BIGINT)) SECOND"
    )


# --- exact-decimal aggregation -------------------------------------------------
# Float sums are accumulation-order-dependent; with clean-decimal data the true
# result often sits exactly on a rounding boundary (e.g. avg = 0.01275), so
# engine-order noise flips the rounded digit. Fix: quantize to integer units
# (cents) per row — deterministic in both engines — sum exactly as int64, then
# do one deterministic float division at the end. Both sides must spell the
# post-aggregation arithmetic identically (same op order → same bits).


def cents(col: F.Column, scale: int = 2) -> F.Column:
    return F.round(col * F.lit(10**scale)).cast("long")


def _sql_cents(expr: str, scale: int = 2) -> str:
    return f"CAST(round(({expr}) * {10**scale}) AS BIGINT)"


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Make an externally-provided SparkSession (the driver builds its own,
    without our session factory) able to run the registry: ns-timestamp
    parquet must read as int64, and all time semantics are UTC. Both are
    runtime-settable SQL confs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # µs-precision parquet timestamps must read as LTZ (UTC), not NTZ —
    # unix_micros() rejects NTZ and LTZ-under-UTC matches DuckDB's naive
    # timestamps exactly.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark


def _ns_epoch(ts_str: str) -> int:
    """'YYYY-MM-DD HH:MM:SS' (UTC) → epoch ns, exact integer arithmetic."""
    import calendar
    import datetime as dt

    d = dt.datetime.fromisoformat(ts_str)
    return calendar.timegm(d.timetuple()) * 10**9


def ns_range_filter(lo: str, hi: str) -> Column:
    """Time-range predicate on BOTH the integer ns column (``ts_ns``) and the
    µs timestamp (``ts``).

    Exactly one of the two is the stored parquet column (int64 for
    TIMESTAMP(NANOS) sources, native timestamp for TIMESTAMP(MICROS)
    sources) — the other is derived by ``normalize_event_time`` and a
    predicate on it cannot reach the scan. Emitting the conjunction
    guarantees the stored-column half pushes to parquet row-group stats
    whichever precision the source uses; the derived-column half is a cheap
    post-scan no-op. The two halves are equivalent for whole-second
    bounds."""
    lo_ns, hi_ns = _ns_epoch(lo), _ns_epoch(hi)
    return (
        (F.col("ts_ns") >= F.lit(lo_ns))
        & (F.col("ts_ns") < F.lit(hi_ns))
        & (F.col("ts") >= F.timestamp_micros(F.lit(lo_ns // 1000)))
        & (F.col("ts") < F.timestamp_micros(F.lit(-(-hi_ns // 1000))))
    )


# Lazy-frame cache for the three events fixture variants (OPTIMIZATION
# r14): rebuilding the normalize/cents/promql projections costs 18-37 ms
# of py4j/analysis per call and the bench makes ~150+ such calls. Same
# metadata-only doctrine and key discipline as tables._READ_CACHE (the
# frames are immutable lazy plans over the mtime-keyed cached read; no
# rows are ever cached).
_EVENTS_FRAME_CACHE: dict[tuple, DataFrame] = {}


def _events_variant(spark: SparkSession, sf_dir: str, variant: str,
                    build) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    try:
        key = (
            spark.sparkContext.applicationId,
            os.path.realpath(path),
            os.stat(path).st_mtime_ns,
            variant,
        )
    except OSError:
        return build()
    df = _EVENTS_FRAME_CACHE.get(key)
    if df is None:
        if len(_EVENTS_FRAME_CACHE) >= 64:
            _EVENTS_FRAME_CACHE.clear()
        df = build()
        _EVENTS_FRAME_CACHE[key] = df
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalsin_spark.sources.tables import (
        normalize_event_time,
        read_parquet_meta_cached,
    )

    ensure_session_conf(spark)
    return _events_variant(
        spark, sf_dir, "base",
        lambda: normalize_event_time(
            read_parquet_meta_cached(
                spark, os.path.join(sf_dir, "events.parquet")
            )
        ),
    )


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "lineitem")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cardinalsin_spark.sources.tables import read_parquet_meta_cached

    ensure_session_conf(spark)
    return read_parquet_meta_cached(
        spark, os.path.join(sf_dir, f"{name}.parquet")
    )


# ---------------------------------------------------------------------------
# Time-series operator queries (SURVEY §2.2/2.4/2.6/2.10) over `events`
# ---------------------------------------------------------------------------


def _events_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events_variant(
        spark, sf_dir, "cents",
        lambda: _events(spark, sf_dir).withColumn(
            "value_cents", cents(F.col("value"))
        ),
    )


EV_CENTS = MetricsCols(ts="ts", name="event_type", value="value_cents", labels=("user_id",))


def q_ts_bucket_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL range-aggregation shape: avg per 5-min bucket per metric."""
    df = bucket_agg(
        _events_cents(spark, sf_dir), 300, "avg", cols=EV_CENTS, value_alias="v"
    )
    return df.select(
        "bucket", "event_type", (F.col("v") / F.lit(100.0)).alias("value")
    ).transform(final_order, "bucket", "event_type")


SQL_TS_BUCKET_AVG = f"""
SELECT {_sql_bucket(300)} AS bucket, event_type,
       avg({_sql_cents('value')}) / 100.0 AS value
FROM events GROUP BY 1, 2
"""


def q_ts_instant_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL instant aggregation: sum by metric + MAX(ts) sample time."""
    df = instant_agg(
        _events_cents(spark, sf_dir), "sum", cols=EV_CENTS, value_alias="v"
    )
    return df.select(
        "event_type",
        F.round(F.col("v").cast("double") / F.lit(100.0), 2).alias("value"),
        "sample_time",
    ).transform(final_order, F.desc("value"), "event_type")


SQL_TS_INSTANT_SUM = f"""
SELECT event_type,
       round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value,
       max(ts) AS sample_time
FROM events GROUP BY 1
"""


def q_ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference rate(): (max-min)/range per 10-min bucket."""
    return rate_bucketed(_events(spark, sf_dir), 600, cols=EV).transform(
        final_order, "bucket", "event_type"
    )


SQL_TS_RATE = f"""
SELECT {_sql_bucket(600)} AS bucket, event_type,
       (max(value) - min(value)) / 600.0 AS rate
FROM events GROUP BY 1, 2
"""


def q_ts_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference increase(): max-min per 10-min bucket."""
    return increase_bucketed(
        _events(spark, sf_dir), 600, cols=EV
    ).transform(final_order, "bucket", "event_type")


SQL_TS_INCREASE = f"""
SELECT {_sql_bucket(600)} AS bucket, event_type,
       max(value) - min(value) AS increase
FROM events GROUP BY 1, 2
"""


def q_ts_rate_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware rate per 1h bucket (window lag + bucket agg),
    computed over exact integer cents so the bucket sums are
    accumulation-order independent."""
    df = rate_faithful(_events_cents(spark, sf_dir), 3600, cols=EV_CENTS)
    return df.select(
        "bucket",
        "event_type",
        F.round(F.col("rate") / F.lit(100.0), 6).alias("rate"),
    ).transform(final_order, "bucket", "event_type")


SQL_TS_RATE_FAITHFUL = f"""
WITH deltas AS (
  SELECT ts, event_type, {_sql_cents('value')} AS vc,
         lag({_sql_cents('value')}) OVER (PARTITION BY event_type ORDER BY ts) AS prev
  FROM events
)
SELECT {_sql_bucket(3600)} AS bucket, event_type,
       round(sum(CASE WHEN prev IS NULL THEN NULL
                      WHEN vc >= prev THEN vc - prev
                      ELSE vc END) / 3600.0 / 100.0, 6) AS rate
FROM deltas GROUP BY 1, 2
"""


def q_ts_irate_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-faithful irate: last-two-samples rate per 1h bucket, reset
    aware (the reference AVG-falls-back for irate).

    Cross-engine exactness has TWO requirements, both needed:

    1. **µs-grid divisor.** DuckDB's TIMESTAMP is µs-precision, so the
       oracle's ``epoch_ns(ts)`` deltas always sit on the µs grid; when the
       source parquet is TIMESTAMP(NANOS) the raw ``ts_ns`` deltas don't
       (…452714 vs …452000) and the quotients differ regardless of rounding
       — the actual round-1/2 hash mismatch. Fix: truncate the Spark-side
       ns column to the µs grid before the window (a no-op for µs-precision
       sources like the current driver data), mirroring
       ``normalize_event_time`` (``sources/tables.py``).
    2. **Integer-grid division.** units/sec to 6 decimals is
       ``floor(delta_cents * 10^13 / dt_ns) / 1e6`` on decimal(38)/HUGEINT,
       so both engines produce the identical long before the single float
       division (avoids half-ulp ``round`` disagreement).

    dt_ns stays >= 1 µs after truncation (samples closer than 1 µs would
    collapse to dt=0; the events fixture has >1 s spacing), so the
    delta_cents*10^13/dt_ns quotient stays far below int64 overflow —
    see ADVICE r2 on the decimal-div wraparound hazard."""
    from cardinalsin_spark.operators.timeseries import irate_faithful

    ev = _events_cents(spark, sf_dir).withColumn(
        "ts_ns_us", F.expr("ts_ns div 1000 * 1000")
    )
    df = irate_faithful(ev, 3600, cols=EV_CENTS, ts_ns_col="ts_ns_us")
    scaled = F.expr("CAST(delta AS DECIMAL(38,0)) * 10000000000000 div dt_ns")
    return df.select(
        "bucket",
        "event_type",
        (scaled / F.lit(1_000_000.0)).alias("irate"),
    ).transform(_final_order_wide, "bucket", "event_type")


SQL_TS_IRATE_FAITHFUL = f"""
WITH base AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type,
         epoch_ns(ts) AS tns, {_sql_cents('value')} AS vc
  FROM events
),
lagged AS (
  SELECT bucket, event_type, tns, vc,
         lag(vc) OVER (PARTITION BY bucket, event_type ORDER BY tns) AS pv,
         lag(tns) OVER (PARTITION BY bucket, event_type ORDER BY tns) AS pt,
         row_number() OVER (PARTITION BY bucket, event_type
                            ORDER BY tns DESC) AS rn
  FROM base
)
SELECT bucket, event_type,
       CAST(CAST(CASE WHEN vc >= pv THEN vc - pv ELSE vc END AS HUGEINT)
            * 10000000000000 // (tns - pt) AS BIGINT) / 1000000.0 AS irate
FROM lagged
WHERE rn = 1 AND pv IS NOT NULL
ORDER BY bucket, event_type
"""


def q_ts_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-faithful deriv: per-bucket least-squares slope per second,
    exact-int sums (the reference AVG-falls-back for deriv)."""
    from cardinalsin_spark.operators.timeseries import deriv_bucketed

    df = deriv_bucketed(_events_cents(spark, sf_dir), 3600, cols=EV_CENTS)
    return df.select(
        "bucket",
        "event_type",
        F.round(F.col("deriv") / F.lit(100.0), 6).alias("deriv"),
    ).transform(final_order, "bucket", "event_type")


SQL_TS_DERIV = f"""
WITH base AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type,
         CAST(floor((epoch_ns(ts) % {3600 * 10**9}) / 1000000.0) AS BIGINT) AS x,
         {_sql_cents('value')} AS y
  FROM events
),
agg AS (
  SELECT bucket, event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sx2
  FROM base GROUP BY 1, 2
)
SELECT bucket, event_type,
       round(CAST(n * sxy - sx * sy AS DOUBLE) * 1000.0
             / CAST(n * sx2 - sx * sx AS DOUBLE) / 100.0, 6) AS deriv
FROM agg
WHERE n >= 2 AND (n * sx2 - sx * sx) > 0
ORDER BY bucket, event_type
"""


def q_ts_latest_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest sample per metric, deterministic tie-break on event_id."""
    df = latest_point_per_series(
        _events(spark, sf_dir), cols=EV, tiebreak=["event_id"]
    )
    return df.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).transform(_final_order_wide, "event_type")


SQL_TS_LATEST_PER_SERIES = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_ts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(3, avg) done correctly (reference degrades topk: no LIMIT)."""
    df = topk(_events_cents(spark, sf_dir), 3, "avg", cols=EV_CENTS, value_alias="v")
    return df.select(
        "event_type", (F.col("v") / F.lit(100.0)).alias("value")
    )


SQL_TS_TOPK = f"""
SELECT event_type, avg({_sql_cents('value')}) / 100.0 AS value
FROM events GROUP BY 1
ORDER BY avg({_sql_cents('value')}) DESC, event_type LIMIT 3
"""


def q_ts_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL /label/<name>/values: DISTINCT label values."""
    return distinct_label_values(
        _events(spark, sf_dir), "event_type"
    ).transform(final_order, "event_type")


SQL_TS_DISTINCT_VALUES = """
SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL
"""


def q_ts_distinct_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL /series: DISTINCT series label tuples."""
    return distinct_series(
        _events(spark, sf_dir), ["event_type", "user_id"]
    ).transform(final_order, "event_type", "user_id")


SQL_TS_DISTINCT_SERIES = """
SELECT DISTINCT event_type, user_id FROM events
"""


def q_ts_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup on (ts, event_type), deterministic by event_id."""
    df = dedup_first_wins(_events(spark, sf_dir), ["ts", "event_type"], ["event_id"])
    return df.select("event_id", "ts", "user_id", "event_type", "value")


SQL_TS_DEDUP_FIRST = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY ts, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def q_ts_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range + label-matcher scan (Eq + regex + value predicate) — the
    reference's pruning hot path (SURVEY §2.2). Filters push to parquet."""
    df = _events(spark, sf_dir)
    return df.filter(
        ns_range_filter("2024-01-05 00:00:00", "2024-01-12 00:00:00")
        & label_matcher("event_type", "=~", "click|view")
        & (F.col("value") > 100.0)
    ).select("event_id", "ts", "user_id", "event_type", "value")


SQL_TS_FILTER_RANGE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <  TIMESTAMP '2024-01-12 00:00:00'
  AND regexp_matches(event_type, '^(?:click|view)$')
  AND value > 100.0
"""


# ---------------------------------------------------------------------------
# PromQL transpiler queries (SURVEY §2.2/§2.4 — reference
# api/query/prometheus_api.rs:744-1087)
# ---------------------------------------------------------------------------


def _events_promql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events mapped to the metrics shape for PromQL: label values are
    strings in PromQL, so user_id is cast; value_cents carries exact sums."""
    return _events_variant(
        spark, sf_dir, "promql",
        lambda: _events_cents(spark, sf_dir).withColumn(
            "user_id", F.col("user_id").cast("string")
        ),
    )


def q_promql_range_sum_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (purchase)` range query, 30-min steps."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (purchase)',
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,  # 2024-02-01
        step_s=1800,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_RANGE_SUM_BY = f"""
SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_rate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(click[10m])` range query: (max-min)/600 per bucket (exact —
    max/min are input values, no accumulation order)."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "rate(click[10m])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=600,
        cols=EV,
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_RATE_RANGE = f"""
SELECT {_sql_bucket(600)} AS time_bucket, event_type,
       (max(value) - min(value)) / 600.0 AS value
FROM events
WHERE event_type = 'click'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2
"""


def q_promql_instant_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (signup{user_id=~"1.*"})` instant query with an
    upper time bound — regex matcher + grouped aggregation."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (signup{user_id=~"1.*"})',
        time_s=1705276800.0,  # 2024-01-15
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_INSTANT_SUM = f"""
SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
       max(ts) AS sample_time,
       round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
FROM events
WHERE event_type = 'signup'
  AND regexp_matches(CAST(user_id AS VARCHAR), '^(?:1.*)$')
  AND ts <= TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1, 2
"""


def q_promql_at_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `@` modifier under oracle check: the same instant aggregation
    as promql_instant_sum, but the selector pins evaluation to
    2024-01-15 via `@` while the query's own eval time is two weeks
    later — identical results prove `@` overrides the eval time."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (signup{user_id=~"1.*"} @ 1705276800)',
        time_s=1706745600.0,  # 2024-01-29 — must NOT be the bound used
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_AT_PINNED = SQL_PROMQL_INSTANT_SUM


def q_promql_at_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`@ start()` sugar under oracle check: for an instant query the
    range bounds collapse to the evaluation time (PromQL spec), so
    `sum by (user_id) (signup{...} @ start())` at t must equal the plain
    instant sum at t — the same oracle as promql_instant_sum."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (signup{user_id=~"1.*"} @ start())',
        time_s=1705276800.0,  # 2024-01-15
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_AT_START = SQL_PROMQL_INSTANT_SUM


def q_promql_set_unless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL set algebra `a unless b`: per-user purchase totals for users
    WITHOUT a matching 1-prefixed signup series — a left-anti join on the
    shared label set (the reference has no binary ops at all; SURVEY
    §2.3/§2.7 superset, api/query/prometheus_api.rs:744-826)."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (purchase) unless sum by (user_id) '
        '(signup{user_id=~"1.*"})',
        time_s=1705276800.0,
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_SET_UNLESS = f"""
WITH p AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         max(ts) AS sample_time,
         round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
),
s AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_id FROM events
  WHERE event_type = 'signup'
    AND regexp_matches(CAST(user_id AS VARCHAR), '^(?:1.*)$')
    AND ts <= TIMESTAMP '2024-01-15 00:00:00'
)
SELECT p.* FROM p WHERE p.user_id NOT IN (SELECT user_id FROM s)
"""


def q_promql_set_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `a or b`: every purchase series plus error series for users
    with no purchase series — union + left-anti on the shared label set."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) or sum by (user_id) (error)",
        time_s=1705276800.0,
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        _final_order_wide, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_SET_OR = f"""
WITH p AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         max(ts) AS sample_time,
         round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
),
e AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         max(ts) AS sample_time,
         round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'error' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
)
SELECT * FROM p
UNION ALL
SELECT e.* FROM e WHERE e.user_id NOT IN (SELECT user_id FROM p)
"""


def q_promql_cmp_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-vector comparison `a > b` (PromQL filter semantics): per-user
    purchase totals kept only where they exceed the matched view total —
    an inner join on the label match group + predicate filter, lhs values
    and labels preserved."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) > sum by (user_id) (view)",
        time_s=1705276800.0,
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        _final_order_wide, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_CMP_VECTOR = f"""
WITH p AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         max(ts) AS sample_time,
         sum({_sql_cents('value')}) AS cents
  FROM events
  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
),
v AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         sum({_sql_cents('value')}) AS cents
  FROM events
  WHERE event_type = 'view' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1
)
SELECT p.event_type, p.user_id, p.sample_time,
       round(CAST(p.cents AS DOUBLE) / 100.0, 2) AS value
FROM p JOIN v ON p.user_id = v.user_id
WHERE p.cents > v.cents
"""


def q_promql_scalar_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`scalar(v)` under oracle check: each user's purchase share of the
    grand total — the scalar side is a 1-row subquery broadcast into a
    crossJoin fold (no key shuffle), per promql/functions.go funcScalar."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) / scalar(sum(purchase))",
        time_s=1705276800.0,
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        F.round(F.col("value").cast("double"), 6).alias("value"),
    ).transform(
        _final_order_wide, F.desc("value"), "event_type", "user_id"
    )


SQL_PROMQL_SCALAR_FOLD = f"""
WITH p AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         max(ts) AS sample_time,
         sum({_sql_cents('value')}) AS cents
  FROM events
  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum({_sql_cents('value')}) AS DOUBLE) AS t
  FROM events
  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
)
SELECT p.event_type, p.user_id, p.sample_time,
       round(CAST(p.cents AS DOUBLE) / tot.t, 6) AS value
FROM p CROSS JOIN tot
"""


def q_promql_range_at_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query with an `@ end()` pin: every grid step evaluates at the
    range end, so the result is the instant vector at end_s replicated
    across the 7-bucket grid (PromQL @-modifier semantics on range
    queries). The grid is broadcast; the instant vector stays
    distributed."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        'sum by (user_id) (signup{user_id=~"1.*"} @ end())',
        start_s=1704067200.0,  # 2024-01-01 00:00
        end_s=1704070800.0,  # 2024-01-01 01:00
        step_s=600,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_RANGE_AT_END = f"""
SELECT g.time_bucket, s.event_type, s.user_id, s.value
FROM (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-01 01:00:00',
                                INTERVAL 10 MINUTE)) AS time_bucket
) g
CROSS JOIN (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'signup'
    AND regexp_matches(CAST(user_id AS VARCHAR), '^(?:1.*)$')
    AND ts <= TIMESTAMP '2024-01-01 01:00:00'
  GROUP BY 1, 2
) s
ORDER BY 1, 2, 3
"""


def q_promql_range_fn_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`@` on a range-FUNCTION expression (VERDICT r7 item 4):
    `increase(purchase{user_id=~"1.*"}[86400s] @ pin)` in a range query
    evaluates the function ONCE over the pinned window [pin-1d, pin]
    (closed bounds, the bucket grid's convention) and replicates the
    per-user instant vector across the 7-step grid. The reference's
    transpiler has no `@` at all (api/query/prometheus_api.rs:744-826)."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        'increase(purchase{user_id=~"1.*"}[86400s] @ 1705276800)',
        start_s=1704067200.0,  # 2024-01-01 00:00
        end_s=1704070800.0,  # 2024-01-01 01:00
        step_s=600,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_RANGE_FN_AT = f"""
SELECT g.time_bucket, s.event_type, s.user_id, s.value
FROM (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-01 01:00:00',
                                INTERVAL 10 MINUTE)) AS time_bucket
) g
CROSS JOIN (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
         round(CAST(max({_sql_cents('value')}) - min({_sql_cents('value')})
               AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'purchase'
    AND regexp_matches(CAST(user_id AS VARCHAR), '^(?:1.*)$')
    AND ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 86400 SECOND
    AND ts <= TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1, 2
) s
ORDER BY 1, 2, 3
"""


def q_promql_range_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step `scalar()` in a RANGE query (VERDICT r7 item 5): each
    user's purchase share of that step's total —
    `sum by (user_id) (purchase) / scalar(sum(purchase))`. The scalar side
    is one row per grid step (broadcast, bounded by the step count) joined
    on time_bucket; smearing the instant scalar over the grid would be a
    wrong answer for moving totals."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) / scalar(sum(purchase))",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1704672000.0,  # 2024-01-08
        step_s=21600,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_RANGE_SCALAR = f"""
WITH p AS (
  SELECT {_sql_bucket(21600)} AS time_bucket, event_type,
         CAST(user_id AS VARCHAR) AS user_id,
         sum({_sql_cents('value')}) AS c
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-01-08 00:00:00'
  GROUP BY 1, 2, 3
),
t AS (
  SELECT time_bucket, CAST(sum(c) AS DOUBLE) AS tot FROM p GROUP BY 1
)
SELECT p.time_bucket, p.event_type, p.user_id,
       round(CAST(p.c AS DOUBLE) / t.tot, 6) AS value
FROM p JOIN t USING (time_bucket)
ORDER BY 1, 2, 3
"""


def q_promql_vector_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum(purchase) or vector(0)` on the range grid — the canonical
    PromQL empty-fallback idiom: steps with data keep their aggregate,
    empty grid steps gap-fill with the literal 0 via the per-bucket
    set-op match (vector(s) is a label-free sample; the `or` anti-join
    carries time_bucket). Existence probes are 1-row broadcast
    aggregates — no collect."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "sum(purchase) or vector(0)",
        start_s=1704067200.0,  # 2024-01-01 00:00
        end_s=1704081600.0,  # 2024-01-01 04:00
        step_s=1800,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type"
    )


SQL_PROMQL_VECTOR_FALLBACK = f"""
WITH g AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-01 04:00:00',
                                INTERVAL 30 MINUTE)) AS time_bucket
),
p AS (
  SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
         round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-01-01 04:00:00'
  GROUP BY 1, 2
)
SELECT g.time_bucket, p.event_type, COALESCE(p.value, 0.0) AS value
FROM g LEFT JOIN p USING (time_bucket)
ORDER BY 1
"""


def q_promql_time_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`time() - timestamp(purchase)` on the range grid: per step, how far
    the latest purchase sample sits from the step's own epoch — the
    PromQL staleness idiom (`time() - process_start_time_seconds`-style).
    time() folds per step as the bucket epoch (broadcast grid frame,
    bounded by the step count); values land in [-step, 0] for steps with
    samples under the bucket-start labeling convention."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "time() - timestamp(purchase)",
        start_s=1704067200.0,  # 2024-01-01 00:00
        end_s=1704081600.0,  # 2024-01-01 04:00
        step_s=1800,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type"
    )


SQL_PROMQL_TIME_STALENESS = f"""
SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
       round(CAST(epoch({_sql_bucket(1800)}) AS DOUBLE)
             - epoch_us(max(ts)) / 1000000.0, 6) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-01-01 04:00:00'
GROUP BY 1, 2
ORDER BY 1
"""


def q_promql_instant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`topk by (user_id) (3, view)` — real LIMIT k (reference degrades
    topk; deliberate correctness upgrade, SURVEY §2.6)."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "topk by (user_id) (3, view)",
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        F.col("timestamp_").alias("sample_time"),
        (F.col("value").cast("double") / F.lit(100.0)).alias("value"),
    )


SQL_PROMQL_INSTANT_TOPK = f"""
SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
       max(ts) AS sample_time,
       CAST(avg({_sql_cents('value')}) AS DOUBLE) / 100.0 AS value
FROM events
WHERE event_type = 'view'
GROUP BY 1, 2
ORDER BY avg({_sql_cents('value')}) DESC, event_type, user_id LIMIT 3
"""


def q_promql_rate_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(purchase[600s])` through the transpiler with ``faithful=True``:
    per-series (event_type, user_id) counter-reset-aware rate, superseding
    the reference's MAX−MIN/range degradation through the SAME entry point
    users hit (``api/query/prometheus_api.rs:969-1012``)."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "rate(purchase[600s])",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,  # 2024-02-01
        step_s=600,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value") / F.lit(100.0), 6).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_RATE_FAITHFUL = f"""
WITH filtered AS (
  SELECT ts, event_type, CAST(user_id AS VARCHAR) AS user_id,
         {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
deltas AS (
  SELECT ts, event_type, user_id, vc,
         lag(vc) OVER (PARTITION BY event_type, user_id ORDER BY ts) AS prev
  FROM filtered
)
SELECT {_sql_bucket(600)} AS time_bucket, event_type, user_id,
       round(sum(CASE WHEN prev IS NULL THEN NULL
                      WHEN vc >= prev THEN vc - prev
                      ELSE vc END) / 600.0 / 100.0, 6) AS value
FROM deltas GROUP BY 1, 2, 3
"""


def q_promql_irate_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`irate(click[600s])` through the transpiler with ``faithful=True``:
    last-two-samples rate per (1d bucket, event_type, user_id) — the
    reference AVG-falls-back for irate. Divisor is the µs-grid ns delta
    (ts_ns_us) so the float quotient is bit-identical to DuckDB's
    µs-truncated epoch_ns; a single IEEE division of exact int64 inputs is
    deterministic across engines."""
    from cardinalsin_spark.operators.promql import promql_range

    ev = _events_promql(spark, sf_dir).withColumn(
        "ts_ns_us", F.expr("ts_ns div 1000 * 1000")
    )
    df = promql_range(
        ev,
        "irate(click[600s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
        faithful=True,
        ts_ns_col="ts_ns_us",
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_IRATE_FAITHFUL = f"""
WITH filtered AS (
  SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
         CAST(user_id AS VARCHAR) AS user_id,
         epoch_ns(ts) AS tns, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'click'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
lagged AS (
  SELECT time_bucket, event_type, user_id, tns, vc,
         lag(vc) OVER (PARTITION BY time_bucket, event_type, user_id
                       ORDER BY tns) AS pv,
         lag(tns) OVER (PARTITION BY time_bucket, event_type, user_id
                        ORDER BY tns) AS pt,
         row_number() OVER (PARTITION BY time_bucket, event_type, user_id
                            ORDER BY tns DESC) AS rn
  FROM filtered
)
SELECT time_bucket, event_type, user_id,
       (CAST((CASE WHEN vc >= pv THEN vc - pv ELSE vc END)
             * 1000000000 AS DOUBLE) / CAST(tns - pt AS DOUBLE)) / 100.0 AS value
FROM lagged
WHERE rn = 1 AND pv IS NOT NULL
"""


def q_promql_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_over_time(view[600s])` + `count_over_time` shape — the
    *_over_time family the reference's grammar lacks. max/count are exact
    (no accumulation order), so no rounding is needed."""
    from cardinalsin_spark.operators.promql import promql_range

    mx = promql_range(
        _events_promql(spark, sf_dir),
        "max_over_time(view[600s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=600,
        cols=EV,
    )
    cnt = promql_range(
        _events_promql(spark, sf_dir),
        "count_over_time(view[600s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=600,
        cols=EV,
    ).withColumnRenamed("value", "n")
    return mx.join(cnt, ["time_bucket", "event_type"]).select(
        "time_bucket", "event_type", F.col("value").alias("max_value"), "n"
    ).transform(
        _final_order_wide, "time_bucket", "event_type"
    )


SQL_PROMQL_OVER_TIME = f"""
SELECT {_sql_bucket(600)} AS time_bucket, event_type,
       max(value) AS max_value, count(*) AS n
FROM events
WHERE event_type = 'view'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2
"""


def q_promql_binary_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL binary op with vector matching:
    `sum by (user_id) (purchase) / sum by (user_id) (view)` — an equi-join
    on (time_bucket, shared labels). The reference implements NO binary
    ops (transpiler is selector/agg/rate-shaped only,
    ``api/query/prometheus_api.rs:744-826``); superset per SURVEY §2.3's
    join mapping. Exact-int sums → one float division → deterministic."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) / sum by (user_id) (view)",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
    )


SQL_PROMQL_BINARY_RATIO = f"""
WITH l AS (
  SELECT {_sql_bucket(86400)} AS time_bucket,
         CAST(user_id AS VARCHAR) AS user_id,
         sum({_sql_cents('value')}) AS v
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY 1, 2
),
r AS (
  SELECT {_sql_bucket(86400)} AS time_bucket,
         CAST(user_id AS VARCHAR) AS user_id,
         sum({_sql_cents('value')}) AS v
  FROM events
  WHERE event_type = 'view'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY 1, 2
)
SELECT l.time_bucket, l.user_id, l.v / r.v AS value
FROM l JOIN r ON l.time_bucket = r.time_bucket AND l.user_id = r.user_id
"""


def q_promql_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`quantile by (user_id) (0.9, purchase)` range query — the PromQL
    quantile aggregation (beyond the reference's agg vocabulary,
    ``api/query/prometheus_api.rs:756-779``). Exact interpolated percentile
    over integer cents; one float division + round at the end."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "quantile by (user_id) (0.9, purchase)",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value") / F.lit(100.0), 4).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_QUANTILE = f"""
SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       round(quantile_cont({_sql_cents('value')}, 0.9) / 100.0, 4) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_offset_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`delta(purchase[30m] offset 1h)` — the offset modifier (beyond the
    reference's grammar): samples from [start-1h, end-1h] re-aligned onto
    the query's bucket grid. max-min is exact, no rounding needed."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "delta(purchase[30m] offset 1h)",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=1800,
        cols=EV,
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_OFFSET_DELTA = """
SELECT TIMESTAMP '1970-01-01' + INTERVAL (CAST(
         floor((epoch(ts) + 3600) / 1800) * 1800 AS BIGINT)) SECOND
         AS time_bucket,
       event_type,
       max(value) - min(value) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2023-12-31 23:00:00'
  AND ts <= TIMESTAMP '2024-01-31 23:00:00'
GROUP BY 1, 2
"""


def q_promql_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`label_replace(sum by (user_id) (purchase), "tier", "u$1",
    "user_id", "([0-9]+)")` — Prometheus label manipulation (the reference
    implements no function vocabulary). Anchored full-match regex with
    group expansion into a new label column."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        'label_replace(sum by (user_id) (purchase), "tier", "u$1",'
        ' "user_id", "([0-9]+)")',
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        "tier",
        F.round(F.col("value").cast("double") / F.lit(100.0), 2).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id", "tier"
    )


SQL_PROMQL_LABEL_REPLACE = f"""
SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       regexp_replace(CAST(user_id AS VARCHAR), '^(?:([0-9]+))$', 'u\\1')
         AS tier,
       round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0, 2) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`count_values("v", purchase)` instant aggregation: one row per
    distinct sample value with its occurrence count (beyond the
    reference's agg vocabulary). Exact: integer group key, integer count."""
    from cardinalsin_spark.operators.promql import promql_instant

    return promql_instant(
        _events_promql(spark, sf_dir),
        'count_values("v", purchase)',
        time_s=1706745600.0,
        cols=EV_CENTS,
    ).transform(
        final_order, "event_type", "value"
    )


SQL_PROMQL_COUNT_VALUES = f"""
SELECT event_type, {_sql_cents('value')} AS v, count(*) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2
"""


def q_promql_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`absent(no_such_metric)` instant query: a single {value: 1} sample
    because the selector matches nothing (Prometheus alerting primitive;
    beyond the reference's grammar)."""
    from cardinalsin_spark.operators.promql import promql_instant

    return promql_instant(
        _events_promql(spark, sf_dir),
        "absent(no_such_metric)",
        time_s=1706745600.0,
        cols=EV,
    )


SQL_PROMQL_ABSENT = """
SELECT CAST(1.0 AS DOUBLE) AS value
WHERE (SELECT count(*) FROM events
       WHERE event_type = 'no_such_metric'
         AND ts <= TIMESTAMP '2024-02-01 00:00:00') = 0
"""


# ---------------------------------------------------------------------------
# Relational pass-through (SURVEY §2.3/§2.7 — joins/set-ops reach the engine
# through full SQL, same as the reference's DataFusion pass-through)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg with multiple aggregates."""
    li = _lineitem(spark, sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(cents(F.col("l_extendedprice"))).cast("double") / F.lit(100.0),
                2,
            ).alias("sum_base_price"),
            F.round(
                F.sum(
                    cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                ).cast("double")
                / F.lit(10000.0),
                2,
            ).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .transform(final_order, "l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(CAST(sum({_sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0, 2)
         AS sum_base_price,
       round(CAST(sum({_sql_cents('l_extendedprice * (1 - l_discount)', 4)}) AS DOUBLE)
         / 10000.0, 2) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: 3-way join (broadcast dims) + agg + top-10 revenue."""
    cust = F.broadcast(_read(spark, sf_dir, "customer"))
    orders = _read(spark, sf_dir, "orders")
    li = _lineitem(spark, sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                ).cast("double")
                / F.lit(10000.0),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_TPCH_Q3ISH = f"""
SELECT o_orderkey, o_orderdate,
       round(CAST(sum({_sql_cents('l_extendedprice * (1 - l_discount)', 4)}) AS DOUBLE)
         / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (SURVEY §2.4 'grouping sets / cube / rollup' —
    reachable pass-through in the reference via DataFusion SQL; here the
    native ``df.rollup`` with ``grouping_id`` pinning the level mask).
    Exact-int sums → deterministic."""
    li = _lineitem(spark, sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("l_quantity"))).alias("qty_cents"),
        )
        .transform(final_order, "gid", "l_returnflag", "l_linestatus")
    )


SQL_SQL_ROLLUP = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum({_sql_cents('l_quantity')}) AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_sql_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over the events table (all 4 grouping levels)."""
    ev = _events(spark, sf_dir)
    return (
        ev.cube("event_type", "user_id")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .transform(final_order, "gid", "event_type", "user_id")
    )


SQL_SQL_CUBE = """
SELECT event_type, user_id,
       CAST(GROUPING(event_type, user_id) AS BIGINT) AS gid,
       count(*) AS n
FROM events
GROUP BY CUBE (event_type, user_id)
"""


def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the third of the multi-level aggregation
    trio (cube/rollup/sets): per-type totals, per-user totals, and the
    grand total in ONE pass over the fact table (Spark expands the sets
    map-side; no union of three scans)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupingSets(
            [["event_type"], ["user_id"], []], "event_type", "user_id"
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .transform(final_order, "gid", "event_type", "user_id")
    )


SQL_SQL_GROUPING_SETS = f"""
SELECT event_type, user_id,
       CAST(GROUPING(event_type, user_id) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum({_sql_cents('value')}) AS BIGINT) AS value_cents
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())
"""


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's showcase query (README.md:214-221): per-minute
    avg + p99 + count per service over a time window — here per event_type."""
    df = _events(spark, sf_dir).filter(
        ns_range_filter("2024-01-01 00:00:00", "2024-01-08 00:00:00")
    )
    return (
        df.withColumn("value_cents", cents(F.col("value")))
        .groupBy(time_bucket("ts", 60).alias("minute"), F.col("event_type"))
        .agg(
            (F.avg("value_cents") / F.lit(100.0)).alias("avg_value"),
            F.round(
                F.percentile("value_cents", F.lit(0.99)) / F.lit(100.0), 4
            ).alias("p99_value"),
            F.count(F.lit(1)).alias("sample_count"),
        )
        .transform(final_order, "minute", "event_type")
    )


SQL_FLAGSHIP = f"""
SELECT {_sql_bucket(60)} AS minute, event_type,
       avg({_sql_cents('value')}) / 100.0 AS avg_value,
       round(quantile_cont({_sql_cents('value')}, 0.99) / 100.0, 4) AS p99_value,
       count(*) AS sample_count
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <  TIMESTAMP '2024-01-08 00:00:00'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Maintenance operators (SURVEY §2.11): compaction planning, retention,
# time-index pruning, downsampling — exercised over a chunks-metadata table
# derived deterministically from events (one "chunk" per event_type × day).
# Timestamps are ns derived from exact integer µs (unix_micros*1000) so both
# engines agree bit-for-bit.
# ---------------------------------------------------------------------------

_SQL_CHUNKS_CTE = """
WITH chunks AS (
  SELECT event_type || '/' || CAST(CAST(ts AS DATE) AS VARCHAR) AS chunk_path,
         min(epoch_us(ts)) * 1000 AS min_timestamp,
         max(epoch_us(ts)) * 1000 AS max_timestamp,
         count(*) AS row_count,
         count(*) * 64 AS size_bytes,
         0 AS level
  FROM events
  GROUP BY 1
)
"""


def _derived_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.concat(
                F.col("event_type"), F.lit("/"), F.to_date("ts").cast("string")
            ).alias("chunk_path")
        )
        .agg(
            (F.min(F.unix_micros("ts")) * 1000).alias("min_timestamp"),
            (F.max(F.unix_micros("ts")) * 1000).alias("max_timestamp"),
            F.count(F.lit(1)).alias("row_count"),
            (F.count(F.lit(1)) * 64).alias("size_bytes"),
            F.lit(0).alias("level"),
        )
    )


def q_maint_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file backlog: chunks below the catalog-wide average size, with
    the per-day count and byte deficit — the compaction-pressure report an
    operator watches (reference compactor targets 250-500 MB files,
    compactor/mod.rs:84-87). "Small" is the scale-invariant exact-integer
    rule ``size * n_chunks < total_bytes`` (below average), so the report
    stays meaningful at any corpus size."""
    ch = _derived_chunks(spark, sf_dir)
    tot = ch.agg(
        F.sum("size_bytes").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    small = ch.crossJoin(F.broadcast(tot)).filter(
        F.col("size_bytes") * F.col("_n") < F.col("_total")
    )
    return (
        small.groupBy(
            F.expr("min_timestamp div 86400000000000").alias("day_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum("size_bytes").alias("bytes_small"),
        )
        .transform(final_order, "day_idx")
    )


SQL_MAINT_SMALL_FILES = f"""
{_SQL_CHUNKS_CTE},
tot AS (SELECT sum(size_bytes) AS total, count(*) AS n FROM chunks)
SELECT min_timestamp // 86400000000000 AS day_idx,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(size_bytes) AS BIGINT) AS bytes_small
FROM chunks CROSS JOIN tot
WHERE size_bytes * n < total
GROUP BY 1 ORDER BY 1
"""


def q_maint_l0_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L0 size-tiered compaction candidates: ≥5 level-0 chunks in the same
    hour bucket of min_timestamp (reference metadata/s3.rs:1188-1217)."""
    from cardinalsin_spark.operators.compaction import l0_compaction_candidates

    cand = l0_compaction_candidates(_derived_chunks(spark, sf_dir), trigger_files=5)
    return cand.select(
        "hour_bucket",
        "n_files",
        "total_bytes",
        "total_rows",
        F.array_join("chunk_paths", ",").alias("chunk_paths"),
    ).transform(final_order, "hour_bucket")


SQL_MAINT_L0_PLAN = f"""
{_SQL_CHUNKS_CTE}
SELECT (min_timestamp // 3600000000000) * 3600000000000 AS hour_bucket,
       count(*) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(row_count) AS BIGINT) AS total_rows,
       string_agg(chunk_path, ',' ORDER BY chunk_path) AS chunk_paths
FROM chunks
WHERE level = 0
GROUP BY 1
HAVING count(*) >= 5
"""


def q_maint_leveled_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+ leveled compaction grouping: chunks ordered by min_timestamp,
    greedily packed to a 64 KiB target via running-sum window
    (reference ``metadata/s3.rs:1219-1263``; the sequential greedy loop
    becomes group_id = floor(cumulative_bytes_before / target))."""
    from cardinalsin_spark.operators.compaction import leveled_compaction_groups

    chunks = _derived_chunks(spark, sf_dir).withColumn("level", F.lit(1))
    groups = leveled_compaction_groups(chunks, level=1, target_bytes=65536)
    return groups.select(
        "group_id",
        "n_files",
        "total_bytes",
        "min_timestamp",
        "max_timestamp",
        F.array_join("chunk_paths", ",").alias("chunk_paths"),
    )


SQL_MAINT_LEVELED_PLAN = f"""
{_SQL_CHUNKS_CTE},
cum AS (
  SELECT chunk_path, min_timestamp, max_timestamp, row_count, size_bytes,
         coalesce(sum(size_bytes) OVER (
           ORDER BY min_timestamp, chunk_path
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM chunks
)
SELECT CAST(cum_before // 65536 AS BIGINT) AS group_id,
       count(*) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       min(min_timestamp) AS min_timestamp,
       max(max_timestamp) AS max_timestamp,
       string_agg(chunk_path, ',' ORDER BY chunk_path) AS chunk_paths
FROM cum
GROUP BY 1
HAVING count(*) > 1
ORDER BY 1
"""


def q_maint_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention: chunks wholly before the cutoff are deletable
    (reference compactor/mod.rs:921-947)."""
    from cardinalsin_spark.operators.compaction import retention_candidates

    cutoff_ns = 1705276800 * 1_000_000_000  # 2024-01-15
    return retention_candidates(_derived_chunks(spark, sf_dir), cutoff_ns).select(
        "chunk_path", "max_timestamp", "row_count"
    ).transform(final_order, "chunk_path")


SQL_MAINT_RETENTION = f"""
{_SQL_CHUNKS_CTE}
SELECT chunk_path, max_timestamp, row_count
FROM chunks WHERE max_timestamp < 1705276800000000000
"""


def q_maint_time_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-index pruning: chunks overlapping a 3-day window survive
    (reference metadata/s3.rs:1083-1124)."""
    from cardinalsin_spark.sources.catalog import prune_chunks_by_time

    start_ns = 1704672000 * 1_000_000_000  # 2024-01-08
    end_ns = 1704931200 * 1_000_000_000  # 2024-01-11
    return prune_chunks_by_time(
        _derived_chunks(spark, sf_dir), start_ns, end_ns
    ).select("chunk_path", "min_timestamp", "max_timestamp", "row_count")


SQL_MAINT_TIME_PRUNE = f"""
{_SQL_CHUNKS_CTE}
SELECT chunk_path, min_timestamp, max_timestamp, row_count
FROM chunks
WHERE max_timestamp >= 1704672000000000000
  AND min_timestamp <= 1704931200000000000
"""


def q_maint_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling rollup (1h, per metric): the operator the reference
    configures but never implemented (compactor/mod.rs:70-91)."""
    from cardinalsin_spark.operators.compaction import downsample

    ds = downsample(
        _events_cents(spark, sf_dir),
        3600,
        ["event_type"],
        ts_col="ts",
        value_col="value_cents",
        counters=False,  # only classic moments selected below
    )
    # avg derives from the EXACT moments, UNROUNDED: int64 cents sum →
    # one deterministic IEEE division chain, identical bits in both
    # engines. The old round(AVG(.), 4) failed twice over at sf0.1 — the
    # float AVG is accumulation-order-dependent, and even on the exact
    # sum/count a bucket whose true mean sits ON the 10^-4 half-boundary
    # splits Spark's BigDecimal HALF_UP from DuckDB's multiply-and-round.
    # No rounding, no boundary (the r3 class, caught by the r10 sf0.1
    # sweep).
    return ds.select(
        "bucket",
        "event_type",
        (
            F.col("sum_value").cast("double")
            / F.col("count_value")
            / F.lit(100.0)
        ).alias("avg_value"),
        (F.col("min_value") / F.lit(100.0)).alias("min_value"),
        (F.col("max_value") / F.lit(100.0)).alias("max_value"),
        (F.col("sum_value").cast("double") / F.lit(100.0)).alias(
            "sum_value"
        ),
        "count_value",
    ).transform(final_order, "bucket", "event_type")


SQL_MAINT_DOWNSAMPLE = f"""
SELECT {_sql_bucket(3600)} AS bucket, event_type,
       CAST(sum({_sql_cents('value')}) AS DOUBLE) / count(value) / 100.0
           AS avg_value,
       min({_sql_cents('value')}) / 100.0 AS min_value,
       max({_sql_cents('value')}) / 100.0 AS max_value,
       CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0 AS sum_value,
       count(value) AS count_value
FROM events GROUP BY 1, 2
"""


# Rollup parquet cache for maint_rollup_routed: one deterministic
# downsample() write per (process, sf_dir) — the routed query then scans
# ONLY the rollup, never raw events (the plan pin in
# tests/test_plan_quality.py proves it).  Rebuilds after a bench cache
# eviction REUSE the same per-(pid, sf) directory with an overwrite
# write (ADVICE r11: a fresh mkdtemp per miss leaked one parquet tree
# per timed repeat), and every directory is removed at interpreter exit.
_ROLLUP_CACHE: dict[str, str] = {}


def _fixture_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(process, sf_dir) scratch dir for query-side
    parquet fixtures, registered for cleanup at exit."""
    import atexit
    import re as _re
    import shutil
    import tempfile

    import hashlib

    # slug for readability, hash for uniqueness (the slug collapses
    # punctuation runs, so 'data/sf0.1' and 'data-sf0.1' would collide)
    slug = _re.sub(r"[^A-Za-z0-9.]+", "-", sf_dir.strip("/"))
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(),
        f"cardinalsin-{kind}-{os.getpid()}-{slug}-{tag}",
    )
    if path not in _FIXTURE_DIRS:
        _FIXTURE_DIRS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


_FIXTURE_DIRS: set[str] = set()


def _events_rollup_path(
    spark: SparkSession, sf_dir: str, resolution_s: int = 21600
) -> str:
    from cardinalsin_spark.operators.compaction import downsample

    key = f"{sf_dir}::{resolution_s}"
    path = _ROLLUP_CACHE.get(key)
    if path is None:
        path = _fixture_dir(f"rollup-{resolution_s}", sf_dir) + "/rollup"
        downsample(
            _events_cents(spark, sf_dir),
            resolution_s,
            ["event_type"],
            ts_col="ts",
            value_col="value_cents",
            counters=False,  # gauge routing only — skip the window sort
        ).write.mode("overwrite").parquet(path)
        _ROLLUP_CACHE[key] = path
    return path


def q_maint_rollup_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent continuous-aggregate SERVING (VERDICT r9 item 2): a
    14-day daily range aggregation routed through a 6h downsample rollup —
    the read side of the reference's downsample config
    (``compactor/mod.rs:70-91``), which shipped with no implementation.

    The oracle below computes the RAW-path answer directly from events;
    this query must hash-match it while scanning only the rollup parquet
    (exact moment recomposition on integer cents; ``subsecond=True`` bound
    coverage to the exact micro — events carry µs timestamps, so the query
    end is 2024-01-15 00:00:00 − 1µs, covering whole 6h buckets).  The
    ``pick() is None`` guard makes a silent raw-path fallback impossible.

    Scale shape: 1000 executors answer a 90-day dashboard query from
    ~10⁴ rollup rows instead of re-scanning raw samples; the rollup read
    is an ordinary pruned parquet scan plus one hash aggregation."""
    from cardinalsin_spark.operators.rollup import RollupRouter

    resolution_s = 21600
    router = RollupRouter(
        spark,
        _events_cents(spark, sf_dir),
        series_cols=["event_type"],
        ts_col="ts",
        value_col="value_cents",
        subsecond=True,
    )
    router.attach(_events_rollup_path(spark, sf_dir, resolution_s), resolution_s)
    start = 1704067200  # 2024-01-01 00:00:00 UTC
    end = 1705276799.999999  # 2024-01-15 00:00:00 − 1µs
    step = 86400
    if router.pick(start, end, step) is None:
        raise RuntimeError(
            "maint_rollup_routed: rollup routing must engage (pick() "
            "returned base) — the aligned bounds or attach() regressed"
        )
    avg = router.range_agg("avg", start, end, step).withColumnRenamed(
        "value", "avg_cents"
    )
    tot = router.range_agg("sum", start, end, step).withColumnRenamed(
        "value", "sum_cents"
    )
    return (
        avg.join(tot, ["time_bucket", "event_type"])
        .select(
            "time_bucket",
            "event_type",
            F.round(F.col("avg_cents") / F.lit(100.0), 4).alias("avg_value"),
            (F.col("sum_cents").cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        .transform(_final_order_wide, "time_bucket", "event_type")
    )


SQL_MAINT_ROLLUP_ROUTED = f"""
SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
       round(CAST(sum({_sql_cents('value')}) AS DOUBLE) / count(value) / 100.0, 4)
           AS avg_value,
       CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0 AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# Fixtures for maint_rollup_sql_door: events reshaped to the engine's
# metrics schema (timestamp = µs event time, metric_name = event_type,
# value = integer cents) plus a 6h downsample rollup — one deterministic
# write per (process, sf_dir), like _events_rollup_path above.
_SQL_DOOR_CACHE: dict[str, tuple[str, str]] = {}


def _sql_door_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    from cardinalsin_spark.operators.compaction import downsample
    from cardinalsin_spark.schema import value_expr

    pair = _SQL_DOOR_CACHE.get(sf_dir)
    if pair is None:
        # deterministic per-(pid, sf) dir, overwrite on rebuild (ADVICE
        # r11: a fresh mkdtemp per bench eviction leaked a tree per
        # timed repeat), removed at interpreter exit via _fixture_dir
        base = _fixture_dir("sqldoor", sf_dir)
        mpath, rpath = base + "/metrics", base + "/rollup"
        # metrics-shaped directly (flat parquet, typed value columns) —
        # the fixture is query-side scaffolding whose one-time build cost
        # lands in this query's first timed bench run, so it skips the
        # hive-partitioned ingest layout AND the normalize value-routing
        # pass (µs timestamps survive the ts rename untouched)
        src = _events_cents(spark, sf_dir).select(
            F.col("ts").alias("timestamp"),
            F.col("event_type").alias("metric_name"),
            F.col("value_cents").cast("double").alias("value_f64"),
            F.lit(None).cast("long").alias("value_i64"),
            F.lit(None).cast("long").alias("value_u64"),
        )
        src.coalesce(2).write.mode("overwrite").parquet(mpath)
        from cardinalsin_spark.sources.tables import read_parquet_meta_cached

        downsample(
            read_parquet_meta_cached(spark, mpath).withColumn(
                "value", value_expr()
            ),
            21600,
            ["metric_name"],
        ).write.mode("overwrite").parquet(rpath)
        pair = (mpath, rpath)
        _SQL_DOOR_CACHE[sf_dir] = pair
    return pair


def q_maint_rollup_sql_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent rollup serving at the SQL door (VERDICT r10 missing
    #3): ``engine.sql`` recognizes the canonical GROUP-BY-``time_bucket``
    aggregation shape (``operators.rollup.match_bucket_agg_sql``) and
    serves it from an attached 6h rollup — the same ``rollup_covers``
    geometry and freshness rules as the promql doors, closing the
    asymmetry where the identical aggregation routed through PromQL but
    re-scanned raw through SQL. The events carry µs timestamps, so the
    query uses the micros-exact bound form (``timestamp_micros``, end =
    2024-01-15 − 1µs) — an integer-second bound would rightly refuse to
    route. The route guard makes a silent raw-path fallback impossible;
    the oracle computes the raw answer straight from events (exact
    integer cents, one final division).

    Scale shape: the dashboard query reads ~10³ rollup rows instead of
    the raw event samples; reference anchor ``compactor/mod.rs:70-91``
    (downsample config, no read side)."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.schema import value_expr

    mpath, rpath = _sql_door_fixture(spark, sf_dir)
    eng = CardinalSin(spark, mpath)
    eng.metrics.withColumn("value", value_expr()).createOrReplaceTempView(
        "metrics"
    )
    eng.attach_rollup(rpath, 21600, subsecond=True)
    q = (
        "SELECT time_bucket(timestamp, 86400) AS time_bucket, metric_name, "
        "sum(value) AS sum_cents, avg(value) AS avg_cents, "
        "count(value) AS sample_count FROM metrics "
        "WHERE timestamp >= timestamp_micros(1704067200000000) "
        "AND timestamp <= timestamp_micros(1705276799999999) "
        "GROUP BY time_bucket, metric_name "
        "ORDER BY time_bucket, metric_name"
    )
    if eng._maybe_route_sql_rollup(q) is None:
        raise RuntimeError(
            "maint_rollup_sql_door: SQL-door rollup routing must engage "
            "— the grammar match, alignment or attach() regressed"
        )
    return eng.sql(q).select(
        "time_bucket",
        F.col("metric_name").alias("event_type"),
        (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        # exact average, never rounded below the value's own granularity
        # (the r10 rounding doctrine): sum/count is the same bit-
        # deterministic division chain the oracle runs
        (F.col("avg_cents") / F.lit(100.0)).alias("avg_value"),
        "sample_count",
    )


SQL_MAINT_ROLLUP_SQL_DOOR = f"""
SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
       CAST(sum({_sql_cents('value')}) AS DOUBLE) / 100.0 AS sum_value,
       CAST(sum({_sql_cents('value')}) AS DOUBLE) / count(value) / 100.0
           AS avg_value,
       CAST(count(value) AS BIGINT) AS sample_count
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_maint_rollup_rate_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAITHFUL counter functions served from a rollup (VERDICT r11 item
    1 — the reference's hottest generated shape is the per-bucket rate,
    ``api/query/prometheus_api.rs:969-983``, and it was the one query
    family that still rescanned raw under an attached rollup): a 14-day
    daily ``rate``/``increase`` over every metric, recomposed from the 6h
    rollup's counter moments — ``inc_value`` (the reset-aware in-bucket
    increase) plus the reset-aware boundary delta between consecutive
    rollup buckets of each series (``first_value``/``last_value``) —
    so counter resets anywhere reproduce the raw answer bit-for-bit on
    the integer-cents fixture.

    The oracle computes the RAW faithful answer straight from events
    (the same per-series lag chain PromQL's increase sums, with the
    reference's bucket attribution: a delta lands in the LATER sample's
    bucket).  The plan guard makes a silent raw-path fallback
    impossible.

    Scale shape: a 90-day counter dashboard reads ~10³ rollup rows +
    one rollup-sized window instead of rescanning raw samples — the
    missing half of the continuous-aggregate story (gauges routed since
    r9; counters routed here)."""
    from cardinalsin_spark.engine import CardinalSin

    mpath, rpath = _sql_door_fixture(spark, sf_dir)
    eng = CardinalSin(spark, mpath)
    eng.attach_rollup(rpath, 21600, subsecond=True)
    start = 1704067200  # 2024-01-01 00:00:00 UTC
    end = 1705276799.999999  # 2024-01-15 00:00:00 − 1µs
    step = 86400
    rate = eng.promql_range('rate({__name__=~".+"}[86400s])', start, end, step)
    inc = eng.promql_range(
        'increase({__name__=~".+"}[86400s])', start, end, step
    ).withColumnRenamed("value", "inc_cents")
    for df, what in ((rate, "rate"), (inc, "increase")):
        # inputFiles(), not the plan STRING — executedPlan().toString()
        # truncates long FileScan lines, so a substring probe on it is
        # one path character away from a false negative
        files = df.inputFiles()
        if not any("/rollup" in f for f in files) or any(
            "/metrics" in f for f in files
        ):
            raise RuntimeError(
                f"maint_rollup_rate_routed: faithful {what} must serve "
                "from the rollup (counter moments, alignment or "
                "attach() regressed) — refusing the silent raw fallback"
            )
    return (
        rate.join(inc, ["time_bucket", "metric_name"])
        .select(
            "time_bucket",
            F.col("metric_name").alias("event_type"),
            # cents/s → units/s and cents → units: one deterministic
            # division chain, identical on both engines (exact int64
            # delta sums underneath — the rounding doctrine)
            (F.col("value") / F.lit(100.0)).alias("rate_value"),
            (F.col("inc_cents") / F.lit(100.0)).alias("increase_value"),
        )
        .transform(_final_order_wide, "time_bucket", "event_type")
    )


SQL_MAINT_ROLLUP_RATE_ROUTED = f"""
WITH d AS (
  SELECT {_sql_bucket(86400)} AS tb, event_type,
         CASE WHEN pv IS NULL THEN NULL
              WHEN v >= pv THEN v - pv
              ELSE v END AS dlt
  FROM (
    SELECT ts, event_type, {_sql_cents('value')} AS v,
           lag({_sql_cents('value')})
               OVER (PARTITION BY event_type ORDER BY ts) AS pv
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts < TIMESTAMP '2024-01-15 00:00:00'
  )
)
SELECT tb AS time_bucket, event_type,
       sum(dlt) / 86400.0 / 100.0 AS rate_value,
       sum(dlt) / 100.0 AS increase_value
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


# Quantile-sketch parquet fixture for maint_sketch_quantile_routed: one
# deterministic downsample_quantile_sketch() write per (process, sf_dir)
# over the _sql_door_fixture metrics reshape — the continuous-aggregate
# "index" whose build cost belongs to this query's cold bench time.
_SKETCH_FIXTURE_CACHE: dict[str, str] = {}

_SKETCH_ALPHA = 0.01


def _sketch_fixture(spark: SparkSession, sf_dir: str,
                    resolution_s: int = 21600) -> str:
    from cardinalsin_spark.operators.quantile_sketch import (
        downsample_quantile_sketch,
    )
    from cardinalsin_spark.schema import value_expr

    from cardinalsin_spark.sources.snapshots import SnapshotCatalog

    key = f"{sf_dir}::{resolution_s}"
    path = _SKETCH_FIXTURE_CACHE.get(key)
    if path is None:
        mpath, _ = _sql_door_fixture(spark, sf_dir)
        path = _fixture_dir(f"qsketch-{resolution_s}", sf_dir) + "/qsketch"
        from cardinalsin_spark.sources.tables import read_parquet_meta_cached

        downsample_quantile_sketch(
            read_parquet_meta_cached(spark, mpath).withColumn(
                "value", value_expr()
            ),
            resolution_s,
            ["metric_name"],
            _SKETCH_ALPHA,
        ).write.mode("overwrite").parquet(path)
        # manifest-bootstrap with the sketch keys: the SQL quantile
        # door only serves sketches whose manifest PROVES the NULL_SLOT
        # sentinel property (this build just wrote those rows), and
        # attach validates alpha/resolution from the same manifest
        cat = SnapshotCatalog(path)
        cat.commit(
            cat._list_parquet(path),
            None,
            extra={
                "rollup_resolution_s": int(resolution_s),
                "sketch_alpha": float(_SKETCH_ALPHA),
                "sketch_null_slot": True,
            },
        )
        _SKETCH_FIXTURE_CACHE[key] = path
    return path


def _quantile_contract_row(
    spark: SparkSession, sf_dir: str, q: float, p_alias: str, door
) -> DataFrame:
    """Shared body of the two sketch-quantile contract rows
    (``maint_sketch_quantile_routed`` / ``promql_quantile_routed`` —
    r14 review: they were near-verbatim twins).  ``door`` evaluates the
    14-day daily q-quantile grid through one serving door (and raises
    on a silent raw fallback); this helper builds the engine + attached
    6h sketch it runs against, the EXACT evaluation arm, and the
    hash-checked contract: per (day, event_type) the exact non-null
    sample count, the exact nearest-rank quantile on integer cents
    (``target = floor(q·(n−1)) + 1``, the same convention
    ``sketch_quantile`` walks), and ``within_alpha`` — the routed
    estimate lies within the declared α=1% relative error of that exact
    quantile, asserted as literal TRUE by the DuckDB oracle.  The
    estimate itself is libm-valued and stays OUT of the hash."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.functions.core import time_bucket

    mpath, _ = _sql_door_fixture(spark, sf_dir)
    spath = _sketch_fixture(spark, sf_dir)
    eng = CardinalSin(spark, mpath)
    eng.attach_quantile_sketch(spath, 21600, alpha=_SKETCH_ALPHA,
                               subsecond=True)
    start = 1704067200  # 2024-01-01 00:00:00 UTC
    end = 1705276799.999999  # 2024-01-15 00:00:00 − 1µs
    est = door(eng, start, end).select(
        "time_bucket",
        F.col("metric_name").alias("event_type"),
        F.col("value").alias("est_cents"),
    )
    exact = (
        _events_cents(spark, sf_dir)
        .filter(
            (F.col("ts") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("ts") <= F.timestamp_micros(F.lit(1705276799999999)))
            & F.col("value").isNotNull()
        )
        .groupBy(
            time_bucket("ts", 86400).alias("time_bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("sample_count"),
            F.expr("sort_array(collect_list(value_cents))").alias("__vs"),
        )
        .select(
            "time_bucket",
            "event_type",
            "sample_count",
            F.element_at(
                "__vs",
                (
                    F.floor(F.lit(q) * (F.col("sample_count") - 1)) + 1
                ).cast("int"),
            ).alias(p_alias),
        )
    )
    rel_ok = (
        F.abs(F.col("est_cents") - F.col(p_alias)) / F.abs(F.col(p_alias))
    ) <= F.lit(_SKETCH_ALPHA + 1e-9)
    within = F.when(
        F.col(p_alias) == 0, F.col("est_cents") == F.lit(0.0)
    ).otherwise(rel_ok)
    return (
        exact.join(est, ["time_bucket", "event_type"])
        .select(
            "time_bucket",
            "event_type",
            "sample_count",
            p_alias,
            within.alias("within_alpha"),
        )
        .transform(_final_order_wide, "time_bucket", "event_type")
    )


def _sql_quantile_contract(q: float, p_alias: str) -> str:
    return f"""
WITH w AS (
  SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
         {_sql_cents('value')} AS c
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-15 00:00:00'
    AND value IS NOT NULL
)
SELECT time_bucket, event_type,
       count(*) AS sample_count,
       (array_agg(c ORDER BY c))[CAST(floor({q} * (count(*) - 1)) AS BIGINT) + 1]
           AS {p_alias},
       TRUE AS within_alpha
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_maint_sketch_quantile_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile continuous aggregate SERVING (VERDICT r12
    item 2): a 14-day daily p90 over every metric answered from an
    attached 6h quantile sketch (``engine.quantile_approx`` — DDSketch-
    style log-bucketed slot counts, Masson et al. VLDB'19; the quantile
    shape the exact-moment rollups can never recompose, and the
    reference covers only for pre-instrumented `le` families,
    ``api/query/prometheus_api.rs:998-1012``).  The inputFiles route
    guard makes a silent raw fallback impossible; the hash-checked
    contract lives in ``_quantile_contract_row``.

    Scale shape: the serving arm reads ~10²-10³ slot-count rows instead
    of raw samples — a 90-day p99 latency dashboard for gauges never
    instrumented as histograms; the exact arm is the EVALUATION
    harness (collect_list per day-bucket group), not the serving path."""

    def door(eng, start, end):
        est = eng.quantile_approx(
            '{__name__=~".+"}', 0.9, start, end, 86400, alpha=_SKETCH_ALPHA
        )
        files = est.inputFiles()
        if not any("/qsketch" in f for f in files) or any(
            "/metrics" in f for f in files
        ):
            raise RuntimeError(
                "maint_sketch_quantile_routed: quantile_approx must "
                "serve from the attached sketch (alignment, alpha or "
                "attach() regressed) — refusing the silent raw fallback"
            )
        return est

    return _quantile_contract_row(spark, sf_dir, 0.9, "p90_cents", door)


SQL_MAINT_SKETCH_QUANTILE_ROUTED = _sql_quantile_contract(0.9, "p90_cents")


def q_promql_quantile_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-in approximate ``quantile_over_time`` at the PromQL door
    (VERDICT r13 item 2): a 14-day daily p95 grid evaluated as
    ``promql_range("quantile_over_time(0.95, {__name__=~'.+'}[1d])",
    ..., approx_quantile_alpha=0.01)`` and served from the attached 6h
    quantile sketch — completing the jump over the reference's wall,
    which serves quantiles ONLY for metrics pre-instrumented as ``le``
    histogram families (``api/query/prometheus_api.rs:998-1012``).  The
    opt-in is never silent: the default flag keeps exact PromQL
    evaluation, any non-quantile shape with the flag raises, and
    ``last_quantile_route`` + the inputFiles guard here make a silent
    raw fallback impossible.  Hash-checked contract: see
    ``_quantile_contract_row`` (p95 twin of the p90 maint row).

    Scale shape: a 90-day p95 latency dashboard over arbitrary gauges
    reads ~10²-10³ slot-count rows through this door instead of raw
    samples."""

    def door(eng, start, end):
        est = eng.promql_range(
            'quantile_over_time(0.95, {__name__=~".+"}[86400s])',
            start, end, 86400, approx_quantile_alpha=_SKETCH_ALPHA,
        )
        route = eng.last_quantile_route
        files = est.inputFiles()
        if (
            route is None
            or not route["routed"]
            or not any("/qsketch" in f for f in files)
            or any("/metrics" in f for f in files)
        ):
            raise RuntimeError(
                "promql_quantile_routed: the approx_quantile_alpha door "
                "must serve from the attached sketch (alignment, alpha "
                "or the route regressed) — refusing the silent raw "
                "fallback"
            )
        return est

    return _quantile_contract_row(spark, sf_dir, 0.95, "p95_cents", door)


SQL_PROMQL_QUANTILE_ROUTED = _sql_quantile_contract(0.95, "p95_cents")


# ---------------------------------------------------------------------------
# Point-in-time joins and gap-filling (SURVEY §2.3/§2.4 superset — the
# canonical time-series ops Spark lacks natively, built as compositions)
# ---------------------------------------------------------------------------


def q_ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF join: each purchase event matched to the same user's latest view
    at-or-before it. Union + LOCF-window formulation — one shuffle on the
    join key, linear per-partition scan, both sides may be 100 TB facts."""
    from cardinalsin_spark.operators.timeseries import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["view_value"],
        right_ts_alias="view_ts",
    ).select("user_id", "ts", "purchase_value", "view_ts", "view_value")


SQL_TS_ASOF_JOIN = """
SELECT p.user_id, p.ts, p.value AS purchase_value,
       v.ts AS view_ts, v.value AS view_value
FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ASOF JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_ts_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: all events of "high-value" users
    (lifetime purchase cents > 100 000), aggregated per (user, type).

    The classic 100 TB fact-table pre-filter — the key set is derived, so
    it can't be a static partition predicate: build a Bloom bitmap over
    the qualifying user_ids (operators.bloom — bit_or'd 64-bit words,
    broadcastable by construction), probe the fact table's distinct keys
    against it map-side, exact-verify the candidates, broadcast the
    verified keys back. Output is exactly the semi-join (oracle: plain
    IN-subquery); the fact table never shuffles on the key."""
    from cardinalsin_spark.operators.bloom import bloom_semi_join

    ev = _events(spark, sf_dir)
    hv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(cents(F.col("value"))).alias("_s"))
        .filter(F.col("_s") > 100_000)
        .select("user_id")
    )
    filtered = bloom_semi_join(ev, hv, "user_id", m_bits=1 << 16, k_hashes=5)
    return (
        filtered.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .transform(final_order, "user_id", "event_type")
    )


SQL_TS_BLOOM_JOIN = f"""
WITH hv AS (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY 1 HAVING sum({_sql_cents('value')}) > 100000
)
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_sql_cents('value')}) AS BIGINT) AS value_cents
FROM events WHERE user_id IN (SELECT user_id FROM hv)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill + locf: dense hourly grid over 3 days for a
    sparse slice (3 users), missing buckets carried forward."""
    from cardinalsin_spark.operators.timeseries import gapfill_locf

    df = _events_cents(spark, sf_dir).filter(F.col("user_id") < 3)
    out = gapfill_locf(
        df, 3600, "2024-01-03 00:00:00", "2024-01-06 00:00:00",
        agg="avg", cols=EV_CENTS,
    )
    return out.select(
        "bucket",
        "event_type",
        F.round(F.col("value") / F.lit(100.0), 4).alias("value"),
        "filled",
    )


SQL_TS_GAPFILL_LOCF = f"""
WITH src AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type, {_sql_cents('value')} AS vc
  FROM events
  WHERE user_id < 3
    AND ts >= TIMESTAMP '2024-01-03 00:00:00'
    AND ts <  TIMESTAMP '2024-01-06 00:00:00'
),
agg AS (SELECT bucket, event_type, avg(vc) AS v FROM src GROUP BY 1, 2),
series AS (SELECT DISTINCT event_type FROM agg),
grid AS (
  SELECT s.event_type, g.bucket
  FROM series s CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-03 00:00:00',
                                  TIMESTAMP '2024-01-06 00:00:00'
                                    - INTERVAL 3600 SECOND,
                                  INTERVAL 3600 SECOND)) AS bucket) g
)
SELECT g.bucket, g.event_type,
       round(last_value(a.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0,
             4) AS value,
       (a.v IS NULL) AS filled
FROM grid g
LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = g.event_type
"""


def q_ts_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upstream-faithful extrapolated rate per (1h bucket, event_type):
    Prometheus's extrapolatedRate boundary logic + counter zero-clamp,
    bit-exact across engines (identical float chains on exact ints)."""
    from cardinalsin_spark.operators.timeseries import rate_extrapolated

    df = rate_extrapolated(_events_cents(spark, sf_dir), 3600, cols=EV_CENTS)
    return df.select(
        "bucket",
        "event_type",
        (F.col("rate") / F.lit(100.0)).alias("rate"),
    ).transform(final_order, "bucket", "event_type")


SQL_TS_RATE_EXTRAPOLATED = f"""
WITH base AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type, epoch_ns(ts) AS tns,
         {_sql_cents('value')} AS vc
  FROM events
),
lagged AS (
  SELECT bucket, event_type, tns, vc,
         lag(vc) OVER (PARTITION BY bucket, event_type
                       ORDER BY tns, vc) AS prev
  FROM base
),
agg AS (
  SELECT bucket, event_type, count(*) AS n,
         sum(CASE WHEN prev IS NULL THEN NULL
                  WHEN vc >= prev THEN vc - prev
                  ELSE vc END) AS d,
         min(tns) AS tf, max(tns) AS tl,
         arg_min(vc, tns) AS vf,
         epoch_us(min(bucket)) * 1000 AS bstart
  FROM lagged GROUP BY 1, 2
),
ext AS (
  SELECT bucket, event_type, d,
         CAST(tl - tf AS DOUBLE) AS sampled,
         CAST(tl - tf AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS avg_dur,
         CAST(tf - bstart AS DOUBLE) AS dur_start,
         CAST(bstart + {3600 * 10**9} - tl AS DOUBLE) AS dur_end,
         CASE WHEN d > 0 AND vf >= 0
              THEN CAST(tl - tf AS DOUBLE)
                   * (CAST(vf AS DOUBLE) / CAST(d AS DOUBLE))
              ELSE NULL END AS dur_to_zero
  FROM agg WHERE n >= 2 AND tl > tf
),
fin AS (
  SELECT bucket, event_type, d, sampled,
         CASE WHEN dur_to_zero IS NOT NULL AND dur_to_zero <
                (CASE WHEN dur_start < avg_dur * 1.1 THEN dur_start
                      ELSE avg_dur / 2.0 END)
              THEN dur_to_zero
              ELSE (CASE WHEN dur_start < avg_dur * 1.1 THEN dur_start
                         ELSE avg_dur / 2.0 END) END AS ext_start,
         CASE WHEN dur_end < avg_dur * 1.1 THEN dur_end
              ELSE avg_dur / 2.0 END AS ext_end
  FROM ext
)
SELECT bucket, event_type,
       CAST(d AS DOUBLE) * ((sampled + ext_start + ext_end) / sampled)
         / 3600.0 / 100.0 AS rate
FROM fin ORDER BY bucket, event_type
"""


def q_ts_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time × value 2-D histogram (the observability heatmap panel): sample
    counts per (1d bucket, event_type, $25 value band). Exact integer band
    index via cents div; one map-side-combinable aggregation."""
    df = _events_cents(spark, sf_dir)
    band = F.expr("value_cents div 2500")
    return (
        df.groupBy(
            time_bucket("ts", 86400).alias("bucket"),
            F.col("event_type"),
            band.alias("value_band"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(final_order, "bucket", "event_type", "value_band")
    )


SQL_TS_HEATMAP = f"""
SELECT {_sql_bucket(86400)} AS bucket, event_type,
       {_sql_cents('value')} // 2500 AS value_band,
       count(*) AS n
FROM events
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_ts_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z-score outliers (|z| > 3) per 6h bucket per event_type — exact
    integer decision rule, deterministic float zscore."""
    from cardinalsin_spark.operators.timeseries import zscore_outliers

    return zscore_outliers(
        _events_cents(spark, sf_dir), 21600, z=3, by=["event_type"],
        cols=EV_CENTS,
    ).transform(
        _final_order_wide, "bucket", "event_type", "ts", "value_int"
    )


SQL_TS_OUTLIERS = f"""
WITH base AS (
  SELECT {_sql_bucket(21600)} AS bucket, event_type, ts,
         {_sql_cents('value')} AS vc
  FROM events
),
st AS (
  SELECT bucket, event_type, ts, vc,
         count(*) OVER w AS n, sum(vc) OVER w AS sy,
         sum(vc * vc) OVER w AS sy2
  FROM base WINDOW w AS (PARTITION BY bucket, event_type)
)
SELECT bucket, event_type, ts, vc AS value_int,
       CAST(vc * n - sy AS DOUBLE)
         / sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)) AS zscore
FROM st
WHERE n >= 2 AND n * sy2 - sy * sy > 0
  AND (vc * n - sy) * (vc * n - sy) > 9 * (n * sy2 - sy * sy)
ORDER BY bucket, event_type, ts, value_int
"""


def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (2h gap) per user: session bounds, event
    count, exact integer duration."""
    from cardinalsin_spark.operators.timeseries import sessionize

    out = sessionize(
        _events(spark, sf_dir),
        7200,
        key_cols=["user_id"],
        cols=EV,
        order_tiebreak=["event_id"],
    )
    return out.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "session_start",
        "session_end",
        "n_events",
        "duration_s",
    ).transform(final_order, "user_id", "session_idx")


SQL_TS_SESSIONIZE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > 7200000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_idx
  FROM ordered
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
FROM numbered GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# PromQL function-surface widening: resets/changes, predict_linear,
# stddev/stdvar, histogram_quantile (all AVG-degraded in the reference,
# api/query/prometheus_api.rs:998-1012 — implemented faithfully here)
# ---------------------------------------------------------------------------


def q_ts_resets_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (event_type) (resets(m[6h]))` + changes(): counter resets and
    value changes per series (event_type, user_id), summed per type."""
    from cardinalsin_spark.operators.timeseries import resets_changes_bucketed

    return resets_changes_bucketed(
        _events_cents(spark, sf_dir),
        21600,
        series=["user_id"],
        by=["event_type"],
        cols=EV_CENTS,
    ).transform(final_order, "bucket", "event_type")


SQL_TS_RESETS_CHANGES = f"""
WITH base AS (
  SELECT {_sql_bucket(21600)} AS bucket, event_type, user_id,
         {_sql_cents('value')} AS vc, epoch_ns(ts) AS tns
  FROM events
),
lagged AS (
  SELECT bucket, event_type, vc,
         lag(vc) OVER (PARTITION BY bucket, event_type, user_id
                       ORDER BY tns, vc) AS prev
  FROM base
)
SELECT bucket, event_type,
       CAST(sum(CASE WHEN vc < prev THEN 1 ELSE 0 END) AS BIGINT) AS resets,
       CAST(sum(CASE WHEN vc <> prev THEN 1 ELSE 0 END) AS BIGINT) AS changes
FROM lagged GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict_linear(m[1h], 30m): least-squares extrapolation 30 minutes
    past each bucket end, DECIMAL(38)-grid exact."""
    from cardinalsin_spark.operators.timeseries import predict_linear_bucketed

    df = predict_linear_bucketed(
        _events_cents(spark, sf_dir), 3600, 1800, cols=EV_CENTS
    )
    return df.select(
        "bucket",
        "event_type",
        (F.col("predicted") / F.lit(100.0)).alias("predicted"),
    ).transform(final_order, "bucket", "event_type")


_PL_XEVAL_MS = (3600 + 1800) * 1000

SQL_TS_PREDICT_LINEAR = f"""
WITH base AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type,
         CAST(floor((epoch_ns(ts) % {3600 * 10**9}) / 1000000.0) AS BIGINT) AS x,
         {_sql_cents('value')} AS y
  FROM events
),
agg AS (
  SELECT bucket, event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sx2
  FROM base GROUP BY 1, 2
),
fit AS (
  SELECT bucket, event_type, n, sx, sy,
         n * sxy - sx * sy AS num,
         n * sx2 - sx * sx AS den
  FROM agg WHERE n >= 2 AND (n * sx2 - sx * sx) > 0
)
SELECT bucket, event_type,
       CAST((CAST(sy AS HUGEINT) * den
             + CAST(num AS HUGEINT) * (CAST(n AS HUGEINT) * {_PL_XEVAL_MS} - sx))
            * 1000000 // (CAST(n AS HUGEINT) * den) AS BIGINT)
         / 1000000.0 / 100.0 AS predicted
FROM fit ORDER BY bucket, event_type
"""


def q_ts_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL stddev/stdvar aggregation per 6h bucket, exact-int internals
    (sqrt + two divisions are IEEE-deterministic on exact inputs)."""
    from cardinalsin_spark.operators.timeseries import stddev_bucketed_exact

    df = stddev_bucketed_exact(
        _events_cents(spark, sf_dir), 21600, by=["event_type"], cols=EV_CENTS
    )
    return df.select(
        "bucket",
        "event_type",
        (F.col("stddev") / F.lit(100.0)).alias("stddev"),
        (F.col("stdvar") / F.lit(10_000.0)).alias("stdvar"),
    ).transform(final_order, "bucket", "event_type")


SQL_TS_STDDEV = f"""
WITH agg AS (
  SELECT {_sql_bucket(21600)} AS bucket, event_type, count(*) AS n,
         sum({_sql_cents('value')}) AS sy,
         sum({_sql_cents('value')} * {_sql_cents('value')}) AS sy2
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type,
       sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0
         AS stddev,
       CAST(n * sy2 - sy * sy AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0 AS stdvar
FROM agg ORDER BY bucket, event_type
"""


_HQ_LES = [1000, 2500, 5000, 10000, 20000, 50000]


def q_promql_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.9, m_bucket) per day per type over synthesized
    cumulative le-buckets (the events table has no native _bucket metric, so
    the classic instrumentation shape is built from the raw samples: one
    conditional-sum pass per le bound, broadcast tiny le dimension)."""
    from cardinalsin_spark.operators.promql import (
        cumulative_le_buckets,
        histogram_quantile_cumulative,
    )

    ev = _events_cents(spark, sf_dir)
    b = ev.select(
        time_bucket("ts", 86400).alias("day"), "event_type", "value_cents"
    )
    cum = cumulative_le_buckets(
        b, ["day", "event_type"], "value_cents", _HQ_LES
    )
    return histogram_quantile_cumulative(
        cum, 9, 10, ["day", "event_type"], out_scale=100_000_000.0
    ).transform(_final_order_wide, "day", "event_type")


SQL_PROMQL_HISTOGRAM_QUANTILE = f"""
WITH les(le) AS (VALUES (1000), (2500), (5000), (10000), (20000), (50000),
                        ({2**62})),
src AS (
  SELECT {_sql_bucket(86400)} AS day, event_type, {_sql_cents('value')} AS vc
  FROM events
),
b AS (
  SELECT day, event_type, le,
         sum(CASE WHEN vc <= le THEN 1 ELSE 0 END) AS cum
  FROM src CROSS JOIN les GROUP BY 1, 2, 3
),
ann AS (
  SELECT day, event_type, le, cum,
         max(cum) OVER (PARTITION BY day, event_type) AS total,
         coalesce(lag(cum) OVER w, 0) AS prev_cum,
         lag(le) OVER w AS prev_le
  FROM b WINDOW w AS (PARTITION BY day, event_type ORDER BY le)
),
hit AS (
  SELECT *, row_number() OVER (PARTITION BY day, event_type ORDER BY le) AS rn
  FROM ann WHERE 10 * cum >= 9 * total AND total > 0
)
SELECT day, event_type,
       CAST(CASE WHEN le >= {2**62} THEN prev_le * 1000000
                 WHEN cum - prev_cum > 0 THEN
                   (coalesce(prev_le, 0) * 10 * (cum - prev_cum)
                    + (le - coalesce(prev_le, 0)) * (9 * total - 10 * prev_cum))
                   * 1000000 // (10 * (cum - prev_cum))
                 ELSE NULL END AS BIGINT) / 100000000.0 AS value
FROM hit WHERE rn = 1
ORDER BY day, event_type
"""


_HF_LO, _HF_HI = 1500, 30000  # cents, deliberately OFF the bucket bounds


def q_promql_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_fraction(15.00, 300.00, m_bucket) per day per type over
    the same synthesized cumulative le-buckets as the quantile row: the
    estimated fraction of observations in (lo, hi], both thresholds
    interpolating INSIDE a bucket (not on a bound) so the rational
    interpolation path is what the oracle checks."""
    from cardinalsin_spark.operators.promql import (
        cumulative_le_buckets,
        histogram_fraction_cumulative,
    )

    ev = _events_cents(spark, sf_dir)
    b = ev.select(
        time_bucket("ts", 86400).alias("day"), "event_type", "value_cents"
    )
    cum = cumulative_le_buckets(
        b, ["day", "event_type"], "value_cents", _HQ_LES
    )
    return histogram_fraction_cumulative(
        cum, _HF_LO, _HF_HI, ["day", "event_type"]
    ).transform(_final_order_wide, "day", "event_type")


SQL_PROMQL_HISTOGRAM_FRACTION = f"""
WITH les(le) AS (VALUES (1000), (2500), (5000), (10000), (20000), (50000),
                        ({2**62})),
src AS (
  SELECT {_sql_bucket(86400)} AS day, event_type, {_sql_cents('value')} AS vc
  FROM events
),
b AS (
  SELECT day, event_type, le,
         sum(CASE WHEN vc <= le THEN 1 ELSE 0 END) AS cum
  FROM src CROSS JOIN les GROUP BY 1, 2, 3
),
ann AS (
  SELECT day, event_type, le, cum,
         max(cum) OVER (PARTITION BY day, event_type) AS total,
         coalesce(lag(cum) OVER w, 0) AS prev_cum,
         coalesce(lag(le) OVER w, 0) AS prev_le
  FROM b WINDOW w AS (PARTITION BY day, event_type ORDER BY le)
),
flo AS (
  SELECT day, event_type,
         CASE WHEN le >= {2**62} THEN total
              ELSE prev_cum * (le - prev_le)
                   + ({_HF_LO} - prev_le) * (cum - prev_cum) END AS n_lo,
         CASE WHEN le >= {2**62} THEN 1 ELSE le - prev_le END AS d_lo
  FROM (SELECT *, row_number() OVER (PARTITION BY day, event_type
                                     ORDER BY le) AS rn
        FROM ann WHERE le >= {_HF_LO} AND total > 0)
  WHERE rn = 1
),
fhi AS (
  SELECT day, event_type,
         CASE WHEN le >= {2**62} THEN total
              ELSE prev_cum * (le - prev_le)
                   + ({_HF_HI} - prev_le) * (cum - prev_cum) END AS n_hi,
         CASE WHEN le >= {2**62} THEN 1 ELSE le - prev_le END AS d_hi,
         total
  FROM (SELECT *, row_number() OVER (PARTITION BY day, event_type
                                     ORDER BY le) AS rn
        FROM ann WHERE le >= {_HF_HI} AND total > 0)
  WHERE rn = 1
)
SELECT day, event_type,
       CAST(GREATEST(0, LEAST(n_hi * d_lo - n_lo * d_hi,
                              d_hi * d_lo * total)) * 1000000
            // (d_hi * d_lo * total) AS BIGINT) / 1000000.0 AS value
FROM fhi JOIN flo USING (day, event_type)
ORDER BY day, event_type
"""


def q_promql_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum(resets(click[21600s]))` through the transpiler with
    ``faithful=True``: per-series (event_type, user_id) counter-reset
    counts, summed across series — reachable from the SAME PromQL entry
    point users hit (the reference AVG-degrades unknown functions,
    ``api/query/prometheus_api.rs:998-1012``)."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "sum(resets(click[21600s]))",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,  # 2024-02-01
        step_s=21600,
        cols=EV_CENTS,
        faithful=True,
    ).transform(final_order, "time_bucket", "event_type")


SQL_PROMQL_RESETS = f"""
WITH filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type,
         CAST(user_id AS VARCHAR) AS user_id, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'click'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
lagged AS (
  SELECT {_sql_bucket(21600)} AS time_bucket, event_type, vc,
         lag(vc) OVER (PARTITION BY {_sql_bucket(21600)}, event_type, user_id
                       ORDER BY tns, vc) AS prev
  FROM filtered
)
SELECT time_bucket, event_type,
       CAST(sum(CASE WHEN vc < prev THEN 1 ELSE 0 END) AS BIGINT) AS value
FROM lagged GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_promql_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`predict_linear(view[3600s], 1800)` through the transpiler: per-series
    least-squares extrapolation 30 min past each bucket end."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "predict_linear(view[3600s], 1800)",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=3600,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_PREDICT_LINEAR = f"""
WITH filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type,
         CAST(user_id AS VARCHAR) AS user_id, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'view'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
base AS (
  SELECT {_sql_bucket(3600)} AS time_bucket, event_type, user_id,
         CAST(floor((tns % {3600 * 10**9}) / 1000000.0) AS BIGINT) AS x,
         vc AS y
  FROM filtered
),
agg AS (
  SELECT time_bucket, event_type, user_id, count(*) AS n, sum(x) AS sx,
         sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sx2
  FROM base GROUP BY 1, 2, 3
),
fit AS (
  SELECT time_bucket, event_type, user_id, n, sx, sy,
         n * sxy - sx * sy AS num,
         n * sx2 - sx * sx AS den
  FROM agg WHERE n >= 2 AND (n * sx2 - sx * sx) > 0
)
SELECT time_bucket, event_type, user_id,
       CAST((CAST(sy AS HUGEINT) * den
             + CAST(num AS HUGEINT) * (CAST(n AS HUGEINT) * {_PL_XEVAL_MS} - sx))
            * 1000000 // (CAST(n AS HUGEINT) * den) AS BIGINT)
         / 1000000.0 / 100.0 AS value
FROM fit ORDER BY time_bucket, event_type, user_id
"""


def q_promql_delta_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`delta(signup[86400s])` through the transpiler: signed last−first
    gauge drift per (1d bucket, event_type, user_id) — no reset clamp,
    pure max_by/min_by aggregation (one combinable shuffle, no window)."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "delta(signup[86400s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_DELTA_FAITHFUL = f"""
WITH filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type,
         CAST(user_id AS VARCHAR) AS user_id, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'signup'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
)
, win AS (
  SELECT {_sql_bucket(86400)} AS time_bucket, event_type, user_id,
         first_value(vc) OVER w AS fv,
         last_value(vc) OVER (PARTITION BY {_sql_bucket(86400)}, event_type,
                              user_id ORDER BY tns, vc
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING) AS lv,
         count(*) OVER (PARTITION BY {_sql_bucket(86400)}, event_type,
                        user_id) AS n
  FROM filtered
  WINDOW w AS (PARTITION BY {_sql_bucket(86400)}, event_type, user_id
               ORDER BY tns, vc)
)
SELECT DISTINCT time_bucket, event_type, user_id, (lv - fv) / 100.0 AS value
FROM win WHERE n >= 2
ORDER BY 1, 2, 3
"""


def q_promql_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(view[3600s])` through the transpiler with
    ``faithful="extrapolated"``: the upstream extrapolatedRate algorithm
    per (1h bucket, event_type series) — reachable from the same entry
    point users hit."""
    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    cols = MetricsCols(ts="ts", name="event_type", value="value_cents")
    df = promql_range(
        _events_cents(spark, sf_dir),
        "rate(view[3600s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=3600,
        cols=cols,
        faithful="extrapolated",
    )
    return df.select(
        "time_bucket",
        "event_type",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_RATE_EXTRAPOLATED = f"""
WITH filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'view'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
base AS (
  SELECT {_sql_bucket(3600)} AS time_bucket, event_type, tns, vc
  FROM filtered
),
lagged AS (
  SELECT time_bucket, event_type, tns, vc,
         lag(vc) OVER (PARTITION BY time_bucket, event_type
                       ORDER BY tns, vc) AS prev
  FROM base
),
agg AS (
  SELECT time_bucket, event_type, count(*) AS n,
         sum(CASE WHEN prev IS NULL THEN NULL
                  WHEN vc >= prev THEN vc - prev
                  ELSE vc END) AS d,
         min(tns) AS tf, max(tns) AS tl,
         arg_min(vc, tns) AS vf,
         epoch_us(min(time_bucket)) * 1000 AS bstart
  FROM lagged GROUP BY 1, 2
),
ext AS (
  SELECT time_bucket, event_type, d,
         CAST(tl - tf AS DOUBLE) AS sampled,
         CAST(tl - tf AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS avg_dur,
         CAST(tf - bstart AS DOUBLE) AS dur_start,
         CAST(bstart + {3600 * 10**9} - tl AS DOUBLE) AS dur_end,
         CASE WHEN d > 0 AND vf >= 0
              THEN CAST(tl - tf AS DOUBLE)
                   * (CAST(vf AS DOUBLE) / CAST(d AS DOUBLE))
              ELSE NULL END AS dur_to_zero
  FROM agg WHERE n >= 2 AND tl > tf
),
fin AS (
  SELECT time_bucket, event_type, d, sampled,
         CASE WHEN dur_to_zero IS NOT NULL AND dur_to_zero <
                (CASE WHEN dur_start < avg_dur * 1.1 THEN dur_start
                      ELSE avg_dur / 2.0 END)
              THEN dur_to_zero
              ELSE (CASE WHEN dur_start < avg_dur * 1.1 THEN dur_start
                         ELSE avg_dur / 2.0 END) END AS ext_start,
         CASE WHEN dur_end < avg_dur * 1.1 THEN dur_end
              ELSE avg_dur / 2.0 END AS ext_end
  FROM ext
)
SELECT time_bucket, event_type,
       CAST(d AS DOUBLE) * ((sampled + ext_start + ext_end) / sampled)
         / 3600.0 / 100.0 AS value
FROM fin ORDER BY time_bucket, event_type
"""


def q_promql_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`clamp(sum by (user_id) (purchase), 50000, 150000)` — scalar wrapper
    over an instant vector (cents bounds = $500..$1500)."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "clamp(sum by (user_id) (purchase), 50000, 150000)",
        time_s=1706745600.0,  # 2024-02-01
        cols=EV_CENTS,
    )
    return df.select(
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        final_order, "event_type", "user_id"
    )


SQL_PROMQL_CLAMP = f"""
SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
       least(greatest(CAST(sum({_sql_cents('value')}) AS DOUBLE), 50000.0),
             150000.0) / 100.0 AS value
FROM events
WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2
"""


def q_promql_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`idelta(error[86400s])` through the transpiler: signed last-two-samples
    delta per (1d bucket, event_type, user_id) — gauge semantics, no reset
    clamp."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "idelta(error[86400s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        _final_order_wide, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_IDELTA = f"""
WITH filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type,
         CAST(user_id AS VARCHAR) AS user_id, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'error'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
lagged AS (
  SELECT {_sql_bucket(86400)} AS time_bucket, event_type, user_id, vc,
         lag(vc) OVER (PARTITION BY {_sql_bucket(86400)}, event_type, user_id
                       ORDER BY tns) AS prev,
         row_number() OVER (PARTITION BY {_sql_bucket(86400)}, event_type,
                            user_id ORDER BY tns DESC) AS rn
  FROM filtered
)
SELECT time_bucket, event_type, user_id, (vc - prev) / 100.0 AS value
FROM lagged WHERE rn = 1 AND prev IS NOT NULL
ORDER BY time_bucket, event_type, user_id
"""


# ---------------------------------------------------------------------------
# TPC-H widening: q6 (filter-agg) and q5-ish (6-table join)
# ---------------------------------------------------------------------------


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue: exact-int revenue (price cents x
    discount hundredths, one float division at the end)."""
    li = _lineitem(spark, sf_dir)
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount")))
    return f.agg((rev / F.lit(10_000.0)).alias("revenue"))


SQL_TPCH_Q6 = f"""
SELECT sum({_sql_cents('l_extendedprice')} * {_sql_cents('l_discount')})
         / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier-volume: customer-orders-lineitem-supplier-
    nation-region star join filtered to one region/year; all dims broadcast
    (plan test asserts BroadcastHashJoin), revenue on the exact-cents grid."""
    from cardinalsin_spark.sources.tables import load_tables

    ensure_session_conf(spark)
    t = load_tables(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    rev = F.sum(
        cents(F.col("l_extendedprice"))
        * (F.lit(100) - cents(F.col("l_discount")))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg((rev / F.lit(10_000.0)).alias("revenue"))
        .transform(final_order, F.desc("revenue"), F.asc("n_name"))
    )


SQL_TPCH_Q5ISH = f"""
SELECT n_name,
       sum({_sql_cents('l_extendedprice')}
           * (100 - {_sql_cents('l_discount')})) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item report: top-20 customers by revenue lost to
    returns in a quarter — broadcast dims, exact-cents revenue."""
    from cardinalsin_spark.sources.tables import load_tables

    ensure_session_conf(spark)
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    rev = F.sum(
        cents(F.col("l_extendedprice"))
        * (F.lit(100) - cents(F.col("l_discount")))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((rev / F.lit(10_000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion-effect: promo revenue as a fraction of total
    revenue for one shipping month. Exact-cents numerator/denominator,
    one final float division."""
    from cardinalsin_spark.sources.tables import load_tables

    ensure_session_conf(spark)
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    rev = cents(F.col("l_extendedprice")) * (
        F.lit(100) - cents(F.col("l_discount"))
    )
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .agg(
            (
                F.lit(100.0) * promo.cast("double") / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


SQL_TPCH_Q14ISH = f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN {_sql_cents('l_extendedprice')}
                        * (100 - {_sql_cents('l_discount')})
                   ELSE 0 END) AS DOUBLE)
       / CAST(sum({_sql_cents('l_extendedprice')}
                  * (100 - {_sql_cents('l_discount')})) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


SQL_TPCH_Q10ISH = f"""
SELECT c_custkey, c_name, n_name,
       sum({_sql_cents('l_extendedprice')}
           * (100 - {_sql_cents('l_discount')})) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): SEMI join — orders from
    1995Q1 having at least one lineitem shipped after the order date,
    counted by priority. Exercises the left-semi join strategy (the one
    §2.3 join flavor the suite didn't yet pin); the EXISTS never
    duplicates orders no matter how many lineitems match."""
    o = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _lineitem(spark, sf_dir)
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .transform(final_order, "o_orderpriority")
    )


SQL_TPCH_Q4ISH = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts without matching activity): ANTI join —
    parts with NO 1995 shipment, counted by brand. Exercises the
    left-anti strategy."""
    p_ = _read(spark, sf_dir, "part")
    li95 = _lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    unshipped = p_.join(
        li95, F.col("l_partkey") == F.col("p_partkey"), "leftanti"
    )
    return (
        unshipped.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .transform(final_order, "p_brand")
    )


SQL_TPCH_Q16ISH = """
SELECT p_brand, count(*) AS n_parts
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey
                    AND l.l_shipdate >= TIMESTAMP '1995-01-01'
                    AND l.l_shipdate <  TIMESTAMP '1996-01-01')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Derived partsupp: the driver fixture ships no partsupp table, so the TPC-H
# shapes that need one (Q2/Q11/Q20) run on a DETERMINISTIC derivation both
# engines compute identically from `part` and the supplier COUNT — dbgen's
# own 4-suppliers-per-part assignment rule (integer arithmetic only;
# availqty/supplycost are integer mixes of the keys, exact in int64), with
# the oracle replaying the same CTE. This converts the "fixture-blocked"
# queries into oracle-checked coverage without synthesizing input data: the
# derivation is a pure function of the driver's tables.
# ---------------------------------------------------------------------------

_SQL_PARTSUPP_CTE = """ps AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey + i * (ns // 4 + p_partkey // ns)) % ns AS BIGINT)
           AS ps_suppkey,
         CAST((p_partkey * 7 + i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
         CAST((p_partkey * 31
               + ((p_partkey + i * (ns // 4 + p_partkey // ns)) % ns) * 17)
              % 100000 + 100 AS BIGINT) AS ps_supplycost_cents
  FROM part
  CROSS JOIN (SELECT count(*) AS ns FROM supplier)
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
)"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of the derived partsupp (see _SQL_PARTSUPP_CTE).
    The supplier count is a catalog-sized driver scalar (like the IVF
    training sample); everything else is a broadcast 4-row crossJoin —
    per-part work, no shuffle."""
    ns = _read(spark, sf_dir, "supplier").count()
    step = f"({ns} div 4 + p_partkey div {ns})"
    return (
        _read(spark, sf_dir, "part")
        .select("p_partkey")
        .crossJoin(F.broadcast(spark.range(4).select(F.col("id").alias("i"))))
        .selectExpr(
            "p_partkey AS ps_partkey",
            f"CAST((p_partkey + i * {step}) % {ns} AS BIGINT) AS ps_suppkey",
            "CAST((p_partkey * 7 + i * 11) % 9999 + 1 AS BIGINT)"
            " AS ps_availqty",
            f"CAST((p_partkey * 31 + ((p_partkey + i * {step}) % {ns}) * 17)"
            " % 100000 + 100 AS BIGINT) AS ps_supplycost_cents",
        )
    )


def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every small part
    (p_size <= 15), the EUROPE supplier(s) offering the region-wide
    minimum supply cost. Small dims broadcast; the per-part minimum is a
    groupBy + equi-join back (the correlated-subquery plan)."""
    ps = _partsupp(spark, sf_dir)
    s_ = _read(spark, sf_dir, "supplier")
    n_ = _read(spark, sf_dir, "nation")
    r_ = _read(spark, sf_dir, "region")
    p_ = _read(spark, sf_dir, "part")
    eligible = (
        ps.join(F.broadcast(s_), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r_), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    best = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("_mc")
    )
    return (
        eligible.join(best, "ps_partkey")
        .filter(F.col("ps_supplycost_cents") == F.col("_mc"))
        .join(
            F.broadcast(p_), F.col("p_partkey") == F.col("ps_partkey")
        )
        .filter(F.col("p_size") <= 15)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round(
                F.col("ps_supplycost_cents").cast("double") / F.lit(100.0), 2
            ).alias("supplycost"),
        )
        .transform(_final_order_wide, F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


SQL_TPCH_Q2ISH = f"""
WITH {_SQL_PARTSUPP_CTE},
eligible AS (
  SELECT ps.*, s_name, s_acctbal, n_name
  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT ps_partkey, min(ps_supplycost_cents) AS mc FROM eligible GROUP BY 1
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
       round(CAST(e.ps_supplycost_cents AS DOUBLE) / 100.0, 2) AS supplycost
FROM eligible e
JOIN best b ON e.ps_partkey = b.ps_partkey AND e.ps_supplycost_cents = b.mc
JOIN part p ON p.p_partkey = e.ps_partkey
WHERE p.p_size <= 15
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
"""


def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    (supplycost x availqty, exact int64 cents) over ASIA suppliers,
    keeping parts whose value exceeds 2x the mean part value — the
    threshold compares integers cross-multiplied (value x n > 2 x total),
    no float rank. The grand total is a 1-row broadcast."""
    ps = _partsupp(spark, sf_dir)
    s_ = _read(spark, sf_dir, "supplier")
    n_ = _read(spark, sf_dir, "nation")
    r_ = _read(spark, sf_dir, "region")
    g = (
        ps.join(F.broadcast(s_), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r_), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("_vc")
        )
    )
    t = g.agg(
        F.sum("_vc").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .filter(F.col("_vc") * F.col("_n") > F.lit(2) * F.col("_total"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.round(F.col("_vc").cast("double") / F.lit(100.0), 2).alias(
                "value"
            ),
        )
        .transform(_final_order_wide, F.desc("value"), "p_partkey")
    )


SQL_TPCH_Q11ISH = f"""
WITH {_SQL_PARTSUPP_CTE},
g AS (
  SELECT ps_partkey, sum(ps_supplycost_cents * ps_availqty) AS vc
  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1
),
t AS (SELECT sum(vc) AS total, count(*) AS n FROM g)
SELECT g.ps_partkey AS p_partkey,
       round(CAST(g.vc AS DOUBLE) / 100.0, 2) AS value
FROM g CROSS JOIN t
WHERE g.vc * t.n > 2 * t.total
ORDER BY value DESC, p_partkey
"""


def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers): suppliers of 'ring'
    parts whose availqty exceeds half their own 1995 shipped quantity for
    that part — availqty doubled keeps the comparison in exact integers.
    The shipped aggregate shuffles lineitem once on (part, supp); part
    and supplier broadcast."""
    ps = _partsupp(spark, sf_dir)
    p_ = _read(spark, sf_dir, "part")
    s_ = _read(spark, sf_dir, "supplier")
    shipped = (
        _lineitem(spark, sf_dir)
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    return (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(p_), F.col("p_partkey") == F.col("ps_partkey"))
        .filter(
            F.col("p_name").like("%ring%")
            & (F.lit(2) * F.col("ps_availqty") > F.col("_qty"))
        )
        .join(F.broadcast(s_), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .transform(final_order, "s_suppkey")
    )


SQL_TPCH_Q20ISH = f"""
WITH {_SQL_PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY 1, 2
)
SELECT DISTINCT s_suppkey, s_name
FROM ps
JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
WHERE p_name LIKE '%ring%' AND 2 * ps_availqty > qty
ORDER BY s_suppkey
"""


def q_promql_absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`absent_over_time(purchase[3600s])` over a range extending two days
    past the fixture's data end: emits 1 for every query-grid hour with no
    matching samples (PromQL alerting's 'did the series stop reporting'
    primitive; the reference has no function vocabulary at all)."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "absent_over_time(purchase[3600s])",
        start_s=1704067200.0,   # 2024-01-01
        end_s=1706918400.0,     # 2024-02-03
        step_s=3600,
        cols=EV_CENTS,
    ).transform(
        _final_order_wide, "time_bucket"
    )


SQL_PROMQL_ABSENT_OVER_TIME = f"""
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-02-03 00:00:00',
                                INTERVAL 1 HOUR)) AS time_bucket
),
present AS (
  SELECT DISTINCT {_sql_bucket(3600)} AS tb FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-03 00:00:00'
)
SELECT g.time_bucket, CAST(1.0 AS DOUBLE) AS value
FROM grid g LEFT JOIN present p ON p.tb = g.time_bucket
WHERE p.tb IS NULL
ORDER BY 1
"""


def q_maint_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order interleave over (user_id, value_cents) on a 16-bit
    grid — the clustering key ``write_zordered`` sorts by (executing the
    adaptive recommender's 'range' advice; the reference recommends
    Z-ORDER but never rewrites). Masked inputs keep this oracle-exact;
    the production path rank-normalizes first."""
    from cardinalsin_spark.operators.compaction import zorder_key

    ev = _events_cents(spark, sf_dir)
    mask = (1 << 16) - 1
    return (
        ev.select(
            "event_id",
            zorder_key(
                F.col("user_id").bitwiseAND(F.lit(mask)).cast("long"),
                F.col("value_cents").bitwiseAND(F.lit(mask)).cast("long"),
            ).alias("zkey"),
        )
        .orderBy("zkey", "event_id")
        .limit(500)
    )


def _sql_maint_zorder() -> str:
    from cardinalsin_spark.operators.compaction import sql_zorder_key

    return f"""
SELECT event_id, {sql_zorder_key('(user_id & 65535)',
                                 f'({_sql_cents("value")} & 65535)')} AS zkey
FROM events
ORDER BY zkey, event_id
LIMIT 500
"""


SQL_MAINT_ZORDER_KEY = _sql_maint_zorder()


def q_promql_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_over_time(rate(purchase[300s])[3600s:300s])`: PromQL subquery —
    the inner faithful rate evaluated at 5-min resolution, the outer max
    over each hour's inner points (tumbling two-level evaluation; beyond
    the reference's grammar entirely). max is order-free over floats, so
    the chain stays engine-deterministic."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "max_over_time(rate(purchase[300s])[3600s:300s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=3600,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value") / F.lit(100.0), 6).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_SUBQUERY_MAX_RATE = f"""
WITH filtered AS (
  SELECT ts, event_type, CAST(user_id AS VARCHAR) AS user_id,
         {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
deltas AS (
  SELECT ts, event_type, user_id, vc,
         lag(vc) OVER (PARTITION BY event_type, user_id ORDER BY ts) AS prev
  FROM filtered
),
inner_rate AS (
  SELECT {_sql_bucket(300)} AS tb, event_type, user_id,
         sum(CASE WHEN prev IS NULL THEN NULL
                  WHEN vc >= prev THEN vc - prev
                  ELSE vc END) / 300.0 AS v
  FROM deltas GROUP BY 1, 2, 3
)
SELECT {_sql_bucket(3600, 'tb')} AS time_bucket, event_type, user_id,
       round(max(v) / 100.0, 6) AS value
FROM inner_rate GROUP BY 1, 2, 3
"""


def q_promql_subquery_outer_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`increase(purchase[1d:6h])`: range FUNCTION over a subquery — the
    inner default range (avg per 6h bucket) feeds the reference's MAX−MIN
    increase per 1d outer window (two-level tumbling evaluation; the
    outer-fn direction of `promql_subquery_max_rate`). max/min are
    order-free, one subtraction + one division → engine-deterministic."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "increase(purchase[1d:6h])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_SUBQUERY_OUTER_RATE = f"""
WITH filtered AS (
  SELECT ts, event_type, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
inner_avg AS (
  SELECT {_sql_bucket(21600)} AS tb, event_type, avg(vc) AS v
  FROM filtered GROUP BY 1, 2
)
SELECT {_sql_bucket(86400, 'tb')} AS time_bucket, event_type,
       round((max(v) - min(v)) / 100.0, 6) AS value
FROM inner_avg GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_promql_instant_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_over_time(purchase[2d:6h])` as an INSTANT query at a pinned
    eval time: the inner default range evaluates on the 6h grid over the
    closed [T−2d, T] window, then collapses to one sample per series
    (round-8 grammar: subqueries in both query modes). Inner avgs are
    single divisions of exact-int sums; the outer max is order-free, so
    the chain stays engine-deterministic."""
    from cardinalsin_spark.operators.promql import promql_instant

    df = promql_instant(
        _events_promql(spark, sf_dir),
        "max_over_time(purchase[2d:6h])",
        time_s=1704931200.0,  # 2024-01-11 00:00:00 UTC
        cols=EV_CENTS,
    )
    return df.select(
        "event_type", F.round(F.col("value") / 100.0, 6).alias("value")
    ).transform(
        final_order, "event_type"
    )


SQL_PROMQL_INSTANT_SUBQUERY = f"""
WITH filtered AS (
  SELECT ts, event_type, {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-09 00:00:00'
    AND ts <= TIMESTAMP '2024-01-11 00:00:00'
),
inner_avg AS (
  SELECT {_sql_bucket(21600)} AS tb, event_type, avg(vc) AS v
  FROM filtered GROUP BY 1, 2
)
SELECT event_type, round(max(v) / 100.0, 6) AS value
FROM inner_avg GROUP BY 1 ORDER BY 1
"""


def q_promql_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`quantile_over_time(0.9, purchase[1d])`: per-SERIES interpolated
    quantile over each bucket's samples (the per-series twin of the
    cross-series `quantile` aggregation; beyond the reference's grammar).
    Exact integer cents in, one interpolation chain out."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        'quantile_over_time(0.9, purchase{user_id=~".+"}[86400s])',
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=86400,
        cols=EV_CENTS,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        F.round(F.col("value") / F.lit(100.0), 4).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_QUANTILE_OVER_TIME = f"""
SELECT {_sql_bucket(86400)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       round(quantile_cont({_sql_cents('value')}, 0.9) / 100.0, 4) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`holt_winters(view[3600s], 0.3, 0.3)` through the transpiler:
    double exponential smoothing per (bucket, series), cents-exact inputs
    so the float recursion chains identically across engines."""
    from cardinalsin_spark.operators.promql import promql_range

    df = promql_range(
        _events_promql(spark, sf_dir),
        "holt_winters(view[3600s], 0.3, 0.3)",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=3600,
        cols=EV_CENTS,
        faithful=True,
    )
    return df.select(
        "time_bucket",
        "event_type",
        "user_id",
        (F.col("value") / F.lit(100.0)).alias("value"),
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_HOLT_WINTERS = f"""
WITH RECURSIVE filtered AS (
  SELECT ts, epoch_ns(ts) AS tns, event_type,
         CAST(user_id AS VARCHAR) AS user_id,
         CAST({_sql_cents('value')} AS DOUBLE) AS vc
  FROM events
  WHERE event_type = 'view'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
vals AS (
  SELECT {_sql_bucket(3600)} AS time_bucket, event_type, user_id,
         list(vc ORDER BY tns, vc) AS vs, count(*) AS n
  FROM filtered GROUP BY 1, 2, 3 HAVING count(*) >= 2
),
steps AS (
  SELECT time_bucket, event_type, user_id, vs, n, 1 AS i,
         CAST(0 AS DOUBLE) AS s0, vs[1] AS s1, vs[2] - vs[1] AS tr
  FROM vals
  UNION ALL
  SELECT time_bucket, event_type, user_id, vs, n, i + 1,
         s1,
         (0.3 * vs[CAST(i + 1 AS INT)])
           + (0.7 * (s1 + CASE WHEN i = 1 THEN tr
                          ELSE (0.3 * (s1 - s0)) + (0.7 * tr) END)),
         CASE WHEN i = 1 THEN tr ELSE (0.3 * (s1 - s0)) + (0.7 * tr) END
  FROM steps WHERE i < n
)
SELECT time_bucket, event_type, user_id, s1 / 100.0 AS value
FROM steps WHERE i = n
ORDER BY time_bucket, event_type, user_id
"""


def q_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL holt_winters (double exponential smoothing, upstream
    promql/functions.go recursion; the reference AVG-degrades it) per
    hour bucket per metric."""
    from cardinalsin_spark.operators.timeseries import holt_winters_bucketed

    return holt_winters_bucketed(
        _events(spark, sf_dir), 3600, sf=0.3, tf=0.3, cols=EV
    ).transform(final_order, "bucket", "event_type")


# The DuckDB oracle replays the same sequential recursion as a RECURSIVE
# CTE — one row per (group, step), step i+1 computed from step i's
# (s0, s1, tr) with the identical float-op chain, CASE i=1 keeping the
# seed trend (upstream calcTrendValue(0)). A list_reduce struct
# accumulator would be the natural fold, but DuckDB 1.0 aliases
# accumulator fields while evaluating the struct literal (acc.b read in
# one field sees another field's just-computed value), silently breaking
# any multi-component fold — verified against a Python replay.
SQL_TS_HOLT_WINTERS = f"""
WITH RECURSIVE vals AS (
  SELECT {_sql_bucket(3600)} AS bucket, event_type,
         list(value ORDER BY epoch_ns(ts), value) AS vs,
         count(*) AS n
  FROM events GROUP BY 1, 2 HAVING count(*) >= 2
),
steps AS (
  SELECT bucket, event_type, vs, n, 1 AS i,
         CAST(0 AS DOUBLE) AS s0, vs[1] AS s1, vs[2] - vs[1] AS tr
  FROM vals
  UNION ALL
  SELECT bucket, event_type, vs, n, i + 1,
         s1,
         (0.3 * vs[CAST(i + 1 AS INT)])
           + (0.7 * (s1 + CASE WHEN i = 1 THEN tr
                          ELSE (0.3 * (s1 - s0)) + (0.7 * tr) END)),
         CASE WHEN i = 1 THEN tr ELSE (0.3 * (s1 - s0)) + (0.7 * tr) END
  FROM steps WHERE i < n
)
SELECT bucket, event_type, s1 AS hw FROM steps WHERE i = n
ORDER BY bucket, event_type
"""


def q_ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average per (event_type, day) — TimescaleDB's
    ``time_weight('LOCF')`` resampling for irregular series (plain AVG
    over-weights bursts). Integral in exact cents·µs int64, one float
    division per row (operators.timeseries.time_weighted_avg)."""
    from cardinalsin_spark.operators.timeseries import time_weighted_avg

    return time_weighted_avg(
        _events_cents(spark, sf_dir), 86_400, cols=EV_CENTS
    ).transform(final_order, "time_bucket", "event_type")


SQL_TS_TIME_WEIGHTED_AVG = f"""
WITH staged AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS _b,
         epoch_us(ts) AS _us,
         {_sql_cents('value')} AS vc,
         coalesce(
           lead(epoch_us(ts)) OVER (
             PARTITION BY event_type, epoch_us(ts) // 86400000000
             ORDER BY ts, {_sql_cents('value')}),
           (epoch_us(ts) // 86400000000 + 1) * 86400000000) AS _next_us
  FROM events
)
SELECT event_type,
       TIMESTAMP '1970-01-01'
         + INTERVAL (CAST(_b * 86400 AS BIGINT)) SECOND AS time_bucket,
       CAST(CAST(sum(vc * (_next_us - _us)) AS BIGINT) AS DOUBLE)
         / ((_b + 1) * 86400000000 - min(_us)) AS twa
FROM staged GROUP BY event_type, _b
ORDER BY time_bucket, event_type
"""


def q_ts_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: count and exact-cents mean value per
    (day-of-week, event_type) — the baseline shape behind the seasonal
    residual query. Day-of-week by pure epoch arithmetic (epoch day 0 =
    Thursday → +4 mod 7, 0 = Sunday), one aggregation."""
    ev = _events_cents(spark, sf_dir)
    dow = F.pmod(
        F.expr("unix_micros(ts) div 86400000000") + F.lit(4), F.lit(7)
    )
    return (
        ev.groupBy(dow.cast("long").alias("day_of_week"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("value_cents").cast("double")
                / F.count(F.lit(1))
                / F.lit(100.0)
            ).alias("mean_value"),
        )
        .transform(final_order, "day_of_week", "event_type")
    )


SQL_TS_WEEKDAY_PROFILE = f"""
SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS day_of_week, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_sql_cents('value')}) AS BIGINT)
         / CAST(count(*) AS DOUBLE) / 100.0 AS mean_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn-down per day (target 99% non-error events):
    running error/total counts via cumulative windows, budget consumed =
    cum_err/(0.01·cum_total) as the exact ratio 100·cum_err/cum_total —
    the month-to-date view next to ts_burn_rate's instantaneous one.
    Integer running sums on ONE global-ordered window pair (day grain —
    ~30 rows; the window is over the daily aggregate, not raw events)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(time_bucket(F.col("ts"), 86_400).alias("day"))
        .agg(
            F.sum((F.col("event_type") == "error").cast("long")).alias("err"),
            F.count(F.lit(1)).alias("total"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("cum_err", F.sum("err").over(w))
        .withColumn("cum_total", F.sum("total").over(w))
        .select(
            "day",
            "err",
            "total",
            "cum_err",
            "cum_total",
            (
                F.lit(100) * F.col("cum_err").cast("double")
                / F.col("cum_total")
            ).alias("budget_consumed_frac"),
        )
        .transform(_final_order_wide, "day")
    )


SQL_TS_ERROR_BUDGET = f"""
WITH daily AS (
  SELECT {_sql_bucket(86400)} AS day,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err,
         CAST(count(*) AS BIGINT) AS total
  FROM events GROUP BY 1
)
SELECT day, err, total,
       CAST(sum(err) OVER w AS BIGINT) AS cum_err,
       CAST(sum(total) OVER w AS BIGINT) AS cum_total,
       100 * CAST(sum(err) OVER w AS BIGINT)
         / CAST(CAST(sum(total) OVER w AS BIGINT) AS DOUBLE)
         AS budget_consumed_frac
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def q_ts_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex score per hour treating `value` as a latency: satisfied
    (≤ T), tolerating (≤ 4T), frustrated; score = (sat + tol/2)/total —
    the canonical SRE user-satisfaction index. Integer counts in one
    conditional aggregation; the half-weight stays exact by scoring in
    doubled units (2·sat + tol over 2·total)."""
    ev = _events_cents(spark, sf_dir)
    t_cents = 50_00  # T = 50.00
    sat = (F.col("value_cents") <= t_cents).cast("long")
    tol = (
        (F.col("value_cents") > t_cents)
        & (F.col("value_cents") <= 4 * t_cents)
    ).cast("long")
    return (
        ev.groupBy(time_bucket(F.col("ts"), 3600).alias("hour"))
        .agg(
            F.sum(sat).alias("n_sat"),
            F.sum(tol).alias("n_tol"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "hour",
            "n_sat",
            "n_tol",
            "n_total",
            (
                (F.lit(2) * F.col("n_sat") + F.col("n_tol")).cast("double")
                / (F.lit(2) * F.col("n_total"))
            ).alias("apdex"),
        )
        .transform(final_order, "hour")
    )


SQL_TS_APDEX = f"""
SELECT hour, n_sat, n_tol, n_total,
       CAST(2 * n_sat + n_tol AS DOUBLE) / (2 * n_total) AS apdex
FROM (
  SELECT {_sql_bucket(3600)} AS hour,
         CAST(sum(CASE WHEN {_sql_cents('value')} <= 5000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
         CAST(sum(CASE WHEN {_sql_cents('value')} > 5000
                   AND {_sql_cents('value')} <= 20000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_tol,
         CAST(count(*) AS BIGINT) AS n_total
  FROM events GROUP BY 1
) ORDER BY hour
"""


def q_ts_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type — the scrape/ingest
    health view a TSDB operator reads (mean/median/max gap, stall count):
    one lag window for the µs deltas, one aggregation. Exact integer
    gaps; the mean is sum·n with a single division; the median is the
    exact interpolated percentile both engines share."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    staged = (
        ev.select("event_type", "ts", "event_id")
        .withColumn(
            "_gap_us",
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w),
        )
        .filter(F.col("_gap_us").isNotNull())
    )
    return (
        staged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("_gap_us").cast("double") / F.count(F.lit(1)) / 1e6).alias(
                "mean_gap_s"
            ),
            (F.expr("percentile(_gap_us, 0.5)") / F.lit(1e6)).alias(
                "median_gap_s"
            ),
            (F.max("_gap_us").cast("double") / F.lit(1e6)).alias("max_gap_s"),
            F.sum((F.col("_gap_us") > 3_600_000_000).cast("long")).alias(
                "n_stalls_1h"
            ),
        )
        .transform(final_order, "event_type")
    )


SQL_TS_GAP_STATS = """
WITH staged AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS _gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(_gap_us) AS BIGINT) / CAST(count(*) AS DOUBLE) / 1000000.0
         AS mean_gap_s,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY _gap_us) / 1000000.0
         AS median_gap_s,
       CAST(max(_gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s,
       CAST(sum(CASE WHEN _gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stalls_1h
FROM staged WHERE _gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per (event_type, day): Pearson r over
    consecutive sample pairs — the persistence diagnostic behind
    seasonal/trend modeling. Sums are exact int64 on the cents grid;
    the only float steps are the final int64→double conversions, two
    IEEE-correctly-rounded sqrts (the libm-safe function, unlike exp/ln)
    and one division — deterministic across engines. One lag window +
    one aggregation on a shared (type, day) shuffle; groups without
    variance are filtered (r undefined)."""
    ev = _events_cents(spark, sf_dir)
    day = time_bucket(F.col("ts"), 86_400)
    w = Window.partitionBy("event_type", "_day").orderBy("ts", "event_id")
    staged = (
        ev.withColumn("_day", day)
        .withColumn("_x", F.col("value_cents"))
        .withColumn("_y", F.lag("value_cents").over(w))
        .filter(F.col("_y").isNotNull())
    )
    agg = staged.groupBy("event_type", "_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    # moment products on DECIMAL(38,0): n·Σx² passes 2^63 at a few
    # thousand samples per group at |v| ~ 1e6 cents — int64 would wrap
    # silently (the deriv/zscore overflow class fixed earlier this round)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vx = dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))
    vy = dec(F.col("n")) * dec(F.col("syy")) - dec(F.col("sy")) * dec(F.col("sy"))
    num = dec(F.col("n")) * dec(F.col("sxy")) - dec(F.col("sx")) * dec(F.col("sy"))
    return (
        agg.filter((F.col("n") >= 2) & (vx > 0) & (vy > 0))
        .select(
            "event_type",
            F.col("_day").alias("day"),
            F.col("n").cast("long").alias("n_pairs"),
            (
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).alias("r1"),
        )
        .transform(final_order, "day", "event_type")
    )


SQL_TS_AUTOCORR_LAG1 = f"""
WITH staged AS (
  SELECT event_type, {_sql_bucket(86400)} AS day,
         {_sql_cents('value')} AS _x,
         lag({_sql_cents('value')}) OVER (
           PARTITION BY event_type, {_sql_bucket(86400)}
           ORDER BY ts, event_id) AS _y
  FROM events
),
agg AS (
  SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(_x) AS BIGINT) AS sx, CAST(sum(_y) AS BIGINT) AS sy,
         CAST(sum(_x * _x) AS BIGINT) AS sxx,
         CAST(sum(_y * _y) AS BIGINT) AS syy,
         CAST(sum(_x * _y) AS BIGINT) AS sxy
  FROM staged WHERE _y IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, day, n AS n_pairs,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS r1
FROM agg
WHERE n >= 2 AND CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
  AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
ORDER BY day, event_type
"""


def q_ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation click→purchase at hourly lags 0-3: Pearson r
    between the hourly click count and the purchase count ``lag`` hours
    later — the lead-indicator scan behind attribution dashboards. The
    lag dimension is an exploded literal array (one plan, four lags, no
    per-lag re-scan); counts and moment sums are exact int64; the float
    path is the same sqrt-only chain as ts_autocorr_lag1."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            time_bucket(F.col("ts"), 3600).alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    clicks = hourly.filter(F.col("event_type") == "click").select(
        "hour", F.col("n").alias("_x")
    )
    purchases = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("hour").alias("_ph"), F.col("n").alias("_y")
    )
    lagged = clicks.select(
        "*", F.explode(F.array(*[F.lit(l) for l in range(4)])).alias("lag_h")
    ).withColumn(
        "_target_hour",
        F.col("hour") + F.col("lag_h") * F.expr("INTERVAL 1 HOUR"),
    )
    joined = lagged.join(
        purchases, F.col("_target_hour") == F.col("_ph")
    )
    agg = joined.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731  (see autocorr)
    vx = dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))
    vy = dec(F.col("n")) * dec(F.col("syy")) - dec(F.col("sy")) * dec(F.col("sy"))
    num = dec(F.col("n")) * dec(F.col("sxy")) - dec(F.col("sx")) * dec(F.col("sy"))
    return (
        agg.filter((vx > 0) & (vy > 0))
        .select(
            F.col("lag_h").cast("long").alias("lag_h"),
            F.col("n").cast("long").alias("n_pairs"),
            (
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).alias("r"),
        )
        .transform(final_order, "lag_h")
    )


SQL_TS_CROSSCORR = f"""
WITH hourly AS (
  SELECT {_sql_bucket(3600)} AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
clicks AS (SELECT hour, n AS _x FROM hourly WHERE event_type = 'click'),
purchases AS (SELECT hour AS _ph, n AS _y FROM hourly
              WHERE event_type = 'purchase'),
lagged AS (
  SELECT c.hour, c._x, l.lag_h,
         c.hour + to_hours(l.lag_h) AS _target_hour
  FROM clicks c CROSS JOIN (
    SELECT unnest([0, 1, 2, 3]) AS lag_h) l
),
agg AS (
  SELECT lag_h,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(_x) AS BIGINT) AS sx, CAST(sum(_y) AS BIGINT) AS sy,
         CAST(sum(_x * _x) AS BIGINT) AS sxx,
         CAST(sum(_y * _y) AS BIGINT) AS syy,
         CAST(sum(_x * _y) AS BIGINT) AS sxy
  FROM lagged JOIN purchases ON _target_hour = _ph
  GROUP BY 1
)
SELECT CAST(lag_h AS BIGINT) AS lag_h, n AS n_pairs,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS r
FROM agg
WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
  AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
ORDER BY lag_h
"""


def q_ts_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile assignment per event type, rolled up to quartile
    boundaries (min/max/count per quartile) — the ranking-window frame
    family (`ntile`) the suite hadn't pinned. ntile's uneven-bucket rule
    (earlier buckets get the remainder) is identical in Spark and DuckDB;
    ties are made deterministic by the (value, event_id) ordering."""
    ev = _events_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value_cents"), F.col("event_id")
    )
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.min("value_cents").alias("lo_cents"),
            F.max("value_cents").alias("hi_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .transform(final_order, "event_type", "quartile")
    )


SQL_TS_VALUE_QUARTILES = f"""
SELECT event_type, quartile,
       CAST(min(vc) AS BIGINT) AS lo_cents,
       CAST(max(vc) AS BIGINT) AS hi_cents,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT event_type, {_sql_cents('value')} AS vc,
         CAST(ntile(4) OVER (PARTITION BY event_type
                             ORDER BY {_sql_cents('value')}, event_id)
              AS INT) AS quartile
  FROM events
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle downsampling per (day, event_type): first/last by
    (ts, event_id) via two row_number orders on ONE partition shuffle,
    high/low/count as plain aggregates — all exact integer cents. The
    classic gauge→candlestick rollup a dashboarding layer asks of a
    metrics store."""
    ev = _events_cents(spark, sf_dir).select(
        time_bucket("ts", 86400).alias("day"),
        "event_type",
        "ts",
        "event_id",
        "value_cents",
    )
    w_a = Window.partitionBy("day", "event_type").orderBy("ts", "event_id")
    w_d = Window.partitionBy("day", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_ra", F.row_number().over(w_a))
        .withColumn("_rd", F.row_number().over(w_d))
        .groupBy("day", "event_type")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value_cents"))).alias(
                "open_cents"
            ),
            F.max("value_cents").alias("high_cents"),
            F.min("value_cents").alias("low_cents"),
            F.max(F.when(F.col("_rd") == 1, F.col("value_cents"))).alias(
                "close_cents"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .transform(final_order, "day", "event_type")
    )


SQL_TS_OHLC = f"""
WITH ev AS (
  SELECT {_sql_bucket(86400)} AS day, event_type, ts, event_id,
         {_sql_cents('value')} AS vc
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY day, event_type
                               ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY day, event_type
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM ev
)
SELECT day, event_type,
       max(CASE WHEN ra = 1 THEN vc END) AS open_cents,
       max(vc) AS high_cents,
       min(vc) AS low_cents,
       max(CASE WHEN rd = 1 THEN vc END) AS close_cents,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: daily event counts in wide form. The category
    list is PINNED (no hidden distinct pre-scan — Spark's pivot without
    values runs one), so the plan is a single hash aggregate; absent
    cells fill 0 like the oracle's conditional counts."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(time_bucket("ts", 86400).alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
        .na.fill(0, _PIVOT_TYPES)
        .transform(final_order, "day")
    )


SQL_SQL_PIVOT = f"""
SELECT {_sql_bucket(86400)} AS day,
       {", ".join(
           f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
           for t in _PIVOT_TYPES
       )}
FROM events GROUP BY 1 ORDER BY 1
"""


def q_ts_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorized mean per event type: clamp at the p05/p95
    order statistics (percentile_disc semantics — exact integer cents, no
    interpolation) and report clipped-tail counts. Robust-mean
    preprocessing for outlier-heavy gauges."""
    from cardinalsin_spark.operators.timeseries import winsorize_stats

    return winsorize_stats(_events_cents(spark, sf_dir)).transform(
        final_order, "event_type"
    )


SQL_TS_WINSORIZE = f"""
WITH ranked AS (
  SELECT event_type, event_id, {_sql_cents('value')} AS vc,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {_sql_cents('value')}, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         max(CASE WHEN rn <= (5 * n + 99) // 100 THEN vc END) AS lo_cents,
         max(CASE WHEN rn <= (95 * n + 99) // 100 THEN vc END) AS hi_cents
  FROM ranked GROUP BY 1
)
SELECT r.event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(lo_cents) AS lo_cents,
       min(hi_cents) AS hi_cents,
       CAST(sum(least(greatest(vc, lo_cents), hi_cents)) AS BIGINT)
         AS win_sum_cents,
       CAST(count(*) FILTER (WHERE vc < lo_cents) AS BIGINT) AS n_clipped_lo,
       CAST(count(*) FILTER (WHERE vc > hi_cents) AS BIGINT) AS n_clipped_hi,
       round(CAST(sum(least(greatest(vc, lo_cents), hi_cents)) AS DOUBLE)
             / count(*) / 100.0, 4) AS win_mean
FROM ranked r JOIN bounds USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_ts_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly residual: each (event_type, hour) bucket's
    summed value minus the SAME bucket 24h earlier (the simplest seasonal
    baseline; what dashboards paint as day-over-day deltas). One
    aggregation + one self-equi-join on the shifted bucket key — the
    shift is exact integer seconds, so the join stays a plain hash join
    (broadcast at these sizes, co-partitioned at scale)."""
    ev = _events_cents(spark, sf_dir)
    hourly = ev.groupBy(
        time_bucket(F.col("ts"), 3600).alias("hour"), "event_type"
    ).agg(F.sum("value_cents").alias("vc"))
    prev = hourly.select(
        (F.col("hour") + F.expr("INTERVAL 24 HOURS")).alias("hour"),
        F.col("event_type"),
        F.col("vc").alias("vc_prev"),
    )
    return (
        hourly.join(prev, ["hour", "event_type"])
        .select(
            "hour",
            "event_type",
            ((F.col("vc") - F.col("vc_prev")) / F.lit(100.0)).alias(
                "residual"
            ),
        )
        .transform(_final_order_wide, "hour", "event_type")
    )


SQL_TS_SEASONAL_RESIDUAL = f"""
WITH hourly AS (
  SELECT {_sql_bucket(3600)} AS hour, event_type,
         CAST(sum({_sql_cents('value')}) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
)
SELECT c.hour, c.event_type, (c.vc - p.vc) / 100.0 AS residual
FROM hourly c
JOIN hourly p ON p.hour = c.hour - INTERVAL 24 HOUR
             AND p.event_type = c.event_type
ORDER BY 1, 2
"""


def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 market-share shape: a chosen nation's share of total
    revenue per order-year — the share is a conditional-sum / sum ratio
    inside ONE aggregation (no self-join of two revenue queries), on the
    exact-cents grid with a single final division."""
    t = {
        n: _read(spark, sf_dir, n)
        for n in ("lineitem", "orders", "supplier", "nation")
    }
    rev = cents(F.col("l_extendedprice")) * (
        F.lit(100) - cents(F.col("l_discount"))
    )
    is_target = F.col("n_name") == "NATION_3"
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(is_target, rev).otherwise(F.lit(0))).alias("_nat"),
            F.sum(rev).alias("_tot"),
        )
        .select(
            "o_year",
            (F.col("_nat").cast("double") / F.col("_tot")).alias("mkt_share"),
        )
        .transform(final_order, "o_year")
    )


SQL_TPCH_Q8ISH = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CASE WHEN n_name = 'NATION_3'
                     THEN {_sql_cents('l_extendedprice')}
                          * (100 - {_sql_cents('l_discount')})
                     ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(sum({_sql_cents('l_extendedprice')}
                    * (100 - {_sql_cents('l_discount')})) AS BIGINT)
         AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per event type (Page 1954), daily report:
    target k = 55.00, alarm threshold h = 5000.00 (cents grid). The
    sequential recursion is closed-formed into two stacked windows via
    the reflection identity — see operators.timeseries.cusum_alarm."""
    from cardinalsin_spark.operators.timeseries import cusum_alarm

    return cusum_alarm(
        _events_cents(spark, sf_dir),
        k_units=5_500,
        h_units=500_000,
        bucket_seconds=86_400,
        cols=EV_CENTS,
        tiebreak=["event_id"],
    ).transform(final_order, "time_bucket", "event_type")


SQL_TS_CUSUM = f"""
WITH staged AS (
  SELECT event_type, ts, event_id,
         sum({_sql_cents('value')} - 5500) OVER w AS _p
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT event_type, ts, event_id,
         _p - least(CAST(0 AS BIGINT), min(_p) OVER w) AS _s
  FROM staged
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, {_sql_bucket(86400)} AS time_bucket,
       CAST(max(_s) AS BIGINT) AS max_cusum,
       CAST(sum(CASE WHEN _s > 500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm,
       CAST(last(_s ORDER BY ts, event_id) AS BIGINT) AS final_cusum
FROM s GROUP BY 1, 2 ORDER BY time_bucket, event_type
"""


def q_promql_present_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`present_over_time(purchase[3600s])`: 1 per grid bucket holding any
    matching sample — absent_over_time's positive complement, evaluated
    per series (one groupBy, min(1) literal)."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "present_over_time(purchase[3600s])",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1704240000.0,    # 2024-01-03
        step_s=3600,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_PRESENT_OVER_TIME = f"""
SELECT {_sql_bucket(3600)} AS time_bucket, event_type,
       CAST(1 AS DOUBLE) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1, 2
"""


def q_ts_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE multi-window burn rate (the Google SRE workbook alert shape):
    per hour, the error fraction over the FULL hour and over the hour's
    LAST 5 MINUTES — both from ONE conditional aggregation pass (no self-
    join of two rate queries; the short window is a CASE on the µs offset
    within the hour). Integer counts, two final divisions; hours with an
    empty short window emit NULL short_ratio (no fabricated zero)."""
    ev = _events(spark, sf_dir)
    off_us = F.unix_micros(F.col("ts")) % F.lit(3_600_000_000)
    in_short = off_us >= F.lit(3_300_000_000)
    is_err = F.col("event_type") == "error"
    agg = (
        ev.select(
            time_bucket(F.col("ts"), 3600).alias("hour"),
            is_err.cast("long").alias("err"),
            in_short.cast("long").alias("short"),
        )
        .groupBy("hour")
        .agg(
            F.sum("err").alias("err_n"),
            F.count(F.lit(1)).alias("tot_n"),
            F.sum(F.col("err") * F.col("short")).alias("err_s"),
            F.sum("short").alias("tot_s"),
        )
    )
    return agg.select(
        "hour",
        (F.col("err_n").cast("double") / F.col("tot_n")).alias("long_ratio"),
        F.when(
            F.col("tot_s") > 0,
            F.col("err_s").cast("double") / F.col("tot_s"),
        ).alias("short_ratio"),
        "err_n",
        "tot_n",
        "tot_s",
    ).transform(final_order, "hour")


SQL_TS_BURN_RATE = f"""
SELECT hour,
       CAST(err_n AS DOUBLE) / tot_n AS long_ratio,
       CASE WHEN tot_s > 0 THEN CAST(err_s AS DOUBLE) / tot_s END
         AS short_ratio,
       err_n, tot_n, tot_s
FROM (
  SELECT {_sql_bucket(3600)} AS hour,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err_n,
         CAST(count(*) AS BIGINT) AS tot_n,
         CAST(sum(CASE WHEN event_type = 'error'
                   AND epoch_us(ts) % 3600000000 >= 3300000000
                   THEN 1 ELSE 0 END) AS BIGINT) AS err_s,
         CAST(sum(CASE WHEN epoch_us(ts) % 3600000000 >= 3300000000
                   THEN 1 ELSE 0 END) AS BIGINT) AS tot_s
  FROM events GROUP BY 1
) ORDER BY hour
"""


def q_ts_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per (event_type, day): the robust outlier
    scale measure (`mad_over_time` in recent PromQL; z-score's breakdown-
    resistant sibling). GRID-BOUNDED single-pass shape (OPTIMIZATION r15,
    VERDICT r14 item 4): one map-side-combinable count per (day,
    event_type, cents value) — the only full-stream shuffle, carrying
    grid-sized partial counts — then a grid-sized MAD aggregate
    (operators/promql._mad_grid_expr: sorted (value, count) pairs, two
    cumulative-count rank walks for the median, re-sort of the integral
    doubled deviations, two more walks). Replaces r14's
    ``collect_list``-per-group form, whose aggregation buffer grew with
    GROUP ROW COUNT — at 100 TB a hot (event_type, day) is billions of
    rows in one buffer; the grid buffer is bounded by DISTINCT cents
    values. Bit-equal to both prior forms: on the integer cents grid
    every median is a sum of two ≤2^52 ints halved and every
    |v − med| a multiple of 0.5 — all intermediates exact dyadic doubles
    (tests/test_r15_equivalence.py pins grid == collect_list ==
    percentile/join)."""
    from cardinalsin_spark.operators.promql import _mad_grid_expr

    ev = _events_cents(spark, sf_dir)
    day = time_bucket(F.col("ts"), 86_400)
    base = ev.select(
        day.alias("day"), "event_type", F.col("value_cents").alias("vc")
    )
    grid = base.groupBy("day", "event_type", "vc").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        grid.groupBy("day", "event_type")
        .agg(
            (F.expr(_mad_grid_expr("vc", "_c")) / F.lit(100.0)).alias("mad"),
            F.sum("_c").alias("n"),
        )
        .transform(final_order, "day", "event_type")
    )


SQL_TS_MAD = f"""
WITH base AS (
  SELECT {_sql_bucket(86400)} AS day, event_type,
         {_sql_cents('value')} AS vc
  FROM events
),
med AS (
  SELECT day, event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY vc)
           AS med
  FROM base GROUP BY 1, 2
)
SELECT b.day, b.event_type,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(b.vc - m.med)) / 100.0
         AS mad,
       CAST(count(*) AS BIGINT) AS n
FROM base b JOIN med m ON b.day = m.day AND b.event_type = m.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_promql_mad_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mad_over_time(view[3600s])` — the experimental upstream robust
    spread function, through the transpiler's range path: per-bucket
    median(|v − median|) on the exact cents grid (single collected-array
    aggregate, see operators/promql._mad_expr), ONE division back to
    currency units at the end."""
    from cardinalsin_spark.operators.promql import promql_range

    out = promql_range(
        _events_promql(spark, sf_dir),
        "mad_over_time(view[3600s])",
        start_s=1704067200.0,
        end_s=1706745600.0,
        step_s=3600,
        cols=EV_CENTS,
    )
    return out.withColumn("value", F.col("value") / F.lit(100.0)).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_MAD_OVER_TIME = f"""
WITH base AS (
  SELECT {_sql_bucket(3600)} AS time_bucket, event_type,
         {_sql_cents('value')} AS vc
  FROM events
  WHERE event_type = 'view'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
),
med AS (
  SELECT time_bucket, event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY vc) AS med
  FROM base GROUP BY 1, 2
)
SELECT b.time_bucket, b.event_type,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(b.vc - m.med)) / 100.0
         AS value
FROM base b
JOIN med m ON b.time_bucket = m.time_bucket AND b.event_type = m.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle downsampling (parallel-anchor variant of
    Steinarsson's LTTB): one chart-representative point per
    (event_type, hour), areas on exact integer µs×cents cross products
    (operators.timeseries.lttb_downsample)."""
    from cardinalsin_spark.operators.timeseries import lttb_downsample

    return lttb_downsample(
        _events_cents(spark, sf_dir), 3_600, cols=EV_CENTS
    ).transform(final_order, "ts", "event_type")


SQL_TS_LTTB = f"""
WITH staged AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS _b,
         epoch_us(ts) % 3600000000 AS _us,
         {_sql_cents('value')} AS _vc
  FROM events
),
pb AS (
  SELECT event_type, _b,
         CAST(sum(_us) AS BIGINT) AS _sx,
         CAST(sum(_vc) AS BIGINT) AS _sy,
         CAST(count(*) AS BIGINT) AS _n
  FROM staged GROUP BY 1, 2
),
anch AS (
  SELECT event_type, _b, _sx, _sy, _n,
    coalesce(lag(_sx) OVER w
             + (lag(_b) OVER w - _b) * 3600000000 * lag(_n) OVER w,
             _sx) AS _psx,
    coalesce(lag(_sy) OVER w, _sy) AS _psy,
    coalesce(lag(_n) OVER w, _n) AS _pn,
    coalesce(lead(_sx) OVER w
             + (lead(_b) OVER w - _b) * 3600000000 * lead(_n) OVER w,
             _sx) AS _nsx,
    coalesce(lead(_sy) OVER w, _sy) AS _nsy,
    coalesce(lead(_n) OVER w, _n) AS _nn
  FROM pb WINDOW w AS (PARTITION BY event_type ORDER BY _b)
),
scored AS (
  SELECT s.event_type, s._b, s._us, s._vc,
         abs( (CAST(s._us AS HUGEINT) * a._pn - a._psx)
              * (CAST(a._nsy AS HUGEINT) * a._pn
                 - CAST(a._psy AS HUGEINT) * a._nn)
            - (CAST(a._nsx AS HUGEINT) * a._pn
               - CAST(a._psx AS HUGEINT) * a._nn)
              * (CAST(s._vc AS HUGEINT) * a._pn - a._psy) ) AS area
  FROM staged s JOIN anch a ON s.event_type = a.event_type AND s._b = a._b
)
SELECT event_type, make_timestamp(_b * 3600000000 + _us) AS ts,
       _vc AS value_cents
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type, _b
    ORDER BY area DESC, _us DESC, _vc DESC) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY ts, event_type
"""


def q_ts_session_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join on interval overlap: user sessions (2h-gap sessionize)
    × error-spike incident windows (hours with ≥3 error events), counting
    incidents each session overlaps. Executed as the BINNED range join
    (operators.timeseries.interval_overlap_join) — explode to hour bins,
    equi-join, first-shared-bin dedup, exact residual — because Spark
    plans a raw inequality join as a nested-loop product (plan-tested
    here); the DuckDB oracle uses the plain overlap predicate, proving
    the binned plan is semantics-preserving."""
    from cardinalsin_spark.operators.timeseries import (
        interval_overlap_join,
        sessionize,
    )

    ev = _events(spark, sf_dir)
    sessions = sessionize(
        ev, 7200, key_cols=["user_id"], cols=EV,
        order_tiebreak=["event_id"], sort=False,
    ).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "session_start",
        "session_end",
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(time_bucket(F.col("ts"), 3600).alias("inc_start"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 3)
        .select(
            "inc_start",
            F.timestamp_micros(
                F.unix_micros(F.col("inc_start")) + F.lit(3_599_999_999)
            ).alias("inc_end"),
        )
    )
    overlaps = interval_overlap_join(
        sessions,
        incidents,
        "session_start",
        "session_end",
        "inc_start",
        "inc_end",
        bin_seconds=3600,
    )
    return (
        overlaps.groupBy("user_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n_incidents"))
        .transform(final_order, "user_id", "session_idx")
    )


SQL_TS_SESSION_INCIDENTS = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > 7200000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_idx
  FROM ordered
),
sessions AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY 1, 2
),
incidents AS (
  SELECT bucket AS inc_start,
         bucket + INTERVAL 3600 SECOND - INTERVAL 1 MICROSECOND AS inc_end
  FROM (
    SELECT {_sql_bucket(3600)} AS bucket, count(*) AS n
    FROM events WHERE event_type = 'error' GROUP BY 1
  ) WHERE n >= 3
)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_incidents
FROM sessions s JOIN incidents i
  ON s.session_start <= i.inc_end AND i.inc_start <= s.session_end
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_topk_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (PromQL `topk(3, ...) by (event_type)` semantics):
    the 3 highest-spending users within EACH event type — k per group,
    not a global limit (the reference degrades topk to an unlimited
    aggregation, api/query/prometheus_api.rs:757). One aggregation +
    one group-keyed window; Spark pushes rank<=3 down as a group-limit."""
    from cardinalsin_spark.operators.timeseries import topk_per_group

    ev = _events_cents(spark, sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum("value_cents").alias("total_cents")
    )
    return topk_per_group(
        totals,
        k=3,
        group_cols=["event_type"],
        value_col="total_cents",
        tiebreak=["user_id"],
    ).transform(
        _final_order_wide, "event_type", F.desc("total_cents"), "user_id"
    )


SQL_TS_TOPK_BY = f"""
SELECT event_type, user_id, total_cents FROM (
  SELECT event_type, user_id, total_cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY total_cents DESC, user_id) AS rn
  FROM (
    SELECT event_type, user_id,
           CAST(sum({_sql_cents('value')}) AS BIGINT) AS total_cents
    FROM events GROUP BY 1, 2
  )
) WHERE rn <= 3
ORDER BY event_type, total_cents DESC, user_id
"""


def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top-supplier shape: per-supplier revenue over a quarter,
    keep the supplier(s) achieving the GLOBAL max (uncorrelated scalar
    subquery over an aggregate — a 1-row max broadcast against the
    revenue frame, never collected). Revenue on the exact-cents grid so
    the max-equality join is integer-exact."""
    li = _lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice"))
                * (F.lit(100) - cents(F.col("l_discount")))
            ).alias("rev_cents")
        )
    )
    mx = rev.agg(F.max("rev_cents").alias("_mx"))
    s = _read(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("_mx"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents") / F.lit(10_000.0)).alias("total_revenue"),
        )
        .transform(_final_order_wide, "s_suppkey")
    )


SQL_TPCH_Q15ISH = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum({_sql_cents('l_extendedprice')}
                  * (100 - {_sql_cents('l_discount')})) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, rev_cents / 10000.0 AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
ORDER BY s_suppkey
"""


def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order shape: revenue from lineitems whose
    quantity is below 20% of that PART's average quantity — a correlated
    aggregate subquery expressed as a per-part aggregate joined back to
    the fact (the scalable decorrelation). The 20%-of-average compare is
    exact integers: qty·5·n < Σqty (no float threshold)."""
    li = _lineitem(spark, sf_dir)
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(cents(F.col("l_quantity"))).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    p_ = _read(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(F.broadcast(p_), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("_pk"))
        # qty < 0.2·avg  ⇔  qty·5·n < Σqty  (exact int64)
        .filter(
            cents(F.col("l_quantity")) * F.lit(5) * F.col("_n") < F.col("_sq")
        )
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice"))) / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


SQL_TPCH_Q17ISH = f"""
WITH per_part AS (
  SELECT l_partkey AS _pk,
         CAST(sum({_sql_cents('l_quantity')}) AS BIGINT) AS _sq,
         CAST(count(*) AS BIGINT) AS _n
  FROM lineitem GROUP BY 1
)
SELECT CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) / 700.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN per_part ON l_partkey = _pk
WHERE p_brand = 'Brand#23'
  AND {_sql_cents('l_quantity')} * 5 * _n < _sq
"""


def q_ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average per event type at every event — a
    RANGE window frame over the µs-integer time axis (the one §2.5 frame
    kind the suite didn't pin; bucketed ops use tumbling groupBys).
    Frame sums are exact cents ints; ONE division per row at the end.
    Single shuffle on event_type."""
    ev = _events_cents(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        (
            F.sum("value_cents").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
            / F.lit(100.0)
        ).alias("moving_avg"),
    )


SQL_TS_MOVING_AVG = f"""
SELECT event_id, event_type, ts,
       CAST(sum({_sql_cents('value')}) OVER w AS DOUBLE)
         / (count(*) OVER w) / 100.0 AS moving_avg
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis over the events table: signup → view →
    click → purchase, each step's timestamp = the user's FIRST qualifying
    event at-or-after the previous step (the classic product-analytics
    funnel; the reference's single-table SQL surface can express this only
    by hand). Four stacked min-CASE windows share ONE user_id partitioning
    — a single Exchange feeds all of them (plan-tested) — then one
    hash-aggregate counts users per completed depth. Exact: timestamps
    compared as-is, counts integral."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")

    def _step(prev_col: str | None, et: str, out: str):
        cond = F.col("event_type") == et
        if prev_col is not None:
            cond = cond & F.col("ts").isNotNull() & (
                F.col("ts") >= F.col(prev_col)
            )
        return F.min(F.when(cond, F.col("ts"))).over(w).alias(out)

    staged = (
        ev.select("user_id", "event_type", "ts")
        .select("*", _step(None, "signup", "t1"))
        .select("*", _step("t1", "view", "t2"))
        .select("*", _step("t2", "click", "t3"))
        .select("*", _step("t3", "purchase", "t4"))
        .select("user_id", "t1", "t2", "t3", "t4")
        # t1..t4 are per-user window constants: dedup on user_id alone
        # reuses the windows' existing user_id partitioning (no second
        # wide shuffle, unlike distinct() which hashes all five columns)
        .dropDuplicates(["user_id"])
    )
    depth = (
        F.when(F.col("t4").isNotNull(), 4)
        .when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        staged.select(depth.alias("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .transform(final_order, "funnel_depth")
    )


SQL_TS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2 FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3 FROM s2
),
s4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t3 THEN ts END)
              OVER (PARTITION BY user_id) AS t4 FROM s3
),
per_user AS (SELECT DISTINCT user_id, t1, t2, t3, t4 FROM s4)
SELECT CAST(CASE WHEN t4 IS NOT NULL THEN 4
            WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS INT) AS funnel_depth,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


def q_ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (epoch-week integer), distinct active users per (cohort, week-offset).
    Two hash aggregations + one join on user_id — the cohort dimension
    table is per-user (small next to events) so AQE broadcasts it; all
    arithmetic is integer epoch-week math."""
    ev = _events(spark, sf_dir)
    week = (F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long") / F.lit(
        604_800
    )
    ev_w = ev.select("user_id", week.cast("long").alias("week"))
    cohort = ev_w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev_w.distinct()
        .join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .transform(final_order, "cohort_week", "week_offset")
    )


SQL_TS_RETENTION_COHORTS = """
WITH ev_w AS (
  SELECT user_id,
         CAST(CAST(epoch_us(ts) // 1000000 AS BIGINT) // 604800 AS BIGINT)
           AS week
  FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM ev_w GROUP BY 1
),
act AS (SELECT DISTINCT user_id, week FROM ev_w)
SELECT cohort_week, week - cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM act JOIN cohort USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ts_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation: pull ``k`` out of the
    ``props`` JSON column (get_json_object — JVM-side, no UDF), decile-
    bucket it, aggregate count + exact-cents value sum. The reference's
    data model has no JSON anywhere (SURVEY §2.8); Spark's JSON path
    expressions make this a plain column pipeline."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(
            (k / F.lit(10)).cast("long").alias("k_decile"),
            cents(F.col("value")).alias("value_cents"),
        )
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_cents").alias("value_cents_sum"),
        )
        .transform(final_order, "k_decile")
    )


SQL_TS_JSON_PROPS = f"""
SELECT CAST(CAST(props->>'k' AS BIGINT) // 10 AS BIGINT) AS k_decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_sql_cents('value')}) AS BIGINT) AS value_cents_sum
FROM events
GROUP BY 1 ORDER BY 1
"""


def q_promql_scalar_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (purchase) / 100` — vector-scalar arithmetic
    (promql binary op with a literal operand): the scalar folds into the
    value column with no join and no extra shuffle. The inner sum runs on
    the exact cents grid, so the single float division is deterministic."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) / 100",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,    # 2024-02-01
        step_s=1800,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_SCALAR_ARITH = f"""
SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       CAST(sum({_sql_cents('value')}) AS BIGINT) / 100.0 AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_subquery_default_res(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`avg_over_time(sum by (user_id) (purchase)[7200s:])` — subquery
    with the RESOLUTION OMITTED: Prometheus falls back to the global
    evaluation interval; the transpiler's analogue is the range query's
    own step (1800 s here). Inner sums are exact cents; the outer avg
    divides a double-exact integer sum by a ≤4 count — one deterministic
    float step."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "avg_over_time(sum by (user_id) (purchase)[7200s:])",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,    # 2024-02-01
        step_s=1800,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_SUBQUERY_DEFAULT_RES = f"""
WITH inner_agg AS (
  SELECT {_sql_bucket(1800)} AS tb, event_type,
         CAST(user_id AS VARCHAR) AS user_id,
         CAST(sum({_sql_cents('value')}) AS BIGINT) AS v
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY 1, 2, 3
)
SELECT {_sql_bucket(7200, 'tb')} AS time_bucket, event_type, user_id,
       CAST(avg(v) AS DOUBLE) AS value
FROM inner_agg
GROUP BY 1, 2, 3
"""


def q_promql_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`group by (user_id) (purchase)` — the PromQL `group` aggregator
    (constant 1 per output group; the membership-marker idiom for series
    existence, upstream promql/parser aggregators). Plans as a plain
    hash aggregate emitting a literal — no window, no join."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "group by (user_id) (purchase)",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,    # 2024-02-01
        step_s=1800,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_GROUP_AGG = f"""
SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       CAST(1.0 AS DOUBLE) AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_mod_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (purchase) % 9973` — the `%` binary operator
    (round 8 completes the PromQL arithmetic set: + - * / % ^ atan2).
    `%` is Go math.Mod == Spark double `%` == DuckDB BIGINT `%` on the
    exact cents grid — fmod is an exact IEEE-754 operation, so unlike
    ^/atan2 (libm convenience tier) it is oracle-safe. The scalar folds
    into the value column: no join, no extra shuffle."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "sum by (user_id) (purchase) % 9973",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,    # 2024-02-01
        step_s=1800,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type", "user_id"
    )


SQL_PROMQL_MOD_ARITH = f"""
SELECT {_sql_bucket(1800)} AS time_bucket, event_type,
       CAST(user_id AS VARCHAR) AS user_id,
       CAST(CAST(sum({_sql_cents('value')}) AS BIGINT) % 9973 AS DOUBLE)
         AS value
FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_promql_timestamp_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hour(timestamp(purchase))` on an hourly grid: timestamp() turns each
    bucket's latest sample into its epoch-seconds value, hour() extracts the
    UTC hour-of-day from that value (promql/functions.go funcTimestamp /
    funcHour — the reference's transpiler has no function vocabulary).
    Single groupBy, pure integer arithmetic on the epoch — no calendar, no
    window, no UDF."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "hour(timestamp(purchase))",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1704240000.0,    # 2024-01-03
        step_s=3600,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_TIMESTAMP_HOUR = f"""
SELECT bucket AS time_bucket, event_type,
       CAST(CAST(floor((epoch_us(max_ts) / 1000000.0) / 3600) AS BIGINT) % 24
            AS DOUBLE) AS value
FROM (
  SELECT {_sql_bucket(3600)} AS bucket, event_type, max(ts) AS max_ts
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-01-03 00:00:00'
  GROUP BY 1, 2
)
"""


def q_promql_day_of_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`day_of_week(timestamp(purchase))` on a daily grid: 0 = Sunday, via
    (epoch_day + 4) mod 7 — epoch day zero was a Thursday, so no calendar
    lookup is needed (promql/functions.go funcDayOfWeek)."""
    from cardinalsin_spark.operators.promql import promql_range

    return promql_range(
        _events_promql(spark, sf_dir),
        "day_of_week(timestamp(purchase))",
        start_s=1704067200.0,  # 2024-01-01
        end_s=1706745600.0,    # 2024-02-01
        step_s=86400,
        cols=EV_CENTS,
    ).transform(
        final_order, "time_bucket", "event_type"
    )


SQL_PROMQL_DAY_OF_WEEK = f"""
SELECT bucket AS time_bucket, event_type,
       CAST((CAST(floor((epoch_us(max_ts) / 1000000.0) / 86400) AS BIGINT) + 4)
            % 7 AS DOUBLE) AS value
FROM (
  SELECT {_sql_bucket(86400)} AS bucket, event_type, max(ts) AS max_ts
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <= TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY 1, 2
)
"""


def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume-shipping shape: lineitem joined to BOTH a supplier
    nation and a customer nation (two independent broadcast branches of the
    same dim), restricted to an unordered nation pair, revenue by
    (supp_nation, cust_nation, year). Exercises the one §2.3 join topology
    the suite lacked: the same dimension table joined twice under different
    roles — Catalyst must keep both broadcast branches distinct. Reference
    reaches this only via DataFusion SQL pass-through
    (query/engine.rs:252-256)."""
    t = {
        n: _read(spark, sf_dir, n)
        for n in ("supplier", "lineitem", "orders", "customer", "nation")
    }
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.sum(
        cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((rev / F.lit(10_000.0)).alias("revenue"))
        .transform(final_order, "supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7ISH = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       sum({_sql_cents('l_extendedprice')}
           * (100 - {_sql_cents('l_discount')})) / 10000.0 AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority shape: orders⋈lineitem with CASE-based
    conditional aggregation — high-priority vs low-priority order counts per
    returnflag (fixture has no l_shipmode; l_returnflag plays its role).
    Exercises map-side CASE counting (partial agg before the shuffle)."""
    o = _read(spark, sf_dir, "orders")
    li = _lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .transform(final_order, "l_returnflag")
    )


SQL_TPCH_Q12ISH = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume-customer shape: HAVING-filtered aggregate
    (orderkeys whose summed quantity clears a threshold) joined back to
    orders+customer. The inner aggregate runs on the exact-cents integer
    grid so the threshold compare is bit-deterministic; the join back is a
    semi-shaped inner join on the (small) surviving key set — at 100 TB the
    survivors are rare, so AQE converts that join to broadcast at runtime."""
    li = _lineitem(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_cents"))
        .filter(F.col("qty_cents") > 15_000)
    )
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            (F.col("qty_cents") / F.lit(100.0)).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


SQL_TPCH_Q18ISH = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       qty_cents / 100.0 AS total_qty
FROM (
  SELECT l_orderkey, CAST(sum({_sql_cents('l_quantity')}) AS BIGINT) AS qty_cents
  FROM lineitem GROUP BY 1 HAVING qty_cents > 15000
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 20
"""


def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 disjunctive-predicate shape: part⋈lineitem where the
    residual OR-of-ANDs mixes both sides' columns (brand × size-range ×
    quantity-range). The equi-key still hash-joins; only the disjunction
    stays residual — the planner must NOT fall back to a nested-loop
    cross product. Plan-tested accordingly."""
    p_ = _read(spark, sf_dir, "part")
    li = _lineitem(spark, sf_dir)
    qty = cents(F.col("l_quantity"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & qty.between(100, 1_100)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & qty.between(1_000, 2_000)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & qty.between(2_000, 3_000)
        )
    )
    rev = F.sum(
        cents(F.col("l_extendedprice")) * (F.lit(100) - cents(F.col("l_discount")))
    )
    return (
        li.join(F.broadcast(p_), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg((rev / F.lit(10_000.0)).alias("revenue"))
    )


SQL_TPCH_Q19ISH = f"""
SELECT sum({_sql_cents('l_extendedprice')}
           * (100 - {_sql_cents('l_discount')})) / 10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND {_sql_cents('l_quantity')} BETWEEN 100 AND 1100)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND {_sql_cents('l_quantity')} BETWEEN 1000 AND 2000)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND {_sql_cents('l_quantity')} BETWEEN 2000 AND 3000)
"""


def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-relation shape: customers with above-average account
    balance (uncorrelated scalar subquery — computed as a 1-row aggregate
    cross-joined/broadcast into the filter, never collected to the driver)
    who have placed NO orders (left-anti join). Combines the two remaining
    §2.3/§2.7 shapes in one query. The threshold uses the exact-cents
    integer average (sum·n compare, no float division) so the cut is
    bit-identical across engines."""
    c = _read(spark, sf_dir, "customer").withColumn(
        "bal_cents", cents(F.col("c_acctbal"))
    )
    pos = c.filter(F.col("bal_cents") > 0)
    avg_row = pos.agg(
        F.sum("bal_cents").alias("_sum"), F.count(F.lit(1)).alias("_n")
    )
    o = _read(spark, sf_dir, "orders")
    rich = (
        pos.crossJoin(F.broadcast(avg_row))
        # bal > avg  ⇔  bal·n > sum   (exact integers, no division)
        .filter(F.col("bal_cents") * F.col("_n") > F.col("_sum"))
    )
    return (
        rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "leftanti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / F.lit(100.0)).alias("totacctbal"),
        )
        .transform(final_order, "c_mktsegment")
    )


SQL_TPCH_Q22ISH = f"""
WITH pos AS (
  SELECT c_custkey, c_mktsegment,
         {_sql_cents('c_acctbal')} AS bal_cents
  FROM customer WHERE {_sql_cents('c_acctbal')} > 0
),
thr AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n FROM pos)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) / 100.0 AS totacctbal
FROM pos, thr
WHERE bal_cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pos.c_custkey)
GROUP BY 1 ORDER BY 1
"""


_EWMA_K = 8


def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per event type (α = 1/2,
    truncated at the last 8 samples) — the standard monitoring smoother,
    on the exact grid: dyadic weights 2^(K-1-j) make the weighted sum an
    exact int64 (cents × powers of two), the present-lag mask makes the
    truncated normalizer exact too, ONE float division at the end. A
    stack of K lags over a single (event_type)-ordered window — one
    shuffle, no per-row state, so it scales like any other lag query."""
    ev = _events_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    v = F.col("value_cents")
    num = None
    den = None
    for j in range(_EWMA_K):
        lag_j = v if j == 0 else F.lag(v, j).over(w)
        wt = F.lit(1 << (_EWMA_K - 1 - j))
        n_j = F.coalesce(lag_j, F.lit(0)) * wt
        d_j = F.when(lag_j.isNotNull(), wt).otherwise(F.lit(0))
        num = n_j if num is None else num + n_j
        den = d_j if den is None else den + d_j
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        (num.cast("double") / den / F.lit(100.0)).alias("ewma"),
    ).orderBy("event_type", "ts", "event_id")


def _sql_ewma() -> str:
    num = " + ".join(
        f"coalesce(lag(vc, {j}) OVER w, 0) * {1 << (_EWMA_K - 1 - j)}"
        if j
        else f"vc * {1 << (_EWMA_K - 1)}"
        for j in range(_EWMA_K)
    )
    den = " + ".join(
        f"(CASE WHEN lag(vc, {j}) OVER w IS NOT NULL"
        f" THEN {1 << (_EWMA_K - 1 - j)} ELSE 0 END)"
        if j
        else f"{1 << (_EWMA_K - 1)}"
        for j in range(_EWMA_K)
    )
    return f"""
SELECT event_id, event_type, ts,
       CAST(({num}) AS DOUBLE) / ({den}) / 100.0 AS ewma
FROM (SELECT event_id, event_type, ts, {_sql_cents('value')} AS vc
      FROM events)
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
ORDER BY event_type, ts, event_id
"""


SQL_TS_EWMA = _sql_ewma()


def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type-profit shape, adapted to the fixture schema
    (no partsupp table, so profit = discounted revenue without the
    supplycost term): revenue per (supplier nation, order year) over the
    'red' parts. The 5-way star: lineitem ⋈ orders (year) ⋈ supplier ⋈
    nation (broadcast dims) ⋈ filtered part (broadcast). Exact-cents
    revenue, one final division."""
    t = {
        n: _read(spark, sf_dir, n)
        for n in ("lineitem", "orders", "supplier", "nation")
    }
    red_parts = _read(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    amount = cents(F.col("l_extendedprice")) * (
        F.lit(100) - cents(F.col("l_discount"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(amount) / F.lit(10_000.0)).alias("sum_profit"))
        .transform(final_order, "nation", F.desc("o_year"))
    )


SQL_TPCH_Q9ISH = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_sql_cents('l_extendedprice')}
                * (100 - {_sql_cents('l_discount')})) AS BIGINT) / 10000.0
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer-distribution shape: LEFT OUTER join customers to
    their non-urgent orders, count orders per customer (zero preserved!),
    then the distribution of those counts. Exercises the outer-join +
    double-aggregation pattern; both groupBys are map-side combinable and
    the second input is one row per customer — shrinking, not growing,
    with corpus size."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .transform(final_order, F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13ISH = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
GROUP BY 1 ORDER BY 2 DESC, 1 DESC
"""


def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 waiting-supplier shape, adapted to the fixture schema (no
    commit/receipt dates — 'late' := shipped ≥ 90 days after the order
    date): for finished ('F') orders, count per supplier the late
    lineitems where ANOTHER supplier participated in the order (EXISTS →
    left-semi) but NO OTHER supplier was also late (NOT EXISTS →
    left-anti). The classic double-correlated-subquery plan, decorrelated
    into two self-joins of the late set; top 10 by waiting count."""
    o_f = _read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _lineitem(spark, sf_dir)
    base = li.join(
        o_f.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    late = base.filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey", "l_linenumber")
    others = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    waiting = (
        late.join(
            others,
            (F.col("_ok") == F.col("l_orderkey"))
            & (F.col("_sk") != F.col("l_suppkey")),
            "leftsemi",
        ).join(
            late_others,
            (F.col("_ok") == F.col("l_orderkey"))
            & (F.col("_sk") != F.col("l_suppkey")),
            "leftanti",
        )
    )
    s = _read(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


SQL_TPCH_Q21ISH = """
WITH late AS (
  SELECT l_orderkey, l_suppkey, l_linenumber
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# name -> (spark_callable, oracle_sql | None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "flagship_minute_p99": (q_flagship, SQL_FLAGSHIP),
    "ts_bucket_avg": (q_ts_bucket_avg, SQL_TS_BUCKET_AVG),
    "ts_instant_sum": (q_ts_instant_sum, SQL_TS_INSTANT_SUM),
    "ts_rate": (q_ts_rate, SQL_TS_RATE),
    "ts_increase": (q_ts_increase, SQL_TS_INCREASE),
    "ts_rate_faithful": (q_ts_rate_faithful, SQL_TS_RATE_FAITHFUL),
    "ts_irate_faithful": (q_ts_irate_faithful, SQL_TS_IRATE_FAITHFUL),
    "ts_deriv": (q_ts_deriv, SQL_TS_DERIV),
    "ts_latest_per_series": (q_ts_latest_per_series, SQL_TS_LATEST_PER_SERIES),
    "ts_topk": (q_ts_topk, SQL_TS_TOPK),
    "ts_distinct_values": (q_ts_distinct_values, SQL_TS_DISTINCT_VALUES),
    "ts_distinct_series": (q_ts_distinct_series, SQL_TS_DISTINCT_SERIES),
    "ts_dedup_first": (q_ts_dedup_first, SQL_TS_DEDUP_FIRST),
    "ts_filter_range": (q_ts_filter_range, SQL_TS_FILTER_RANGE),
    "promql_range_sum_by": (q_promql_range_sum_by, SQL_PROMQL_RANGE_SUM_BY),
    "promql_rate_range": (q_promql_rate_range, SQL_PROMQL_RATE_RANGE),
    "promql_instant_sum": (q_promql_instant_sum, SQL_PROMQL_INSTANT_SUM),
    "promql_instant_topk": (q_promql_instant_topk, SQL_PROMQL_INSTANT_TOPK),
    "promql_rate_faithful": (q_promql_rate_faithful, SQL_PROMQL_RATE_FAITHFUL),
    "promql_irate_faithful": (q_promql_irate_faithful, SQL_PROMQL_IRATE_FAITHFUL),
    "promql_binary_ratio": (q_promql_binary_ratio, SQL_PROMQL_BINARY_RATIO),
    "promql_over_time": (q_promql_over_time, SQL_PROMQL_OVER_TIME),
    "promql_quantile": (q_promql_quantile, SQL_PROMQL_QUANTILE),
    "promql_offset_delta": (q_promql_offset_delta, SQL_PROMQL_OFFSET_DELTA),
    "promql_label_replace": (q_promql_label_replace, SQL_PROMQL_LABEL_REPLACE),
    "promql_count_values": (q_promql_count_values, SQL_PROMQL_COUNT_VALUES),
    "promql_absent": (q_promql_absent, SQL_PROMQL_ABSENT),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3ish": (q_tpch_q3ish, SQL_TPCH_Q3ISH),
    "sql_rollup": (q_sql_rollup, SQL_SQL_ROLLUP),
    "sql_cube": (q_sql_cube, SQL_SQL_CUBE),
    "sql_grouping_sets": (q_sql_grouping_sets, SQL_SQL_GROUPING_SETS),
    "maint_l0_plan": (q_maint_l0_plan, SQL_MAINT_L0_PLAN),
    "maint_small_files": (q_maint_small_files, SQL_MAINT_SMALL_FILES),
    "maint_leveled_plan": (q_maint_leveled_plan, SQL_MAINT_LEVELED_PLAN),
    "maint_retention": (q_maint_retention, SQL_MAINT_RETENTION),
    "maint_time_prune": (q_maint_time_prune, SQL_MAINT_TIME_PRUNE),
    "maint_downsample": (q_maint_downsample, SQL_MAINT_DOWNSAMPLE),
    "maint_rollup_routed": (q_maint_rollup_routed, SQL_MAINT_ROLLUP_ROUTED),
    "maint_rollup_rate_routed": (
        q_maint_rollup_rate_routed,
        SQL_MAINT_ROLLUP_RATE_ROUTED,
    ),
    "maint_rollup_sql_door": (
        q_maint_rollup_sql_door,
        SQL_MAINT_ROLLUP_SQL_DOOR,
    ),
    "maint_sketch_quantile_routed": (
        q_maint_sketch_quantile_routed,
        SQL_MAINT_SKETCH_QUANTILE_ROUTED,
    ),
    "promql_quantile_routed": (
        q_promql_quantile_routed,
        SQL_PROMQL_QUANTILE_ROUTED,
    ),
    "ts_asof_join": (q_ts_asof_join, SQL_TS_ASOF_JOIN),
    "ts_bloom_join": (q_ts_bloom_join, SQL_TS_BLOOM_JOIN),
    "ts_gapfill_locf": (q_ts_gapfill_locf, SQL_TS_GAPFILL_LOCF),
    "ts_resets_changes": (q_ts_resets_changes, SQL_TS_RESETS_CHANGES),
    "ts_predict_linear": (q_ts_predict_linear, SQL_TS_PREDICT_LINEAR),
    "ts_stddev": (q_ts_stddev, SQL_TS_STDDEV),
    "promql_histogram_quantile": (
        q_promql_histogram_quantile,
        SQL_PROMQL_HISTOGRAM_QUANTILE,
    ),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q5ish": (q_tpch_q5ish, SQL_TPCH_Q5ISH),
    "tpch_q10ish": (q_tpch_q10ish, SQL_TPCH_Q10ISH),
    "tpch_q14ish": (q_tpch_q14ish, SQL_TPCH_Q14ISH),
    "ts_sessionize": (q_ts_sessionize, SQL_TS_SESSIONIZE),
    "ts_outliers": (q_ts_outliers, SQL_TS_OUTLIERS),
    "ts_heatmap": (q_ts_heatmap, SQL_TS_HEATMAP),
    "ts_rate_extrapolated": (q_ts_rate_extrapolated, SQL_TS_RATE_EXTRAPOLATED),
    "promql_resets": (q_promql_resets, SQL_PROMQL_RESETS),
    "promql_predict_linear": (
        q_promql_predict_linear,
        SQL_PROMQL_PREDICT_LINEAR,
    ),
    "promql_idelta": (q_promql_idelta, SQL_PROMQL_IDELTA),
    "promql_clamp": (q_promql_clamp, SQL_PROMQL_CLAMP),
    "promql_rate_extrapolated": (
        q_promql_rate_extrapolated,
        SQL_PROMQL_RATE_EXTRAPOLATED,
    ),
    "promql_delta_faithful": (
        q_promql_delta_faithful,
        SQL_PROMQL_DELTA_FAITHFUL,
    ),
    "ts_holt_winters": (q_ts_holt_winters, SQL_TS_HOLT_WINTERS),
    "promql_holt_winters": (q_promql_holt_winters, SQL_PROMQL_HOLT_WINTERS),
    "promql_quantile_over_time": (
        q_promql_quantile_over_time,
        SQL_PROMQL_QUANTILE_OVER_TIME,
    ),
    "promql_subquery_max_rate": (
        q_promql_subquery_max_rate,
        SQL_PROMQL_SUBQUERY_MAX_RATE,
    ),
    "promql_subquery_outer_rate": (
        q_promql_subquery_outer_rate,
        SQL_PROMQL_SUBQUERY_OUTER_RATE,
    ),
    "promql_instant_subquery": (
        q_promql_instant_subquery,
        SQL_PROMQL_INSTANT_SUBQUERY,
    ),
    "maint_zorder_key": (q_maint_zorder_key, SQL_MAINT_ZORDER_KEY),
    "tpch_q4ish": (q_tpch_q4ish, SQL_TPCH_Q4ISH),
    "tpch_q16ish": (q_tpch_q16ish, SQL_TPCH_Q16ISH),
    "promql_absent_over_time": (
        q_promql_absent_over_time,
        SQL_PROMQL_ABSENT_OVER_TIME,
    ),
    "ts_time_weighted_avg": (q_ts_time_weighted_avg, SQL_TS_TIME_WEIGHTED_AVG),
    "ts_lttb": (q_ts_lttb, SQL_TS_LTTB),
    "ts_mad": (q_ts_mad, SQL_TS_MAD),
    "ts_burn_rate": (q_ts_burn_rate, SQL_TS_BURN_RATE),
    "promql_present_over_time": (
        q_promql_present_over_time,
        SQL_PROMQL_PRESENT_OVER_TIME,
    ),
    "ts_cusum": (q_ts_cusum, SQL_TS_CUSUM),
    "tpch_q8ish": (q_tpch_q8ish, SQL_TPCH_Q8ISH),
    "ts_value_quartiles": (q_ts_value_quartiles, SQL_TS_VALUE_QUARTILES),
    "ts_winsorize": (q_ts_winsorize, SQL_TS_WINSORIZE),
    "ts_ohlc": (q_ts_ohlc, SQL_TS_OHLC),
    "sql_pivot": (q_sql_pivot, SQL_SQL_PIVOT),
    "ts_autocorr_lag1": (q_ts_autocorr_lag1, SQL_TS_AUTOCORR_LAG1),
    "ts_crosscorr": (q_ts_crosscorr, SQL_TS_CROSSCORR),
    "ts_gap_stats": (q_ts_gap_stats, SQL_TS_GAP_STATS),
    "ts_apdex": (q_ts_apdex, SQL_TS_APDEX),
    "ts_error_budget": (q_ts_error_budget, SQL_TS_ERROR_BUDGET),
    "ts_weekday_profile": (q_ts_weekday_profile, SQL_TS_WEEKDAY_PROFILE),
    "ts_seasonal_residual": (q_ts_seasonal_residual, SQL_TS_SEASONAL_RESIDUAL),
    "ts_session_incidents": (q_ts_session_incidents, SQL_TS_SESSION_INCIDENTS),
    "ts_topk_by": (q_ts_topk_by, SQL_TS_TOPK_BY),
    "tpch_q15ish": (q_tpch_q15ish, SQL_TPCH_Q15ISH),
    "tpch_q17ish": (q_tpch_q17ish, SQL_TPCH_Q17ISH),
    "ts_moving_avg": (q_ts_moving_avg, SQL_TS_MOVING_AVG),
    "ts_funnel": (q_ts_funnel, SQL_TS_FUNNEL),
    "ts_retention_cohorts": (q_ts_retention_cohorts, SQL_TS_RETENTION_COHORTS),
    "ts_json_props": (q_ts_json_props, SQL_TS_JSON_PROPS),
    "promql_scalar_arith": (q_promql_scalar_arith, SQL_PROMQL_SCALAR_ARITH),
    "promql_mod_arith": (q_promql_mod_arith, SQL_PROMQL_MOD_ARITH),
    "promql_group_agg": (q_promql_group_agg, SQL_PROMQL_GROUP_AGG),
    "promql_subquery_default_res": (
        q_promql_subquery_default_res,
        SQL_PROMQL_SUBQUERY_DEFAULT_RES,
    ),
    "promql_timestamp_hour": (q_promql_timestamp_hour, SQL_PROMQL_TIMESTAMP_HOUR),
    "promql_day_of_week": (q_promql_day_of_week, SQL_PROMQL_DAY_OF_WEEK),
    "tpch_q7ish": (q_tpch_q7ish, SQL_TPCH_Q7ISH),
    "tpch_q12ish": (q_tpch_q12ish, SQL_TPCH_Q12ISH),
    "tpch_q18ish": (q_tpch_q18ish, SQL_TPCH_Q18ISH),
    "tpch_q19ish": (q_tpch_q19ish, SQL_TPCH_Q19ISH),
    "tpch_q22ish": (q_tpch_q22ish, SQL_TPCH_Q22ISH),
    "tpch_q9ish": (q_tpch_q9ish, SQL_TPCH_Q9ISH),
    "tpch_q13ish": (q_tpch_q13ish, SQL_TPCH_Q13ISH),
    "tpch_q21ish": (q_tpch_q21ish, SQL_TPCH_Q21ISH),
    "promql_mad_over_time": (q_promql_mad_over_time, SQL_PROMQL_MAD_OVER_TIME),
    "promql_at_pinned": (q_promql_at_pinned, SQL_PROMQL_AT_PINNED),
    "promql_at_start": (q_promql_at_start, SQL_PROMQL_AT_START),
    "promql_range_at_end": (q_promql_range_at_end, SQL_PROMQL_RANGE_AT_END),
    "promql_set_unless": (q_promql_set_unless, SQL_PROMQL_SET_UNLESS),
    "promql_set_or": (q_promql_set_or, SQL_PROMQL_SET_OR),
    "promql_cmp_vector": (q_promql_cmp_vector, SQL_PROMQL_CMP_VECTOR),
    "promql_scalar_fold": (q_promql_scalar_fold, SQL_PROMQL_SCALAR_FOLD),
    "ts_ewma": (q_ts_ewma, SQL_TS_EWMA),
    "promql_range_fn_at": (q_promql_range_fn_at, SQL_PROMQL_RANGE_FN_AT),
    "promql_range_scalar": (q_promql_range_scalar, SQL_PROMQL_RANGE_SCALAR),
    "promql_vector_fallback": (q_promql_vector_fallback, SQL_PROMQL_VECTOR_FALLBACK),
    "promql_time_staleness": (q_promql_time_staleness, SQL_PROMQL_TIME_STALENESS),
    "promql_histogram_fraction": (q_promql_histogram_fraction, SQL_PROMQL_HISTOGRAM_FRACTION),
    "tpch_q2ish": (q_tpch_q2ish, SQL_TPCH_Q2ISH),
    "tpch_q11ish": (q_tpch_q11ish, SQL_TPCH_Q11ISH),
    "tpch_q20ish": (q_tpch_q20ish, SQL_TPCH_Q20ISH),
}


def _load_llm_registry() -> None:
    from cardinalsin_spark.queries_llm import REGISTRY_LLM

    REGISTRY.update(REGISTRY_LLM)


_load_llm_registry()


# ---------------------------------------------------------------------------
# Driver correctness-window ordering
# ---------------------------------------------------------------------------
# The external driver's correctness gate only runs the FIRST 50 entries of
# ``queries()`` against the DuckDB oracle.  The full registry is larger, so
# the window rotates per round: the newest / riskiest queries (everything
# changed or added this round, plus any query with no prior green driver row)
# come first; the tiers that have been driver-green for 3+ rounds rotate to
# the back.  Every registry entry — windowed or not — is still covered by the
# builder-side parity sweep (tests/test_oracle_parity.py) at sf0.001.
_DRIVER_WINDOW = [
    # Round-14 window (VERDICT r13 items 1+2+7), planned from
    # `scripts/check_parity.py --ages --before 14`:
    #   (a) LEAD: docs_containment — the registry's only r9-green row
    #       (displaced from the r13 window; at the 4-round rotation
    #       limit). VERDICT r13 item 1 names it the mandatory leader.
    #   (b) promql_quantile_routed — NEW this round (opt-in approximate
    #       quantile_over_time serving from attached sketches, VERDICT
    #       r13 item 2), never driver-checked; also this window's
    #       sketch-routing row while the sketch-serving code churns.
    #   (c) maint_rollup_sql_door (r11-green) re-windowed: the SQL-door
    #       HAVING route gains the value-exactness manifest guard this
    #       round (VERDICT r13 item 3) — the row that proves routing
    #       still engages must be driver-checked while that gate churns.
    #   (d) the r10-green tier — 47 of its 49 rows (everything whose
    #       last green driver row is CORRECTNESS_r10, four rounds old).
    #   Displaced to make room (the only r10 rows left out; both must
    #   join the r15 window):
    #       ts_rate_faithful / ts_rate_extrapolated — their operators
    #       (timeseries.rate_faithful / rate_extrapolated) are exercised
    #       IN-WINDOW through the transpiler by promql_rate_faithful /
    #       promql_rate_extrapolated (operators/promql.py:3153 calls the
    #       same functions), so only the thin cents-reshape wrappers go
    #       unchecked this round.
    # -- (a) rotation-limit leader
    "docs_containment",
    # -- (b) NEW: PromQL approximate-quantile serving contract row
    "promql_quantile_routed",
    # -- (c) HAVING-route guard churns (VERDICT r13 item 3)
    "maint_rollup_sql_door",
    # -- (d) r10-green: docs/media/maint tier
    "docs_clean_corpus",
    "docs_contamination",
    "docs_crossdup",
    "docs_near_dedup_cc",
    "docs_temperature_mixture",
    "maint_downsample",
    "media_audio_features",
    "media_image_features",
    "media_resize",
    # -- (d) r10-green: promql tier
    "promql_absent",
    "promql_at_pinned",
    "promql_at_start",
    "promql_binary_ratio",
    "promql_clamp",
    "promql_cmp_vector",
    "promql_count_values",
    "promql_day_of_week",
    "promql_delta_faithful",
    "promql_histogram_quantile",
    "promql_idelta",
    "promql_instant_sum",
    "promql_instant_topk",
    "promql_irate_faithful",
    "promql_label_replace",
    "promql_mad_over_time",
    "promql_offset_delta",
    "promql_predict_linear",
    "promql_quantile",
    "promql_range_at_end",
    "promql_range_sum_by",
    "promql_rate_extrapolated",
    "promql_rate_faithful",
    "promql_rate_range",
    "promql_resets",
    "promql_scalar_fold",
    "promql_set_or",
    "promql_set_unless",
    "promql_subquery_max_rate",
    # -- (d) r10-green: tpch tier
    "tpch_q1",
    "tpch_q13ish",
    "tpch_q21ish",
    "tpch_q9ish",
    # -- (d) r10-green: ts tier
    "ts_asof_join",
    "ts_ewma",
    "ts_irate_faithful",
    "ts_moving_avg",
    "ts_topk_by",
]

def _reorder_registry() -> None:
    ordered: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
    for name in _DRIVER_WINDOW:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

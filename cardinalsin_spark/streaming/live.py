"""Structured Streaming operators: the Spark-native rebuild of the
reference's historical+live streaming queries.

Reference behavior being re-expressed (all ``/root/reference``):
- Historical+live merge (``query/streaming.rs:73-202``): run SQL over stored
  chunks, then tail the ingester broadcast; ``merge_timestamp = now()`` at
  query start, live rows with ``ts < merge_timestamp`` dropped to avoid
  double-counting rows that were already flushed.
- Row-level live filter (``query/streaming.rs:228-468``): a hand-rolled
  predicate interpreter over Arrow batches. In Spark this is just
  ``.filter`` on the streaming DataFrame — Catalyst compiles it.
- Tumbling-bucket aggregation (``api/query/prometheus_api.rs:1016-1070``):
  integer time-bucket GROUP BY. Spark gives strictly more: event-time
  windows (tumbling AND sliding), watermarks with a late-data policy, and
  session windows — the reference has none of these (SURVEY §2.9).
- Stateful per-series operators: absent in the reference (its "state" is a
  broadcast channel). ``stateful_counter_increase`` shows the
  ``applyInPandasWithState`` pattern for PromQL-faithful counter increase
  across micro-batches (reset-aware), which the reference approximates
  statelessly with MAX-MIN per bucket (``api/query/prometheus_api.rs:969-983``).

Scale posture: watermarks bound state size (without one, a windowed agg on
an unbounded stream grows state forever); per-series state keys on the
precomputed ``series_id`` long, not N string label columns, so the state
store and shuffle stay narrow at 1B-series cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cardinalsin_spark.schema import metrics_schema, value_expr

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def read_metrics_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of metrics parquet chunks — the
    Spark analogue of tailing the ingester's flush output. New chunk files
    appearing under ``path`` become micro-batches."""
    reader = spark.readStream.schema(schema or metrics_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def live_filter(sdf: DataFrame, predicate: str) -> DataFrame:
    """Row-level predicate on the live stream. The reference interprets a
    parsed SQL AST against every Arrow batch (``query/streaming.rs:353-468``);
    Spark compiles the same predicate into the micro-batch plan."""
    return sdf.filter(F.expr(predicate))


def wire_ingest_stream(
    spark: SparkSession,
    path: str,
    wire_format: str = "otlp_proto",
    bytes_col: str = "payload",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming wire ingest: a file-source stream of raw payload files
    (one binary column per row) decoded per micro-batch with the SAME
    mapInPandas decoders batch ingest uses — OTLP protobuf
    (``sources/otlp.py``) or Prometheus remote-write
    (``sources/remote_write.py``). The Spark analogue of the reference's
    ingest endpoints feeding the ingester tail (``api/ingest/*`` →
    ``ingester/broadcast.rs``), with the file source's exactly-once
    semantics instead of an in-process channel. Returns the flat
    (ts, metric_name, value, labels) stream; pipe into ``windowed_agg`` /
    ``live_filter`` / a parquet sink like any metrics stream."""
    from pyspark.sql.types import BinaryType, StructField
    from pyspark.sql.types import StructType as _St

    reader = spark.readStream.schema(_St([StructField(bytes_col, BinaryType())]))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(path)
    if wire_format == "otlp_proto":
        from cardinalsin_spark.sources.otlp import otlp_proto_flatten

        return otlp_proto_flatten(sdf, bytes_col)
    if wire_format == "remote_write":
        from cardinalsin_spark.sources.remote_write import remote_write_flatten

        return remote_write_flatten(sdf, bytes_col)
    raise ValueError(
        f"wire_format must be otlp_proto|remote_write, got {wire_format!r}"
    )


def historical_live_merge(
    historical: DataFrame,
    live: DataFrame,
    merge_timestamp,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Union historical (batch) and live (stream) frames without
    double-counting: historical keeps rows strictly before the merge point,
    live keeps rows at/after it (reference ``query/streaming.rs:109-161``
    drops live rows below ``merge_timestamp``).

    Works for batch+batch (backfill join-up) and batch+stream (the streaming
    union is what ``foreachBatch`` or a union query would execute).
    """
    m = F.lit(merge_timestamp)
    hist = historical.filter(F.col(ts_col) < m)
    tail = live.filter(F.col(ts_col) >= m)
    return hist.unionByName(tail, allowMissingColumns=True)


def windowed_agg(
    sdf: DataFrame,
    width: str = "1 minute",
    slide: str | None = None,
    by: list[str] | None = None,
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Event-time windowed aggregation with a late-data watermark.

    Tumbling (``slide=None``) or sliding windows over the coalesced metric
    value: avg/sum/count/min/max per (window, metric_name, *by). The
    watermark bounds state: rows later than ``watermark`` behind the max
    observed event time are dropped, and closed windows are evicted —
    mandatory for unbounded streams (the reference has no late-data story;
    this is the documented superset)."""
    by = by or []
    win = (
        F.window(ts_col, width, slide) if slide else F.window(ts_col, width)
    )
    v = value_expr()
    return (
        sdf.withWatermark(ts_col, watermark)
        .withColumn("value", v)
        .groupBy(win.alias("window"), "metric_name", *by)
        .agg(
            F.avg("value").alias("avg_value"),
            F.sum("value").alias("sum_value"),
            F.count("value").alias("sample_count"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def session_agg(
    sdf: DataFrame,
    gap: str = "5 minutes",
    by: list[str] | None = None,
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Session-window aggregation (gap-based) — absent from the reference
    entirely; included because Structured Streaming gives it for free."""
    by = by or []
    return (
        sdf.withWatermark(ts_col, watermark)
        .withColumn("value", value_expr())
        .groupBy(F.session_window(ts_col, gap).alias("session"), "metric_name", *by)
        .agg(
            F.count("value").alias("sample_count"),
            F.sum("value").alias("sum_value"),
        )
    )


def streaming_dedup(
    sdf: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming dual-write dedup: keep the first occurrence per
    ``(timestamp, metric_name)`` while a shard split dual-writes — the
    reference does this with an unbounded in-memory hash set for the
    query's lifetime (``query/dedup.rs:22-113``).

    ``dropDuplicatesWithinWatermark`` is the scale-safe version: dedup
    state is evicted once the watermark passes a key's event time, so
    state size is bounded by the (dup-window × ingest rate), not the
    stream's lifetime. Duplicates in a dual-write arrive within seconds
    of each other, so a short watermark horizon suffices."""
    keys = keys or ["timestamp", "metric_name"]
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: reset-aware counter increase across micro-batches
# ---------------------------------------------------------------------------

_INCREASE_OUTPUT = (
    "series_id long, metric_name string, batch_increase double, "
    "n_samples long, last_ts_ns long"
)
_INCREASE_STATE = "last_ts_ns long, last_value double"


def _increase_fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
    """Per-series state: (last_ts_ns, last_value). For each micro-batch,
    accumulate PromQL-style increase: on a counter reset (v < prev) the
    whole new value counts; otherwise the delta does.

    The whole micro-batch is concatenated BEFORE sorting:
    applyInPandasWithState feeds large groups as multiple Arrow chunks
    with no global time order, so sorting each chunk independently would
    read later-timestamp chunks first and count their back-step as a
    counter reset — silently inflating the increase on any series bigger
    than one Arrow batch. Batch-sized memory per (series, micro-batch) is
    the operator's documented state envelope either way."""
    import pandas as pd

    if state.exists:
        last_ts, last_val = state.get
    else:
        last_ts, last_val = None, None

    total = 0.0
    n = 0
    metric_name = None
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        # value as tiebreak: deterministic when samples share a timestamp
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_ns", "value"]
        )
        for ts_ns, v, m in zip(pdf["ts_ns"], pdf["value"], pdf["metric_name"]):
            metric_name = m
            # Arrow nulls surface as NaN in the float64 pandas column, not
            # None — pd.isna catches both
            if pd.isna(v):
                continue
            n += 1
            if last_val is not None:
                total += v if v < last_val else v - last_val
            last_ts, last_val = int(ts_ns), float(v)

    state.update((last_ts, last_val))
    if n == 0:
        return
    yield pd.DataFrame(
        {
            "series_id": [key[0]],
            "metric_name": [metric_name],
            "batch_increase": [total],
            "n_samples": [n],
            "last_ts_ns": [last_ts],
        }
    )


def stateful_counter_increase(
    sdf: DataFrame, label_cols: list[str] | None = None
) -> DataFrame:
    """Reset-aware counter increase per series across micro-batches via
    ``applyInPandasWithState`` — state is (last_ts_ns, last_value) keyed on
    the 64-bit ``series_id``, so state-store width is constant regardless of
    label count/cardinality."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from cardinalsin_spark.schema import series_id_expr

    labels = label_cols or []
    keyed = sdf.select(
        series_id_expr(labels),
        "metric_name",
        "ts_ns",
        value_expr(),
    )
    return keyed.groupBy("series_id").applyInPandasWithState(
        _increase_fn,
        outputStructType=_INCREASE_OUTPUT,
        stateStructType=_INCREASE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_OUTPUT = (
    "series_id long, metric_name string, ewma double, "
    "n_samples long, last_ts_ns long"
)
_EWMA_STATE = "vals array<long>, last_ts_ns long"
_EWMA_K = 8


def _ewma_fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
    """Per-series state: the last ≤K value_cents samples (constant state
    width). Each micro-batch appends its time-sorted samples and emits the
    truncated α=1/2 EWMA on the exact dyadic grid — num = Σ v·2^(K-1-j)
    and den = Σ 2^(K-1-j) over the retained window are exact int64, ONE
    float division at the end, so the stream's final answer is
    bit-identical to the batch q_ts_ewma formula over the same samples.
    Same concat-before-sort discipline as ``_increase_fn`` (Arrow chunk
    order is not time order)."""
    import pandas as pd

    vals, last_ts = (list(state.get[0]), state.get[1]) if state.exists else ([], None)

    n = 0
    metric_name = None
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_ns", "value_cents"]
        )
        for ts_ns, vc, m in zip(
            pdf["ts_ns"], pdf["value_cents"], pdf["metric_name"]
        ):
            metric_name = m
            # a null cents column arrives as NaN (float64), not None
            if pd.isna(vc):
                continue
            n += 1
            vals.append(int(vc))
            last_ts = int(ts_ns)
    vals = vals[-_EWMA_K:]

    state.update((vals, last_ts))
    if n == 0:
        return
    num = den = 0
    for j, v in enumerate(reversed(vals)):  # j=0 → most recent
        w = 1 << (_EWMA_K - 1 - j)
        num += v * w
        den += w
    yield pd.DataFrame(
        {
            "series_id": [key[0]],
            "metric_name": [metric_name],
            "ewma": [num / den / 100.0],
            "n_samples": [n],
            "last_ts_ns": [last_ts],
        }
    )


def stateful_ewma(sdf: DataFrame, label_cols: list[str] | None = None) -> DataFrame:
    """Streaming EWMA per series (α = 1/2 truncated at the last 8 samples)
    via ``applyInPandasWithState`` — the live counterpart of the batch
    ``ts_ewma`` query, with a constant-width state store entry (≤K longs
    per series) and bit-equality to the batch formula (pytest-pinned)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from cardinalsin_spark.schema import series_id_expr

    labels = label_cols or []
    keyed = sdf.select(
        series_id_expr(labels),
        "metric_name",
        "ts_ns",
        F.round(value_expr() * 100).cast("long").alias("value_cents"),
    )
    return keyed.groupBy("series_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=_EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_enrich(
    sdf: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to every
    live row (the reference's streaming layer exposes raw rows only —
    ``query/streaming.rs`` has no join surface; SURVEY §2.9 superset).

    Spark executes a stream-static join per micro-batch with the static
    side broadcast (no state store, no watermark requirement — the static
    side is re-read each batch, so a refreshed dim table is picked up).
    At 100 TB the static side must stay broadcast-sized (dims, not facts);
    stream-stream joins with watermarks are the fact-to-fact path.
    """
    return sdf.join(F.broadcast(dim), on=on, how=how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lookback: str = "10 minutes",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event pairs with
    every right event for the same key whose timestamp falls in
    ``[left.ts − lookback, left.ts]`` — the fact-to-fact live correlation
    (click ↔ preceding views) the reference's streaming layer cannot
    express at all (``query/streaming.rs`` is filter-only; SURVEY §2.9
    superset).

    Both sides carry event-time watermarks, so Spark bounds the join state
    to [watermark + lookback] per key and drops it as time advances —
    the state-retention contract that keeps an unbounded two-stream join
    runnable forever. All right-side columns (key and time included) are
    suffixed so downstream code can address both sides."""
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    for c in rw.columns:
        rw = rw.withColumnRenamed(c, f"{c}{right_suffix}")
    key_eq = [
        F.col(k) == F.col(f"{k}{right_suffix}") for k in on
    ]
    rts = F.col(f"{ts_col}{right_suffix}")
    lts = F.col(ts_col)
    cond = key_eq[0]
    for k in key_eq[1:]:
        cond = cond & k
    cond = (
        cond
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond, "inner")


_HLL_OUTPUT = (
    "metric_name string, n_distinct_est double, n_registers_hit long,"
    " batch_rows long"
)
_HLL_STATE = "regs array<long>"
_HLL_P = 5
_HLL_SEED = "hll"


def _hll_fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
    """Per-key HLL register state: ``regs`` is the full m-register vector
    (m = 2^p longs — constant state width). Each micro-batch folds its
    values' (bucket, rho) pairs into the register maxima and emits the
    RUNNING estimate — identical arithmetic to
    ``operators.sketches.hll_distinct`` (same md5-derived hash, so the
    stream's final estimate equals the batch operator's on the same
    data)."""
    import hashlib

    import pandas as pd

    from cardinalsin_spark.operators.sketches import _alpha

    m = 1 << _HLL_P
    w_bits = 60 - _HLL_P
    mask = (1 << w_bits) - 1
    regs = list(state.get[0]) if state.exists else [0] * m

    n = 0
    for pdf in pdf_iter:
        for v in pdf["_v"]:
            if v is None:
                continue
            n += 1
            h = int(
                hashlib.md5(f"{_HLL_SEED}:{v}".encode()).hexdigest()[:15], 16
            )
            b = h >> w_bits
            w = h & mask
            rho = (w_bits + 1) if w == 0 else w_bits - w.bit_length() + 1
            if rho > regs[b]:
                regs[b] = rho

    state.update((regs,))
    if n == 0:
        return
    s = sum(1 << (w_bits + 1 - r) for r in regs)
    est = (_alpha(m) * m * m * float(1 << (w_bits + 1))) / float(s)
    yield pd.DataFrame(
        {
            "metric_name": [key[0]],
            "n_distinct_est": [est],
            "n_registers_hit": [sum(1 for r in regs if r > 0)],
            "batch_rows": [n],
        }
    )


def streaming_hll_distinct(sdf: DataFrame, value_col: str) -> DataFrame:
    """Streaming distinct-count per metric via HLL registers in the state
    store (``applyInPandasWithState``): state is 2^p longs per key —
    constant width however many distinct values flow — and each
    micro-batch appends the running estimate. The batch twin is
    ``operators.sketches.hll_distinct``; both use the md5-derived 60-bit
    hash, so the stream's last emitted estimate is bit-equal to the batch
    estimate over the same rows (the mergeability property HLL exists
    for). The reference's streaming layer has no aggregation surface at
    all (``query/streaming.rs`` forwards raw rows; SURVEY §2.9
    superset)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = sdf.select(
        "metric_name", F.col(value_col).cast("string").alias("_v")
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        _hll_fn,
        outputStructType=_HLL_OUTPUT,
        stateStructType=_HLL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_OUTPUT = "metric_name string, term string, cms_est long, rank int"
_HH_STATE = "counters array<long>, terms array<string>, ests array<long>"
_HH_DEPTH = 3
_HH_WIDTH = 64
_HH_SEED = "cms"


def _hh_fn_factory(k: int, candidates: int):
    import hashlib

    import pandas as pd

    def _buckets(term: str) -> list[int]:
        return [
            int(
                hashlib.md5(f"{_HH_SEED}{i}:{term}".encode()).hexdigest()[:15],
                16,
            )
            % _HH_WIDTH
            for i in range(_HH_DEPTH)
        ]

    def _fn(key, pdf_iter, state):
        if state.exists:
            counters, terms, ests = state.get
            counters = list(counters)
            cand = dict(zip(terms, ests))
        else:
            counters = [0] * (_HH_DEPTH * _HH_WIDTH)
            cand = {}

        seen: set[str] = set()
        for pdf in pdf_iter:
            for t in pdf["_t"]:
                if t is None:
                    continue
                for i, b in enumerate(_buckets(t)):
                    counters[i * _HH_WIDTH + b] += 1
                seen.add(t)
        if not seen and not cand:
            state.update((counters, [], []))
            return
        # refresh estimates for seen terms + existing candidates (counters
        # only grow, so every candidate's estimate is current after this)
        for t in seen | set(cand):
            cand[t] = min(
                counters[i * _HH_WIDTH + b]
                for i, b in enumerate(_buckets(t))
            )
        trimmed = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[
            :candidates
        ]
        state.update(
            (counters, [t for t, _ in trimmed], [e for _, e in trimmed])
        )
        top = trimmed[:k]
        yield pd.DataFrame(
            {
                "metric_name": [key[0]] * len(top),
                "term": [t for t, _ in top],
                "cms_est": [e for _, e in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return _fn


def streaming_heavy_hitters(
    sdf: DataFrame,
    term_col: str,
    k: int = 10,
    candidates: int = 256,
) -> DataFrame:
    """Streaming top-k heavy hitters per metric: Count-Min counters plus a
    bounded candidate set in the state store (the classic CMS+heap
    construction; Cormode & Muthukrishnan 2005 §4). State is
    ``d·w + 2·candidates`` cells per key — constant however many distinct
    terms flow. Each micro-batch emits the refreshed running top-k. The
    hash/counter arithmetic is byte-identical to the batch
    ``operators.sketches.cms_estimates`` (counters are additive across
    batches), so with ``candidates`` ≥ the live vocabulary the final
    emission EQUALS the batch top-k — the approximation begins only where
    the candidate cap trims (documented trade: capped memory vs possible
    re-entry misses, exactly the batch CMS's over-count-only guarantee
    minus candidate recall)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = sdf.select(
        "metric_name", F.col(term_col).cast("string").alias("_t")
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        _hh_fn_factory(k, candidates),
        outputStructType=_HH_OUTPUT,
        stateStructType=_HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV (bottom-k) distinct sketch
# ---------------------------------------------------------------------------

_KMV_OUTPUT = (
    "metric_name string, n_distinct_est double, kth_hash long, "
    "sketch_size int, batch_rows long"
)
_KMV_STATE = "hashes array<long>, vals array<string>"


def _kmv_fn_factory(k: int):
    from cardinalsin_spark.operators.sketches import KMV_SEED, _KMV_SPACE

    def _fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
        """Per-key bottom-k state: the k smallest (hash, value) pairs over
        all distinct values seen. Merging a micro-batch is a dict union +
        re-truncate — the KMV mergeability property — so the final emitted
        estimate is bit-equal to the batch sketch
        (``operators.sketches.kmv_bottomk``) over the same rows."""
        import hashlib

        import pandas as pd

        if state.exists:
            hs, vs = state.get
            sketch = dict(zip(list(vs), list(hs)))
        else:
            sketch = {}

        n = 0
        for pdf in pdf_iter:
            for v in pdf["_v"]:
                if v is None:
                    continue
                n += 1
                if v not in sketch:
                    sketch[v] = int(
                        hashlib.md5(f"{KMV_SEED}:{v}".encode()).hexdigest()[:15],
                        16,
                    )
        top = sorted(sketch.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        state.update(([h for _, h in top], [v for v, _ in top]))
        if n == 0:
            return
        kth = top[-1][1]
        if len(top) < k:
            est = float(len(top))
        else:
            est = round((k - 1) * _KMV_SPACE / float(kth), 2)
        yield pd.DataFrame(
            {
                "metric_name": [key[0]],
                "n_distinct_est": [est],
                "kth_hash": [kth],
                "sketch_size": [len(top)],
                "batch_rows": [n],
            }
        )

    return _fn


def streaming_kmv_distinct(
    sdf: DataFrame, value_col: str, k: int = 8
) -> DataFrame:
    """Streaming distinct-count + uniform distinct-sample per metric via a
    bottom-k (KMV) sketch in the state store: state is at most k
    (hash, value) pairs per key regardless of cardinality, and each
    micro-batch appends the running estimate. The batch twin is
    ``operators.sketches.kmv_bottomk`` — same md5-derived 60-bit hash, so
    the stream's last emission is bit-equal to the batch estimate over the
    same rows. Complements ``streaming_hll_distinct``: KMV keeps the
    sampled VALUES (HLL keeps only registers), at the cost of k strings of
    state. The reference's streaming layer forwards raw rows only
    (``query/streaming.rs``; SURVEY §2.9 superset)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = sdf.select(
        "metric_name", F.col(value_col).cast("string").alias("_v")
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        _kmv_fn_factory(k),
        outputStructType=_KMV_OUTPUT,
        stateStructType=_KMV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: gap-based sessionization across micro-batches
# ---------------------------------------------------------------------------

_SESS_OUTPUT = (
    "metric_name string, session_idx long, start_us long, end_us long, "
    "n_events long, closed boolean"
)
_SESS_STATE = "start_us long, last_us long, n long, closed_cnt long"


def _sessionize_fn_factory(gap_us: int):
    def _fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
        """Per-key state: the one OPEN session (start_us, last_us, n) plus
        the count of sessions already closed (which numbers the next
        session — identical to the batch running-sum numbering). A session
        closes when an event arrives more than gap_us after the open
        session's last event; closed sessions emit with closed=true, and
        every batch re-emits the open session's running snapshot with
        closed=false, so the LAST emission per (key, session_idx) is the
        session's final row. Assumes micro-batches arrive in event-time
        order (chunk files are time-ordered; same in-order contract as the
        increase/EWMA twins). Within a batch, rows are sorted — Arrow may
        deliver a group as several chunks."""
        import pandas as pd

        if state.exists:
            start_us, last_us, n, closed_cnt = state.get
        else:
            start_us, last_us, n, closed_cnt = None, None, 0, 0

        chunks = list(pdf_iter)
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ts = pdf["_us"].dropna().sort_values()
        if len(ts) == 0:
            return
        out: list[tuple[int, int, int, int, bool]] = []
        for t in ts:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out.append((closed_cnt, start_us, last_us, n, True))
                closed_cnt += 1
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n, closed_cnt))
        out.append((closed_cnt, start_us, last_us, n, False))
        yield pd.DataFrame(
            {
                "metric_name": [key[0]] * len(out),
                "session_idx": [r[0] for r in out],
                "start_us": [r[1] for r in out],
                "end_us": [r[2] for r in out],
                "n_events": [r[3] for r in out],
                "closed": [r[4] for r in out],
            }
        )

    return _fn


def streaming_sessionize(
    sdf: DataFrame, gap_seconds: int, ts_col: str = "timestamp"
) -> DataFrame:
    """Gap-based sessionization across micro-batches — the stateful twin of
    the batch ``operators.timeseries.sessionize``: the last emission per
    (metric, session_idx) is bit-equal to the batch operator's row (same
    exact integer-µs gap rule, same running-count numbering). Differs from
    ``session_agg`` (Spark's native ``session_window``): this twin carries
    the batch twin's session NUMBERING and exposes open-session snapshots
    per micro-batch, which the native window cannot do. State per key is
    four longs — constant regardless of session length or stream lifetime.
    The reference's streaming layer forwards raw rows only
    (``query/streaming.rs``; SURVEY §2.9 superset)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = sdf.select(
        "metric_name", F.unix_micros(F.col(ts_col)).alias("_us")
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        _sessionize_fn_factory(gap_seconds * 1_000_000),
        outputStructType=_SESS_OUTPUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: classic-histogram cumulative buckets
# ---------------------------------------------------------------------------

_HISTB_OUTPUT = "metric_name string, le long, cum long"
_HISTB_STATE = "counts array<long>"


def _hist_fn_factory(bounds: list[int]):
    from cardinalsin_spark.operators.promql import LE_INF

    n_b = len(bounds)

    def _fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
        """Per-key bucket-count state: one long per le bound plus the +Inf
        overflow — constant width however long the stream runs. Each
        micro-batch assigns its values to the SMALLEST covering bound
        (identical CASE order to the batch operator) and re-emits the full
        cumulative grid, so the LAST emission per (key, le) is bit-equal
        to ``operators.promql.cumulative_le_buckets`` over the same
        rows."""
        import pandas as pd

        counts = list(state.get[0]) if state.exists else [0] * (n_b + 1)
        n = 0
        for pdf in pdf_iter:
            for v in pdf["_v"]:
                if v is None or v != v:  # null / NaN-after-Arrow skip
                    continue
                n += 1
                v = int(v)
                for i, b in enumerate(bounds):
                    if v <= b:
                        counts[i] += 1
                        break
                else:
                    counts[n_b] += 1
        state.update((counts,))
        if n == 0:
            return
        les = bounds + [LE_INF]
        cum, tot = [], 0
        for c in counts:
            tot += c
            cum.append(tot)
        yield pd.DataFrame(
            {"metric_name": [key[0]] * len(les), "le": les, "cum": cum}
        )

    return _fn


def streaming_le_buckets(
    sdf: DataFrame, value_col: str, les: list[int]
) -> DataFrame:
    """Streaming classic-histogram cumulative buckets per metric via
    ``applyInPandasWithState``: the live counterpart of
    ``operators.promql.cumulative_le_buckets`` (the frame
    histogram_quantile / histogram_fraction consume). State is
    ``len(les)+1`` longs per key — bucket counts merge by addition, the
    mergeability histograms exist for — and every micro-batch re-emits the
    cumulative grid, so the stream's last emission per (key, le) is
    bit-equal to the batch frame over the same rows. The reference's
    streaming layer forwards raw rows only (``query/streaming.rs``;
    SURVEY §2.9 superset)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    bounds = sorted(int(b) for b in les)
    keyed = sdf.select(
        "metric_name", F.col(value_col).cast("long").alias("_v")
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        _hist_fn_factory(bounds),
        outputStructType=_HISTB_OUTPUT,
        stateStructType=_HISTB_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: log-bucketed quantile sketch (DDSketch-style)
# ---------------------------------------------------------------------------

_QSK_OUTPUT = "metric_name string, bucket_us long, qslot long, qcount long"
_QSK_STATE = "slots array<long>, counts array<long>"


def _qsketch_fn_factory(evict_ms: int | None, step_us: int | None = None):
    """Per-(metric, bucket) state: the occupied slot indices and their
    counts as parallel long arrays — PER-KEY width bounded by
    log_γ(dynamic range) (tens in practice).  The SLOT is computed
    Spark-side before this operator (the same ``quantile_sketch_slot``
    column expression the batch operator uses), so JVM-vs-Python libm
    drift cannot split a value across slots; this function only counts.
    Each micro-batch re-emits the full (slot, count) grid, so the LAST
    emission per (metric, bucket, slot) is bit-equal to
    ``downsample_quantile_sketch`` over the same rows.  ``evict_ms``
    (ADVICE r13 #2) arms a processing-time timeout per key: a
    (metric, bucket) seeing no new rows for that long drops its state —
    the rows already emitted stand.  Samples arriving for a bucket that
    is ALREADY past the horizon (no live state, bucket end older than
    ``evict_ms`` on the processing clock) are DROPPED, never folded: a
    restarted key would re-emit a tiny partial count that supersedes
    the bucket's correct final emission under the last-emission-wins
    contract — a corrupted hybrid distribution, strictly worse than
    ignoring the late sample (r14 review finding)."""

    def fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
        import time as _time

        import pandas as pd

        if evict_ms is not None and getattr(state, "hasTimedOut", False):
            # allowed-lateness horizon passed with no new rows for this
            # (metric, bucket): drop the state; the key's past
            # emissions stand as its final counts.
            state.remove()
            return
        if (
            evict_ms is not None
            and step_us is not None
            and not state.exists
            and _time.time() * 1000.0 - (key[1] + step_us) / 1000.0
            > evict_ms
        ):
            # no live state AND the bucket closed more than the horizon
            # ago: this is (or is indistinguishable from) a post-
            # eviction straggler — drop it rather than restart the key
            # with a partial count that would supersede the bucket's
            # final emission. Eviction mode therefore assumes LIVE
            # ingestion (event time tracking the processing clock);
            # replaying history through an evict-armed sketch would
            # drop everything — use the default evict_after_s=None for
            # backfill.
            for _ in pdf_iter:
                pass
            return
        if state.exists:
            got = state.get
            m = dict(zip(list(got[0]), list(got[1])))
        else:
            m = {}
        n = 0
        for pdf in pdf_iter:
            s = pdf["_slot"].dropna()
            if len(s) == 0:
                continue
            n += len(s)
            for slot, cnt in s.astype("int64").value_counts().items():
                m[int(slot)] = m.get(int(slot), 0) + int(cnt)
        items = sorted(m.items())
        state.update(([k for k, _ in items], [v for _, v in items]))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "metric_name": [key[0]] * len(items),
                "bucket_us": [key[1]] * len(items),
                "qslot": [k for k, _ in items],
                "qcount": [v for _, v in items],
            }
        )

    return fn


_qsketch_fn = _qsketch_fn_factory(None)


def streaming_quantile_sketch(
    sdf: DataFrame,
    step_seconds: int,
    alpha: float = 0.01,
    ts_col: str = "timestamp",
    value_col: str = "value",
    evict_after_s: int | None = None,
) -> DataFrame:
    """Streaming quantile-sketch maintenance via
    ``applyInPandasWithState`` — the stateful twin of
    ``operators.quantile_sketch.downsample_quantile_sketch`` (VERDICT
    r12 item 6, the eighth batch/stream twin): per (metric, time
    bucket), one count per occupied log-scale slot, re-emitted each
    micro-batch so the stream's last emission per (metric, bucket, slot)
    is bit-equal to the batch sketch over the same rows (slot counts
    add — the mergeability the sketch exists for). NULL/NaN values
    count under ``NULL_SLOT``, exactly like the batch sketch (the
    complete-downsample property; rank walks filter the sentinel).
    ``bucket_us`` is integer epoch-µs (``timestamp_micros`` it for the
    batch shape). The reference's streaming layer forwards raw
    rows only (``query/streaming.rs``; SURVEY §2.9 superset).

    State bound (ADVICE r13 #2): each key's state is constant-width
    (occupied slots), but the KEY COUNT grows by one (metric, bucket)
    pair per step_seconds of stream lifetime under the default
    ``evict_after_s=None`` — fine for bounded runs and tests, linear
    for a months-long continuous aggregation.  Pass ``evict_after_s``
    (an allowed-lateness horizon, e.g. several steps) to arm a
    processing-time timeout that drops a bucket's state once no new
    row has arrived for it in that long: total state becomes
    O(active buckets), and bit-equality to the batch sketch then holds
    for samples arriving within the horizon — a sample later than that
    is DROPPED (restarting an evicted key would re-emit a partial
    count that supersedes the bucket's correct final emission; choose
    the horizon ≥ the ingest path's worst-case lateness, exactly like
    a watermark).  ``evict_after_s < step_seconds`` is refused (r14
    review): the timeout arms from the key's LAST ARRIVAL, so a
    shorter horizon could evict a still-open bucket mid-life and the
    next on-time sample would restart it — the same partial-count
    corruption the straggler drop exists to prevent; the full
    bit-equality guarantee needs the horizon ≥ the longest in-bucket
    arrival gap, which a horizon ≥ one whole step makes true for any
    stream delivering each bucket's samples without a bucket-sized
    silence in the middle.  Eviction mode assumes live ingestion —
    replaying old event times through it would drop them; keep the
    default for backfill."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if evict_after_s is not None and int(evict_after_s) < int(step_seconds):
        raise ValueError(
            f"evict_after_s ({evict_after_s}) must be >= step_seconds "
            f"({step_seconds}) — a sub-step horizon can evict a "
            "still-open bucket mid-life and corrupt its counts on the "
            "next on-time sample"
        )

    from cardinalsin_spark.functions.core import time_bucket
    from cardinalsin_spark.operators.quantile_sketch import (
        NULL_SLOT,
        quantile_sketch_slot,
    )

    keyed = sdf.select(
        "metric_name",
        F.unix_micros(time_bucket(ts_col, step_seconds)).alias("bucket_us"),
        # NULL/NaN samples count under NULL_SLOT, exactly like the
        # batch sketch (complete-downsample property)
        F.coalesce(
            quantile_sketch_slot(F.col(value_col), alpha),
            F.lit(NULL_SLOT),
        ).alias("_slot"),
    )
    return keyed.groupBy("metric_name", "bucket_us").applyInPandasWithState(
        (
            _qsketch_fn
            if evict_after_s is None
            else _qsketch_fn_factory(
                int(evict_after_s) * 1000, step_seconds * 1_000_000
            )
        ),
        outputStructType=_QSK_OUTPUT,
        stateStructType=_QSK_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if evict_after_s is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Snapshot-committing streaming sink (idempotent per micro-batch)
# ---------------------------------------------------------------------------


def snapshot_ingest_sink(root: str, backend=None, on_commit=None):
    """Build a ``foreachBatch`` function that lands each micro-batch as
    parquet files under ``root`` and CAS-commits one snapshot version per
    batch — the streaming twin of ``engine.ingest``'s
    snapshot-registered write path.

    Exactly-once per manifest: the committed manifest carries
    ``stream_batch_id``, and a REPLAYED batch (Structured Streaming
    re-runs the last batch after a crash before the checkpoint advanced)
    is detected by ``batch_id <= head's stream_batch_id`` and skipped
    before any file is written — the same transactional-sink idea as
    Delta's ``txnAppId``/``txnVersion``. ``SnapshotCatalog.commit``
    carries the marker forward into every interleaved non-stream commit
    (compact, merge_upsert, commit_new_files), so the head check stays
    valid whatever committed in between.

    Crash story: files land under a staging dir NAMED BY THE BATCH and
    move into place under DETERMINISTIC names (``stream-{batch}-{ordinal}``)
    before the commit, so a crash anywhere replays cleanly — the rerun
    overwrites the same paths instead of writing a second,
    differently-named set that a later ``commit_new_files`` would adopt
    alongside the first (duplicate rows). A lost CAS race (interleaved
    compaction/ingest commit) re-reads the winner's head and retries: the
    batch's files are already durable, only the manifest pointer races.
    Stage leftovers from batches that did commit are reclaimed by
    ``vacuum``.

    A downstream consumer pairs this with ``SnapshotCatalog.read_changes``
    for per-batch incremental reads.

    ``on_commit`` (optional) is called as ``on_commit(version)`` after a
    batch's manifest commit lands — the streaming continuous-aggregate
    hook: pass ``lambda v: refresh_rollup(spark, cat, ...)`` and every
    micro-batch folds into the rollup incrementally (the refresh reads
    the CDC delta, so its cost tracks the batch, not the table). NOT
    called on replayed/raced-away batches (their rows were already
    committed — and already folded — by the earlier run); an exception
    from the hook fails the batch, and the replay skip above makes the
    retry safe because refresh itself is idempotent on an unchanged base
    head.
    """
    import os
    import shutil

    from cardinalsin_spark.sources.snapshots import (
        SnapshotCatalog,
        SnapshotConflict,
    )

    def _sink(batch_df, batch_id: int) -> None:
        cat = SnapshotCatalog(root, backend=backend)
        head = cat.current_version()
        if head is not None:
            last = cat.manifest(head).get("stream_batch_id")
            if last is not None and batch_id <= last:
                return  # replayed batch: already durable, skip
        stage = os.path.join(root, f"_stream-stage-{batch_id:08d}")
        batch_df.write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(stage)
        moved = []
        parts = sorted(
            name
            for name in os.listdir(stage)
            if name.endswith(".parquet") and not name.startswith((".", "_"))
        )
        for i, name in enumerate(parts):
            dst = os.path.join(root, f"stream-{batch_id:08d}-{i:04d}.parquet")
            os.replace(os.path.join(stage, name), dst)  # replay overwrites
            moved.append(dst)
        shutil.rmtree(stage, ignore_errors=True)
        # A crashed attempt of THIS batch may have landed more part files
        # than this rerun produced (output partitioning is not stable
        # across reruns). Those leftovers hold rows this rerun re-wrote —
        # delete them, or a later commit_new_files would adopt them as
        # "new" data next to the committed set (duplicate rows).
        prefix = f"stream-{batch_id:08d}-"
        superseded = {
            os.path.join(root, name)
            for name in os.listdir(root)
            if name.startswith(prefix) and name.endswith(".parquet")
        } - set(moved)
        for stale in sorted(superseded):
            os.unlink(stale)
        for attempt in range(8):
            head = cat.current_version()
            if head is not None:
                last = cat.manifest(head).get("stream_batch_id")
                if last is not None and batch_id <= last:
                    return  # the racing commit already carries this batch
            base = set(cat.files(head)) if head is not None else set()
            try:
                # set-union with the moved files (an interleaved
                # commit_new_files may already have adopted them — never
                # register twice), minus any superseded crashed-attempt
                # files an adoption picked up before this rerun replaced them
                v = cat.commit(
                    sorted((base | set(moved)) - superseded),
                    head,
                    extra={"stream_batch_id": int(batch_id)},
                )
                if on_commit is not None:
                    on_commit(v)
                return
            except SnapshotConflict:
                if attempt == 7:
                    raise

    return _sink

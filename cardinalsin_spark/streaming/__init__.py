from cardinalsin_spark.streaming.live import (
    historical_live_merge,
    live_filter,
    read_metrics_stream,
    session_agg,
    stateful_counter_increase,
    stateful_ewma,
    stream_enrich,
    stream_interval_join,
    streaming_dedup,
    streaming_heavy_hitters,
    streaming_hll_distinct,
    windowed_agg,
)

__all__ = [
    "historical_live_merge",
    "live_filter",
    "read_metrics_stream",
    "session_agg",
    "stateful_counter_increase",
    "stateful_ewma",
    "stream_enrich",
    "stream_interval_join",
    "streaming_dedup",
    "streaming_heavy_hitters",
    "streaming_hll_distinct",
    "windowed_agg",
]

"""Adaptive-index accounting: query-pattern stats → index/layout
recommendations.

The reference collects per-column filter/group-by usage with selectivity
(``adaptive_index/stats_collector.rs:9-160``), scores candidates by
``query_benefit / (storage_cost + write_overhead)``
(``adaptive_index/recommender.rs:116-146``) and picks an index type by
cardinality — Inverted ≤1k, Range ≤100k, BloomFilter above
(``adaptive_index/recommender.rs:133-139``). Crucially its indexes never
change execution (``query/engine.rs:259-300``) — the whole subsystem is
accounting. The honest Spark mapping is therefore a *query-log analyzer*:
record which columns queries filter/group on, and recommend partition /
sort (Z-ORDER-style) / bloom-filter columns for the writer. Execution is
untouched, exactly like the reference.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QueryStats:
    """Per-column usage counters harvested from optimized plans."""

    filter_counts: Counter = field(default_factory=Counter)
    groupby_counts: Counter = field(default_factory=Counter)
    queries_seen: int = 0


class QueryStatsCollector:
    """Walks each query's *optimized* logical plan (so only predicates that
    survive Catalyst count) and tallies which columns appear in Filter and
    Aggregate nodes."""

    def __init__(self, candidate_columns: list[str]):
        self.columns = list(candidate_columns)
        self.stats = QueryStats()

    def record(self, df: DataFrame) -> None:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        self.stats.queries_seen += 1
        for line in plan.splitlines():
            stripped = line.lstrip(" +-:")
            is_filter = stripped.startswith("Filter")
            is_agg = stripped.startswith("Aggregate")
            if not (is_filter or is_agg):
                continue
            for col in self.columns:
                if f"{col}#" in stripped:  # attribute refs print as name#id
                    if is_filter:
                        self.stats.filter_counts[col] += 1
                    else:
                        self.stats.groupby_counts[col] += 1

    # -- recommendation ------------------------------------------------------

    def recommendations(
        self, metrics: DataFrame, min_uses: int = 2, top_n: int = 5
    ) -> list[dict]:
        """Score candidates by usage and attach the reference's
        cardinality-tiered index type. One distributed agg pass measures
        approximate cardinality for all used columns at once."""
        used = [
            c
            for c in self.columns
            if self.stats.filter_counts[c] + self.stats.groupby_counts[c]
            >= min_uses
        ]
        if not used:
            return []
        card_row = metrics.agg(
            *[F.approx_count_distinct(c).alias(c) for c in used]
        ).first()
        out = []
        for c in used:
            n_distinct = card_row[c]
            if n_distinct <= 1_000:
                kind = "inverted"  # partition or dictionary-friendly
            elif n_distinct <= 100_000:
                kind = "range"  # sort/Z-ORDER clustering
            else:
                kind = "bloom_filter"  # parquet bloom filter on write
            score = (
                self.stats.filter_counts[c] * 2 + self.stats.groupby_counts[c]
            ) / (1.0 + n_distinct / 1_000_000)
            out.append(
                {
                    "column": c,
                    "index_type": kind,
                    "filter_uses": self.stats.filter_counts[c],
                    "groupby_uses": self.stats.groupby_counts[c],
                    "approx_cardinality": n_distinct,
                    "score": score,
                }
            )
        out.sort(key=lambda d: -d["score"])
        return out[:top_n]

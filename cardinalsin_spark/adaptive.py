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

import time
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


# ---------------------------------------------------------------------------
# Index lifecycle: Invisible → Visible → Deprecated
# ---------------------------------------------------------------------------
#
# The reference trials every recommended index before letting the planner
# see it (``adaptive_index/lifecycle.rs:9-139``): created Invisible, it
# accrues a would-have-helped counter; ≥100 helped queries promotes it to
# Visible, while an index that still hasn't helped after the visibility-
# check delay (48 h by default) is dropped. Visible indexes unused for 30+
# days are marked Deprecated (``lifecycle.rs:157-183``). As with the rest
# of the subsystem the states never alter execution — it is accounting that
# gates which physical-layout jobs are worth running. The Spark analogue
# keeps the same state machine and counters, and on promotion emits a
# writer job spec (partition / Z-order / parquet-bloom-filter) for the
# layout machinery in ``operators/compaction.py`` — the one place Spark
# can actually cash in an "index": the file layout.


@dataclass
class IndexEntry:
    """Metadata for one trialed index (ref ``lifecycle.rs:22-31``)."""

    id: str
    column: str
    index_type: str  # "inverted" | "range" | "bloom_filter"
    visibility: str = "invisible"  # → "visible" → "deprecated"
    created_at: float = 0.0
    last_used: float | None = None
    usage_count: int = 0
    would_have_helped: int = 0


class IndexLifecycleManager:
    """State machine + counters for trialed indexes.

    ``clock`` is injectable (seconds, monotonic) so the 48 h / 30 d
    thresholds are testable without sleeping; defaults to real time.
    """

    def __init__(
        self,
        visibility_check_delay_s: float = 48 * 3600.0,
        promote_threshold: int = 100,
        unused_days_threshold: float = 30.0,
        clock=time.monotonic,
    ):
        self.visibility_check_delay_s = float(visibility_check_delay_s)
        self.promote_threshold = int(promote_threshold)
        self.unused_seconds_threshold = float(unused_days_threshold) * 86400.0
        self._clock = clock
        self._indexes: dict[str, IndexEntry] = {}
        self._seq = 0

    # -- creation -----------------------------------------------------------

    def create_invisible_index(self, column: str, index_type: str) -> str:
        """New indexes start Invisible — never planner-visible until they
        prove themselves (ref ``lifecycle.rs:59-83``). Deterministic ids
        (no uuid) keep test runs reproducible."""
        self._seq += 1
        idx_id = f"idx-{column}-{self._seq}"
        self._indexes[idx_id] = IndexEntry(
            id=idx_id,
            column=column,
            index_type=index_type,
            created_at=self._clock(),
        )
        return idx_id

    def create_from_recommendations(self, recs: list[dict]) -> list[str]:
        """Trial every recommendation ``QueryStatsCollector`` produced."""
        return [
            self.create_invisible_index(r["column"], r["index_type"])
            for r in recs
        ]

    # -- accounting ---------------------------------------------------------

    def record_query_columns(self, filter_columns: set[str]) -> None:
        """Feed one query's filter columns through the counters: invisible
        indexes on a filtered column would have helped; visible ones were
        used (ref ``lifecycle.rs:142-154``)."""
        now = self._clock()
        for e in self._indexes.values():
            if e.column not in filter_columns:
                continue
            if e.visibility == "invisible":
                e.would_have_helped += 1
            elif e.visibility == "visible":
                e.usage_count += 1
                e.last_used = now

    def record_query(self, df: DataFrame, candidate_columns: list[str]) -> None:
        """Convenience: harvest filter columns from an optimized plan (same
        parse as ``QueryStatsCollector.record``) and feed the counters."""
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        cols = set()
        for line in plan.splitlines():
            stripped = line.lstrip(" +-:")
            if stripped.startswith("Filter"):
                cols.update(c for c in candidate_columns if f"{c}#" in stripped)
        if cols:
            self.record_query_columns(cols)

    # -- state transitions --------------------------------------------------

    def check_visibility(self) -> list[str]:
        """Promote invisible indexes with ≥ threshold would-have-helped;
        drop ones past the check delay that never earned it
        (ref ``lifecycle.rs:118-139``). Returns promoted ids."""
        now = self._clock()
        promoted, dropped = [], []
        for idx_id, e in self._indexes.items():
            if e.visibility != "invisible":
                continue
            if e.would_have_helped >= self.promote_threshold:
                e.visibility = "visible"
                promoted.append(idx_id)
            elif now - e.created_at > self.visibility_check_delay_s:
                dropped.append(idx_id)
        for idx_id in dropped:
            del self._indexes[idx_id]
        return promoted

    def retirement_check(self) -> list[str]:
        """Deprecate visible indexes unused for the threshold period
        (ref ``lifecycle.rs:157-183``). Returns deprecated ids."""
        now = self._clock()
        out = []
        for e in self._indexes.values():
            if e.visibility != "visible":
                continue
            ref_t = e.last_used if e.last_used is not None else e.created_at
            if now - ref_t > self.unused_seconds_threshold:
                e.visibility = "deprecated"
                out.append(e.id)
        return out

    # -- views --------------------------------------------------------------

    def visible_indexes(self) -> list[IndexEntry]:
        return [e for e in self._indexes.values() if e.visibility == "visible"]

    def invisible_indexes(self) -> list[IndexEntry]:
        return [e for e in self._indexes.values() if e.visibility == "invisible"]

    def remove_index(self, idx_id: str) -> None:
        self._indexes.pop(idx_id, None)

    # -- promotion payoff: writer job specs ---------------------------------

    def writer_job_specs(self, time_column: str = "ts") -> list[dict]:
        """Translate each Visible index into the physical-layout job that
        realizes it on parquet — the Spark cash-out of the reference's
        cardinality tiers (``recommender.rs:133-139``): inverted →
        partition-by (low cardinality), range → Z-order rewrite with the
        time column (``operators/compaction.py`` write_zordered),
        bloom_filter → parquet bloom-filter write options."""
        specs = []
        for e in sorted(self.visible_indexes(), key=lambda x: x.id):
            if e.index_type == "inverted":
                specs.append(
                    {
                        "index_id": e.id,
                        "action": "write_partitioned",
                        "partition_by": [e.column],
                    }
                )
            elif e.index_type == "range":
                specs.append(
                    {
                        "index_id": e.id,
                        "action": "write_zordered",
                        "a": e.column,
                        "b": time_column,
                    }
                )
            else:  # bloom_filter
                # executable for real since round 8: the per-chunk bloom
                # sidecar (sources/chunk_bloom.py — Spark's vectorized
                # reader ignores parquet-native column blooms, so the
                # sidecar is the one the planner actually consults);
                # `python -m cardinalsin_spark.jobs bloom` runs it
                specs.append(
                    {
                        "index_id": e.id,
                        "action": "build_chunk_bloom",
                        "column": e.column,
                        "job": ["bloom", "--column", e.column],
                    }
                )
        return specs


# ---------------------------------------------------------------------------
# Column promotion (label → dedicated column)
# ---------------------------------------------------------------------------


@dataclass
class BackfillJob:
    """Backfill bookkeeping for one promotion
    (ref ``column_promoter.rs:24-58``)."""

    id: str
    label_name: str
    index_type: str
    status: str = "pending"  # → in_progress → completed | failed
    total_chunks: int = 0
    processed_chunks: int = 0
    total_rows: int = 0
    processed_rows: int = 0

    def percentage(self) -> float:
        if self.total_chunks == 0:
            return 0.0
        return self.processed_chunks / self.total_chunks * 100.0


class ColumnPromoter:
    """Migrate a key of the generic ``labels`` map to a dedicated top-level
    column (ref ``column_promoter.rs:60-139``). The reference only queues
    the job ("in production this would … backfill"); here ``backfill``
    actually performs the Spark-side rewrite — ``element_at(labels, name)``
    materialized as a real column, which parquet then gets stats/dictionary
    pages for, making the promoted column independently prunable."""

    def __init__(self):
        self._jobs: dict[str, BackfillJob] = {}
        self._seq = 0

    def promote_column(self, label_name: str, index_type: str) -> str:
        self._seq += 1
        job_id = f"promote-{label_name}-{self._seq}"
        self._jobs[job_id] = BackfillJob(
            id=job_id, label_name=label_name, index_type=index_type
        )
        return job_id

    def get_job(self, job_id: str) -> BackfillJob | None:
        return self._jobs.get(job_id)

    def pending_jobs(self) -> list[BackfillJob]:
        return [j for j in self._jobs.values() if j.status == "pending"]

    def update_progress(
        self, job_id: str, processed_chunks: int, processed_rows: int
    ) -> None:
        j = self._jobs[job_id]
        j.processed_chunks = processed_chunks
        j.processed_rows = processed_rows

    def complete_job(self, job_id: str) -> None:
        self._jobs[job_id].status = "completed"

    def fail_job(self, job_id: str) -> None:
        self._jobs[job_id].status = "failed"

    def backfill(
        self, job_id: str, df: DataFrame, labels_col: str = "labels"
    ) -> DataFrame:
        """The dual-write/backfill transform: add the promoted label as a
        dedicated column. Narrow (no shuffle) — safe to fold into any
        compaction rewrite pass."""
        j = self._jobs[job_id]
        j.status = "in_progress"
        return df.withColumn(
            j.label_name, F.element_at(F.col(labels_col), j.label_name)
        )

"""Topic-filtered broadcast: subscription filters for streaming fan-out.

The reference fans ingested batches out to streaming subscribers through a
broadcast channel where every subscription carries a ``TopicFilter``
(All / Shard / Tenant / Metrics / And / Or) evaluated against per-batch
metadata before delivery — "eliminating 90% bandwidth waste"
(``ingester/topic_broadcast.rs:34-160``). Spark owns the transport (a
streaming query per subscriber, or Kafka topics), so the analogue here is
the part with semantics: the filter algebra itself, compiled two ways —

- ``matches(metadata)``: the batch-level short-circuit, for
  ``foreachBatch`` sinks / routers that can skip a whole batch on its
  (shard, tenant, metric-set) metadata without touching rows;
- ``to_column(...)``: the same filter as a Spark ``Column`` predicate, the
  row-level refinement pushed into the stream plan (``live_filter``-style).

``TopicRouter`` replays the reference's FilteredReceiver accounting:
per-subscriber delivered/filtered counts and the measured bandwidth
reduction, plus per-metric subscription stats.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BatchMetadata:
    """Routing metadata attached to each broadcast batch
    (ref ``topic_broadcast.rs:13-21``)."""

    shard_id: str = ""
    tenant_id: int = 0
    metrics: tuple[str, ...] = ()


class TopicFilter:
    """Subscription filter algebra (ref ``topic_broadcast.rs:33-95``).

    Build with the constructors (``TopicFilter.all()``, ``.shard(s)``,
    ``.tenant(t)``, ``.metrics([...])``) and combine with ``.and_()`` /
    ``.or_()``; ``and_`` flattens nested ANDs exactly like the reference's
    ``and`` combinator."""

    def __init__(self, kind: str, value=None, children: tuple | None = None):
        self.kind = kind  # all | shard | tenant | metrics | and | or
        self.value = value
        self.children: tuple[TopicFilter, ...] = children or ()

    # -- constructors -------------------------------------------------------

    @classmethod
    def all(cls) -> TopicFilter:
        return cls("all")

    @classmethod
    def shard(cls, shard_id: str) -> TopicFilter:
        return cls("shard", shard_id)

    @classmethod
    def tenant(cls, tenant_id: int) -> TopicFilter:
        return cls("tenant", int(tenant_id))

    @classmethod
    def metrics(cls, names: list[str]) -> TopicFilter:
        return cls("metrics", tuple(names))

    @classmethod
    def any_of(cls, *filters: TopicFilter) -> TopicFilter:
        return cls("or", children=tuple(filters))

    def and_(self, other: TopicFilter) -> TopicFilter:
        mine = self.children if self.kind == "and" else (self,)
        theirs = other.children if other.kind == "and" else (other,)
        return TopicFilter("and", children=(*mine, *theirs))

    def or_(self, other: TopicFilter) -> TopicFilter:
        return TopicFilter("or", children=(self, other))

    # -- batch-level evaluation (ref matches(), :50-64) ---------------------

    def matches(self, metadata: BatchMetadata) -> bool:
        if self.kind == "all":
            return True
        if self.kind == "shard":
            return metadata.shard_id == self.value
        if self.kind == "tenant":
            return metadata.tenant_id == self.value
        if self.kind == "metrics":
            # any metric present in the batch is subscribed
            return any(m in self.value for m in metadata.metrics)
        if self.kind == "and":
            return all(c.matches(metadata) for c in self.children)
        if self.kind == "or":
            return any(c.matches(metadata) for c in self.children)
        raise ValueError(f"unknown filter kind {self.kind!r}")

    # -- row-level compilation ----------------------------------------------

    def to_column(
        self,
        shard_col: str = "shard_id",
        tenant_col: str = "tenant_id",
        name_col: str = "metric_name",
    ) -> Column:
        """The filter as a Spark predicate — the row-level refinement of
        the batch-level gate (a batch can match on its metric SET while
        only some rows carry a subscribed metric)."""
        if self.kind == "all":
            return F.lit(True)
        if self.kind == "shard":
            return F.col(shard_col) == F.lit(self.value)
        if self.kind == "tenant":
            return F.col(tenant_col) == F.lit(self.value)
        if self.kind == "metrics":
            return F.col(name_col).isin(list(self.value))
        cols = [c.to_column(shard_col, tenant_col, name_col) for c in self.children]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if self.kind == "and" else (out | c)
        return out

    def __repr__(self) -> str:  # debugging aid
        if self.children:
            return f"{self.kind}({', '.join(map(repr, self.children))})"
        return f"{self.kind}({self.value!r})" if self.value is not None else self.kind


@dataclass
class _Subscription:
    filter: TopicFilter
    delivered: int = 0
    filtered: int = 0


@dataclass
class RouteStats:
    delivered: int
    filtered: int

    @property
    def reduction_pct(self) -> float:
        total = self.delivered + self.filtered
        return 0.0 if total == 0 else self.filtered * 100.0 / total


class TopicRouter:
    """Fan-out decision + accounting (ref ``topic_broadcast.rs:96-210``):
    given a batch's metadata, which subscribers receive it — and how much
    delivery each subscription avoided (the FilteredReceiver counters and
    the bandwidth-reduction figure the reference logs)."""

    def __init__(self):
        self._subs: dict[str, _Subscription] = {}
        self._metric_stats: dict[str, int] = {}

    def _count_metrics(self, filt: TopicFilter, delta: int) -> None:
        if filt.kind == "metrics":  # ref tracks per-metric subscription counts
            for m in filt.value:
                n = self._metric_stats.get(m, 0) + delta
                if n > 0:
                    self._metric_stats[m] = n
                else:
                    self._metric_stats.pop(m, None)

    def subscribe(self, subscriber_id: str, filt: TopicFilter) -> None:
        old = self._subs.get(subscriber_id)
        if old is not None:  # re-subscribe replaces — release the old counts
            self._count_metrics(old.filter, -1)
        self._subs[subscriber_id] = _Subscription(filt)
        self._count_metrics(filt, +1)

    def unsubscribe(self, subscriber_id: str) -> None:
        sub = self._subs.pop(subscriber_id, None)
        if sub is not None:
            self._count_metrics(sub.filter, -1)

    def receiver_count(self) -> int:
        return len(self._subs)

    def route(self, metadata: BatchMetadata) -> list[str]:
        """Subscribers whose filter admits this batch; counters updated
        either way."""
        out = []
        for sid, sub in self._subs.items():
            if sub.filter.matches(metadata):
                sub.delivered += 1
                out.append(sid)
            else:
                sub.filtered += 1
        return out

    def stats(self, subscriber_id: str) -> RouteStats:
        s = self._subs[subscriber_id]
        return RouteStats(delivered=s.delivered, filtered=s.filtered)

    def subscription_stats(self) -> dict[str, int]:
        return dict(self._metric_stats)

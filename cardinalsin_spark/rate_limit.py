"""Per-tenant rate limiting and quota management for driver applications.

The reference gates every write/query on token buckets per tenant
(``rate_limit.rs:1-330``): write RPS, write bytes/s, query RPS buckets
refilling continuously, plus a concurrent-query counter — denials carry a
``retry_after_ms`` hint. In a Spark deployment the cluster manager owns
resource fairness, but a multi-tenant driver service (the thing calling
``engine.sql`` / ``write_metrics`` on behalf of users) still needs
admission control, so the same state machine is provided here as plain
Python with an injectable clock: gate a submission with
``check_write``/``check_query`` before launching the Spark job, pair each
allowed query with ``query_completed`` (or use the ``query_slot`` context
manager).

Quota defaults mirror the reference (``rate_limit.rs:31-46``): 10k write
RPS, 100 MB/s write bytes, 1k query RPS, 100 concurrent queries.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class TenantQuota:
    """Configurable per-tenant limits (ref ``rate_limit.rs:14-46``)."""

    max_write_rps: int = 10_000
    max_write_bytes_per_sec: int = 100 * 1024 * 1024
    max_query_rps: int = 1_000
    max_concurrent_queries: int = 100
    max_storage_bytes: int = 1024**4  # 1 TB
    max_indexes: int = 50


class TokenBucket:
    """Continuous-refill token bucket (ref ``rate_limit.rs:44-106``):
    starts full, refills ``refill_rate`` tokens/second up to ``capacity``;
    acquisition is all-or-nothing. Fractional accrual is kept (unlike the
    reference's integer truncation) so sub-second cadences don't starve —
    behavior at whole-second observation points is identical."""

    def __init__(self, capacity: int, refill_rate: int, clock=time.monotonic):
        self.capacity = float(capacity)
        self.refill_rate = float(refill_rate)
        self._tokens = float(capacity)
        self._clock = clock
        self._last_refill = clock()

    def _refill(self) -> None:
        now = self._clock()
        elapsed = now - self._last_refill
        if elapsed > 0:
            self._tokens = min(
                self.capacity, self._tokens + elapsed * self.refill_rate
            )
            self._last_refill = now

    def try_acquire(self, tokens: float = 1.0) -> bool:
        self._refill()
        if self._tokens < tokens:
            return False
        self._tokens -= tokens
        return True

    def available(self) -> float:
        self._refill()
        return self._tokens


@dataclass
class Denial:
    """Why a request was rejected, with the client backoff hint the
    reference computes (ref ``rate_limit.rs:146-157, 203-218``)."""

    reason: str  # write_rps | write_bytes | query_rps | concurrent_queries
    limit: int
    retry_after_ms: int = 0
    current: int = 0


@dataclass
class TenantUsage:
    write_rps_available: float
    write_bytes_available: float
    query_rps_available: float
    concurrent_queries: int
    quota: TenantQuota = field(default_factory=TenantQuota)


class _TenantState:
    def __init__(self, quota: TenantQuota, clock):
        self.quota = quota
        self.write_rps = TokenBucket(quota.max_write_rps, quota.max_write_rps, clock)
        self.write_bytes = TokenBucket(
            quota.max_write_bytes_per_sec, quota.max_write_bytes_per_sec, clock
        )
        self.query_rps = TokenBucket(quota.max_query_rps, quota.max_query_rps, clock)
        self.concurrent_queries = 0


class RateLimiter:
    """Per-tenant admission control (ref ``rate_limit.rs:166-268``).
    Tenants materialize on first use with the default quota;
    ``set_tenant_quota`` resets a tenant to fresh buckets under the new
    quota, exactly like the reference's insert-replace."""

    def __init__(self, default_quota: TenantQuota | None = None, clock=time.monotonic):
        self._default = default_quota or TenantQuota()
        self._clock = clock
        self._tenants: dict[str, _TenantState] = {}

    def _get(self, tenant_id: str) -> _TenantState:
        st = self._tenants.get(tenant_id)
        if st is None:
            st = self._tenants[tenant_id] = _TenantState(self._default, self._clock)
        return st

    def set_tenant_quota(self, tenant_id: str, quota: TenantQuota) -> None:
        self._tenants[tenant_id] = _TenantState(quota, self._clock)

    # -- admission checks ---------------------------------------------------

    def check_write(self, tenant_id: str, n_bytes: int) -> Denial | None:
        """None = allowed. Order matches the reference: RPS first, then
        bytes (an RPS denial does not consume byte tokens)."""
        st = self._get(tenant_id)
        if not st.write_rps.try_acquire(1):
            return Denial(
                "write_rps",
                st.quota.max_write_rps,
                retry_after_ms=1000 // max(st.quota.max_write_rps, 1),
            )
        if not st.write_bytes.try_acquire(n_bytes):
            return Denial(
                "write_bytes",
                st.quota.max_write_bytes_per_sec,
                retry_after_ms=n_bytes * 1000
                // max(st.quota.max_write_bytes_per_sec, 1),
            )
        return None

    def check_query(self, tenant_id: str) -> Denial | None:
        st = self._get(tenant_id)
        if not st.query_rps.try_acquire(1):
            return Denial(
                "query_rps",
                st.quota.max_query_rps,
                retry_after_ms=1000 // max(st.quota.max_query_rps, 1),
            )
        if st.concurrent_queries >= st.quota.max_concurrent_queries:
            return Denial(
                "concurrent_queries",
                st.quota.max_concurrent_queries,
                current=st.concurrent_queries,
            )
        st.concurrent_queries += 1
        return None

    def query_completed(self, tenant_id: str) -> None:
        st = self._tenants.get(tenant_id)
        if st is not None and st.concurrent_queries > 0:
            st.concurrent_queries -= 1

    @contextmanager
    def query_slot(self, tenant_id: str):
        """``with limiter.query_slot(t) as denial:`` — yields None when
        admitted (slot released on exit) or the Denial when not."""
        denial = self.check_query(tenant_id)
        try:
            yield denial
        finally:
            if denial is None:
                self.query_completed(tenant_id)

    # -- introspection ------------------------------------------------------

    def get_usage(self, tenant_id: str) -> TenantUsage | None:
        st = self._tenants.get(tenant_id)
        if st is None:
            return None
        return TenantUsage(
            write_rps_available=st.write_rps.available(),
            write_bytes_available=st.write_bytes.available(),
            query_rps_available=st.query_rps.available(),
            concurrent_queries=st.concurrent_queries,
            quota=st.quota,
        )

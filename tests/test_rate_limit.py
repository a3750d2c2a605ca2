"""Per-tenant rate limiting (ref ``rate_limit.rs``): token-bucket refill,
write RPS/bytes gates in reference order, query RPS + concurrency slots,
retry-after hints, quota replacement, usage introspection."""

from __future__ import annotations

from cardinalsin_spark.rate_limit import (
    RateLimiter,
    TenantQuota,
    TokenBucket,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def test_token_bucket_starts_full_and_refills():
    clock = FakeClock()
    b = TokenBucket(capacity=10, refill_rate=5, clock=clock)
    assert b.available() == 10
    assert b.try_acquire(10)
    assert not b.try_acquire(1)
    clock.advance(1.0)  # +5 tokens
    assert b.available() == 5
    clock.advance(10.0)  # caps at capacity
    assert b.available() == 10


def test_token_bucket_all_or_nothing():
    b = TokenBucket(capacity=4, refill_rate=1, clock=FakeClock())
    assert not b.try_acquire(5)
    assert b.available() == 4  # failed acquire consumes nothing


def test_write_gates_in_reference_order():
    clock = FakeClock()
    quota = TenantQuota(max_write_rps=2, max_write_bytes_per_sec=100)
    rl = RateLimiter(quota, clock=clock)
    assert rl.check_write("t1", 60) is None
    d = rl.check_write("t1", 60)  # RPS ok (2nd), bytes exhausted (120>100)
    assert d is not None and d.reason == "write_bytes"
    assert d.retry_after_ms == 60 * 1000 // 100
    d = rl.check_write("t1", 1)  # now RPS exhausted
    assert d is not None and d.reason == "write_rps"
    assert d.retry_after_ms == 1000 // 2
    clock.advance(1.0)
    assert rl.check_write("t1", 1) is None  # both buckets refilled enough


def test_query_rps_and_concurrency():
    clock = FakeClock()
    rl = RateLimiter(
        TenantQuota(max_query_rps=100, max_concurrent_queries=2), clock=clock
    )
    assert rl.check_query("t") is None
    assert rl.check_query("t") is None
    d = rl.check_query("t")
    assert d is not None and d.reason == "concurrent_queries"
    assert (d.current, d.limit) == (2, 2)
    rl.query_completed("t")
    assert rl.check_query("t") is None


def test_query_rps_denial():
    clock = FakeClock()
    rl = RateLimiter(TenantQuota(max_query_rps=1), clock=clock)
    assert rl.check_query("t") is None
    rl.query_completed("t")
    d = rl.check_query("t")
    assert d is not None and d.reason == "query_rps"
    clock.advance(1.0)
    assert rl.check_query("t") is None


def test_query_slot_context_manager_releases():
    rl = RateLimiter(TenantQuota(max_concurrent_queries=1), clock=FakeClock())
    with rl.query_slot("t") as denial:
        assert denial is None
        with rl.query_slot("t") as inner:
            assert inner is not None and inner.reason == "concurrent_queries"
    with rl.query_slot("t") as denial:  # slot released by the outer exit
        assert denial is None


def test_tenants_isolated_and_quota_replace():
    clock = FakeClock()
    rl = RateLimiter(TenantQuota(max_query_rps=1), clock=clock)
    assert rl.check_query("a") is None
    assert rl.check_query("b") is None  # b has its own bucket
    rl.set_tenant_quota("a", TenantQuota(max_query_rps=50))
    assert rl.check_query("a") is None  # fresh buckets under new quota
    u = rl.get_usage("a")
    assert u.quota.max_query_rps == 50
    assert u.concurrent_queries == 1


def test_usage_none_for_unknown_tenant():
    rl = RateLimiter(clock=FakeClock())
    assert rl.get_usage("nope") is None


def test_token_bucket_fractional_accrual():
    """Sub-second refills accumulate fractionally instead of truncating to
    zero (documented deliberate deviation from the reference's integer
    truncation; whole-second behavior identical)."""
    clock = FakeClock()
    b = TokenBucket(capacity=10, refill_rate=2, clock=clock)
    assert b.try_acquire(10)
    clock.advance(0.25)  # +0.5 tokens
    assert not b.try_acquire(1)
    clock.advance(0.25)  # +0.5 → 1.0 total
    assert b.try_acquire(1)

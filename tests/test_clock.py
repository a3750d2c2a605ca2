"""BoundedClock (ref clock.rs): monotonicity under wall-clock rewinds and
skew-margined retention cutoffs, wired into retention_candidates."""

from __future__ import annotations

from cardinalsin_spark.clock import BoundedClock


def test_monotonic_under_rewind():
    walls = iter([1000, 2000, 1500, 1500, 3000])  # NTP step back at #3
    c = BoundedClock(max_skew_s=0, wall_ns=lambda: next(walls))
    seen = [c.now_nanos() for _ in range(5)]
    assert seen == [1000, 2000, 2001, 2002, 3000]
    assert all(b > a for a, b in zip(seen, seen[1:]))


def test_retention_cutoff_shifts_by_skew():
    c = BoundedClock(max_skew_s=30, wall_ns=lambda: 10**18)
    cut = c.retention_cutoff_nanos(90 * 86400 * 10**9)
    assert cut == 10**18 - 90 * 86400 * 10**9 - 30 * 10**9


def test_cutoff_feeds_retention_candidates(spark):
    """End-to-end with the compaction operator: a chunk stamped by a
    clock up to max_skew ahead of ours must NOT be selected for deletion
    at exactly the retention boundary."""
    from cardinalsin_spark.operators.compaction import retention_candidates

    now = 1_700_000_000 * 10**9
    retention = 90 * 86400 * 10**9
    skew = 30 * 10**9
    c = BoundedClock(max_skew_s=30, wall_ns=lambda: now)
    chunks = spark.createDataFrame(
        [
            ("old", now - retention - skew - 2),  # genuinely expired
            ("boundary", now - retention - 1),  # expired on raw clock
            ("fresh", now - 1),
        ],
        "chunk_path string, max_timestamp long",
    )
    cut = c.retention_cutoff_nanos(retention)
    doomed = {
        r.chunk_path
        for r in retention_candidates(chunks, cutoff_ns=cut).collect()
    }
    assert "old" in doomed
    assert "boundary" not in doomed  # skew margin saves it
    assert "fresh" not in doomed

"""Monotonic clock with skew-aware retention cutoffs.

The reference never trusts the raw wall clock for destructive decisions
(``clock.rs:1-146``): ``BoundedClock`` returns nanosecond timestamps that
never go backward (high-water mark + 1 on NTP rewinds) and shifts
retention/GC cutoffs earlier by a configured skew tolerance so data
written by a fast clock is not deleted prematurely. Same contract here —
feed ``retention_cutoff_nanos`` to ``operators/compaction.py``'s
``retention_candidates`` instead of a hand-computed ``now − retention``.
"""

from __future__ import annotations

import time


class BoundedClock:
    """Never-backward nanosecond clock + skew-margined cutoffs.

    ``wall_ns`` is injectable (a callable returning epoch nanoseconds) so
    rewind behavior is testable; defaults to the real wall clock.
    """

    def __init__(self, max_skew_s: float = 30.0, wall_ns=None):
        self.max_skew_ns = int(max_skew_s * 1_000_000_000)
        self._wall_ns = wall_ns or (lambda: time.time_ns())
        self._high_water_ns = 0

    def now_nanos(self) -> int:
        """Monotonic: a wall-clock rewind (NTP step) yields high-water+1
        instead of going backward (ref ``clock.rs:33-48``)."""
        ts = max(self._wall_ns(), self._high_water_ns + 1)
        self._high_water_ns = ts
        return ts

    def retention_cutoff_nanos(self, retention_ns: int) -> int:
        """Cutoff for deleting data older than ``retention_ns``, shifted
        earlier by the skew margin (ref ``clock.rs:56-66``): rows stamped
        by a clock running up to ``max_skew`` ahead survive the full
        retention period."""
        return self.now_nanos() - retention_ns - self.max_skew_ns

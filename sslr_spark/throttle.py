"""Source-utilization throttle (reference T5).

The reference measures the fraction of wall time spent reading the
source; when utilization exceeds the configured level it sleeps
``2 x excess_ms`` (reference internal/throttle_enabled.go:12-47;
level = clamp(pct,1,100)/100, 100% => no-op; a `nothrottle` build tag
compiles it out, internal/throttle_disabled.go).

Same algorithm here, as a context-manager wrapper around source-side
work. In a Spark deployment the first-line throttles are JDBC
``fetchsize``/``numPartitions`` caps and trigger intervals; this
wrapper adds the reference's adaptive utilization cap on top for
sources that need active protection.
"""

from __future__ import annotations

import time


class Throttle:
    def __init__(self, percentage: int = 80, clock=time.monotonic, sleep=time.sleep):
        # clamp like the reference (internal/throttle_enabled.go:14-21)
        pct = max(1, min(100, int(percentage)))
        self.level = pct / 100.0
        self.enabled = pct < 100
        import threading

        self._clock = clock
        self._sleep = sleep
        self._start = clock()
        self._source_time = 0.0
        self._tls = threading.local()  # per-thread enter timestamps
        self._acc_lock = threading.Lock()

    def __enter__(self):
        self._tls.enter_t = self._clock()
        return self

    def __exit__(self, *exc):
        with self._acc_lock:
            self._source_time += self._clock() - self._tls.enter_t
        self.maybe_sleep()

    @property
    def utilization(self) -> float:
        elapsed = self._clock() - self._start
        return (self._source_time / elapsed) if elapsed > 0 else 0.0

    def maybe_sleep(self) -> float:
        """Sleep 2 x (excess utilization, expressed as time) when over
        the level; returns the sleep duration."""
        if not self.enabled:
            return 0.0
        util = self.utilization
        if util <= self.level:
            return 0.0
        elapsed = self._clock() - self._start
        excess = (util - self.level) * elapsed
        pause = 2.0 * excess
        self._sleep(pause)
        return pause

"""Round-12 hostile-config battery for the throttle/retry harness
(M3/R4/R5, streaming/throttle.py). The r11-and-earlier tests cover the
happy fake-clock paths; this battery drives the CONFIG space a
misconfigured job would hit, with a bounded fake clock so a hang is a
deterministic test failure instead of a stuck suite.

Three pinned behaviors, fix QUEUED (r12 → r13, DIVERGENCES.md "Queued
fix: throttle config validation"): construction-time validation should
reject rpm <= 0 and negative backoff loudly instead of the current
mid-job failure modes. Reference anchor: the reference hard-codes
sane values (20 rpm, vton_scraper/config.py:74-78; 5·2^n backoff,
test_kimono.py:258-262) so it never validates them; a library knob
must.
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.streaming.throttle import (
    ThrottleConfig,
    TokenBucket,
    call_with_retry,
)


class BoundedClock:
    """Fake clock whose sleep() records durations and aborts loudly
    after `limit` calls — converts an infinite throttle wait into a
    deterministic RuntimeError."""

    def __init__(self, limit: int = 50):
        self.t = 0.0
        self.sleeps: list[float] = []
        self.limit = limit

    def now(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        if len(self.sleeps) > self.limit:
            raise RuntimeError(f"HANG: >{self.limit} sleeps")
        self.t += max(s, 0.0)


def test_zero_rpm_rejected_at_construction():
    """FLIPPED r13 (queued fix #4): rpm=0 used to ZeroDivisionError on
    the SECOND acquire (refill rate 0, deficit / 0) — a mid-job crash
    from a config mistake knowable at construction. Now rejected."""
    c = BoundedClock()
    with pytest.raises(ValueError, match="requests_per_minute"):
        ThrottleConfig(requests_per_minute=0.0, clock=c.now, sleep=c.sleep)


def test_negative_rpm_rejected_at_construction():
    """FLIPPED r13 (queued fix #4): a negative rate DRAINED tokens over
    time so the acquire loop spun forever on the 0.01 s sleep floor —
    an unbounded hang, now a construction-time ValueError."""
    c = BoundedClock()
    with pytest.raises(ValueError, match="requests_per_minute"):
        ThrottleConfig(requests_per_minute=-5.0, clock=c.now, sleep=c.sleep)


def test_negative_backoff_rejected_at_construction():
    """FLIPPED r13 (queued fix #4): a negative backoff base used to flow
    straight into cfg.sleep — with the real time.sleep, a ValueError
    mid-retry turning a retryable call failure into a job crash. Now a
    loud config error before any work starts."""
    c = BoundedClock()
    with pytest.raises(ValueError, match="backoff_base_s"):
        ThrottleConfig(max_retries=2, backoff_base_s=-5.0, clock=c.now, sleep=c.sleep)


def test_nan_rpm_and_negative_retries_rejected():
    """Companion: NaN/inf rates and negative retry budgets are the same
    class — knowable-at-construction poison, rejected with the field
    name in the message."""
    with pytest.raises(ValueError, match="requests_per_minute"):
        ThrottleConfig(requests_per_minute=float("nan"))
    with pytest.raises(ValueError, match="requests_per_minute"):
        ThrottleConfig(requests_per_minute=float("inf"))
    with pytest.raises(ValueError, match="max_retries"):
        ThrottleConfig(max_retries=-1)


def test_fractional_rpm_waits_exact_refill_time():
    """Contrast pin: a tiny-but-positive rate is fine — 0.5 rpm waits
    exactly the 120 s refill on the second acquire (fake clock)."""
    c = BoundedClock()
    bucket = TokenBucket(
        ThrottleConfig(requests_per_minute=0.5, clock=c.now, sleep=c.sleep)
    )
    bucket.acquire()
    bucket.acquire()
    assert sum(c.sleeps) == pytest.approx(120.0)


def test_burst_capacity_equals_rpm_then_throttles():
    """Contrast pin: the bucket seeds a full minute of burst (capacity =
    rpm), and the (rpm+1)-th immediate call is the first one throttled."""
    c = BoundedClock(limit=500)
    bucket = TokenBucket(
        ThrottleConfig(requests_per_minute=5.0, clock=c.now, sleep=c.sleep)
    )
    for _ in range(5):
        bucket.acquire()
    assert c.sleeps == []  # full burst allowed
    bucket.acquire()
    assert len(c.sleeps) >= 1 and sum(c.sleeps) == pytest.approx(12.0)  # 1/rate

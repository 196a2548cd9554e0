"""Throttled external-IO harness (R4/R5) with a fake clock — no sleeping,
no network."""

from __future__ import annotations

from syntheticdata_pipeline__spark.streaming.throttle import (
    ThrottleConfig,
    TokenBucket,
    call_with_retry,
    throttled_map_in_pandas,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def _cfg(rpm=60.0, retries=2):
    clk = FakeClock()
    return (
        ThrottleConfig(
            requests_per_minute=rpm,
            max_retries=retries,
            backoff_base_s=1.0,
            clock=clk,
            sleep=clk.sleep,
        ),
        clk,
    )


def test_token_bucket_enforces_rate():
    cfg, clk = _cfg(rpm=60.0)  # 1 token/s, burst 60
    bucket = TokenBucket(cfg)
    for _ in range(60):  # burst drains capacity instantly
        bucket.acquire()
    t0 = clk.t
    for _ in range(10):  # now rate-limited: ~1s each
        bucket.acquire()
    assert clk.t - t0 >= 9.0


def test_retry_backoff_then_success():
    cfg, clk = _cfg(retries=3)
    attempts = []

    def flaky(x):
        attempts.append(x)
        if len(attempts) < 3:
            raise RuntimeError("boom")
        return f"ok:{x}"

    ok, res, n = call_with_retry(flaky, "item", cfg)
    assert ok and res == "ok:item" and n == 3
    assert clk.t == 1.0 + 2.0  # 1·2^0 + 1·2^1 backoff


def test_retry_exhaustion_reports_error():
    cfg, _clk = _cfg(retries=1)

    def dead(x):
        raise ValueError("always")

    ok, err, n = call_with_retry(dead, "i", cfg)
    assert not ok and "always" in err and n == 2


def test_throttled_map_in_pandas_fake_service(spark):
    cfg, _clk = _cfg(rpm=100000.0, retries=1)
    df = spark.createDataFrame([(f"u{i}",) for i in range(20)], "url string")

    out = throttled_map_in_pandas(
        df,
        call_fn=lambda u: u.upper(),
        input_col="url",
        cfg=cfg,
    )
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.ok for r in rows)
    assert {r.response for r in rows} == {f"U{i}" for i in range(20)}

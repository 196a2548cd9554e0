"""Throttled external-IO UDF harness (SURVEY.md §4 custom component #2).

Preserves the reference's politeness machinery — token-bucket rate limit
(20 req/min, vton_scraper/config.py:74-78), bounded retry with exponential
backoff 5·2^n (test_kimono.py:258-262), adaptive cooldown — inside a
``mapInPandas`` kernel, one limiter per partition. Spark task retries plus
keyed idempotent sinks restore exactly-once-ish semantics for
non-idempotent side effects (SURVEY §7.4).

No network calls happen in tests: the kernel takes an injectable
``call_fn`` and the tests use deterministic fakes — same pattern as U1-U5
model UDFs (per-executor singleton, qwen_vl_processor model reuse done
right).
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass


@dataclass
class ThrottleConfig:
    requests_per_minute: float = 20.0
    max_retries: int = 3
    backoff_base_s: float = 5.0
    backoff_factor: float = 2.0
    cooldown_s: float = 60.0
    # tests shrink time by injecting a fake clock/sleep
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep

    def __post_init__(self) -> None:
        # Construction-time rejection (r13, queued fix #4): rpm=0 used
        # to ZeroDivisionError on the second acquire, a negative rpm
        # span forever on the sleep floor, and a negative backoff flow
        # straight into time.sleep (ValueError mid-retry) — all
        # mid-JOB failures from a config mistake that is knowable here.
        if not math.isfinite(self.requests_per_minute) or self.requests_per_minute <= 0:
            raise ValueError(
                f"requests_per_minute must be a positive finite number, got {self.requests_per_minute!r}"
            )
        if self.max_retries < 0:
            raise ValueError(f"max_retries must be >= 0, got {self.max_retries!r}")
        for fname in ("backoff_base_s", "backoff_factor", "cooldown_s"):
            v = getattr(self, fname)
            if not math.isfinite(v) or v < 0:
                raise ValueError(f"{fname} must be a non-negative finite number, got {v!r}")


class TokenBucket:
    """Classic token bucket: capacity = rpm, refill = rpm/60 per second."""

    def __init__(self, cfg: ThrottleConfig):
        self.cfg = cfg
        self.capacity = max(cfg.requests_per_minute, 1.0)
        self.tokens = self.capacity
        self.rate = cfg.requests_per_minute / 60.0
        self.last = cfg.clock()

    def acquire(self) -> None:
        while True:
            now = self.cfg.clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.cfg.sleep(max((1.0 - self.tokens) / self.rate, 0.01))


def call_with_retry(call_fn: Callable[[object], object], item, cfg: ThrottleConfig):
    """Bounded retry with exponential backoff; returns (ok, result_or_err,
    attempts). Mirrors test_kimono.py:230-275 semantics."""
    err = None
    for attempt in range(cfg.max_retries + 1):
        try:
            return True, call_fn(item), attempt + 1
        except Exception as exc:  # noqa: BLE001 - the harness must survive any call failure
            err = exc
            if attempt < cfg.max_retries:
                cfg.sleep(cfg.backoff_base_s * (cfg.backoff_factor**attempt))
    return False, repr(err), cfg.max_retries + 1


def throttled_map_in_pandas(
    df,
    call_fn: Callable[[str], str],
    input_col: str,
    output_col: str = "response",
    cfg: ThrottleConfig | None = None,
):
    """Apply a rate-limited external call per row; adds
    (output_col, ok, attempts). One TokenBucket per partition → cluster-wide
    rate ≈ rpm × partitions; tune partition count to the global budget
    (the reference's single-process limiter doesn't distribute)."""
    import pandas as pd

    cfg = cfg or ThrottleConfig()
    out_schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {output_col} string, ok boolean, attempts int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(cfg)  # per-partition limiter (R4)
        for pdf in batches:
            results, oks, attempts = [], [], []
            for item in pdf[input_col]:
                bucket.acquire()
                ok, res, n = call_with_retry(call_fn, item, cfg)
                results.append(res if ok else None)
                oks.append(ok)
                attempts.append(n)
            pdf = pdf.copy()
            pdf[output_col] = results
            pdf["ok"] = oks
            pdf["attempts"] = attempts
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)

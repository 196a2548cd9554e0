"""Regression pin for the r8 ADVICE fix (bench.py): the superseded v1
stress layout must be reclaimed even when the v2 layout is already
READY — the original guard only removed v1 while v2 still needed
building, so on a machine with a READY v2 the stale replicated parquet
under /tmp lived forever."""

from __future__ import annotations

import os
import shutil


def test_v1_stress_dir_reclaimed_even_when_v2_ready(tmp_path):
    import bench

    sf_dir = str(tmp_path / "sfreclaimtest")
    os.makedirs(sf_dir)
    base = f"/tmp/spark_graft_stress_{os.path.basename(sf_dir)}_10x"
    v2 = f"{base}_v2"
    try:
        # plant a fake superseded v1 dir beside a READY v2
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, "stale.parquet"), "w") as f:
            f.write("stale")
        os.makedirs(v2, exist_ok=True)
        with open(os.path.join(v2, "_READY"), "w") as f:
            f.write("ok")

        # spark=None: with a READY marker the build path is never taken
        out = bench._build_stress_dir(None, sf_dir, 10)

        assert out == v2
        assert os.path.exists(os.path.join(v2, "_READY"))
        assert not os.path.exists(base), "superseded v1 layout must be reclaimed"
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(v2, ignore_errors=True)


class _FakeClock:
    """time.time() stub: returns the next value from a queue."""

    def __init__(self, values):
        self._values = list(values)

    def time(self):
        return self._values.pop(0)


class _FakeDF:
    def count(self):
        return 1


class _FakeSpec:
    def build(self, spark, sf_dir):
        return _FakeDF()


def test_fresh_session_recheck_confirms_only_reproduced_breaches(monkeypatch):
    """r10 methodology pin: an in-context >2x reading only counts as a
    regression when a fresh-session best-of-2 reproduces it; the fresh
    value replaces the in-context one and both land in `recheck`."""
    import bench

    registry = {"slow_q": _FakeSpec(), "noisy_q": _FakeSpec()}
    baseline = {"slow_q": 1.0, "noisy_q": 1.0}
    # in-context both read as 3x their anchor
    timings = {"slow_q": 3.0, "noisy_q": 3.0}
    vs_baseline = {"slow_q": 3.0, "noisy_q": 3.0}
    recheck: dict = {}

    # per query, best-of-2 = two (t0, t1) pairs; slow_q reproduces at
    # 2.5s, noisy_q comes back at 0.5s (in-context session-state noise)
    monkeypatch.setattr(
        bench,
        "time",
        _FakeClock([0.0, 2.5, 10.0, 12.6, 20.0, 20.5, 30.0, 30.6]),
    )

    confirmed = bench._confirm_regressions(
        spark=None,
        registry=registry,
        candidates=["slow_q", "noisy_q"],
        baseline=baseline,
        timings=timings,
        vs_baseline=vs_baseline,
        recheck=recheck,
        sf_dir="/nonexistent",
    )

    assert confirmed == ["slow_q"]
    assert recheck["slow_q"] == {
        "in_context_sec": 3.0,
        "fresh_sec": 2.5,
        "vs_baseline": 2.5,
    }
    assert recheck["noisy_q"]["in_context_sec"] == 3.0
    assert recheck["noisy_q"]["fresh_sec"] == 0.5
    # the fresh values replace the in-context readings in the artifact
    assert timings == {"slow_q": 2.5, "noisy_q": 0.5}
    assert vs_baseline == {"slow_q": 2.5, "noisy_q": 0.5}

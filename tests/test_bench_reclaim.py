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

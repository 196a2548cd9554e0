"""Dated deep-scale point for ANY bench-stress catalog query (r14,
verdict #6 — generalizes tools/deep_point.py, which carries the
incremental-dedup state/compaction extras).

Methodology matches the bench stress section: fresh session, in-session
base measurement at $SPARK_GRAFT_SF_DIR, then the replicated stress
layout from bench._build_stress_dir at each requested factor, best-of-2
per point (first execution pays whole-stage-codegen compilation).
Prints ONE JSON line: {"date", "query", "sf_dir", "base": {...},
"points": [{"factor", "sec", "rows", "growth_x"}...]}.

Usage::

    python tools/deep_query_point.py <query_name> <factor> [factor ...]
    # e.g. python tools/deep_query_point.py jaccard_prefix_filter_join 30

    python tools/deep_query_point.py --simhash-rep-stage <factor> [...]
    # times operators.neardup.simhash_hamming_rep_pairs (collapse +
    # band join + Hamming verify, NO member expansion) over the stress
    # corpus. The full simhash query's output is quadratic in
    # replica-group size BY CONTRACT (every member pair is emitted:
    # 29,628 pairs at sf0.01 already), so its wall time at 100x
    # measures emitted-row volume, not the band stage; this mode
    # asserts the 2**16-bounded compute stage itself stays flat.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (reuses _build_stress_dir + SF_DIR)

from syntheticdata_pipeline__spark.plans import load_all  # noqa: E402
from syntheticdata_pipeline__spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    factors = [int(a) for a in sys.argv[2:]] or [30]
    spark = get_spark("deep-query-point")
    spark.sparkContext.setLogLevel("ERROR")
    if name == "--simhash-rep-stage":
        from syntheticdata_pipeline__spark.operators.neardup import (
            simhash_hamming_rep_pairs,
        )

        def build(sp, sf_dir):
            docs = sp.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            rep_pairs, _groups = simhash_hamming_rep_pairs(docs)
            return rep_pairs

        name = "simhash_rep_stage(simhash_hamming_rep_pairs)"
    else:
        build = load_all()[name].build

    def best_of_2(sf_dir: str) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            rows = build(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return round(best, 3), rows

    out: dict = {"date": time.strftime("%Y-%m-%d"), "query": name, "sf_dir": bench.SF_DIR}
    base_sec, base_rows = best_of_2(bench.SF_DIR)
    out["base"] = {"sec": base_sec, "rows": base_rows}
    out["points"] = []
    for factor in factors:
        sdir = bench._build_stress_dir(spark, bench.SF_DIR, factor)
        sec, rows = best_of_2(sdir)
        out["points"].append(
            {
                "factor": factor,
                "sec": sec,
                "rows": rows,
                "growth_x": round(sec / base_sec, 2),
            }
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized via a count-style action (no driver collect of
payload rows). One warm-up pass of the flagship amortizes JVM/codegen
startup out of the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from syntheticdata_pipeline__spark.plans import load_all
    from syntheticdata_pipeline__spark.session import get_spark

    registry = load_all()
    bench_queries = {n: s for n, s in registry.items() if s.bench}

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM + codegen + parquet footer caches.
    bench_queries[next(iter(bench_queries))].build(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in sorted(bench_queries):
        t0 = time.time()
        df = bench_queries[name].build(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Time individual catalog queries with the bench methodology (warm
session, best-of-2 ``.count()``) for fast optimization iteration.

Usage::

    python tools/time_queries.py <query> [query ...]
    SPARK_GRAFT_REPEATS=3 python tools/time_queries.py <query>

Prints one line per query: ``name best_sec rows`` plus a JSON summary.
This is an iteration aid only — the round's recorded numbers come from
full ``bench.py`` runs (plans/r14/bench_before.json vs the final run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))


def main() -> None:
    from syntheticdata_pipeline__spark.plans import load_all
    from syntheticdata_pipeline__spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    registry = load_all()
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: JVM + codegen + parquet footer caches (same as bench.py).
    registry[names[0]].build(spark, SF_DIR).count()

    out: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        best, n = None, 0
        for _ in range(REPEATS):
            t0 = time.time()
            n = spec.build(spark, SF_DIR).count()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

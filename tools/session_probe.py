"""Per-query session-state probe (VERDICT r14 "next round" #3).

Replicates bench.py's warm-session loop (sorted benched queries,
best-of-2 ``.count()``) and records, AFTER each query, block-manager
storage (cached/checkpointed RDD count, memory/disk bytes, cached
partitions), driver JVM GC totals, heap use, and the persistent-RDD map
size — the instrumentation needed to correlate late-run query inflation
with accumulated session state.

Usage::

    python tools/session_probe.py <tag>            # record only
    python tools/session_probe.py <tag> --reclaim  # + unpersist between queries
    python tools/session_probe.py <tag> --gc       # + Python gc + JVM System.gc()

``--reclaim`` unpersists every persistent RDD between queries:
localCheckpoint blocks from an already-counted bench query are garbage
(each bench iteration rebuilds the DataFrame from scratch), so if the
accumulation hypothesis is right the reclaim run should stay flat where
the plain run inflates.

Output: JSONL at /tmp/spark_graft_probe_<tag>.jsonl, one record per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_stats(spark) -> dict:
    """Driver-JVM and block-manager counters via py4j (public JMX/Spark APIs)."""
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    heap = (
        jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
        .getHeapMemoryUsage()
        .getUsed()
    )
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem_b = sum(i.memSize() for i in infos)
    disk_b = sum(i.diskSize() for i in infos)
    parts = sum(i.numCachedPartitions() for i in infos)
    return {
        "gc_ms": gc_ms,
        "heap_mb": round(heap / 1e6),
        "n_cached_rdds": len(infos),
        "cached_mem_mb": round(mem_b / 1e6, 1),
        "cached_disk_mb": round(disk_b / 1e6, 1),
        "cached_parts": parts,
        "n_persistent": spark.sparkContext._jsc.getPersistentRDDs().size(),
    }


def reclaim(spark) -> int:
    """Unpersist every persistent RDD (non-blocking). Between bench
    queries all of them are dead weight — each query run rebuilds its
    DataFrame from the parquet inputs."""
    rdds = list(spark.sparkContext._jsc.getPersistentRDDs().values())
    for r in rdds:
        r.unpersist(False)
    return len(rdds)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "plain"
    do_reclaim = "--reclaim" in sys.argv
    do_gc = "--gc" in sys.argv
    from syntheticdata_pipeline__spark.plans import load_all
    from syntheticdata_pipeline__spark.session import get_spark

    registry = load_all()
    bench = {n: s for n, s in registry.items() if s.bench}
    spark = get_spark("session-probe")
    spark.sparkContext.setLogLevel("ERROR")
    bench[next(iter(bench))].build(spark, SF_DIR).count()

    path = f"/tmp/spark_graft_probe_{tag}.jsonl"
    t_start = time.time()
    with open(path, "w") as out:
        for name in sorted(bench):
            best = None
            for _ in range(2):
                t0 = time.time()
                bench[name].build(spark, SF_DIR).count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            rec = {
                "q": name,
                "best": round(best, 3),
                "wall": round(time.time() - t_start, 1),
            }
            rec.update(jvm_stats(spark))
            if do_reclaim:
                rec["n_unpersisted"] = reclaim(spark)
            if do_gc:
                # release py4j-held JVM refs first, then let the JVM's
                # ContextCleaner weak-ref queue see them
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
            out.write(json.dumps(rec) + "\n")
            out.flush()
    print(path)


if __name__ == "__main__":
    main()

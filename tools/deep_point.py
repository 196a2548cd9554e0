"""Dated deep-scale point for the incremental ingestion dedup (r11
verdict "Next round" #4): the @30x growth_vs_10x steepened 1.91 (r10) ->
2.82 (r11), and this is the state-carrying operator where super-linear
growth matters most at 100 TB.

Measures, at a chosen replication factor over $SPARK_GRAFT_SF_DIR:

1. the one-shot `incremental_dedup_survivors` wall time (best-of-2,
   fresh session, in-session base — the bench stress methodology);
2. the persisted signature STATE via StateTable: rows, on-disk bytes,
   bytes/doc — the O(distinct docs) claim measured, not asserted;
3. chunked ingestion (N chunks through incremental_minhash_dedup with a
   StateTable carry): per-chunk append growth, file count before/after
   `compact()`, and that chunked survivors == one-shot survivors at this
   scale (the associativity proof re-run at depth).

Usage::

    python tools/deep_point.py [factor] [n_chunks]   # default 60 4
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (reuses _build_stress_dir + SF_DIR)
from pyspark.sql import functions as F  # noqa: E402

from syntheticdata_pipeline__spark.operators.neardup import (  # noqa: E402
    incremental_minhash_dedup,
)
from syntheticdata_pipeline__spark.operators.state import StateTable  # noqa: E402
from syntheticdata_pipeline__spark.plans import load_all  # noqa: E402
from syntheticdata_pipeline__spark.session import get_spark  # noqa: E402


def _du(path: str) -> tuple[int, int]:
    """(bytes, data-file count) under path, ignoring _SUCCESS/markers."""
    total, files = 0, 0
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(dirpath, n))
            files += 1
    return total, files


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("deep-point")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    build = registry["incremental_dedup_survivors"].build

    def best_of_2(sf_dir: str) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            rows = build(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return round(best, 3), rows

    out: dict = {"date": time.strftime("%Y-%m-%d"), "factor": factor, "sf_dir": bench.SF_DIR}
    base_sec, base_rows = best_of_2(bench.SF_DIR)
    out["base"] = {"sec": base_sec, "survivor_groups": base_rows}
    sdir = bench._build_stress_dir(spark, bench.SF_DIR, factor)
    deep_sec, deep_rows = best_of_2(sdir)
    out["deep"] = {"sec": deep_sec, "survivor_groups": deep_rows, "growth_x": round(deep_sec / base_sec, 2)}

    # ---- state size: one signature row per ingested doc --------------------
    docs = spark.read.parquet(os.path.join(sdir, "documents.parquet"))
    n_docs = docs.count()
    state_path = f"/tmp/deep_point_state_{factor}x"
    import shutil

    shutil.rmtree(state_path, ignore_errors=True)
    st = StateTable(spark, state_path, key_cols=["id"], value_cols=["sig"])
    _surv, sigs = incremental_minhash_dedup(docs, None, id_col="doc_id", text_col="text")
    st.append(sigs)
    nbytes, nfiles = _du(state_path)
    out["state_oneshot"] = {
        "docs": n_docs,
        "rows": st.count(),
        "bytes": nbytes,
        "bytes_per_doc": round(nbytes / max(1, n_docs), 1),
        "files": nfiles,
    }

    # ---- chunked ingestion + compaction (n_chunks=0 skips: the deepest
    # factors measure the one-shot curve + state footprint only) -------------
    if n_chunks <= 0:
        print(json.dumps(out))
        return
    if n_docs == 0:
        # empty documents table: bounds.lo/hi are NULL and the step
        # arithmetic below would TypeError (r12 ADVICE #4) — record the
        # vacuous result explicitly instead of crashing the evidence run
        out["chunked"] = {"n_chunks": 0, "survivors_total": 0, "associativity_ok": True}
        print(json.dumps(out))
        return
    shutil.rmtree(state_path, ignore_errors=True)
    bounds = docs.select(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    step = (bounds.hi - bounds.lo + n_chunks) // n_chunks
    survivors_total = 0
    appends = []
    t0 = time.time()
    for c in range(n_chunks):
        lo = bounds.lo + c * step
        chunk = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + step))
        prior = st.load() if st.exists() else None
        surv, sigs = incremental_minhash_dedup(
            chunk, prior, id_col="doc_id", text_col="text"
        )
        survivors_total += surv.count()
        st.append(sigs)
        b, f_ = _du(state_path)
        appends.append({"chunk": c, "state_bytes": b, "state_files": f_})
    chunked_sec = round(time.time() - t0, 3)
    pre_bytes, pre_files = _du(state_path)
    st.compact()
    post_bytes, post_files = _du(state_path)
    out["chunked"] = {
        "n_chunks": n_chunks,
        "sec_total": chunked_sec,
        "survivors_total": survivors_total,
        "appends": appends,
        "state_rows": st.count(),
        "compaction": {
            "bytes": [pre_bytes, post_bytes],
            "files": [pre_files, post_files],
        },
    }
    # associativity at depth: chunked survivor total == one-shot total.
    # The flag is CHECKED and recorded, not just printed (r12 ADVICE #4)
    # — a silent mismatch must self-report in the evidence JSON and in
    # the exit code.
    oneshot_surv, _ = incremental_minhash_dedup(docs, None, id_col="doc_id", text_col="text")
    oneshot_n = oneshot_surv.count()
    out["chunked"]["oneshot_survivors"] = oneshot_n
    out["chunked"]["associativity_ok"] = survivors_total == oneshot_n
    print(json.dumps(out))
    if not out["chunked"]["associativity_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

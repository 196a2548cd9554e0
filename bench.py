"""Benchmark runner: executes every benched catalog query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:
{"queries": {<headline subset>: sec, ...}, "detail": "BENCH_local.json",
"n_queries": N, "median_vs_baseline": ..., "worst_vs_baseline": ...,
"recheck_repeat_offenders": [...], "regressions_gt_2x": [...],
"sf": ..., "metric": ..., "unit": "sec", "value": total_sec}.

The line is kept under the driver's ~2000-byte capture so it PARSES in
the per-round artifact (BENCH_r05..r10 all record parsed=null because
the full-catalog line outgrew the capture at round 5);
tests/test_bench_line_size.py pins the budget. The full per-query
record (all timings, vs_baseline, stress curves, recheck provenance)
is written to /tmp/spark_graft_bench_full.json, which run_gates.sh
installs as the committed BENCH_local.json.

The 2x gate is falsifiable: per-query targets live in
bench_baseline.json (round-1 measured numbers); "vs_baseline" reports
this-run/target per query and "regressions_gt_2x" lists violations.

Scale-stress: the dedup family is re-run against a 10x-replicated
documents table (50k docs at sf0.1) and "scale_stress" reports the
runtime growth factor per query — sub-linear-in-pairs growth is the
evidence that the LSH/inverted-index shapes (not quadratic ones) are on
the data path. Skip with SPARK_GRAFT_NO_STRESS=1.

Each query is materialized via a count-style action (no driver collect of
payload rows). One warm-up pass of the flagship amortizes JVM startup;
each query then runs twice and reports the best (whole-stage-codegen
compilation of big join plans costs ~2x on first execution and is not a
property of the plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.abspath(__file__))

# queries re-run against 10x documents for the growth curve
STRESS_QUERIES = (
    "exact_dedup_docs",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "gopher_quality_flags",
    "repetition_top_bigram",
    "substring_dup_pairs",
    "substring_max_span",
    "incremental_dedup_survivors",
    # doc-local plans (winnowing windows, intra-doc self-join) must grow
    # at most linearly in docs; cross_source_overlap's JOIN side is
    # distinct-gram-bound (replicated copies land in the same source, so
    # pair counts stay flat) — its growth is the scan+explode volume.
    "winnowing_fingerprints",
    "intradoc_repeated_span",
    "cross_source_overlap",
    # prefix-filter join: postings/candidates run on DISTINCT sets after
    # the identical-set collapse — growth must track unique docs + the
    # re-expanded output, never the quadratic duplicate count.
    "jaccard_prefix_filter_join",
    "doc_continuation_pairs",
    # trained IVF: training scans only the seeded sample, assignment and
    # the query-bounded probe/brute sides are one corpus pass each —
    # growth must stay linear in vectors (embeddings table replicated).
    "ann_ivf_trained_topk",
    # embeddings family (replicated identical vectors are the worst case:
    # they share every hyperplane bucket, so the pair stage's output
    # grows ~100x): growth must stay output/linear-bound — measured at
    # first wiring r7: semantic 2.35x, cosine-LSH 3.54x with 734x the
    # emitted pairs, kmeans 1.41x, pagerank 1.07x.
    "semantic_dedup_stats",
    "cosine_neardup_lsh",
    "kmeans_embedding_clusters",
    "similarity_pagerank",
    # r9: the heaviest benched query with no growth curve until now —
    # its min-label propagation rounds are the one hot loop the
    # identical-set collapse can't shorten, so the curve is the evidence
    # the node-keyed SMJ rounds stay sub-quadratic under duplicate-heavy
    # corpora; plus the df-capped postings path (rare-gram pruning) whose
    # cap is exactly what must hold as duplicates multiply.
    "cluster_aware_split_leakage",
    "ngram_jaccard_pruned",
    "lsh_param_chooser",
    # r11: first stress coverage for the EVENTS family — the replication
    # keeps user_id (copies share users), so every per-user window/sort
    # partition grows by the factor and every copied timestamp becomes a
    # duplicate-instant tie: the hot-user axis, the hard one (more-users
    # growth is embarrassingly parallel by construction). Growth must be
    # ~linear: these are one-shuffle-per-user-key plans (sessionize,
    # as-of union+carry, lag matrix, 3-arm feature join).
    "asof_view_purchase",
    "session_windows_batch",
    "event_transition_matrix",
    "user_behavior_features",
)
STRESS_FACTOR = 10
# second, deeper replication point for the paths whose state/postings
# grow with every ingested doc: the incremental signature state and the
# two newest postings-family members (prefix-filter join, positional
# max-span) get a 30x sample too (keys land in scale_stress as
# "<name>@30x", with growth_vs_10x locking the curve shape).
STRESS_QUERIES_DEEP = (
    # r11: the as-of is the events query most exposed to the duplicate-
    # instant blowup (its (user, t) tie collapse must keep the carried
    # state linear) — give it the deep point too.
    "asof_view_purchase",
    # r12 (r11 verdict #5): the two events-family queries with the
    # highest 10x growth and no deeper point — behavior features 3.25x,
    # transition matrix 2.23x. Both are one-shuffle-per-user-key plans,
    # so the 10x->30x segment should flatten; measure, don't assert.
    "user_behavior_features",
    "event_transition_matrix",
    "incremental_dedup_survivors",
    "jaccard_prefix_filter_join",
    "substring_max_span",
    # r9: lock the curve shape of the label-propagation loop too — the
    # 30x point bounds how the per-round SMJ volume scales when every
    # document has ~30 replicas in its connected component.
    "cluster_aware_split_leakage",
    # r10 (r9 verdict #4): the stress table's highest 10x growth (2.51x)
    # with no deeper point — its doc-local self-join output is bounded
    # by per-doc repetition, so the curve should flatten; measure it.
    "intradoc_repeated_span",
)
STRESS_FACTOR_DEEP = 30

# Per-query timings printed on the STDOUT line (the driver's capture of
# that line is bounded at ~2000 bytes, so the full 190-query dict cannot
# ride it — it lives in the DETAIL_PATH sidecar / committed
# BENCH_local.json). The subset is the scale-critical stress family plus
# a few representative relational/vector anchors.
HEADLINE_QUERIES = STRESS_QUERIES + (
    "tpch_q1_pricing_summary",
    "tpch_q9_product_profit",
    "ann_recall_at_k",
    "bm25_topk_docs",
)

# Full-detail sidecar: run_gates.sh installs this as BENCH_local.json so
# the committed artifact and PERF.md keep the complete per-query record.
DETAIL_PATH = "/tmp/spark_graft_bench_full.json"


def _load_baseline() -> dict[str, float]:
    try:
        with open(os.path.join(REPO, "bench_baseline.json")) as f:
            return json.load(f)["queries"]
    except Exception:
        return {}


def _load_baseline_sf() -> str:
    try:
        with open(os.path.join(REPO, "bench_baseline.json")) as f:
            return str(json.load(f).get("sf", "0.1"))
    except Exception:
        return "0.1"


def _build_stress_dir(spark, sf_dir: str, factor: int) -> str:
    """Materialize <tmp>/documents.parquet, <tmp>/embeddings.parquet and
    <tmp>/events.parquet as `factor` copies of the source tables (ids
    offset per copy so dedup / ANN keys stay realistic: exact-duplicate
    groups and cell occupancy scale by `factor`; events keep user_id so
    per-user partitions grow by `factor` and copied timestamps become
    duplicate-instant ties — the hot-user axis), other tables symlinked.
    The `_v3` suffix versions the layout (v1 symlinked embeddings, v2
    symlinked events)."""
    import pyspark.sql.functions as F

    base = f"/tmp/spark_graft_stress_{os.path.basename(sf_dir.rstrip('/'))}_{factor}x"
    stress = f"{base}_v3"
    marker = os.path.join(stress, "_READY")
    # Reclaim superseded layouts (v1 symlinked embeddings, v2 symlinked
    # events) so stale replicated parquet doesn't accumulate under /tmp —
    # unconditionally, not only when the current layout still needs
    # building (r7 + r8 ADVICE; tests/test_bench_reclaim.py).
    import shutil

    for old in (base, f"{base}_v2"):
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
    if not os.path.exists(marker):
        os.makedirs(stress, exist_ok=True)
        for table, id_col in (
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
            ("events", "event_id"),
        ):
            src_df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
            n = src_df.count()
            copies = src_df
            for i in range(1, factor):
                copies = copies.unionByName(
                    src_df.withColumn(id_col, (F.col(id_col) + i * n).cast("long"))
                )
            copies.repartition(32).write.mode("overwrite").parquet(
                os.path.join(stress, f"{table}.parquet")
            )
        for t in "region nation customer supplier part orders lineitem".split():
            link = os.path.join(stress, f"{t}.parquet")
            src = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(link) and os.path.exists(src):
                os.symlink(src, link)
        with open(marker, "w") as f:
            f.write("ok")
    return stress


def _fresh_process_best(name: str, sf_dir: str, repeats: int = 2) -> float | None:
    """Best-of-``repeats`` in a truly fresh PROCESS (cold JVM via
    tools/time_queries.py). r15 measurement-bug fix (documented in
    OPTIMIZATION_r15.md): the recheck used to reuse the same JVM
    (spark.stop() + getOrCreate), so a degraded JVM/machine could
    CONFIRM false >2x breaches on untouched sub-second queries. Returns
    None on any failure so the caller falls back to the in-process
    session recheck (the conservative pre-r15 behavior)."""
    import subprocess

    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_REPEATS=str(repeats)
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "time_queries.py"), name],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        if out.returncode != 0:
            return None
        return float(json.loads(out.stdout.strip().splitlines()[-1])[name])
    except Exception:
        return None


def _confirm_regressions(
    spark,
    registry,
    candidates: list[str],
    baseline: dict[str, float],
    timings: dict[str, float],
    vs_baseline: dict[str, float],
    recheck: dict[str, dict],
    sf_dir: str | None = None,
) -> list[str]:
    """Fresh confirmation of would-be 2x gate breaches: only a breach
    that REPRODUCES outside the warm session counts. Since r15 the
    recheck runs in a fresh PROCESS (cold JVM) when a live session is
    passed (``spark is not None``); on any subprocess failure it falls
    back to the in-(re)started-session loop, which is also the path the
    methodology tests drive directly. The fresh best-of-2 replaces the
    in-context timing/ratio and both values are recorded in ``recheck``
    for provenance; returns the confirmed subset. Tested in
    tests/test_bench_reclaim.py."""
    sf_dir = sf_dir or SF_DIR
    confirmed = []
    for name in candidates:
        if spark is not None:
            fresh = _fresh_process_best(name, sf_dir)
            if fresh is not None:
                ratio = fresh / baseline[name]
                recheck[name] = {
                    "in_context_sec": timings[name],
                    "fresh_sec": round(fresh, 3),
                    "vs_baseline": round(ratio, 2),
                    "fresh_process": True,
                }
                timings[name] = round(fresh, 3)
                vs_baseline[name] = round(ratio, 2)
                if ratio > 2.0:
                    confirmed.append(name)
                print(
                    f"# recheck {name}: fresh-process {fresh:.3f}s vs anchor ratio"
                    f" {ratio:.3f}"
                    f" ({'CONFIRMED regression' if ratio > 2.0 else 'in-context noise'})",
                    file=sys.stderr,
                )
                continue
        # A recheck crash (transient Spark failure, OOM) must not sink the
        # bench line (r10 ADVICE): keep the in-context breach as confirmed
        # — the conservative reading — and record the error for triage.
        try:
            best = None
            for _ in range(2):
                t0 = time.time()
                registry[name].build(spark, sf_dir).count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
        except Exception as e:
            recheck[name] = {
                "in_context_sec": timings[name],
                "error": f"{type(e).__name__}: {e}"[:300],
            }
            confirmed.append(name)
            print(f"# recheck {name}: ERROR ({type(e).__name__}) — breach kept", file=sys.stderr)
            continue
        # gate on the UNROUNDED ratio (r10 ADVICE: 2.0049 must not pass a
        # 2.0 gate); round only the recorded artifact values
        ratio = best / baseline[name]
        recheck[name] = {
            "in_context_sec": timings[name],
            "fresh_sec": round(best, 3),
            "vs_baseline": round(ratio, 2),
        }
        timings[name] = round(best, 3)
        vs_baseline[name] = round(ratio, 2)
        if ratio > 2.0:
            confirmed.append(name)
        print(
            f"# recheck {name}: fresh {best:.3f}s vs anchor ratio {ratio:.3f}"
            f" ({'CONFIRMED regression' if ratio > 2.0 else 'in-context noise'})",
            file=sys.stderr,
        )
    return confirmed


def main() -> None:
    from syntheticdata_pipeline__spark.plans import load_all
    from syntheticdata_pipeline__spark.session import get_spark

    registry = load_all()
    bench_queries = {n: s for n, s in registry.items() if s.bench}

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM + codegen + parquet footer caches.
    bench_queries[next(iter(bench_queries))].build(spark, SF_DIR).count()

    # best-of-2 per query: the first execution of a multi-join plan pays
    # one-time whole-stage-codegen compilation (measured ~2x on the 6-join
    # TPC-H shapes); the gate targets steady-state plan cost, not the
    # codegen lottery, so each query runs twice and keeps the minimum.
    timings: dict[str, float] = {}
    for name in sorted(bench_queries):
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = bench_queries[name].build(spark, SF_DIR).count()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    baseline = _load_baseline()
    # gate on UNROUNDED ratios (r10 ADVICE: a true 2.0049 must not slip a
    # 2.0 gate via display rounding); vs_baseline keeps 2-decimal artifact
    # values for the committed JSON.
    ratios = {
        name: timings[name] / baseline[name]
        for name in timings
        if name in baseline and baseline[name] > 0
    }
    vs_baseline = {name: round(r, 2) for name, r in ratios.items()}
    # The anchors are sf0.1/local[32] measurements; at other SFs fixed
    # per-job overhead dominates sub-second queries and the ratio is
    # meaningless, so the 2x gate only binds when run-sf == anchor-sf.
    sf_str = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    gate_active = sf_str == str(_load_baseline_sf())
    regressions = (
        sorted(n for n, r in ratios.items() if r > 2.0) if gate_active else []
    )

    # Fresh-session confirmation of gate breaches: the ~190-query main
    # loop accumulates session state that can slow compute-heavy
    # queries 2-3x late in the run with NO plan change (same effect the
    # stress phase hit at ~100 queries — cluster_aware_split_leakage
    # measured 15-17s in-context across two full runs while its
    # fresh-session base inside the SAME runs was 4.6-4.9s, at anchor;
    # a forced System.gc() between queries does not cure it). The 2x
    # gate is about plan shape, so a breach only counts if a fresh
    # session reproduces it; the recheck value replaces the in-context
    # one and is recorded under "recheck" for provenance.
    recheck: dict[str, dict] = {}
    if regressions:
        spark.stop()
        spark = get_spark("bench-recheck")
        spark.sparkContext.setLogLevel("ERROR")
        regressions = _confirm_regressions(
            spark, registry, regressions, baseline, timings, vs_baseline, recheck
        )

    stress: dict = {}
    if not os.environ.get("SPARK_GRAFT_NO_STRESS"):
        try:
            # The stress phase runs in a RESTARTED session with its own
            # re-measured base: after the ~100-query main loop, the first
            # stress entries measured 4-7x slower best-of-2 at identical
            # output rows than the same query in a fresh session
            # (minhash@10x 17.5-26.7 s in-context vs 3.9-4.2 s solo,
            # reproduced across two full-run contexts 2026-08-15; a
            # 12-heavy-query prefix does NOT reproduce it — accumulated
            # session state, not the plan). Growth curves are evidence
            # about plan SHAPE, so both sides of each ratio are measured
            # inside the same fresh session: base_sec at SF_DIR first,
            # then the replicated runs.
            spark.stop()
            spark = get_spark("bench-stress")
            spark.sparkContext.setLogLevel("ERROR")
            stress_base: dict[str, float] = {}

            def fresh_base(name: str) -> float:
                if name not in stress_base:
                    best = None
                    for _ in range(2):
                        t0 = time.time()
                        registry[name].build(spark, SF_DIR).count()
                        sec = time.time() - t0
                        best = sec if best is None else min(best, sec)
                    stress_base[name] = round(best, 3)
                return stress_base[name]

            # best-of-2 like the main loop: the first stress execution pays
            # cold codegen + cold stress-dir file cache, which previously
            # made growth curves cold-vs-warm noise (a 30x point measuring
            # FASTER than its 10x point).
            def stress_run(name: str, factor: int, vs_10x_key: str | None = None):
                sdir = _build_stress_dir(spark, SF_DIR, factor)
                best, n = None, 0
                for _ in range(2):
                    t0 = time.time()
                    n = registry[name].build(spark, sdir).count()
                    sec = time.time() - t0
                    best = sec if best is None else min(best, sec)
                sec = round(best, 3)
                base = fresh_base(name)
                rec = {
                    "sec": sec,
                    "rows": n,
                    "base_sec": base,
                    "growth_x": round(sec / base, 2) if base else None,
                }
                if vs_10x_key is not None and vs_10x_key in stress:
                    rec["growth_vs_10x"] = round(sec / stress[vs_10x_key]["sec"], 2)
                print(
                    f"# stress[{factor}x] {name}: {sec:.3f}s rows={n} "
                    f"growth={rec['growth_x']}x",
                    file=sys.stderr,
                )
                return rec

            for name in STRESS_QUERIES:
                if name in registry:
                    stress[name] = stress_run(name, STRESS_FACTOR)
            stress["factor"] = STRESS_FACTOR
            for name in STRESS_QUERIES_DEEP:
                if name in registry:
                    stress[f"{name}@{STRESS_FACTOR_DEEP}x"] = stress_run(
                        name, STRESS_FACTOR_DEEP, vs_10x_key=name
                    )
        except Exception as e:  # stress must never sink the bench line
            stress = {"error": f"{type(e).__name__}: {e}"}

    # A query the fresh-session recheck forgives in CONSECUTIVE committed
    # runs is a repeat offender (r10 ADVICE): a plan regression that only
    # manifests under accumulated session state would be silently forgiven
    # forever, so surface the overlap with the previously committed run.
    prior_forgiven: set[str] = set()
    try:
        with open(os.path.join(REPO, "BENCH_local.json")) as f:
            prior_forgiven = set(json.load(f).get("recheck", {}))
    except Exception:
        pass
    repeat_offenders = sorted(prior_forgiven & set(recheck))

    sf = sf_str
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    summary = {
        "n_queries": len(timings),
        "median_vs_baseline": (
            round(sorted(vs_baseline.values())[len(vs_baseline) // 2], 2)
            if vs_baseline
            else None
        ),
        "worst_vs_baseline": (
            round(max(vs_baseline.values()), 2) if vs_baseline else None
        ),
        "recheck_repeat_offenders": repeat_offenders,
        "regressions_gt_2x": regressions,
        "sf": sf_val,
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "value": round(sum(timings.values()), 3),
    }
    # Full per-query detail (all queries + vs_baseline + stress curves +
    # recheck provenance) goes to the sidecar, which run_gates.sh installs
    # as the committed BENCH_local.json.
    with open(DETAIL_PATH, "w") as f:
        json.dump(
            {
                "queries": timings,
                "vs_baseline": vs_baseline,
                "scale_stress": stress,
                "recheck": recheck,
                **summary,
            },
            f,
        )
    # The stdout line must PARSE from the driver's bounded capture
    # (~2000 bytes: BENCH_r05..r10 all record parsed=null because the
    # full-catalog line outgrew it in round 5). So the line carries the
    # complete summary + gate verdicts + the fixed HEADLINE subset of
    # per-query timings, and points at the sidecar for the rest;
    # tests/test_bench_line_size.py pins the budget.
    headline = {n: timings[n] for n in HEADLINE_QUERIES if n in timings}
    print(
        json.dumps(
            {
                "queries": headline,
                "detail": "BENCH_local.json",
                **summary,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

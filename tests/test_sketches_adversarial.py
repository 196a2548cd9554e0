"""Round-12 hostile-key battery for the sketch kernels (KMV, Count-Min;
operators/sketches.py). The catalog's sketch queries run NULL-guarded
inputs (r9 sweeps green), but the KERNELS had never been driven with
NULL keys directly — and NULL keys find two real gaps, both pinned with
the fix QUEUED (r12 → r13, DIVERGENCES.md "Queued fix: sketch kernels
must drop NULL keys"):

1. **KMV cross-engine divergence**: a NULL key hashes to a NULL __h;
   Spark's ascending sort puts NULLS FIRST (the NULL takes rank 1 and
   shifts every real hash down one rank), DuckDB's puts NULLS LAST —
   the k-th smallest hash differs, so the estimates diverge on
   IDENTICAL input (measured: 12.11 vs 6.05 on the fixture below).
2. **Count-Min upper-bound violation**: NULL keys hash into NULL
   buckets (isolated — real-key estimates are unaffected), but the
   probe's equi-join can't match a NULL bucket, so a NULL key that
   occurred N times estimates 0 — below the true count, violating the
   one guarantee CM makes (est >= true).

The r13 fix is the engine's standing NULL contract ("no key ⇒ no
participation", r9): drop NULL keys at sketch build AND probe on both
engines. Under-k KMV counting NULL as one distinct (both engines agree)
and hostile-byte keys hashing fine are contrast-pinned.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from syntheticdata_pipeline__spark.operators.sketches import (
    countmin_estimate,
    countmin_tables,
    kmv_distinct,
    kmv_distinct_sql,
)

# 10 distinct real keys + 2 NULL rows, one group, k=4 (< distinct count
# so the k-th-hash path — the divergent one — is exercised)
_KMV_ROWS = [("g", str(i)) for i in range(10)] + [("g", None), ("g", None)]


def _duck_kmv(k: int) -> float:
    con = duckdb.connect()
    vals = ",".join(f"('g','{i}')" for i in range(10)) + ",('g',NULL),('g',NULL)"
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(grp, __kk)")
    return con.execute(kmv_distinct_sql("t", "grp", "__kk", k=k)).fetchall()[0][1]


def test_kmv_null_keys_diverge_cross_engine_pinned_queued_fix(spark):
    """QUEUED FIX: identical NULL-laced input, different estimates —
    Spark ranks the NULL hash first (NULLS FIRST), DuckDB last. Both
    deterministic (md5 hashing), so the exact values are pinned."""
    df = spark.createDataFrame(_KMV_ROWS, "grp string, key string")
    spark_est = kmv_distinct(df, ["grp"], F.col("key"), k=4).collect()[0].distinct_est
    duck_est = _duck_kmv(4)
    assert spark_est == pytest.approx(12.112267843952596)
    assert duck_est == pytest.approx(6.045940082759138)
    assert spark_est != pytest.approx(duck_est)  # r13: both must drop NULLs


def test_kmv_under_k_fallback_counts_null_as_one_distinct(spark):
    """Contrast pin: below k the exact-count fallback fires and BOTH
    engines count the NULL as one distinct key (dropDuplicates and
    SELECT DISTINCT both keep a single NULL) — they agree, so only the
    k-th-hash path diverges."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None)], "grp string, key string"
    )
    est = kmv_distinct(df, ["grp"], F.col("key"), k=8).collect()[0].distinct_est
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('g','a'),('g','b'),('g',NULL)) v(grp, __kk)"
    )
    duck = con.execute(kmv_distinct_sql("t", "grp", "__kk", k=8)).fetchall()[0][1]
    assert est == 3.0 and duck == 3.0


def test_kmv_empty_input_yields_no_groups(spark):
    empty = spark.createDataFrame([], "grp string, key string")
    assert kmv_distinct(empty, ["grp"], F.col("key"), k=4).collect() == []


def test_countmin_null_keys_isolated_but_estimate_underruns_pinned(spark):
    """QUEUED FIX: NULL keys land in per-depth NULL buckets — real-key
    estimates stay correct — but probing the NULL key estimates 0 while
    its true count is 1: the CM upper-bound guarantee (est >= true)
    breaks exactly and only for NULL."""
    df = spark.createDataFrame([("a",), ("a",), (None,)], "k string")
    sketch = countmin_tables(df, F.col("k"))
    rows = [(r.d, r.bucket, r.n) for r in sketch.collect()]
    null_rows = [(d, b, n) for d, b, n in rows if b is None]
    assert len(null_rows) == 3 and all(n == 1 for _d, _b, n in null_rows)
    probes = spark.createDataFrame([("a",), ("x",), (None,)], "k string")
    est = {r.k: r.freq_est for r in countmin_estimate(sketch, probes, "k").collect()}
    assert est["a"] == 2  # real keys unaffected by the NULL pollution
    assert est["x"] == 0  # absent key, no collisions at this scale
    assert est[None] == 0  # r13: NULL must be dropped, not under-counted


def test_countmin_hostile_byte_keys_hash_fine(spark):
    """Contrast pin: NUL bytes, unicode, and 10 KB keys are ordinary
    hash inputs — estimates keep the upper-bound property."""
    keys = ["a\x00b", "中文", "x" * 10_000]
    df = spark.createDataFrame([(k,) for k in keys for _ in range(3)], "k string")
    sketch = countmin_tables(df, F.col("k"))
    probes = spark.createDataFrame([(k,) for k in keys], "k string")
    est = {r.k: r.freq_est for r in countmin_estimate(sketch, probes, "k").collect()}
    assert all(est[k] >= 3 for k in keys)

"""Round-12 hostile-key battery for the sketch kernels (KMV, Count-Min;
operators/sketches.py), FLIPPED in r13 when the queued NULL-key fix
landed (DIVERGENCES.md "Queued fix: sketch kernels must drop NULL
keys"). The two gaps the battery found in r12:

1. **KMV cross-engine divergence**: a NULL key hashed to a NULL __h;
   Spark's ascending sort puts NULLS FIRST (the NULL took rank 1 and
   shifted every real hash down one rank), DuckDB's puts NULLS LAST —
   the k-th smallest hash differed, so the estimates diverged on
   IDENTICAL input (measured: 12.11 vs 6.05 on the fixture below).
2. **Count-Min upper-bound violation**: NULL keys hashed into NULL
   buckets (isolated — real-key estimates were unaffected), but the
   probe's equi-join can't match a NULL bucket, so a NULL key that
   occurred N times estimated 0 — below the true count, violating the
   one guarantee CM makes (est >= true).

The r13 fix is the engine's standing NULL contract ("no key ⇒ no
participation", r9): NULL keys are dropped at sketch build AND probe on
both engines (KMV, Count-Min, and HLL — the HLL NULL row was a phantom
register, engine-consistent but contract-violating). These tests now
assert the fixed behavior; hostile-byte keys hashing fine stays
contrast-pinned.
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


def test_kmv_null_keys_agree_cross_engine_after_drop_fix(spark):
    """FLIPPED r13: both kernels drop NULL keys at build, so the
    NULL-laced input estimates identically on both engines — and equals
    the estimate on the same input with the NULLs never present."""
    df = spark.createDataFrame(_KMV_ROWS, "grp string, key string")
    spark_est = kmv_distinct(df, ["grp"], F.col("key"), k=4).collect()[0].distinct_est
    duck_est = _duck_kmv(4)
    assert spark_est == pytest.approx(duck_est)
    clean = spark.createDataFrame(
        [r for r in _KMV_ROWS if r[1] is not None], "grp string, key string"
    )
    clean_est = kmv_distinct(clean, ["grp"], F.col("key"), k=4).collect()[0].distinct_est
    assert spark_est == pytest.approx(clean_est)


def test_kmv_under_k_fallback_excludes_null_from_distinct(spark):
    """FLIPPED r13: below k the exact-count fallback fires and the NULL
    key no longer counts as a distinct member on either engine — 'no
    key ⇒ no participation' holds on the fallback path too."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None)], "grp string, key string"
    )
    est = kmv_distinct(df, ["grp"], F.col("key"), k=8).collect()[0].distinct_est
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('g','a'),('g','b'),('g',NULL)) v(grp, __kk)"
    )
    duck = con.execute(kmv_distinct_sql("t", "grp", "__kk", k=8)).fetchall()[0][1]
    assert est == 2.0 and duck == 2.0


def test_kmv_empty_input_yields_no_groups(spark):
    empty = spark.createDataFrame([], "grp string, key string")
    assert kmv_distinct(empty, ["grp"], F.col("key"), k=4).collect() == []


def test_countmin_null_keys_dropped_at_build_and_probe(spark):
    """FLIPPED r13: NULL keys never enter the sketch (no NULL buckets)
    and a NULL probe key produces no estimate row — the CM upper-bound
    guarantee (est >= true) holds for every key that HAS an estimate."""
    df = spark.createDataFrame([("a",), ("a",), (None,)], "k string")
    sketch = countmin_tables(df, F.col("k"))
    rows = [(r.d, r.bucket, r.n) for r in sketch.collect()]
    assert all(b is not None for _d, b, _n in rows)  # no NULL buckets
    probes = spark.createDataFrame([("a",), ("x",), (None,)], "k string")
    est = {r.k: r.freq_est for r in countmin_estimate(sketch, probes, "k").collect()}
    assert est["a"] == 2  # real keys unaffected
    assert est["x"] == 0  # absent key, no collisions at this scale
    assert None not in est  # no key ⇒ no participation, not an under-count


def test_hll_null_keys_dropped_no_phantom_register(spark):
    """r13: a NULL key used to create a (group, NULL-register, NULL-rho)
    row on BOTH engines — consistent, but a phantom register that
    inflated __present. The kernel now drops NULL keys, so the sketch
    (and estimate) over NULL-laced input equals the clean input's."""
    from syntheticdata_pipeline__spark.operators.sketches import (
        hll_distinct,
        hll_partials,
    )

    laced = spark.createDataFrame(
        [("g", str(i)) for i in range(30)] + [("g", None)] * 3,
        "grp string, key string",
    )
    clean = laced.filter(F.col("key").isNotNull())
    regs = hll_partials(laced, ["grp"], F.col("key"))
    assert all(r[0] is not None for r in regs.select(F.col("__reg")).collect())
    est_laced = hll_distinct(laced, ["grp"], F.col("key")).collect()[0].distinct_est
    est_clean = hll_distinct(clean, ["grp"], F.col("key")).collect()[0].distinct_est
    assert est_laced == pytest.approx(est_clean)


def test_countmin_hostile_byte_keys_hash_fine(spark):
    """Contrast pin: NUL bytes, unicode, and 10 KB keys are ordinary
    hash inputs — estimates keep the upper-bound property."""
    keys = ["a\x00b", "中文", "x" * 10_000]
    df = spark.createDataFrame([(k,) for k in keys for _ in range(3)], "k string")
    sketch = countmin_tables(df, F.col("k"))
    probes = spark.createDataFrame([(k,) for k in keys], "k string")
    est = {r.k: r.freq_est for r in countmin_estimate(sketch, probes, "k").collect()}
    assert all(est[k] >= 3 for k in keys)

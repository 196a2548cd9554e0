"""Pins for the round-12 hostile DEPTH sweep finds
(tools/hostile_depth_sweep.py: the committed sf0.001 NULL-stripe
batteries re-run over sf0.01 — more rows make more stripe collisions
reachable). Results: nullmeta 67/67, nullfacts 44/45, nullevents 36/37;
the two fails were pinned here red-to-flip in r12 and FLIPPED in r13
when the queued fixes landed (DIVERGENCES.md "Queued fix: depth-sweep
pair") — both stripes now hash-match cross-engine:

1. tpch_q16_supplier_relationship — the engine's left-anti KEEPS a
   NULL-l_suppkey row (NULL == x is unknown, no match) and counts a
   phantom NULL "supplier"; the oracle's NOT IN DROPS it (NULL NOT IN
   set = NULL). The r9 NULL-dims convention ("unknown ≠ seen": oracle →
   NOT EXISTS, matching anti-join) was applied to the resume queries
   but never to Q16. At sf0.001 no striped row survives the part
   filters, so the committed battery stayed green — only depth exposes
   it.
2. kmv_distinct_users — the sketch-kernel NULL-key split pinned in
   test_sketches_adversarial.py, now confirmed REACHABLE from a catalog
   query: with NULL user_ids striped in, Spark ranks the NULL hash
   first (NULLS FIRST) and DuckDB last. At sf0.001 every group stays
   under k distinct users, so the exact-count fallback (where both
   engines agree) hides the divergence.

Both fixtures are built at sf0.01 with the EXACT stripe SQL of the
committed sf0.001 batteries.
"""

from __future__ import annotations

import os
import shutil

import pytest

SF = "/root/testdata/sf0.01"
ALL_TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def _striped_dir(tmp_path, rewrites: dict[str, str]) -> str:
    import duckdb

    tmp = str(tmp_path)
    con = duckdb.connect()
    for table, replace_sql in rewrites.items():
        con.execute(
            f"COPY (SELECT * REPLACE ({replace_sql}) "
            f"FROM read_parquet('{SF}/{table}.parquet')) "
            f"TO '{tmp}/{table}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in ALL_TABLES.split():
        if t not in rewrites:
            src = os.path.join(SF, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    return tmp


def _compare(spark, sf_dir: str, name: str):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    spec = load_all()[name]
    con = duck_connect(sf_dir)
    try:
        return compare_one(
            spark, con, name, {name: spec.build}, {name: spec.oracle}, sf_dir
        )
    finally:
        con.close()


def test_q16_null_suppkey_agrees_after_not_exists_fix(spark, tmp_path):
    """FLIPPED r13 (queued fix #12): the Q16 oracle moved from NOT IN to
    NOT EXISTS (the r9 'unknown ≠ seen' convention), so a NULL
    l_suppkey survives the exclusion on both engines and the sf0.01
    NULL stripe that split them in r12 now hash-matches."""
    d = _striped_dir(
        tmp_path,
        {
            "lineitem": (
                "CASE WHEN (l_orderkey*10 + l_linenumber) % 31 = 0 "
                "THEN NULL ELSE l_suppkey END AS l_suppkey"
            )
        },
    )
    assert _compare(spark, d, "tpch_q16_supplier_relationship") is True


def test_kmv_users_null_keys_agree_after_drop_fix(spark, tmp_path):
    """FLIPPED r13 (queued fix #7): the KMV kernel drops NULL keys at
    build on both engines (DIVERGENCES 'sketch kernels must drop NULL
    keys'), so the NULLS-FIRST/NULLS-LAST rank split the r12 depth
    sweep found is gone — the striped fixture now hash-matches."""
    d = _striped_dir(
        tmp_path,
        {
            "events": (
                "CASE WHEN event_id % 17 = 0 THEN NULL ELSE user_id END AS user_id"
            )
        },
    )
    assert _compare(spark, d, "kmv_distinct_users") is True

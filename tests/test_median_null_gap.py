"""Reproduction fixture for the queued exact_median_two_pass fix
(r9 ADVICE #2; DIVERGENCES.md "Queued fix: exact_median_two_pass").

The non-finite contract says NaN/±Inf measures are "skipped from sums,
counts, means, histograms, CDFs and selection machinery". The median's
selection machinery only half-honors that: `finite_or_null` NULLs the
value but the NULL row still counts in n and k, lands in top bucket
b-1 via the NULL-skipping least(), and — when the k-th rank reaches
that bucket among mixed NULL/real values — the terminal
row_number() OVER (ORDER BY value) picks a different row per engine
(Spark NULLS FIRST vs DuckDB NULLS LAST).

This fixture forces exactly that shape for one event type: 40% NaN,
real values split 20%/40% across the range ends so the k-th rank lands
in bucket 511 with NULLs mixed in. The round-11 fix (`value IS NOT
NULL` before the stats CTE on both sides — n, k, and every bucket
count measurements only) landed in plans/events_q.py; this fixture now
pins it as a regression test.
"""

from __future__ import annotations

import os
import shutil

import pytest

_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def median_gap_dir(tmp_path_factory):
    import duckdb

    tmp = str(tmp_path_factory.mktemp("median_gap"))
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * REPLACE (
            CASE WHEN event_type = 'click' AND event_id % 5 IN (0, 1) THEN 'nan'::DOUBLE
                 WHEN event_type = 'click' AND event_id % 5 = 2 THEN 1.0
                 WHEN event_type = 'click' THEN 1000.0
                 ELSE value END AS value)
          FROM read_parquet('{_SRC}/events.parquet'))
        TO '{tmp}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in "region nation customer supplier part orders lineitem documents embeddings".split():
        os.symlink(os.path.join(_SRC, f"{t}.parquet"), os.path.join(tmp, f"{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_median_excludes_nulled_nonfinite_from_selection(spark, median_gap_dir):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    name = "exact_median_two_pass"
    qs = {name: registry[name].build}
    oracles = {name: registry[name].oracle}
    con = duck_connect(median_gap_dir)
    try:
        assert compare_one(spark, con, name, qs, oracles, median_gap_dir) is not False
    finally:
        con.close()

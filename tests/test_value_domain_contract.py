"""Value-domain contract of the exact fixed-point statistics: the
order-independent accumulation discipline (trunc-scaled integers /
fixed-scale decimals) has an inherent magnitude domain, and BOTH
engines must reject values outside it LOUDLY and symmetrically — an
ANSI overflow error on the bad partition, never a silently corrupted
or NULLed statistic. (Round-7 sweep with |value| = 1e12 planted in
events: Spark raised NUMERIC_VALUE_OUT_OF_RANGE / CAST overflow and
DuckDB raised the matching Conversion Error on all three affected
queries; the other 187 catalog queries are insensitive to the value
column's magnitude and stayed green.)

If a future refactor widens the domain (e.g. decimal re-scaling), this
test will fail on the now-succeeding engine pair and should be updated
to assert value parity instead — what it guards against is the
ASYMMETRIC middle state where one engine errors and the other returns
numbers.
"""

from __future__ import annotations

import os
import shutil

import pytest

_SRC = "/root/testdata/sf0.001"
_REJECTING = (
    "event_value_outliers",
    "neyman_allocation_sample",
    "value_trend_by_type",
)
# magnitude-insensitive representatives that must keep matching the
# oracle even with the planted extremes present:
_TOLERANT = ("stateful_dedup_events", "hourly_profile_by_type")


@pytest.fixture(scope="module")
def extreme_sf_dir(tmp_path_factory):
    import duckdb

    tmp = str(tmp_path_factory.mktemp("extreme_sf"))
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (CASE
              WHEN event_id = 0 THEN 1e12
              WHEN event_id = 1 THEN -1e12
              WHEN event_id = 2 THEN 1e-9
              WHEN event_id = 3 THEN 0.0
              ELSE value END AS value)
             FROM read_parquet('{_SRC}/events.parquet'))
            TO '{tmp}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in "region nation customer supplier part orders lineitem documents embeddings".split():
        os.symlink(os.path.join(_SRC, f"{t}.parquet"), os.path.join(tmp, f"{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("name", _REJECTING)
def test_out_of_domain_rejection_is_symmetric(spark, extreme_sf_dir, name):
    import duckdb

    from syntheticdata_pipeline__spark.plans import load_all

    spec = load_all()[name]
    with pytest.raises(Exception) as spark_err:
        spec.build(spark, extreme_sf_dir).collect()
    assert any(
        tag in str(spark_err.value)
        for tag in ("NUMERIC_VALUE_OUT_OF_RANGE", "CAST_OVERFLOW", "ARITHMETIC")
    ), f"Spark rejected for an unexpected reason: {str(spark_err.value)[:200]}"

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings events"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{extreme_sf_dir}/{t}.parquet')"
        )
    try:
        with pytest.raises(Exception) as duck_err:
            con.execute(spec.oracle).fetchall()
        assert "Conversion Error" in str(duck_err.value) or "Out of Range" in str(
            duck_err.value
        )
    finally:
        con.close()


@pytest.mark.parametrize("name", _TOLERANT)
def test_magnitude_insensitive_queries_stay_green(spark, extreme_sf_dir, name):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    qs = {name: registry[name].build}
    oracles = {name: registry[name].oracle}
    con = duck_connect(extreme_sf_dir)
    try:
        assert compare_one(spark, con, name, qs, oracles, extreme_sf_dir) is True
    finally:
        con.close()

"""Runtime bloom-filter join pruning — the 100 TB lever that drops
probe-side rows before the shuffle when the build side is selectively
filtered. Local datasets are below the production scan-size threshold, so
the test lowers it to force injection and proves (a) the optimizer plants
``might_contain`` on the probe side and (b) results are unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_SMOKE

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # production default is 10GB; the toy tables need 0 to qualify
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _join(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_totalprice")


def test_bloom_filter_injected_and_result_identical(spark):
    baseline = sorted(map(tuple, _join(spark).collect()))
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        j = _join(spark)
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in plan or "bloom" in plan
        assert sorted(map(tuple, j.collect())) == baseline
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

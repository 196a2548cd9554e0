"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``syntheticdata_pipeline__spark/``; the query
catalog (Spark plan + DuckDB oracle twins) is
``syntheticdata_pipeline__spark/plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syntheticdata_pipeline__spark.plans import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1-A3 "final scraping report" shape: scan → join → agg → derived
    rates (SURVEY.md §7.1).
    """
    registry = load_all()
    return registry["report_order_fulfillment"].build(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    registry = load_all()
    return {name: spec.build for name, spec in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible query (same column
    aliases — the driver hashes values after sorting columns by name)."""
    registry = load_all()
    return {name: spec.oracle for name, spec in registry.items() if spec.oracle is not None}

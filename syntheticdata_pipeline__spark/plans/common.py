"""Shared helpers for the query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_runtime_confs, load_table
from ..sources.readers import load_events


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with runtime confs applied (driver-owned
    sessions included). ``events`` goes through the NANOS-safe loader."""
    ensure_runtime_confs(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return load_table(spark, sf_dir, name)

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


def cpu_width(spark: SparkSession) -> int:
    """Partition width for exchanges that feed CPU-dense stages (set
    intersection, per-pair verification, hash batteries).

    AQE's partition coalescing is byte-based: a stage whose input is a
    few MB of keys/arrays but whose per-row compute is heavy gets
    coalesced to one partition and serializes on a single core. An
    explicit ``repartition(cpu_width(spark), keys...)`` opts that one
    exchange out of byte-based coalescing while staying scale-adaptive:
    the width follows ``spark.sql.shuffle.partitions`` — sized to the
    cluster in production, to the local core count in tests/bench — and
    never hard-codes a machine constant."""
    try:
        return max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    except Exception:
        return max(int(spark.sparkContext.defaultParallelism), 1)

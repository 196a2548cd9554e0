"""SparkSession bootstrap + runtime-conf hardening.

The correctness driver owns its own SparkSession, so every query entry point
calls :func:`ensure_runtime_confs` (runtime-settable SQL confs only) instead
of relying on builder-time configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every query depends on for deterministic,
# oracle-comparable output.
_RUNTIME_CONFS = {
    # Timestamps in testdata are naive/UTC; make Spark interpret them the
    # same way DuckDB does.
    "spark.sql.session.timeZone": "UTC",
    # J5 merge-with-precedence (right side wins), SURVEY §2.4.
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # Runtime re-planning: partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime SQL confs; safe to call on a driver-owned session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be locked by the host; queries degrade gracefully.
            pass
    return spark


def get_spark(
    app_name: str = "syntheticdata_pipeline__spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session shaped like a cluster deployment.

    local[$SPARK_GRAFT_CPUS] for tests/bench; on a real cluster the same
    code runs unchanged — only master/resource confs differ.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or int(cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return ensure_runtime_confs(builder.getOrCreate())


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

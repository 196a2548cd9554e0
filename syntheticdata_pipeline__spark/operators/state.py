"""Parquet-backed state/resume manager (SURVEY.md §4 custom component #1).

Replaces the reference's whole-set-in-memory, whole-JSON-flush progress
checkpoints (any_scraper.py:85-116, test_kimono_ec2.py:317-414) with an
append-only parquet state table + periodic compaction:

- ``append``  — record newly processed keys (idempotent by design: dedup
  happens at read).
- ``filter_new`` — anti-join incoming work against the state (J3/R2/R3).
- ``compact`` — rewrite the accumulated appends as one deduped snapshot.

At 100 TB the state table is itself big; ``filter_new`` is a shuffled
anti join on the key (broadcast when small), and compaction bounds the
file count — the reference's unbounded in-memory set simply can't scale.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class StateTable:
    """Append-only processed-keys table with snapshot compaction.

    ``value_cols`` optionally carries payload columns alongside the keys
    (e.g. the minhash signature per doc id for incremental dedup state);
    dedup across appends stays keyed on ``key_cols``, which is sound when
    the payload is functionally determined by the key (same id ⇒ same
    signature)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        value_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.value_cols = list(value_cols or [])

    def _cols(self) -> list[str]:
        return [*self.key_cols, *self.value_cols]

    # -- reads ---------------------------------------------------------------
    def exists(self) -> bool:
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(self.path)  # type: ignore[union-attr]
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        return bool(fs.exists(hpath))

    def load(self) -> DataFrame:
        """Current state keys (+ payload), deduped across appends."""
        if not self.exists():
            if self.value_cols:
                raise ValueError(
                    "empty state table with value columns has no inferable "
                    "schema; call exists() before load()"
                )
            schema = ", ".join(f"{c} string" for c in self.key_cols)
            return self.spark.createDataFrame([], schema=schema)
        return self.spark.read.parquet(self.path).select(*self._cols()).dropDuplicates(
            self.key_cols
        )

    def count(self) -> int:
        """A11 state-size counter (len(scraped_urls), test_kimono_ec2.py:358)."""
        return self.load().count()

    # -- writes ----------------------------------------------------------------
    def append(self, done: DataFrame) -> None:
        """Flush a batch of processed keys (K5 checkpoint cadence becomes
        one append per micro-batch instead of a full-set rewrite)."""
        done.select(*self._cols()).dropDuplicates(self.key_cols).write.mode("append").parquet(
            self.path
        )

    def compact(self) -> None:
        """Rewrite accumulated appends as a single deduped snapshot."""
        if not self.exists():
            return
        snapshot = self.load()
        tmp = os.path.join(os.path.dirname(self.path.rstrip("/")), f".compact-{uuid.uuid4().hex}")
        snapshot.coalesce(max(1, snapshot.rdd.getNumPartitions() // 8)).write.mode(
            "overwrite"
        ).parquet(tmp)
        reread = self.spark.read.parquet(tmp)
        reread.write.mode("overwrite").parquet(self.path)
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(tmp)  # type: ignore[union-attr]
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        fs.delete(hpath, True)

    # -- the resume operator -----------------------------------------------------
    def filter_new(self, work: DataFrame) -> DataFrame:
        """R2/J3: keep only work items whose keys are not yet in the state."""
        if not self.exists():
            return work
        return work.join(self.load(), on=self.key_cols, how="left_anti")

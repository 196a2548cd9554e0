"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 R2/R3 — the arbitrary-state form of the reference's
progress counters and seen-sets, with Spark-managed fault-tolerant state
instead of in-memory Python sets flushed to JSON).

State is partitioned by key across executors and checkpointed with the
query — bounded, recoverable, and shardable at 100 TB/day, which the
reference's whole-set-in-RAM approach (any_scraper.py:58-116) is not.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_micros", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("sv_micros", LongType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, Σvalue) maintained in keyed group state —
    the progress-counter semantics (test_kimono.py:63-74) as a custom
    stateful operator. Value sums accumulate in integer micro-units so
    state merges are order-independent (same determinism rule as the
    decimal aggregates).
    """

    def update(
        key: tuple, pdf_iter: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        (user_id,) = key
        n, sv = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # micro-units: int arithmetic, associative across batches
            sv += int(round(float(pdf["value"].sum()) * 1_000_000))
        state.update((n, sv))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value_micros": [sv]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

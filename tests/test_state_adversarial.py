"""State/streaming adversarial battery (r9 verdict "Next round" #5) —
the last operator family without a hostile-fixture sweep: the
parquet-backed resume state (operators/state.py, reference semantics
any_scraper.py:85-116 / test_kimono_ec2.py:317-414), the incremental
chunk-boundary operators, and the watermark dedup path, under NULL
keys, empty checkpoints/appends, duplicate appends, and
duplicate-timestamp chunk boundaries.

Contracts pinned here:

- **NULL-key work is never known-done** (StateTable.filter_new is a
  left-anti join = SQL NOT EXISTS): a row with no identity cannot be
  deduplicated against state, so it survives every resume — mirrors the
  r9 `anti_join_new_customers` NOT-EXISTS NULL rule.
- **NULL keys dedup as one inside the state itself** (dropDuplicates
  treats NULLs equal), so state growth stays bounded under NULL-key
  appends.
- **Empty appends and empty checkpoints are inert**: resume == fresh
  before any real append, after an empty append, and after compaction.
- **Duplicate appends are idempotent** (dedup at read).
- **Chunked == batch under duplicate-timestamp chunk boundaries** for
  incremental_transition_counts — the (ts, id) tiebreak must hold when
  the boundary rows share identical timestamps.
- **Chunked == batch under NULL user ids** — the batch twin
  (event_transition_matrix) partitions NULL users into one real group,
  so the boundary stitch and the carried-state anti-join must be
  null-safe or cross-chunk NULL-user transitions are silently lost and
  NULL state rows accumulate one per chunk (found by this battery,
  fixed in operators/state.py with eqNullSafe).
- **Streaming dedup == batch dedup with NULL keys and duplicate
  timestamps** (dropDuplicatesWithinWatermark vs dropDuplicates).
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.operators.state import (
    StateTable,
    incremental_transition_counts,
)

pytestmark = pytest.mark.slow  # deep battery: default run skips;
# SPARK_GRAFT_FULL_TESTS=1 (run_gates.sh full) runs it (r15 suite split)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# StateTable under NULL keys / empty / duplicate appends
# ---------------------------------------------------------------------------


def test_null_key_work_is_never_known_done(spark, tmp_path):
    st = StateTable(spark, str(tmp_path / "st"), ["url"])
    work = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "url string"
    )
    st.append(work)
    # non-null keys are known-done; NULL-key rows have no identity and
    # survive every resume (NOT EXISTS semantics)
    remaining = st.filter_new(work)
    assert _rows(remaining, "url") == [(None,), (None,)]


def test_null_keys_dedup_as_one_in_state(spark, tmp_path):
    st = StateTable(spark, str(tmp_path / "st"), ["url"])
    st.append(spark.createDataFrame([(None,), (None,), ("a",)], "url string"))
    st.append(spark.createDataFrame([(None,), ("a",)], "url string"))
    # state is bounded: NULLs collapse to one row at read, duplicates too
    assert st.count() == 2
    st.compact()
    assert st.count() == 2


def test_empty_append_is_inert(spark, tmp_path):
    st = StateTable(spark, str(tmp_path / "st"), ["url"])
    work = spark.createDataFrame([(f"u{i}",) for i in range(5)], "url string")
    st.append(work.limit(0))  # flush of an empty micro-batch
    assert st.filter_new(work).count() == 5  # resume == fresh
    st.append(work.limit(2))
    assert st.filter_new(work).count() == 3
    st.append(work.limit(0))
    assert st.filter_new(work).count() == 3
    st.compact()
    assert st.filter_new(work).count() == 3


def test_duplicate_appends_idempotent(spark, tmp_path):
    st = StateTable(spark, str(tmp_path / "st"), ["url"])
    batch = spark.createDataFrame([("a",), ("b",)], "url string")
    for _ in range(3):
        st.append(batch)
    assert st.count() == 2
    st.compact()
    assert st.count() == 2


def test_empty_state_with_value_cols_is_loud(spark, tmp_path):
    st = StateTable(spark, str(tmp_path / "st"), ["k"], value_cols=["sig"])
    with pytest.raises(ValueError, match="no inferable"):
        st.load()
    # but filter_new on a missing state is fine (returns work unchanged)
    work = spark.createDataFrame([("a", "s1")], "k string, sig string")
    assert st.filter_new(work).count() == 1


# ---------------------------------------------------------------------------
# incremental_transition_counts: hostile chunk boundaries
# ---------------------------------------------------------------------------

_EV_SCHEMA = "user_id long, event_type string, ts_us long, event_id long"


def _batch_transitions(spark, rows):
    """One-shot lag counts — the batch twin (event_transition_matrix
    shape, NULL users form one real partition)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, _EV_SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = df.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        seq.groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )


def _chunked_transitions(spark, rows, n_chunks):
    """Thread state through time-ordered chunks; per-chunk counts are
    summed driver-side and state cached per chunk (the established
    technique from test_round6_analytics — one combined lazy plan over
    every chunk's joins trips a flaky whole-stage-codegen zip)."""
    size = (len(rows) + n_chunks - 1) // n_chunks
    ordered = sorted(rows, key=lambda r: (r[2], r[3]))  # (ts, id) order
    parts = [ordered[i * size : (i + 1) * size] for i in range(n_chunks)]
    state = None
    totals: dict[tuple, int] = {}
    for p in parts:
        if not p:
            continue
        chunk = spark.createDataFrame(p, _EV_SCHEMA)
        c, state = incremental_transition_counts(chunk, state)
        state = state.cache()
        for r in c.collect():
            k = (r["from_type"], r["to_type"])
            totals[k] = totals.get(k, 0) + r["n"]
    return totals, state


def test_transitions_duplicate_ts_chunk_boundary(spark):
    """Every boundary row shares its timestamp with the neighbor across
    the chunk cut; the (ts, id) tiebreak must keep chunked == batch."""
    rows = []
    eid = 0
    for u in (1, 2):
        for ts in (100, 100, 200, 200, 200, 300):  # heavy duplication
            rows.append((u, f"t{eid % 3}", ts, eid))
            eid += 1
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in _batch_transitions(spark, rows).collect()
    }
    for n_chunks in (2, 3, 4):
        chunked, _ = _chunked_transitions(spark, rows, n_chunks)
        assert chunked == batch, n_chunks


def test_transitions_null_user_chunk_boundary(spark):
    """NULL users are ONE real group in the batch twin
    (Window.partitionBy groups NULLs); the chunked path must stitch
    their boundary transitions and carry exactly one NULL state row."""
    rows = [
        (None, "a", 100, 0),
        (None, "b", 200, 1),
        (7, "a", 150, 2),
        (None, "c", 300, 3),  # crosses a chunk boundary for the NULL user
        (7, "b", 350, 4),
        (None, "a", 400, 5),
    ]
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in _batch_transitions(spark, rows).collect()
    }
    for n_chunks in (2, 3):
        chunked, state = _chunked_transitions(spark, rows, n_chunks)
        assert chunked == batch, n_chunks
        # exactly one state row per user INCLUDING the NULL user
        assert state.count() == 2, n_chunks
        assert state.filter("user_id IS NULL").count() == 1, n_chunks


def test_transitions_user_absent_from_middle_chunk(spark):
    """A user whose events skip a chunk entirely must still stitch its
    boundary transition across the gap (carried state)."""
    rows = [
        (1, "a", 100, 0),
        (2, "x", 110, 1),
        (2, "y", 210, 2),  # chunk 2 has only user 2
        (2, "z", 220, 3),
        (1, "b", 300, 4),  # user 1 returns in chunk 3
    ]
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in _batch_transitions(spark, rows).collect()
    }
    chunked, state = _chunked_transitions(spark, rows, 3)
    assert chunked == batch
    assert state.count() == 2


# ---------------------------------------------------------------------------
# Watermark dedup vs batch dedup: NULL keys + duplicate timestamps
# ---------------------------------------------------------------------------


def test_stream_dedup_null_keys_match_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark must agree with the batch
    dropDuplicates contract on NULL keys (NULLs compare equal for
    dedup) and duplicate timestamps — one survivor per (user_id) key
    including the NULL key."""
    import os

    from pyspark.sql import functions as F

    from syntheticdata_pipeline__spark.streaming.windows import (
        dedup_within_watermark,
        run_append_to_memory,
    )

    rows = [
        (0, "2024-01-01 00:00:00", None),
        (1, "2024-01-01 00:00:00", None),  # same ts, NULL key again
        (2, "2024-01-01 00:01:00", 5),
        (3, "2024-01-01 00:01:00", 5),  # duplicate (key, ts)
        (4, "2024-01-01 00:02:00", 6),
    ]
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "events.parquet"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(src, "events.parquet"))
    )
    out = run_append_to_memory(dedup_within_watermark(stream, ["user_id"]))
    # batch twin: one survivor per key, NULLs equal
    assert out.count() == 3
    assert out.filter("user_id IS NULL").count() == 1
    assert out.filter("user_id = 5").count() == 1

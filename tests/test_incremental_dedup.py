"""Incremental near-dup dedup: chunked ingestion against persisted
signature state must equal the one-shot run (the rule checks every doc
against ALL earlier docs, so batching is associative)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.operators.neardup import (
    incremental_minhash_dedup,
    minhash_signatures,
)
from syntheticdata_pipeline__spark.plans.common import T

from .conftest import SF_SMOKE


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_incremental_equals_oneshot(spark):
    d = T(spark, SF_SMOKE, "documents").select("doc_id", "text")

    # one-shot: everything in a single batch, no prior state
    oneshot, _ = incremental_minhash_dedup(d, None)
    want = _ids(oneshot)

    # chunked: three id-ordered batches, state accumulated between them
    cut1, cut2 = 160, 320
    batches = [
        d.filter(F.col("doc_id") < cut1),
        d.filter((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)),
        d.filter(F.col("doc_id") >= cut2),
    ]
    state = None
    got = set()
    for b in batches:
        survivors, new_sigs = incremental_minhash_dedup(b, state)
        got |= _ids(survivors)
        state = new_sigs if state is None else state.unionByName(new_sigs)

    assert got == want
    # dedup actually dropped something, and no doc vanished entirely
    n_docs = d.count()
    assert 0 < len(want) < n_docs


def test_null_text_survives_and_associative(spark):
    """r14 (ADVICE medium): NULL text yields an all-NULL MinHash
    signature, whose band hashes are NULL and can never equi-join — so
    the band rule keeps EVERY NULL-text doc, in any batching. The r13
    identical-signature collapse keyed them all under md5('') (concat_ws
    skips NULLs) and dropped the non-minimum ids WITHIN a batch while
    cross-batch NULL bands still never matched: survivor sets depended
    on batch boundaries. The collapse now exempts all-NULL signatures;
    one-shot == chunked == everything-survives for the NULL-text rows."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, None),
        (3, None),
        (4, "completely different text about spark engines here"),
        (5, None),
    ]
    d = spark.createDataFrame(rows, "doc_id INT, text STRING")

    oneshot, _ = incremental_minhash_dedup(d, None)
    assert _ids(oneshot) == {1, 2, 3, 4, 5}

    # chunked with a NULL-text doc in each batch AND NULL-sig rows in
    # the persisted state (exercises the prior-side exemption too)
    b1 = d.filter(F.col("doc_id") <= 2)
    b2 = d.filter(F.col("doc_id") > 2)
    sv1, st = incremental_minhash_dedup(b1, None)
    sv2, _ = incremental_minhash_dedup(b2, st)
    assert _ids(sv1) | _ids(sv2) == {1, 2, 3, 4, 5}


def test_identical_signature_collapse_is_output_identical(spark):
    """r13 (queued fix #10): byte-identical replicas share every LSH
    band, so pre-collapse the band join was quadratic in replica-group
    size. The collapse must not change the ANSWER: survivors of a
    replica-laced corpus are exactly the survivors of the distinct
    corpus (replicas of id-minimal docs all die; the distinct docs'
    fate is decided by the same rep-vs-rep comparisons)."""
    base = T(spark, SF_SMOKE, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 120
    )
    # 4 byte-identical replicas per doc, ids stacked ABOVE the originals
    laced = base
    n = 1_000_000
    for k in range(1, 4):
        laced = laced.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(k * n))
        )
    surv_laced, _ = incremental_minhash_dedup(laced, None)
    surv_base, _ = incremental_minhash_dedup(base, None)
    assert _ids(surv_laced) == _ids(surv_base)  # every replica died, no original's fate changed


def test_est_threshold_validated():
    import pytest

    with pytest.raises(ValueError, match="est_threshold"):
        incremental_minhash_dedup(None, None, est_threshold=1.5)


def test_incremental_drops_replica_batch(spark):
    """A second batch that replays earlier docs (ids shifted up) is wiped
    out entirely by the state comparison."""
    d = T(spark, SF_SMOKE, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 100
    )
    survivors1, sigs1 = incremental_minhash_dedup(d, None)
    replay = d.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    survivors2, _ = incremental_minhash_dedup(replay, sigs1)
    assert survivors2.count() == 0
    assert survivors1.count() > 0


def test_signature_state_is_compact(spark):
    sigs = minhash_signatures(T(spark, SF_SMOKE, "documents"))
    row = sigs.first()
    assert len(row.sig) == 12 and all(len(h) == 32 for h in row.sig)


def test_streaming_ingest_with_foreachbatch_state(spark, tmp_path):
    """The streaming-ingestion form: a file-source stream of id-ordered
    chunks, foreachBatch running incremental_minhash_dedup against a
    parquet-persisted signature state, survivors accumulated to a sink.
    Final survivor set equals the one-shot batch run."""
    d = T(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "chunks")
    d.filter(F.col("doc_id") < 160).coalesce(1).write.mode("append").parquet(src)
    d.filter((F.col("doc_id") >= 160) & (F.col("doc_id") < 320)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    d.filter(F.col("doc_id") >= 320).coalesce(1).write.mode("append").parquet(src)

    state_path = str(tmp_path / "sig_state")
    out_path = str(tmp_path / "survivors")

    def ingest(batch_df, batch_id):
        s = batch_df.sparkSession
        try:
            state = s.read.parquet(state_path)
        except Exception:
            state = None
        survivors, new_sigs = incremental_minhash_dedup(batch_df, state)
        survivors.write.mode("append").parquet(out_path)
        new_sigs.write.mode("append").parquet(state_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt_inc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.doc_id for r in spark.read.parquet(out_path).select("doc_id").collect()}
    oneshot, _ = incremental_minhash_dedup(d, None)
    want = _ids(oneshot)
    assert got == want and 0 < len(want) < d.count()


def _part_files(path):
    import glob

    return glob.glob(f"{path}/part-*.parquet") + glob.glob(f"{path}/*/part-*.parquet")


def test_state_compaction_under_growth(spark, tmp_path):
    """The incremental minhash state path through StateTable: N chunked
    appends (one replayed twice) + compact must equal the one-batch state
    exactly, survivors must equal the one-shot run, state row count stays
    O(distinct docs) despite duplicate appends, and compaction shrinks the
    accumulated append files to a bounded snapshot (VERDICT r5 #8)."""
    from syntheticdata_pipeline__spark.operators.state import StateTable

    d = T(spark, SF_SMOKE, "documents").select("doc_id", "text")
    st = StateTable(
        spark, str(tmp_path / "sig_state"), key_cols=["id"], value_cols=["sig"]
    )

    cuts = [0, 120, 240, 360, 10**9]
    got = set()
    for lo, hi in zip(cuts, cuts[1:]):
        batch = d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        state = st.load() if st.exists() else None
        survivors, new_sigs = incremental_minhash_dedup(batch, state)
        got |= _ids(survivors)
        st.append(new_sigs)
        if lo == 120:
            st.append(new_sigs)  # replayed flush: idempotent by design

    n_docs = d.count()
    files_before = len(_part_files(st.path))
    assert st.count() == n_docs  # O(distinct docs) despite the double append
    st.compact()
    files_after = len(_part_files(st.path))
    assert files_after < files_before
    assert st.count() == n_docs

    # compacted state content == the one-batch signature state, exactly
    # (collected compare: exceptAll over the array column trips a Spark
    # analyzer INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND here)
    compacted = {(r.id, tuple(r.sig)) for r in st.load().collect()}
    onebatch = {(r.id, tuple(r.sig)) for r in minhash_signatures(d).collect()}
    assert compacted == onebatch

    # survivors across the chunked+compacted run == one-shot survivors
    oneshot, _ = incremental_minhash_dedup(d, None)
    assert got == _ids(oneshot)

    # the state keeps working after compaction: a replayed corpus with
    # shifted ids is wiped out entirely
    replay = d.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    survivors2, _ = incremental_minhash_dedup(replay, st.load())
    assert survivors2.count() == 0

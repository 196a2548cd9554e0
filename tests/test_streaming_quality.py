"""Streaming corpus curation: the quality gate is a stateless projection,
so the streaming form must equal the batch form row-for-row (availableNow
⇒ one bounded pass). This is the incremental-ingest shape: new crawl
shards arrive as files, the gate filters them on the fly."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.operators.textops import quality_score
from syntheticdata_pipeline__spark.streaming.windows import run_append_to_memory

from .conftest import SF_SMOKE

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _read_docs_stream(spark):
    return (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
    )


def _gate(df):
    return quality_score(df).filter(F.col("quality") >= 0.5).select("doc_id", "quality")


def test_stream_quality_gate_equals_batch(spark):
    streamed = run_append_to_memory(_gate(_read_docs_stream(spark)))
    batch = _gate(spark.read.schema(_DOC_SCHEMA).parquet(f"{SF_SMOKE}/documents.parquet"))
    s = sorted((r.doc_id, round(r.quality, 9)) for r in streamed.collect())
    b = sorted((r.doc_id, round(r.quality, 9)) for r in batch.collect())
    assert s == b
    assert 0 < len(s) < batch.sparkSession.read.parquet(f"{SF_SMOKE}/documents.parquet").count()

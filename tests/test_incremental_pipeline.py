"""R2 at pipeline level: N incremental runs over growing input, each
skipping state-recorded work, must produce exactly the outputs of one
fresh batch run (resume-equals-fresh, SURVEY §5.2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.functions.text import extract_product_id
from syntheticdata_pipeline__spark.operators.state import StateTable


def _process(batch_df):
    """A stand-in for the expensive stage: id extraction + projection."""
    return batch_df.withColumn("product_id", extract_product_id(F.col("url"))).select(
        "url", "product_id"
    )


def test_incremental_runs_equal_fresh_batch(spark, tmp_path):
    all_urls = spark.createDataFrame(
        [(f"https://www.zalando.co.uk/item-{i}.html",) for i in range(30)], "url string"
    )
    # fresh single-shot run
    fresh = sorted(map(tuple, _process(all_urls).collect()))

    # three incremental runs over a growing snapshot, with state + output accumulation
    st = StateTable(spark, str(tmp_path / "state"), ["url"])
    out_dir = str(tmp_path / "out")
    for cutoff in (10, 20, 30):
        visible = all_urls.filter(
            F.regexp_extract("url", r"item-(\d+)", 1).cast("int") < cutoff
        )
        todo = st.filter_new(visible)
        result = _process(todo)
        result.write.mode("append").parquet(out_dir)
        st.append(todo)

    accumulated = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert accumulated == fresh
    # re-running with complete state does nothing (idempotence)
    assert st.filter_new(all_urls).count() == 0
    # and a duplicate run appends nothing new
    extra = st.filter_new(all_urls)
    assert _process(extra).count() == 0

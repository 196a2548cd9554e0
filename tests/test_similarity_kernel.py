"""The Arrow/numpy ANN kernel must agree with the SQL-fold baseline."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.operators.similarity import (
    brute_force_topk,
    topk_pandas_kernel,
)

from .conftest import SF_SMOKE


def test_pandas_kernel_matches_fold_baseline(spark):
    np = pytest.importorskip("numpy")  # noqa: F841
    corpus = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 5)
    baseline = brute_force_topk(corpus, queries, k=3)
    q_pd = queries.select("vec_id", "embedding").toPandas()
    kernel = topk_pandas_kernel(corpus, q_pd, k=3)
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in baseline.collect())
    k = sorted((r.query_id, r.rank, r.neighbor_id) for r in kernel.collect())
    assert b == k

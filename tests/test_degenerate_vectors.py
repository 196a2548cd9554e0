"""Degenerate-vector adversarial battery: vectors that are present and
NULL-free but geometrically or structurally hostile, swept
engine-vs-oracle over the whole embeddings-reading family (FIXTURES.md
§C discipline — membership shared with tests/test_embeddings_adversarial).

The NULL battery (r9) covered absent vectors and NULL components; the
non-finite sweep covered NaN/±Inf components. This battery covers the
remaining hostile class — every value finite and non-NULL, but:

- **zero vector** (vec_id %17) — norm 0, so cosine denominators are
  0·|x| = 0: engines may disagree NaN vs Inf vs NULL on the 0/0, and a
  zero vector must not outrank real neighbors in any ANN list;
- **empty array []** (vec_id %13) — length 0, not NULL: folds over no
  elements (sum() of nothing) differ from folds over NULL;
- **ragged SHORT** (vec_id %19, 32 of 64 dims) and **ragged LONG**
  (vec_id %23, 96 dims) — dimension mismatch inside dot/sqdist kernels:
  Spark's zip_with pads the shorter side with NULL while a
  position-indexed SQL join simply has no row, so a latent kernel
  asymmetry only a ragged fixture can reach;
- **underflow-tiny** (vec_id %29, all components 1e-30, stored float32)
  — norm² = 64e-60 underflows; float32→float64 promotion points differ
  between engines.

A 100 TB embedding pipeline ingests exactly these (a failed encoder
emits zeros; schema drift ships truncated vectors; fp16→fp32 exports
denormalize), so 'reject at load' must itself be a pinned, twinned
rule — not an engine accident.
"""

from __future__ import annotations

import os
import shutil

import pytest

_SRC = "/root/testdata/sf0.001"

from tests.test_embeddings_adversarial import _members, _run_one  # noqa: E402

pytestmark = pytest.mark.slow  # deep battery: default run skips;
# SPARK_GRAFT_FULL_TESTS=1 (run_gates.sh full) runs it (r15 suite split)


def _make_degenerate_fixture(tmp: str) -> str:
    import duckdb

    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (
            CASE
              WHEN vec_id % 17 = 0 THEN
                list_transform(embedding, x -> CAST(0.0 AS FLOAT))
              WHEN vec_id % 13 = 0 THEN CAST([] AS FLOAT[])
              WHEN vec_id % 19 = 0 THEN embedding[1:32]
              WHEN vec_id % 23 = 0 THEN
                list_concat(embedding, embedding[1:32])
              WHEN vec_id % 29 = 0 THEN
                list_transform(embedding, x -> CAST(1e-30 AS FLOAT))
              ELSE embedding
            END AS embedding)
            FROM read_parquet('{_SRC}/embeddings.parquet'))
            TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in "region nation customer supplier part orders lineitem events documents".split():
        src = os.path.join(_SRC, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    return tmp


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    tmp = _make_degenerate_fixture(str(tmp_path_factory.mktemp("emb_degen")))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("name", _members())
def test_degenerate_vectors_match_oracle(spark, degenerate_sf_dir, name):
    _run_one(spark, degenerate_sf_dir, name)


def test_fixture_has_all_five_degeneracies(degenerate_sf_dir):
    import duckdb

    con = duckdb.connect()
    n_zero, n_empty, n_short, n_long, n_tiny = con.execute(
        f"""SELECT
              count(*) FILTER (len(embedding) = 64 AND NOT list_has_any(
                  list_transform(embedding, x -> x <> 0), [true])),
              count(*) FILTER (len(embedding) = 0),
              count(*) FILTER (len(embedding) = 32),
              count(*) FILTER (len(embedding) = 96),
              count(*) FILTER (len(embedding) = 64 AND embedding[1] = CAST(1e-30 AS FLOAT))
            FROM read_parquet('{degenerate_sf_dir}/embeddings.parquet')"""
    ).fetchone()
    con.close()
    assert min(n_zero, n_empty, n_short, n_long, n_tiny) > 0, (
        n_zero,
        n_empty,
        n_short,
        n_long,
        n_tiny,
    )

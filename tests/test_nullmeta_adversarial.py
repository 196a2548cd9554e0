"""NULL-laced documents-metadata battery: every catalog query that
reads the documents table, run against its DuckDB oracle on a fixture
where the metadata columns carry deterministic NULL stripes — `lang`,
`source`, and `n_chars` — while `text` is left intact (the round-7
NULL-text sweep covers text, and keeping it intact keeps the
generator-twin HTML oracles valid: they predict output from the text
contract, not from metadata).

This is the missing third axis of hostile documents input: r7 NULLed
the payload, the empty-corpus sweep removed all rows, but a document
whose language-ID or source attribution failed upstream (NULL lang /
NULL source) — or whose length field was dropped by a schema migration
(NULL n_chars) — has never been swept. Lang/source are GROUP BY and
window-partition keys across the docs/dataset families (per-lang
sampling, source mixtures, drift-by-source, domain quotas), exactly the
NULL-group / NULL-partition class that found six real divergences on
the fact tables.

Stripes on doc_id (coprime): lang %7, source %11, n_chars %13.

Divergences found by this sweep (round 9) are documented in
DIVERGENCES.md §"NULL-laced documents metadata" and fixed
engine-aligned.
"""

from __future__ import annotations

import os
import shutil

import pytest

pytestmark = pytest.mark.slow  # deep battery: default run skips;
# SPARK_GRAFT_FULL_TESTS=1 (run_gates.sh full) runs it (r15 suite split)

_SRC = "/root/testdata/sf0.001"


def _members():
    """Every registered query that reads documents — derived from the
    registry at collection time (build source + oracle SQL, see
    tests/sweep_membership.py) so the sweep cannot silently rot."""
    from tests.sweep_membership import sweep_members

    return sweep_members(("documents",), floor=67)


@pytest.fixture(scope="module")
def null_meta_dir(tmp_path_factory):
    import duckdb

    tmp = str(tmp_path_factory.mktemp("null_meta"))
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (
            CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
            CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS source,
            CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS n_chars)
            FROM read_parquet('{_SRC}/documents.parquet'))
            TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        src = os.path.join(_SRC, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("name", _members())
def test_null_laced_doc_metadata_match_oracle(spark, null_meta_dir, name):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    qs = {name: registry[name].build}
    oracles = {name: registry[name].oracle} if registry[name].oracle else {}
    con = duck_connect(null_meta_dir)
    try:
        assert compare_one(spark, con, name, qs, oracles, null_meta_dir) is not False
    finally:
        con.close()

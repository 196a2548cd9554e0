"""Round-12 source-reader adversarial battery: the S10 pairs-file scan
and the S7 listing resume scan under hostile input. (S1/S2 JSONL/JSON
hostile-bytes coverage lives in test_jsonl_adversarial.py.)

Reference semantics (experiments/standard_vton/dataloader.py:189-192):
``person_name, cloth_name = line.strip().split()`` — i.e. WHITESPACE-RUN
splitting, crash on anything but exactly two tokens. The engine's
tolerant-parse idiom (DIVERGENCES #3 family) deliberately does not
replicate the crashes; but two CSV-reader artifacts diverge from the
reference on lines the reference parses FINE, and those are QUEUED
fixes (r12 → r13, DIVERGENCES.md "Queued fix: pairs-file whitespace
splitting"):

- ``a  b`` (double space): reference → ('a','b'); current CSV sep=' '
  reads an empty middle field → ('a', NULL) and DROPS 'b';
- ``"a x" b`` (CSV quote): reference → 3 tokens (crash); current reader
  applies CSV quoting → ('a x', 'b') — quoting semantics a
  whitespace-split format never had.

The S7 resume scan has one crash class: an id string that overflows
BIGINT kills the whole resume job under ANSI casts (one pathological
filename in a 100 TB bucket listing must not do that) — pinned, fix
queued in the same DIVERGENCES entry (try_cast → NULL → filtered).
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.sources.readers import (
    read_pairs_txt,
    scan_listing_ids,
)


def _write_pairs(tmp_path, payload: bytes) -> str:
    p = tmp_path / "pairs.txt"
    p.write_bytes(payload)
    return str(p)


def _pairs(spark, tmp_path, payload: bytes) -> list[tuple]:
    return sorted(
        (r.person, r.cloth)
        for r in read_pairs_txt(spark, _write_pairs(tmp_path, payload)).collect()
    )


def test_pairs_clean_lines_round_trip(spark, tmp_path):
    got = _pairs(spark, tmp_path, b"p1 c1\np2 c2\n")
    assert got == [("p1", "c1"), ("p2", "c2")]


def test_pairs_bom_is_stripped(spark, tmp_path):
    got = _pairs(spark, tmp_path, "\ufeffp1 c1\n".encode("utf-8"))
    assert got == [("p1", "c1")]


def test_pairs_crlf_and_unicode(spark, tmp_path):
    got = _pairs(spark, tmp_path, "p1 c1\r\ncafé 中文\r\n".encode("utf-8"))
    assert got == [("café", "中文"), ("p1", "c1")]


def test_pairs_blank_line_skipped_short_line_padded(spark, tmp_path):
    """Tolerant-parse divergence (documented, intentional): the reference
    CRASHES on a blank line and on a 1-token line; the engine skips the
    blank and NULL-pads the short line — the S1 PERMISSIVE idiom."""
    got = _pairs(spark, tmp_path, b"p1 c1\n\nonly_person\n")
    assert got == [("only_person", None), ("p1", "c1")]


def test_pairs_extra_tokens_dropped(spark, tmp_path):
    """Tolerant-parse divergence (documented, intentional): the reference
    CRASHES on a 3-token line; the engine keeps the first two tokens."""
    got = _pairs(spark, tmp_path, b"p1 c1 extra\n")
    assert got == [("p1", "c1")]


def test_pairs_double_space_splits_like_reference(spark, tmp_path):
    """FLIPPED r13 (queued fix #2): the reader moved from CSV (which saw
    an empty middle field in 'p1  c1' and silently dropped 'c1') to
    text + whitespace-class-run split — the reference's line.split()
    semantics (dataloader.py:189-192)."""
    got = _pairs(spark, tmp_path, b"p1  c1\n")
    assert got == [("p1", "c1")]


def test_pairs_csv_quote_is_literal(spark, tmp_path):
    """FLIPPED r13 (queued fix #2): a double quote is an ordinary
    character in a whitespace-split format — the CSV reader used to
    apply quoting ('"p1 x" c1' → ('p1 x','c1')); the text-split reader
    keeps it literal, exactly as the reference's split() would."""
    got = _pairs(spark, tmp_path, b'"p1 x" c1\n')
    assert got == [('"p1', 'x"')]


# --- S7 listing resume scan ---------------------------------------------


def _listing(spark, paths: list[str]):
    files = spark.createDataFrame([(p,) for p in paths], "path string")
    return sorted(
        r.prompt_number
        for r in scan_listing_ids(files).collect()
        if r.prompt_number is not None
    )


def test_listing_ids_extract_dedupe_and_leading_zeros(spark):
    got = _listing(
        spark,
        [
            "/x/prompt_12.json",
            "s3a://bucket/deep/prompt_0012.png",  # leading zeros, same id
            "/x/prompt_34.json",
            "/x/other.txt",  # no match -> filtered
        ],
    )
    assert got == [12, 34]


def test_listing_first_match_wins_and_case_sensitive(spark):
    got = _listing(spark, ["/x/prompt_12_prompt_34.json", "/x/PROMPT_77.json"])
    assert got == [12]  # first match extracted; pattern is case-sensitive


def test_listing_fullwidth_digits_do_not_match(spark):
    """Java's \\d is ASCII-only by default: a fullwidth-digit filename
    (prompt_１２) must be filtered, not parsed as 12."""
    got = _listing(spark, ["/x/prompt_１２.json", "/x/prompt_9.json"])
    assert got == [9]


def test_listing_bigint_overflow_filtered_not_fatal(spark):
    """FLIPPED r13 (queued fix #3): an extracted id wider than BIGINT
    used to kill the whole resume scan under Spark 4's ANSI cast
    (CAST_INVALID_INPUT). The cast is now try_cast: the pathological
    filename filters out with the non-match rows and resume proceeds."""
    files = spark.createDataFrame(
        [("/x/prompt_99999999999999999999999.json",), ("/x/prompt_5.json",)],
        "path string",
    )
    got = sorted(r.prompt_number for r in scan_listing_ids(files).collect())
    assert got == [5]

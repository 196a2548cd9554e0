"""Hostile-text adversarial battery: codepoint-level hostility in
documents.text, swept engine-vs-oracle across the whole text-reading
family (FIXTURES.md §C discipline — membership derived from the
registry, floor-pinned).

The existing text coverage probes absence (NULL/whitespace docs,
test_nulltext_guard.py) and a 5-doc unicode spot-check
(test_unicode_parity.py: accents/CJK/emoji/NBSP/combining on 5 pinned
queries). This battery covers the remaining hostile class over the
FULL family: text that is present and valid UTF-8 but adversarial at
the codepoint level — exactly what a web-scale scrape feeds a
tokenizer (reference anchor: the scraped-description fields of
zalando_production_scraper.py and the free-text model output of
qwen_vl_processor.py are uncontrolled unicode).

Stripes on doc_id % 37 (coprime with the %7/%19/%23 stripes other
fixtures use), each a distinct failure hypothesis:

-  0: zero-width separators INSIDE words (ZWSP/ZWNJ/ZWJ) — ``\\s+``
      tokenizers must NOT split (they are format chars, not spaces),
      so both engines must agree the line is ~2 giant tokens;
-  1: bidi controls (RLO ... PDF) — regex/char-class behavior;
-  2: one huge unbroken token (2,000 chars) — shingle/window kernels;
-  3: interior doubled/leading/trailing runs of mixed whitespace
      (space, tab, CR) — empty-split-fragment semantics;
-  4: NFC 'café' vs NFD 'cafe' + U+0301 in the same doc — neither
      engine normalizes, so counts must agree byte-for-byte;
-  5: astral-plane mathematical alphanumerics (non-BMP, surrogate
      pairs in the JVM) — length()/substring/regex must count
      codepoints identically;
-  6: mixed-script confusables (latin 'a' vs cyrillic 'а') — dedup
      kernels must treat them as DIFFERENT without locale folding;
-  7: a single repeated character (pathological rolling-hash /
      winnowing input);
-  8: empty string (not NULL — the NULL battery covers that);
-  9: C0 control chars (BEL/VT/FF) embedded mid-token;
- 10: tab/VT at the string EDGES — trim() removes only ' ' on both
      engines, so the leading empty token must appear identically
      (round-11 addition pinning the trim/split interaction).

First-run triage (round 11): 21/58 members diverged, all from TWO root
causes, both fixed the same round (the r10 freeze had lifted):

1. Java's default ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` but RE2's omits
   ``\\x0B`` (vertical tab), so every twinned ``\\s`` — tokens/
   tokens_sql, slugify, strip_html, the exact-dedup content-key
   normalize, BPE_ISH_PATTERN — tokenized stripe 9 differently per
   engine. All twinned whitespace regexes now spell out the explicit
   ``WS_CLASS`` set on both sides (functions/text.py).
2. ``html_selector_extract``'s oracle computed the expected title
   directly while the engine round-trips it through the DOM and
   ``get_text(strip=True)`` — a fixture title with edge whitespace
   (stripe 3) came back stripped. The oracle now applies the same
   ASCII strip to its computed title.

Behaviors where both engines agreed on first run (ZWSP/bidi/astral/
confusables/controls-in-tokens and the rest) are pinned by the sweep
itself as upgrade regression armor.
"""

from __future__ import annotations

import os
import shutil

import pytest

pytestmark = pytest.mark.slow  # deep battery: default run skips;
# SPARK_GRAFT_FULL_TESTS=1 (run_gates.sh full) runs it (r15 suite split)

_SRC = "/root/testdata/sf0.001"

# Explicit escapes — the hostile codepoints are invisible or
# bidi-reordering, so literals would be unreviewable.
_STRIPES = [
    # 0: ZWSP / ZWNJ / ZWJ inside words
    "zero\u200bwidth\u200bjoined tokens zero\u200cwidth\u200djoined again and again",
    # 1: RLO ... PDF bidi controls
    "visible \u202etrick\u202c order visible \u202etrick\u202c order here",
    # 2: one huge unbroken token
    ("x" * 2000) + " tail",
    # 3: doubled/leading/trailing mixed-whitespace runs
    "  doubled  spaces\tand\ttabs\rplus  trailing  runs   ",
    # 4: NFC 'caf\u00e9' vs NFD 'cafe' + combining acute in one doc
    "caf\u00e9 nfc then cafe\u0301 nfd caf\u00e9 nfc then cafe\u0301 nfd",
    # 5: astral-plane mathematical alphanumerics (non-BMP)
    "\U0001d54a\U0001d56d\U0001d552\U0001d563\U0001d55c math "
    "\U0001d54a\U0001d56d\U0001d552\U0001d563\U0001d55c alphanumerics twice",
    # 6: latin 'a' vs cyrillic U+0430 confusables
    "pascal p\u0430scal pascal p\u0430scal confusable pair test words",
    # 7: single repeated character
    "a" * 600,
    # 8: empty string (not NULL)
    "",
    # 9: C0 controls (BEL/VT/FF) embedded mid-token
    "bell\u0007tone vt\u000bsplit ff\u000cfeed bell\u0007tone again",
    # 10: non-space whitespace at the EDGES - trim() removes only ' '
    #     on both engines, so a leading tab/VT must yield a leading
    #     EMPTY token identically (round-11 follow-up to the WS_CLASS
    #     fix: pins the trim/split interaction, not just the class)
    "\t\u000bleading ws edges trailing\u000b\t",
    # 11: case-mapping divergers (round 11) — Java/Spark lower() applies
    #     Unicode FULL lowercase (SpecialCasing: U+0130 'İ' → 'i'+U+0307,
    #     Final_Sigma Σ → ς) while DuckDB lower() applies the SIMPLE
    #     per-codepoint map ('İ' → 'i', Σ → σ always); upper() diverges
    #     wider (ß → SS vs ẞ, ligature ﬁ → FI vs ﬁ). Any query that
    #     case-folds document text must fold through a twinned
    #     deterministic fold, not bare lower().
    "İstanbul ΟΔΟΣ ΣΙΣΥΦΟΣ straße ẞAL ﬁle ﬂow İİ ΑΣ σς İstanbul ΟΔΟΣ",
]


@pytest.fixture(scope="module")
def hostile_text_dir(tmp_path_factory):
    import duckdb

    tmp = str(tmp_path_factory.mktemp("hostile_text"))
    cases = " ".join(
        f"WHEN {i} THEN '{s.replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(_STRIPES)
    )
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (
            CASE doc_id % 37 {cases} ELSE text END AS text)
            FROM read_parquet('{_SRC}/documents.parquet'))
            TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        src = os.path.join(_SRC, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _members():
    """Every registered query whose build source or oracle SQL reads the
    documents text column — quoted-name source matching + word-boundary
    oracle matching (sweep_membership discipline), floor pinned at the
    first-run membership (58)."""
    import inspect
    import re

    from syntheticdata_pipeline__spark.plans import load_all

    pat = re.compile(r"\btext\b")
    out = []
    for name, spec in load_all().items():
        try:
            src = inspect.getsource(spec.build)
        except (OSError, TypeError):
            src = ""
        if '"text"' in src or "'text'" in src or (spec.oracle and pat.search(spec.oracle)):
            out.append(name)
    assert len(out) >= 58, f"text membership shrank below its pinned floor: {len(out)}"
    return sorted(out)


# First-run triage: both root causes (see module docstring) were fixed
# in-round rather than queued — the r10 evidence freeze had lifted — so
# nothing is xfail-pinned; text kernels have no value-domain envelope,
# so there are no symmetric-rejection exclusions either.
_QUEUED: dict[str, str] = {}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n,
            marks=pytest.mark.xfail(strict=True, reason=f"queued fix: {_QUEUED[n]}"),
        )
        if n in _QUEUED
        else n
        for n in _members()
    ],
)
def test_hostile_text_match_oracle(spark, hostile_text_dir, name):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    qs = {name: registry[name].build}
    oracles = {name: registry[name].oracle} if registry[name].oracle else {}
    con = duck_connect(hostile_text_dir)
    try:
        assert compare_one(spark, con, name, qs, oracles, hostile_text_dir) is not False
    finally:
        con.close()

"""Gopher rule battery: Spark flags must equal a pure-Python reference on
crafted boundary cases (exactly-at-threshold words, zero/all stopwords,
single-token docs)."""

from __future__ import annotations

from syntheticdata_pipeline__spark.operators.textops import (
    GOPHER_MIN_WORDS,
    GOPHER_STOP_FRAC,
    GOPHER_WLEN_HI,
    GOPHER_WLEN_LO,
    LANG_STOPWORDS,
    gopher_flags,
)

_STOPS = set(LANG_STOPWORDS["en"])


def _py_flags(text: str):
    toks = text.strip().split()
    n = len(toks)
    mwl = sum(len(t) for t in toks) / n
    stopfrac = sum(1 for t in toks if t in _STOPS) / n
    return (
        n < GOPHER_MIN_WORDS,
        mwl < GOPHER_WLEN_LO or mwl > GOPHER_WLEN_HI,
        stopfrac < GOPHER_STOP_FRAC,
    )


def _docs():
    yield "word"  # single token: short, mwl=4 in band, no stopwords
    yield "the " * 40  # all stopwords, mwl=3 below band
    yield "abcd " * GOPHER_MIN_WORDS  # exactly at the word-count threshold (not short)
    yield "abcd " * (GOPHER_MIN_WORDS - 1)  # one below (short)
    yield "abcde " * 50  # mwl=5.0, boundary of the band (not flagged: <= HI)
    yield "abcdef " * 50  # mwl=6.0, above band
    yield "abc " * 50  # mwl=3.0, below band
    yield ("the " + "abcd " * 32).strip()  # 1/33 stopwords ≈ 0.0303 > 0.03
    yield ("the " + "abcd " * 33).strip()  # 1/34 stopwords ≈ 0.0294 < 0.03
    yield "of and to in is it a " * 10  # dense stopwords, tiny words


def test_spark_flags_equal_python_reference(spark):
    rows = [(i, t.strip()) for i, t in enumerate(_docs())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.flag_short, r.flag_wordlen, r.flag_lowstop)
        for r in gopher_flags(df).collect()
    }
    want = {i: _py_flags(t) for i, t in rows}
    assert got == want
    # the crafted set exercises both polarities of every rule
    for pos in range(3):
        vals = {v[pos] for v in want.values()}
        assert vals == {True, False}

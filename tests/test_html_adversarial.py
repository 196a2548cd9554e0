"""Hostile-HTML battery for the DOM kernel (`functions/htmldom.py`) and
its `mapInPandas` extraction path (`operators/htmlx.py`).

At scrape time the HTML these kernels see is fully attacker-controlled
(the reference feeds raw `response.text` to BeautifulSoup —
any_scraper.py:332-535); the catalog queries only ever build
well-formed pages from fixture columns, so — like the URL battery —
the hostile surface is the function input, not a parquet stripe.

Two bug classes this battery exists for:

1. **Depth/width resource hostility.** First run found a real
   task-killer: `_walk` and `get_text` recursed one Python frame per
   DOM level, so a 10k-deep `<div>` nest (costs an attacker 60 KB)
   raised RecursionError inside the extraction UDF — on a 1000-executor
   job one hostile page kills the whole task, and Spark's retries kill
   it three more times. bs4's descendants iterator is iterative for
   exactly this reason. Both kernels are now explicit-stack iterative;
   the depth/width cases here are the regression pins.
2. **Malformed-markup recovery drift.** Unclosed/misnested/stray tags,
   void-element end tags, duplicate/unquoted attributes, entities,
   comments, script raw-text — the stdlib tree builder's recovery is
   part of the engine contract (title ladders and gallery harvests run
   over real scraped soup), so each behavior is pinned as a golden.
   Where bs4 is importable the existing parity test
   (tests/test_htmldom.py) cross-checks the same semantics.
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.functions.htmldom import (
    get_text,
    parse_html,
    select,
    select_one,
)


def _texts(html: str, sel: str) -> list[str]:
    return [get_text(n, strip=True) for n in select(parse_html(html), sel)]


# ---------------------------------------------------------------------------
# 1. resource hostility: depth and width
# ---------------------------------------------------------------------------


def test_deep_nesting_survives_and_extracts():
    # regression for the recursive _walk/get_text task-killer: 10k deep
    html = "<div class='a'>" * 10_000 + "deep text" + "</div>" * 10_000
    root = parse_html(html)
    assert get_text(root, strip=True) == "deep text"
    assert len(select(root, "div.a")) == 10_000
    assert select_one(root, "div") is not None


def test_wide_sibling_flood():
    html = "<body>" + "<p>x</p>" * 100_000 + "</body>"
    root = parse_html(html)
    assert len(select(root, "p")) == 100_000
    assert get_text(root, separator="", strip=True) == "x" * 100_000


def test_deep_page_through_mapinpandas_kernel(spark):
    # the UDF path itself must survive a hostile-depth page mixed into a
    # batch of normal pages (one poison row must not kill the task)
    from syntheticdata_pipeline__spark.operators.htmlx import HtmlSpec, html_extract

    rows = [(i, f"<html><body><h1>t{i}</h1></body></html>") for i in range(20)]
    rows.append((99, "<div>" * 10_000 + "<h1>poison-depth</h1>" + "</div>" * 10_000))
    df = spark.createDataFrame(rows, "doc_id int, html string")
    out = html_extract(
        df,
        [HtmlSpec("title", "h1", "text_first"), HtmlSpec("n_divs", "div", "count")],
    )
    got = {r["doc_id"]: (r["title"], r["n_divs"]) for r in out.collect()}
    assert got[99] == ("poison-depth", 10_000)
    assert got[0] == ("t0", 0)


# ---------------------------------------------------------------------------
# 2. malformed-markup recovery goldens
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "html,sel,want",
    [
        # unclosed tags: children accumulate under the open element
        ("<div><span>a<b>c", "div", ["ac"]),
        # misnested close order: </b> pops through the inner <i>
        ("<b>one<i>two</b>three</i>", "b", ["onetwo"]),
        # stray end tag before any open: ignored, text kept
        ("</div>kept<p>para</p>", "p", ["para"]),
        # void elements: </br> and </img> are no-ops, <br> never nests
        ("<p>a<br>b<br></br>c<img src='x'></img>d</p>", "p", ["abcd"]),
        # auto-close: second <p> closes the first (browser behavior)
        ("<p>first<p>second", "p", ["first", "second"]),
        ("<ul><li>a<li>b<li>c</ul>", "li", ["a", "b", "c"]),
        ("<table><tr><td>a<td>b<tr><td>c</table>", "td", ["a", "b", "c"]),
        # uppercase tags/attrs normalize to lowercase
        ("<DIV CLASS='Big'>X</DIV>", "div.Big", ["X"]),
        # comments and conditional comments contribute no text
        ("<div><!-- hidden --><!--[if IE]>ie<![endif]-->shown</div>", "div", ["shown"]),
        # script/style are raw text (CDATA content model): '<' inside is
        # NOT markup; their text is still part of get_text (bs4 parity)
        ("<div><script>if (a<b) {x}</script>t</div>", "div", ["if (a<b) {x}t"]),
        # entities: named, decimal, hex, and a bare '&' that is not one
        ("<p>&amp;&#65;&#x42; &notarealentity; &</p>", "p", ["&AB ¬arealentity; &"]),
        # pure text, no tags at all
        ("just text", "p", []),
    ],
)
def test_malformed_markup_goldens(html, sel, want):
    assert _texts(html, sel) == want


def test_attribute_edge_cases():
    root = parse_html(
        "<div class=unquoted id=u1>"
        "<a class='a' class='b' href>dup</a>"
        "<input disabled>"
        "<img src=\"has <angle> inside\">"
        "</div>"
    )
    d = select_one(root, "div#u1")
    assert d is not None and d.attrs["class"] == "unquoted"
    a = select_one(root, "a")
    # first attribute occurrence wins (html.parser/bs4 behavior)
    assert a.attrs["class"] == "a"
    # valueless attributes present as empty string and match [attr]
    assert a.attrs["href"] == ""
    assert len(select(root, "a[href]")) == 1
    assert select_one(root, "input").attrs["disabled"] == ""
    assert select_one(root, "img").attrs["src"] == "has <angle> inside"


def test_empty_and_whitespace_inputs():
    assert get_text(parse_html(""), strip=True) == ""
    assert select(parse_html(""), "div") == []
    assert get_text(parse_html("   \t\n  "), strip=True) == ""
    # strip=False keeps fragments verbatim
    assert get_text(parse_html("<p> a </p>"), strip=False) == " a "


def test_document_order_after_recovery():
    # order must survive recovery across a misnested + auto-closed mess
    html = "<div>A<p>B<span>C</span><p>D</div>E"
    root = parse_html(html)
    assert get_text(root, separator="|", strip=True) == "A|B|C|D|E"
    assert [n.tag for n in select(root, "p, span")] == ["p", "span", "p"]

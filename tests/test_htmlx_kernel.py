"""Spark-side html_extract kernel tests (operators/htmlx.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.operators.htmlx import HtmlSpec, html_extract


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (
            1,
            "<html><body><h1 class='product-title'> Alpha  Robe </h1>"
            "<div class='gallery'><img src='https://cdn/shop/a.jpg'>"
            "<img src='https://cdn/shop/b.jpg'><img src='https://x/logo.png'></div>"
            "<p>one</p><p>two</p></body></html>",
        ),
        (2, "<html><body><span id='productTitle'>Beta</span></body></html>"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "page_id int, html string")


def test_modes_and_schema(spark, pages):
    out = html_extract(
        pages,
        [
            HtmlSpec("title", "#productTitle, h1.product-title, h1", "text_ladder"),
            HtmlSpec("srcs", ".gallery img[src*='cdn/shop']", "attr_all", "src"),
            HtmlSpec("first_src", ".gallery img", "attr_first", "src"),
            HtmlSpec("n_p", "p", "count"),
            HtmlSpec("para_texts", "p", "text_all"),
        ],
    ).orderBy("page_id")
    assert "html" not in out.columns  # project-early: html dropped pre-shuffle
    rows = out.collect()
    assert rows[0]["title"] == "Alpha  Robe"
    assert rows[0]["srcs"] == ["https://cdn/shop/a.jpg", "https://cdn/shop/b.jpg"]
    assert rows[0]["first_src"] == "https://cdn/shop/a.jpg"
    assert rows[0]["n_p"] == 2
    assert rows[0]["para_texts"] == ["one", "two"]
    assert rows[1]["title"] == "Beta"
    assert rows[1]["srcs"] == [] and rows[1]["n_p"] == 0
    # null html → null extractions, row preserved (PERMISSIVE-style)
    assert rows[2]["title"] is None and rows[2]["srcs"] is None


def test_spec_validation(pages):
    with pytest.raises(ValueError, match="attr modes need"):
        html_extract(pages, [HtmlSpec("x", "img", "attr_all")])
    with pytest.raises(ValueError, match="unknown mode"):
        html_extract(pages, [HtmlSpec("x", "img", "bogus")])


def test_downstream_composability(spark, pages):
    """Extracted arrays feed normal DataFrame ops (explode → filter)."""
    out = html_extract(pages, [HtmlSpec("srcs", "img[src*='cdn']", "attr_all", "src")])
    n = (
        out.select(F.explode("srcs").alias("src"))
        .filter(~F.lower("src").rlike("logo|icon"))
        .count()
    )
    assert n == 2

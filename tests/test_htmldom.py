"""DOM engine + selector tests, mirroring the reference's BeautifulSoup
usage (any_scraper.py:332-535, test_kimono.py:330-335).

When bs4 is importable the same cases are asserted for parity against
BeautifulSoup; in this container the stdlib engine is the real path.
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.functions.htmldom import (
    get_text,
    parse_html,
    select,
    select_ladder,
    select_one,
)

try:
    import bs4  # noqa: F401

    _HAVE_BS4 = True
except Exception:
    _HAVE_BS4 = False


PRODUCT_PAGE = """
<html><head><title>Shop</title></head>
<body>
  <div id="nav"><a href="/cart/add">Cart</a><a href="/account">Me</a></div>
  <h1 class="product-title"> Linen  Kimono <span>Robe</span> </h1>
  <div class="product-gallery">
    <img src="https://cdn/shop/products/kimono-front_600x600.jpg">
    <img src="https://cdn/shop/products/kimono-back_600x600.jpg" data-zoom="1">
    <img src="https://static.example/logo.png">
  </div>
  <div data-testid="product_gallery_refactored">
    <img src="https://img.test/spp-media-p1/abc/thumb/item.jpg">
  </div>
  <p class="desc">Hand-stitched &amp; dyed.</p>
  <ul><li>one<li>two<li>three</ul>
</body></html>
"""


class TestTreeBuilder:
    def test_basic_structure(self):
        root = parse_html(PRODUCT_PAGE)
        assert select_one(root, "html") is not None
        assert select_one(root, "h1").tag == "h1"

    def test_void_elements_do_not_swallow_siblings(self):
        root = parse_html("<div><img src='a'><p>after</p></div>")
        p = select_one(root, "div > p")
        assert p is not None and get_text(p) == "after"

    def test_implied_li_close(self):
        root = parse_html("<ul><li>one<li>two<li>three</ul>")
        items = select(root, "ul > li")
        assert [get_text(li) for li in items] == ["one", "two", "three"]

    def test_entity_decoding(self):
        root = parse_html("<p>a &amp; b &lt;c&gt;</p>")
        assert get_text(select_one(root, "p")) == "a & b <c>"

    def test_stray_end_tag_ignored(self):
        root = parse_html("<div></span><p>x</p></div>")
        assert get_text(select_one(root, "p")) == "x"

    def test_attr_first_occurrence_wins(self):
        root = parse_html('<a href="/first" href="/second">x</a>')
        assert select_one(root, "a").get("href") == "/first"


class TestSelectors:
    def setup_method(self):
        self.root = parse_html(PRODUCT_PAGE)

    def test_id(self):
        assert select_one(self.root, "#nav").tag == "div"

    def test_tag_class_compound(self):
        assert select_one(self.root, "h1.product-title") is not None
        assert select_one(self.root, "div.product-title") is None

    def test_attr_substring(self):
        # any_scraper.py:395: "[class*='gallery'] img[src*='spp-media']"
        imgs = select(self.root, "img[src*='cdn/shop']")
        assert len(imgs) == 2

    def test_attr_exact(self):
        # any_scraper.py:397: "[data-testid='product_gallery_refactored'] img"
        imgs = select(self.root, "[data-testid='product_gallery_refactored'] img")
        assert len(imgs) == 1
        assert "spp-media" in imgs[0].get("src")

    def test_attr_presence(self):
        assert len(select(self.root, "img[data-zoom]")) == 1

    def test_descendant_combinator(self):
        assert len(select(self.root, ".product-gallery img")) == 3

    def test_child_combinator(self):
        assert len(select(self.root, "body > img")) == 0
        assert len(select(self.root, ".product-gallery > img")) == 3

    def test_comma_union_document_order(self):
        # test_kimono.py:330-335 multi-selector union accumulation
        nodes = select(self.root, ".product-gallery img, [data-testid='product_gallery_refactored'] img")
        srcs = [n.get("src") for n in nodes]
        assert len(srcs) == 4
        assert srcs[-1].startswith("https://img.test/spp-media")

    def test_attr_prefix_suffix(self):
        assert len(select(self.root, "img[src^='https://cdn']")) == 2
        assert len(select(self.root, "img[src$='.png']")) == 1

    def test_get_text_strip(self):
        # any_scraper.py:529-531: element.get_text(strip=True)
        h1 = select_one(self.root, "h1")
        # bs4 semantics: each text fragment stripped (internal spaces kept),
        # empties dropped, then joined by separator
        assert get_text(h1, strip=True) == "Linen  KimonoRobe"
        assert get_text(h1, separator=" ", strip=True) == "Linen  Kimono Robe"


class TestReferenceLadders:
    """The exact selector ladder of extract_product_title
    (any_scraper.py:519-535)."""

    LADDER = [
        "#productTitle",
        "h1.product-title",
        'h1[data-testid="product-title"]',
        ".product-name h1",
        "h1",
    ]

    def test_amazon_shape(self):
        root = parse_html('<span id="productTitle"> Amazon Item </span><h1>Other</h1>')
        node = select_ladder(root, self.LADDER)
        assert get_text(node, strip=True) == "Amazon Item"

    def test_class_shape(self):
        root = parse_html("<h1>plain</h1><h1 class='product-title'>Classy</h1>")
        # ladder picks the first *selector* with a match, not document order
        node = select_ladder(root, self.LADDER)
        assert get_text(node, strip=True) == "Classy"

    def test_fallback_h1(self):
        root = parse_html("<div><h1>  Fallback  Title </h1></div>")
        node = select_ladder(root, self.LADDER)
        assert get_text(node, strip=True) == "Fallback  Title"

    def test_no_match(self):
        assert select_ladder(parse_html("<p>no titles</p>"), self.LADDER) is None


@pytest.mark.skipif(not _HAVE_BS4, reason="bs4 not in container")
class TestBs4Parity:  # pragma: no cover - exercised only where bs4 exists
    CASES = [
        "img[src*='cdn/shop']",
        "[data-testid='product_gallery_refactored'] img",
        ".product-gallery img",
        ".product-gallery > img",
        "h1.product-title",
        "#nav a",
        "img[src^='https://cdn'], img[src$='.png']",
    ]

    def test_select_matches_bs4(self):
        from bs4 import BeautifulSoup

        soup = BeautifulSoup(PRODUCT_PAGE, "html.parser")
        root = parse_html(PRODUCT_PAGE)
        for sel in self.CASES:
            ours = [(n.tag, n.get("src"), n.get("href")) for n in select(root, sel)]
            theirs = [(n.name, n.get("src"), n.get("href")) for n in soup.select(sel)]
            assert ours == theirs, sel


class TestParserRobustness:
    """The kernel parses arbitrary scraped bytes — it must never raise."""

    def test_hypothesis_fuzz_never_raises(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        tagish = st.sampled_from(
            ["<div", "<p>", "</p>", "<img src='", "'>", "<![CDATA[", "<!--", "-->",
             "<a href=", "</", ">", "&amp;", "&#x27;", "&bogus;", "<sCrIpT>", "\x00"]
        )
        soup_text = st.lists(st.one_of(tagish, st.text(max_size=8)), max_size=30).map("".join)

        @given(soup_text)
        @settings(max_examples=200, deadline=None)
        def run(html):
            root = parse_html(html)
            select(root, "div a, img[src*='x'], #i, .c > p")
            node = select_one(root, "*")
            if node is not None:
                get_text(node, strip=True)

        run()

    def test_pathological_nesting(self):
        deep = "<div>" * 400 + "x" + "</div>" * 400
        root = parse_html(deep)
        assert get_text(select_one(root, "div"), strip=True) == "x"

    def test_unclosed_everything(self):
        root = parse_html("<html><body><div class='a'><p>one<div><p>two")
        assert len(select(root, "p")) == 2

"""S5 browser-fetch source: adapter pattern + full fetch→DOM-select
pipeline (sources/browser.py), hermetic via FakeBrowser."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.operators.htmlx import HtmlSpec, html_extract
from syntheticdata_pipeline__spark.sources.browser import FakeBrowser, fetch_pages


def _urls(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("https://shop.test/products/item-"), F.col("id")).alias("url")
    )


def test_fetch_pages_schema_and_status(spark):
    out = fetch_pages(_urls(spark), FakeBrowser, adapter_key="t1")
    rows = out.collect()
    assert out.columns == ["url", "html", "fetch_ok"]
    assert all(r.fetch_ok == "ok" for r in rows)
    assert all("<html>" in r.html for r in rows)


def test_fetch_error_isolation(spark):
    """One bad URL poisons its row only (robust_scraper.py:157-162)."""

    class FlakyBrowser(FakeBrowser):
        def fetch(self, url: str) -> str:
            if url.endswith("item-2"):
                raise RuntimeError("timeout")
            return super().fetch(url)

    out = {r.url: r for r in fetch_pages(_urls(spark), FlakyBrowser, adapter_key="t2").collect()}
    assert out["https://shop.test/products/item-2"].fetch_ok == "error"
    assert out["https://shop.test/products/item-2"].html is None
    assert out["https://shop.test/products/item-0"].fetch_ok == "ok"


def test_fetch_then_dom_select_pipeline(spark):
    """The reference's browser→soup→selector pipeline end-to-end
    (zalando_gallery_scraper_s3.py fetch + any_scraper.py:509-535 select):
    fetched pages flow into the DOM kernel without touching the driver."""
    pages = fetch_pages(_urls(spark, 4), FakeBrowser, adapter_key="t3")
    out = html_extract(
        pages,
        [
            HtmlSpec("title", "#productTitle, h1.product-title, h1", "text_ladder"),
            HtmlSpec("gallery", ".product-gallery img[src*='cdn.test']", "attr_all", "src"),
        ],
    )
    rows = {r.url: r for r in out.collect()}
    r0 = rows["https://shop.test/products/item-0"]
    assert r0.title == "item 0"  # slug → title, strip=True semantics
    assert len(r0.gallery) == 2 and all("cdn.test" in s for s in r0.gallery)
    # deterministic: same URL renders the same page
    again = {r.url: r for r in out.collect()}
    assert again[r0.url].gallery == r0.gallery


def test_fetch_retry_backoff(spark):
    """Reference retry semantics (config.py:162-163): transient failures
    are retried with backoff; success within budget yields a clean row."""

    class EventuallyUpBrowser(FakeBrowser):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def fetch(self, url: str) -> str:
            self.calls += 1
            if self.calls < 3:
                raise RuntimeError("transient 503")
            return super().fetch(url)

    one = spark.createDataFrame([("https://shop.test/products/item-9",)], "url string")
    ok_row = fetch_pages(
        one, EventuallyUpBrowser, adapter_key="t-retry-ok",
        max_retries=3, backoff_base_s=0.001,
    ).collect()[0]
    assert ok_row.fetch_ok == "ok" and "<html>" in ok_row.html

    err_row = fetch_pages(
        one, EventuallyUpBrowser, adapter_key="t-retry-none",
        max_retries=0,
    ).collect()[0]
    assert err_row.fetch_ok == "error" and err_row.html is None

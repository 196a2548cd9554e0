"""S5: browser-fetch source — the reference's Selenium/undetected-Chrome
page acquisition re-expressed as a partition-parallel Spark source.

Reference anchors: driver init + page-load timeout
(zalando_gallery_scraper_s3.py:117-127), headless crawl with per-page
politeness wait (robust_scraper.py:137-162), Selenium fetch inside the
scrape loop (test_kimono.py:239-262).

Design: one browser PER EXECUTOR PROCESS (the singleton pattern shared
with operators/inference.py — a browser is expensive, so it is created
lazily on first use inside the worker and reused across Arrow batches),
fetched pages flow straight into the DOM selector kernel
(operators/htmlx.py) without visiting the driver. At 1000 executors that
is 1000 concurrent browsers with zero driver-side coordination; politeness
is enforced per-browser by the TokenBucket (streaming/throttle.py), which
bounds the fleet-wide request rate at executors × rate.

A real Selenium adapter is provided behind an import gate (selenium is
not in this container); the deterministic FakeBrowser renders a stable
product page per URL so the full fetch→parse→select pipeline is testable
hermetically — swap the factory to go live.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

try:  # pragma: no cover - selenium not in this container
    from selenium import webdriver  # noqa: F401

    _HAVE_SELENIUM = True
except Exception:
    _HAVE_SELENIUM = False


class BrowserAdapter(Protocol):
    """Minimal surface the kernels need (duck-typed; Protocol for docs)."""

    def fetch(self, url: str) -> str:  # rendered page HTML
        ...

    def close(self) -> None:
        ...


class FakeBrowser:
    """Deterministic stand-in: renders a stable synthetic product page for
    any URL (md5-derived ids), including the selector shapes the reference
    scrapes — gallery imgs, nav links, #productTitle."""

    def __init__(self) -> None:
        self.fetched: list[str] = []

    def fetch(self, url: str) -> str:
        import hashlib

        self.fetched.append(url)
        h = hashlib.md5(url.encode()).hexdigest()
        slug = url.rstrip("/").rsplit("/", 1)[-1].split("?")[0] or "item"
        return (
            "<html><head><title>Shop</title></head><body>"
            f'<div id="nav"><a href="/cart">cart</a></div>'
            f'<span id="productTitle"> {slug.replace("-", " ")} </span>'
            f'<div class="product-gallery">'
            f'<img src="https://cdn.test/{h[:8]}/main_600x600.jpg">'
            f'<img src="https://cdn.test/{h[:8]}/alt_600x600.jpg">'
            f'<img src="https://static.test/logo.png"></div>'
            "</body></html>"
        )

    def close(self) -> None:
        pass


if _HAVE_SELENIUM:  # pragma: no cover - exercised only where selenium exists

    class SeleniumBrowser:
        """Real headless-Chrome adapter (robust_scraper.py:142-147,
        zalando_gallery_scraper_s3.py:117-127 semantics)."""

        def __init__(self, page_load_timeout: int = 30):
            from selenium.webdriver.chrome.options import Options

            opts = Options()
            opts.add_argument("--headless=new")
            opts.add_argument("--disable-gpu")
            opts.add_argument("--no-sandbox")
            opts.add_argument("--disable-blink-features=AutomationControlled")
            self._driver = webdriver.Chrome(options=opts)
            self._driver.set_page_load_timeout(page_load_timeout)

        def fetch(self, url: str) -> str:
            self._driver.get(url)
            return self._driver.page_source

        def close(self) -> None:
            self._driver.quit()


# One adapter per executor process, keyed by a stable string (id() would
# differ per task deserialization) — same pattern as operators/inference.py.
_ADAPTERS: dict[str, object] = {}


def _get_adapter(factory: Callable[[], object], key: str):
    if key not in _ADAPTERS:
        _ADAPTERS[key] = factory()
    return _ADAPTERS[key]


def fetch_pages(
    df: DataFrame,
    adapter_factory: Callable[[], object] = FakeBrowser,
    url_col: str = "url",
    requests_per_minute: float | None = None,
    adapter_key: str | None = None,
    max_retries: int = 0,
    backoff_base_s: float = 0.3,
) -> DataFrame:
    """Fetch every URL through a per-executor browser → (.. , html, fetch_ok).

    Failures yield html=NULL / fetch_ok='error' instead of failing the job
    (the reference's per-URL try/except, robust_scraper.py:157-162);
    ``requests_per_minute`` applies the reference's politeness TokenBucket
    (vton_scraper/config.py:74-78: 20 rpm) per executor; ``max_retries``
    applies the reference's bounded exponential backoff per URL
    (config.py:162-163 — 3 retries, 0.3·2^n — via streaming/throttle.py's
    call_with_retry, so tests can inject a fake clock)."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("html", StringType()), StructField("fetch_ok", StringType())]
    )

    key = adapter_key or getattr(adapter_factory, "__qualname__", repr(adapter_factory))

    def kernel(batches: Iterator) -> Iterator:
        from ..streaming.throttle import ThrottleConfig, TokenBucket, call_with_retry

        browser = _get_adapter(adapter_factory, key)
        cfg = ThrottleConfig(
            requests_per_minute=requests_per_minute or 1e9,
            max_retries=max_retries,
            backoff_base_s=backoff_base_s,
        )
        bucket = TokenBucket(cfg) if requests_per_minute is not None else None
        for pdf in batches:
            htmls, oks = [], []
            for url in pdf[url_col]:
                if bucket is not None:
                    bucket.acquire()
                ok, result, _attempts = call_with_retry(browser.fetch, url, cfg)
                htmls.append(result if ok else None)
                oks.append("ok" if ok else "error")
            out = pdf.copy()
            out["html"] = htmls
            out["fetch_ok"] = oks
            yield out

    return df.mapInPandas(kernel, schema=out_schema)

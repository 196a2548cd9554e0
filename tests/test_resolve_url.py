"""resolve_url (native-Spark urljoin) parity against CPython's
urllib.parse.urljoin — the reference resolves every scraped href this way
(any_scraper.py:284,444).

A deterministic grid of bases × hrefs (including dot-segment towers,
double slashes, queries, fragments) is evaluated in ONE Spark job and
compared row-for-row with the stdlib."""

from __future__ import annotations

from urllib.parse import urljoin

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.functions.text import resolve_url

BASES = [
    "https://shop.example.com/cat/sub/item-1.html",
    "https://shop.example.com/cat/sub/",
    "https://shop.example.com/",
    "https://shop.example.com",
    "http://a.test/b/c/d?q=1",
    "https://a.test/b/c/d#frag",
]

HREFS = [
    # absolute / scheme-relative
    "https://other.example.net/x/y.jpg",
    "http://other.example.net/x",
    "//cdn.example.net/lib/app.js",
    # rooted
    "/img/photo.png",
    "/a/../b/c.jpg",
    "/a/b/../../../c",
    "/..",
    # relative
    "photo.png",
    "./photo.png",
    "../up.png",
    "../../up2.png",
    "../../../beyond-root.png",
    "a/b/../c.jpg",
    "a//b.png",
    "a/./b.png",
    "..",
    ".",
    "a/..",
    "a/.",
    # query / fragment forms
    "?page=2",
    "?page=2#top",
    "#section",
    "",
    "photo.png?w=100",
    "photo.png#zoom",
    "../x?y=1#z",
    # WHATWG unsafe bytes + leading C0 controls (round-11 regex-flavor
    # sweep): CPython's urlsplit REMOVES \t\r\n everywhere and lstrips
    # C0-or-space — before resolve_url mirrored that, Java's
    # '.'-excludes-\r/\n semantics truncated fragments CPython de-tabs
    "a#frag\nmore",
    "a#frag\rmore",
    "b?q=1\n2#f",
    "#only\nfrag",
    "\ta/b\n",
    "  spaced  ",
    "a\tb#f\rrag",
    "..\n/up",
    "?q\t=1",
    "\x0b\x00weird",
]


def test_resolve_url_matches_stdlib_urljoin(spark):
    cases = [(b, h) for b in BASES for h in HREFS]
    df = spark.createDataFrame(cases, "base string, href string")
    got = (
        df.withColumn("resolved", resolve_url(F.col("base"), F.col("href")))
        .orderBy("base", "href")
        .collect()
    )
    mismatches = [
        (r["base"], r["href"], r["resolved"], urljoin(r["base"], r["href"]))
        for r in got
        if r["resolved"] != urljoin(r["base"], r["href"])
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first 10: {mismatches[:10]}"


def test_resolve_url_reference_shapes(spark):
    """The exact shapes the reference feeds urljoin: lazy-loaded img srcs
    and hrefs on product pages (any_scraper.py:440-444)."""
    base = "https://www.nykaa.com/p/SKU123"
    cases = [
        ("images/akamaized/1.jpg", "https://www.nykaa.com/p/images/akamaized/1.jpg"),
        ("/media/catalog/2.jpg", "https://www.nykaa.com/media/catalog/2.jpg"),
        ("//img.nykaa.com/3.jpg", "https://img.nykaa.com/3.jpg"),
    ]
    df = spark.createDataFrame([(base, h) for h, _ in cases], "base string, href string")
    out = df.select(resolve_url(F.col("base"), F.col("href")).alias("r")).collect()
    assert [r["r"] for r in out] == [want for _, want in cases]


def test_resolve_url_randomized_sweep(spark):
    """300 seeded-random (base, href) pairs from a component grammar —
    broader than the fixed grid; one Spark job."""
    import random

    rng = random.Random(20260813)
    seg = lambda: rng.choice(["a", "bb", "c-1", "..", ".", "", "img_2"])
    def rand_href():
        kind = rng.randrange(7)
        if kind == 0:
            return "https://x.test/" + "/".join(seg() for _ in range(rng.randrange(3)))
        if kind == 1:
            return "//h.test/" + seg()
        if kind == 2:
            return "/" + "/".join(seg() for _ in range(rng.randrange(1, 4)))
        if kind == 3:
            return "?" + rng.choice(["a=1", "b=2&c=3", ""])
        if kind == 4:
            return "#" + rng.choice(["top", "s1"])
        path = "/".join(seg() for _ in range(rng.randrange(1, 4)))
        return path + rng.choice(["", "?q=1", "#f", "?q=1#f"])

    def rand_base():
        host = rng.choice(["https://s.test", "http://w.test:8080"])
        depth = rng.randrange(4)
        path = "/" + "/".join(rng.choice(["p", "cat", "x9"]) for _ in range(depth))
        return host + (path if depth else "") + rng.choice(["", "/", "?k=v", "#z"])

    cases = [(rand_base(), rand_href()) for _ in range(300)]
    df = spark.createDataFrame(cases, "base string, href string")
    got = df.withColumn("resolved", resolve_url(F.col("base"), F.col("href"))).collect()
    bad = [
        (r["base"], r["href"], r["resolved"], urljoin(r["base"], r["href"]))
        for r in got
        if r["resolved"] != urljoin(r["base"], r["href"])
    ]
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"

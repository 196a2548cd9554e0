"""String / regex / URL / JSON scalar functions (SURVEY.md §2.7, T1-T16).

Each function mirrors an observable behavior of the reference (cited
file:line into /root/reference) as a pure Spark Column expression. Regexes
stick to the common Java/RE2 subset so DuckDB oracles behave identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII whitespace, spelled out: Java's default \s is [ \t\n\x0B\f\r] but
# RE2's \s omits \x0B (vertical tab), so a twinned '\s' silently tokenizes
# VT-laced text differently per engine (found by the hostile-text battery).
# The engine contract is Java's set — the reference is Python, whose \s
# also treats VT as whitespace — pinned explicitly on BOTH sides so neither
# a Spark nor a DuckDB regex-flavor change can shift one engine alone.
# (\xhh escapes parse identically in Java regex and RE2.)
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"

# --- T1: product-id extraction ----------------------------------------------
# Reference rules: Amazon ASIN /dp|gp\/product/{B0...}; Zalando *.html slug;
# Nykaa /p/{sku}; generic last path segment; md5(url) fallback
# (any_scraper.py:161-196, test_kimono.py:277-283,
# zalando_gallery_scraper_s3.py:197-202).

_P_ASIN = r"/(?:dp|gp/product)/([A-Z0-9]{10})"
_P_ZALANDO = r"/([a-z0-9-]+)\.html"
_P_NYKAA = r"/p/([A-Za-z0-9]+)"
# Tail is [\s\S]* rather than .*: Java's '.' excludes \r and the
# U+2028/U+2029 separators while RE2's excludes only \n, so a query
# string containing a bare \r made the twins disagree (Spark fell to
# the md5 fallback, DuckDB extracted the segment; round-11
# regex-flavor sweep). [\s\S] matches every char in both flavors.
_P_LAST_SEG = r"/([^/?#]+)/?(?:[?#][\s\S]*)?$"


def extract_product_id(url: Column) -> Column:
    """First matching id rule wins; md5(url) as last resort."""
    return F.coalesce(
        F.nullif(F.regexp_extract(url, _P_ASIN, 1), F.lit("")),
        F.nullif(F.regexp_extract(url, _P_ZALANDO, 1), F.lit("")),
        F.nullif(F.regexp_extract(url, _P_NYKAA, 1), F.lit("")),
        F.nullif(F.regexp_extract(url, _P_LAST_SEG, 1), F.lit("")),
        F.md5(url),
    )


def extract_product_id_sql(url: str) -> str:
    """DuckDB twin of :func:`extract_product_id`."""
    def rx(p: str) -> str:
        return f"nullif(regexp_extract({url}, '{p}', 1), '')"

    return (
        "coalesce("
        + ", ".join(
            [
                rx("/(?:dp|gp/product)/([A-Z0-9]{10})"),
                rx("/([a-z0-9-]+)\\.html"),
                rx("/p/([A-Za-z0-9]+)"),
                rx("/([^/?#]+)/?(?:[?#][\\s\\S]*)?$"),
                f"md5({url})",
            ]
        )
        + ")"
    )


# --- T2: thumbnail → hi-res URL rewrite --------------------------------------
# Site rules from any_scraper.py:224-265, test_kimono.py:388-390,
# test_etsy.py:317-331, zalando_production_scraper.py:151-157.

_HIRES_RULES: list[tuple[str, str]] = [
    (r"_S[XY]\d+_", "_SL1500_"),            # Amazon size token
    (r"/(thumb|sq)/", "/org/"),              # Zalando thumb/square → original
    (r"w_\d+,h_\d+[,/]?", ""),               # CDN width/height params
    (r"tr:[^/]+/", ""),                       # imagekit transform segment
    (r"_\d+x\d*\.", "_1800x1800."),          # Shopify _WxH. suffix
]


def to_hires_url(url: Column) -> Column:
    out = url
    for pat, repl in _HIRES_RULES:
        out = F.regexp_replace(out, pat, repl)
    return strip_query(out)


def to_hires_url_sql(url: str) -> str:
    out = url
    for pat, repl in _HIRES_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return strip_query_sql(out)


# --- T3: image-id extraction (D1 dedup key) ----------------------------------
# 3 regex rules then md5 fallback (any_scraper.py:198-222).

_P_HEXID = r"([a-f0-9]{32,})"
_P_FNAME = r"/([A-Za-z0-9_-]+?)(?:_\d+x\d+)?\.(?:jpg|jpeg|png|webp)"
_P_NUMID = r"[/_-](\d{6,})[/_.-]"


def extract_image_id(url: Column) -> Column:
    return F.coalesce(
        F.nullif(F.regexp_extract(url, _P_HEXID, 1), F.lit("")),
        F.nullif(F.regexp_extract(url, _P_FNAME, 1), F.lit("")),
        F.nullif(F.regexp_extract(url, _P_NUMID, 1), F.lit("")),
        F.md5(url),
    )


def extract_image_id_sql(url: str) -> str:
    def rx(p: str) -> str:
        return f"nullif(regexp_extract({url}, '{p}', 1), '')"

    return (
        "coalesce("
        + ", ".join(
            [
                rx("([a-f0-9]{32,})"),
                rx("/([A-Za-z0-9_-]+?)(?:_\\d+x\\d+)?\\.(?:jpg|jpeg|png|webp)"),
                rx("[/_-](\\d{6,})[/_.-]"),
                f"md5({url})",
            ]
        )
        + ")"
    )


# --- T4: slugify --------------------------------------------------------------
# lower → whitespace/slashes→_ → keep [a-z0-9_.-] → cap 200
# (people_western_keyword_extractor.py:44-49).


# Slug separator class: slash, backslash, and the explicit ASCII
# whitespace set (VT included on both engines — see WS_CLASS).
_SLUG_SEP = "[/\\\\" + WS_CLASS[1:-1] + "]+"


def slugify(s: Column, max_len: int = 200) -> Column:
    out = F.lower(F.trim(s))
    out = F.regexp_replace(out, _SLUG_SEP, "_")
    out = F.regexp_replace(out, r"[^a-z0-9_.-]", "")
    return F.substring(out, 1, max_len)


def slugify_sql(s: str, max_len: int = 200) -> str:
    out = f"lower(trim({s}))"
    out = f"regexp_replace({out}, '{_SLUG_SEP}', '_', 'g')"
    out = f"regexp_replace({out}, '[^a-z0-9_.-]', '', 'g')"
    return f"substr({out}, 1, {max_len})"


# --- T5: query-param strip ----------------------------------------------------
# any_scraper.py:247,255,263; test_kimono.py:389-390.


def strip_query(url: Column) -> Column:
    return F.substring_index(url, "?", 1)


def strip_query_sql(url: str) -> str:
    # substring_index equivalent: text before first '?'
    return f"CASE WHEN strpos({url}, '?') > 0 THEN substr({url}, 1, strpos({url}, '?') - 1) ELSE {url} END"


# --- T6: URL host/path parse --------------------------------------------------
# urlparse uses in any_scraper.py:188-193,284,444. DuckDB has no parse_url,
# so both sides use the same regex.

_P_HOST = r"^[a-z]+://([^/?#]+)"
_P_PATH = r"^[a-z]+://[^/?#]+(/[^?#]*)"


def url_host(url: Column) -> Column:
    return F.nullif(F.regexp_extract(url, _P_HOST, 1), F.lit(""))


def url_host_sql(url: str) -> str:
    return f"nullif(regexp_extract({url}, '^[a-z]+://([^/?#]+)', 1), '')"


def url_path(url: Column) -> Column:
    return F.nullif(F.regexp_extract(url, _P_PATH, 1), F.lit(""))


def url_path_sql(url: str) -> str:
    return f"nullif(regexp_extract({url}, '^[a-z]+://[^/?#]+(/[^?#]*)', 1), '')"


# --- T7: pagination URL build --------------------------------------------------
# '?p=N' vs '&p=N' depending on existing query (any_scraper.py:704-713).


def page_url(url: Column, page: Column, param: str = "p") -> Column:
    sep = F.when(F.instr(url, "?") > 0, F.lit("&")).otherwise(F.lit("?"))
    return F.concat(url, sep, F.lit(param + "="), page.cast("string"))


def page_url_sql(url: str, page: str, param: str = "p") -> str:
    return (
        f"({url} || CASE WHEN strpos({url}, '?') > 0 THEN '&' ELSE '?' END"
        f" || '{param}=' || CAST({page} AS VARCHAR))"
    )


# --- T12: digit test -----------------------------------------------------------


def is_digits(s: Column) -> Column:
    return s.rlike(r"^[0-9]+$")


# --- T14: lowercase-contains battery -------------------------------------------
# Blocklists/indicator lists (any_scraper.py:385,441,490-497).

URL_BLOCKLIST = (
    "logo",
    "icon",
    "badge",
    "banner",
    "sprite",
    "pixel",
    "placeholder",
    "avatar",
)


def matches_blocklist(s: Column, terms: tuple[str, ...] = URL_BLOCKLIST) -> Column:
    return F.lower(s).rlike("|".join(terms))


def matches_blocklist_sql(s: str, terms: tuple[str, ...] = URL_BLOCKLIST) -> str:
    return f"regexp_matches(lower({s}), '{'|'.join(terms)}')"


# --- T15: human duration formatting --------------------------------------------
# s / min / h ladder (test_kimono.py:700-710).


def format_duration(seconds: Column) -> Column:
    # floor() everywhere: Spark's double→bigint cast truncates while
    # DuckDB's rounds — floor first makes both exact. A non-finite
    # duration is unknown → NULL (finite_or_null contract, r9): without
    # the guard Spark's non-ANSI BIGINT cast renders -inf as
    # "-9223372036854775808s" and NaN as "0h" while DuckDB raises.
    from .determinism import finite_or_null

    seconds = finite_or_null(seconds)
    return (
        F.when(seconds < 60, F.concat(F.floor(seconds).cast("bigint").cast("string"), F.lit("s")))
        .when(
            seconds < 3600,
            F.concat(F.floor(seconds / 60).cast("bigint").cast("string"), F.lit("min")),
        )
        .otherwise(F.concat(F.floor(seconds / 3600).cast("bigint").cast("string"), F.lit("h")))
    )


def format_duration_sql(seconds: str) -> str:
    from .determinism import finite_or_null_sql

    s = finite_or_null_sql(seconds)
    return (
        f"CASE WHEN {s} < 60 THEN CAST(CAST(floor({s}) AS BIGINT) AS VARCHAR) || 's' "
        f"WHEN {s} < 3600 THEN CAST(CAST(floor({s} / 60) AS BIGINT) AS VARCHAR) || 'min' "
        f"ELSE CAST(CAST(floor({s} / 3600) AS BIGINT) AS VARCHAR) || 'h' END"
    )


# --- T16: HTML text extraction -------------------------------------------------
# The reference uses BeautifulSoup getText (any_scraper.py:529-535); the
# engine's column-native form strips tags/entities by regex — sufficient
# for title/text extraction from product pages, and a bs4 UDF can be
# swapped in where full DOM semantics matter.


def strip_html(s: Column) -> Column:
    out = F.regexp_replace(s, r"<[^>]*>", " ")
    out = F.regexp_replace(out, r"&(amp|lt|gt|nbsp|quot);", " ")
    return F.trim(F.regexp_replace(out, WS_CLASS + "+", " "))


def strip_html_sql(s: str) -> str:
    out = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    out = f"regexp_replace({out}, '&(amp|lt|gt|nbsp|quot);', ' ', 'g')"
    return f"trim(regexp_replace({out}, '{WS_CLASS}+', ' ', 'g'))"


# --- T6b: relative-URL resolution (urljoin) -------------------------------------
# Every scraped href goes through urljoin(product_url, src) in the reference
# (any_scraper.py:284,444). This is the same resolution as a pure Spark
# column expression (CPython urllib.parse.urljoin semantics, verified by
# tests/test_functions.py parity grid): JVM-side, codegen-friendly, no UDF.
# Base must be an absolute http(s)-style URL (the scraper invariant).

_P_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*):"
_P_ORIGIN = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def _pop(acc: Column) -> Column:
    """CPython's ``resolved_path.pop()`` with IndexError ignored."""
    return (
        F.when(F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1))
        .when(F.size(acc) == 1, F.array().cast("array<string>"))
        .otherwise(acc)
    )


def _drop_mid_empties(segs: Column) -> Column:
    """CPython urljoin: ``segments[1:-1] = filter(None, segments[1:-1])`` —
    interior empty segments (``a//b``) are collapsed; first/last kept."""
    n = F.size(segs)
    return F.when(n <= 2, segs).otherwise(
        F.concat(
            F.slice(segs, 1, 1),
            F.filter(F.slice(segs, 2, n - 2), lambda x: x != ""),
            F.slice(segs, -1, 1),
        )
    )


def _resolve_segments(raw_segs: Column, filter_mid: bool = False) -> Column:
    """CPython urljoin's dot-segment resolution over a segment array:
    '.' dropped, '..' pops (ignoring underflow), trailing '.'/'..' leaves
    a trailing slash; empty result coerces to '/'; leading '/' is restored
    (urlunsplit inserts it when a netloc is present). ``filter_mid``
    collapses interior empty segments — CPython does this ONLY on the
    relative-merge branch, never on rooted hrefs."""
    segs = _drop_mid_empties(raw_segs) if filter_mid else raw_segs
    resolved = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(x == ".", acc)
        .when(x == "..", _pop(acc))
        .otherwise(F.concat(acc, F.array(x))),
    )
    last = F.element_at(segs, -1)
    resolved = F.when(
        (last == ".") | (last == ".."), F.concat(resolved, F.array(F.lit("")))
    ).otherwise(resolved)
    path = F.array_join(resolved, "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(path.startswith("/"), path).otherwise(F.concat(F.lit("/"), path))


def resolve_url(base: Column, href: Column) -> Column:
    """urljoin(base, href) as a Column expression (any_scraper.py:284,444).

    CPython's urlsplit removes the WHATWG unsafe bytes (tab/CR/LF) from
    the whole URL before parsing (the 3.6.14/3.9.5 security change), so
    ``urljoin(base, "a#frag\\nmore")`` is ``.../a#fragmore`` — the same
    removal happens here first (round-11 regex-flavor sweep: without
    it, Java's '.'-excludes-\\r/\\n semantics truncated fragments that
    CPython merely de-tabs)."""
    def _whatwg_clean(c: Column) -> Column:
        # urlsplit also LSTRIPS C0-controls-or-space (leading only —
        # trailing spaces are kept, verified against CPython 3.11)
        c = F.regexp_replace(c, "[\\t\\n\\r]", "")
        return F.regexp_replace(c, "^[\\x00-\\x20]+", "")

    base = _whatwg_clean(base)
    href = _whatwg_clean(href)
    h_scheme = F.regexp_extract(href, _P_SCHEME, 1)
    b_scheme = F.regexp_extract(base, _P_SCHEME, 1)
    origin = F.regexp_extract(base, _P_ORIGIN, 1)
    b_path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    b_query = F.regexp_extract(base, r"^[^#?]*(\?[^#]*)", 1)  # '?...' or ''

    # href components: path, then query/fragment REBUILT from parsed parts
    # (CPython drops an empty query — 'a?' → 'a' — and an empty fragment)
    h_path = F.regexp_extract(href, r"^([^?#]*)", 1)
    h_rest_raw = F.substring(href, F.length(h_path) + F.lit(1), F.length(href))
    h_query = F.regexp_extract(h_rest_raw, r"^\?([^#]*)", 1)
    h_frag = F.regexp_extract(h_rest_raw, r"(#.+)$", 1)
    h_rest = F.concat(
        F.when(h_query != "", F.concat(F.lit("?"), h_query)).otherwise(F.lit("")),
        h_frag,
    )

    rooted = _resolve_segments(F.split(h_path, "/"))
    b_dir_segs = F.slice(
        F.split(b_path, "/"), 1, F.size(F.split(b_path, "/")) - 1
    )  # CPython: bpath.split('/') minus the non-directory last item
    merged = _resolve_segments(
        F.concat(b_dir_segs, F.split(h_path, "/")), filter_mid=True
    )

    return (
        # different scheme, or same scheme with explicit netloc → href as-is
        F.when((h_scheme != "") & (h_scheme != b_scheme), href)
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), href)
        # scheme-relative: inherit base scheme, no dot resolution
        .when(href.startswith("//"), F.concat(b_scheme, F.lit(":"), href))
        # empty → base verbatim (CPython keeps query AND fragment)
        .when(href == "", base)
        # fragment-only → base minus fragment, plus new fragment (a bare
        # '#' drops cleanly; empty query falls back to the base query)
        .when(href.startswith("#"), F.concat(origin, b_path, b_query, h_frag))
        # query(+fragment) → base path; empty '?' keeps the base query
        .when(
            href.startswith("?"),
            F.concat(
                origin,
                b_path,
                F.when(h_query != "", F.concat(F.lit("?"), h_query)).otherwise(b_query),
                h_frag,
            ),
        )
        # rooted path → dot-resolved against origin (NO mid-empty filter)
        .when(h_path.startswith("/"), F.concat(origin, rooted, h_rest))
        # relative path → merged with base dir, dot-resolved, mid-filtered
        .otherwise(F.concat(origin, merged, h_rest))
    )


# --- tokenization (shared by text-analysis operators) ---------------------------


def fold_case(s: Column) -> Column:
    """Deterministic cross-engine case fold (round-11 casefold stripe).

    Java/Spark ``lower()`` applies Unicode FULL lowercasing
    (SpecialCasing.txt): U+0130 'İ' → 'i' + U+0307, and Σ → ς under the
    Final_Sigma context rule. DuckDB ``lower()`` applies the SIMPLE
    per-codepoint map ('İ' → 'i', Σ → σ always). Those two entries are
    the ONLY non-locale lowercase differences in Unicode, so
    canonicalizing both ends — pre-translate 'İ' → 'i', post-translate
    ς → σ — makes the fold byte-identical on both engines (and stable
    across Unicode versions, which a content key must be). Twin:
    :func:`fold_case_sql`.
    """
    return F.translate(F.lower(F.translate(s, "İ", "i")), "ς", "σ")


def fold_case_sql(s: str) -> str:
    return f"translate(lower(translate({s}, 'İ', 'i')), 'ς', 'σ')"


def ws_normalize(text: Column) -> Column:
    """fold_case → trim → collapse ASCII-whitespace runs (incl. VT, see
    WS_CLASS) to single spaces — the canonical content-key normalization
    shared by the exact-dedup family and its oracles. The fold is the
    deterministic :func:`fold_case`, NOT bare lower(): with bare
    lower(), the doc pair {'ΑΣ', 'ας'} shares a content key on Spark
    (full casing folds both to 'ας') but not on DuckDB (simple casing
    gives 'ασ' vs 'ας') — a dedup-membership divergence, not just a key
    spelling."""
    return F.regexp_replace(F.trim(fold_case(text)), WS_CLASS + "+", " ")


def ws_normalize_sql(text: str) -> str:
    return f"regexp_replace(trim({fold_case_sql(text)}), '{WS_CLASS}+', ' ', 'g')"


def tokens(text: Column) -> Column:
    """Whitespace tokens; trims first so no leading/trailing empties.

    Splits on the explicit ASCII class :data:`WS_CLASS` (not ``\\s`` — see
    the VT note at the top of this module); DuckDB twin is
    :func:`tokens_sql` with the same class.
    """
    return F.split(F.trim(text), WS_CLASS + "+")


def tokens_sql(text: str) -> str:
    return f"string_split_regex(trim({text}), '{WS_CLASS}+')"

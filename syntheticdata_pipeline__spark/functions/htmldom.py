"""Real DOM HTML extraction: an stdlib-``html.parser`` tree builder plus a
CSS-selector subset matching the reference's BeautifulSoup usage (T16/S4).

The reference drives all acquisition through ``soup.select`` /
``soup.select_one`` / ``get_text`` (any_scraper.py:332-460 selector
dispatch, any_scraper.py:509-535 title-selector ladder + getText,
test_kimono.py:330-335 multi-selector union). The selectors it actually
uses are compounds of tag / ``#id`` / ``.class`` / ``[attr]`` /
``[attr='v']`` / ``[attr*='v']`` joined by descendant (and occasionally
child) combinators, with comma unions — exactly the subset implemented
here. No third-party dependency: the tree builder is the stdlib
``html.parser`` (entity decoding included via ``convert_charrefs``), so
the kernel is real DOM parsing, not regex stripping.

``bs4`` remains a drop-in upgrade: the public functions (``parse_html``,
``select``, ``select_one``, ``get_text``) mirror its semantics and the
test-suite asserts parity against BeautifulSoup when it is importable.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# HTML5 void elements: never pushed on the open-element stack.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# Minimal implied-end-tag handling (browsers auto-close these): starting
# `key` closes a still-open element in `value`.
_AUTO_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "option": {"option"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}


class HtmlNode:
    """One element; text nodes are plain ``str`` entries in ``children``."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "HtmlNode | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []
        self.parent = parent

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = HtmlNode("[document]", {}, None)
        self._stack = [self.root]

    # -- element handling ---------------------------------------------------
    def _open(self, tag: str, attrs) -> HtmlNode:
        tag = tag.lower()
        # implied end tag: <li><li> etc. closes the still-open sibling
        if len(self._stack) > 1 and self._stack[-1].tag in _AUTO_CLOSE.get(tag, ()):
            self._stack.pop()
        parent = self._stack[-1]
        # first attr occurrence wins, like html.parser/bs4
        adict: dict[str, str] = {}
        for k, v in attrs:
            adict.setdefault(k.lower(), v if v is not None else "")
        node = HtmlNode(tag, adict, parent)
        parent.children.append(node)
        return node

    def handle_starttag(self, tag: str, attrs) -> None:
        node = self._open(tag, attrs)
        if node.tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._open(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignored (browser behavior)

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> HtmlNode:
    """Parse an HTML string into a DOM tree; returns the document root."""
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    return builder.root


# --------------------------------------------------------------------------
# Selector engine
# --------------------------------------------------------------------------

# one simple selector inside a compound: tag | #id | .class | [attr op val]
_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>\*|[A-Za-z][A-Za-z0-9-]*)
  | \#(?P<id>[A-Za-z0-9_-]+)
  | \.(?P<cls>[A-Za-z0-9_-]+)
  | \[\s*(?P<attr>[A-Za-z0-9_-]+)\s*
      (?:(?P<op>[*^$~]?=)\s*
         (?:'(?P<v1>[^']*)'|"(?P<v2>[^"]*)"|(?P<v3>[^\]\s]+)))?
    \s*\]
    """,
    re.VERBOSE,
)


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None]] = []


def _parse_compound(text: str) -> _Compound:
    comp = _Compound()
    pos = 0
    while pos < len(text):
        m = _SIMPLE_RE.match(text, pos)
        if not m:
            raise ValueError(f"unsupported selector fragment: {text[pos:]!r}")
        if m.group("tag"):
            comp.tag = None if m.group("tag") == "*" else m.group("tag").lower()
        elif m.group("id"):
            comp.id = m.group("id")
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        else:
            val = m.group("v1") or m.group("v2") or m.group("v3")
            comp.attrs.append((m.group("attr").lower(), m.group("op"), val))
        pos = m.end()
    return comp


def _parse_complex(text: str) -> tuple[list[_Compound], list[str]]:
    """One complex selector → (compounds, combinators-between-them)."""
    # normalize child combinator spacing, then split on whitespace
    parts = re.sub(r"\s*>\s*", " > ", text.strip()).split()
    compounds: list[_Compound] = []
    combinators: list[str] = []
    pending = " "
    for part in parts:
        if part == ">":
            pending = ">"
            continue
        if compounds:
            combinators.append(pending)
        compounds.append(_parse_compound(part))
        pending = " "
    if not compounds:
        raise ValueError(f"empty selector: {text!r}")
    return compounds, combinators


def parse_selector(selector: str) -> list[tuple[list[_Compound], list[str]]]:
    """Comma-separated selector list → parsed complex selectors."""
    return [_parse_complex(s) for s in selector.split(",") if s.strip()]


def _match_compound(node: HtmlNode, comp: _Compound) -> bool:
    if comp.tag is not None and node.tag != comp.tag:
        return False
    if comp.id is not None and node.attrs.get("id") != comp.id:
        return False
    if comp.classes:
        classes = node.classes
        if any(c not in classes for c in comp.classes):
            return False
    for name, op, val in comp.attrs:
        actual = node.attrs.get(name)
        if actual is None:
            return False
        if op is None:
            continue
        if op == "=" and actual != val:
            return False
        if op == "*=" and val not in actual:
            return False
        if op == "^=" and not actual.startswith(val):
            return False
        if op == "$=" and not actual.endswith(val):
            return False
        if op == "~=" and val not in actual.split():
            return False
    return True


def _match_complex(node: HtmlNode, compounds: list[_Compound], combinators: list[str]) -> bool:
    if not _match_compound(node, compounds[-1]):
        return False
    if len(compounds) == 1:
        return True
    comb = combinators[-1]
    parent = node.parent
    if comb == ">":
        return parent is not None and parent.tag != "[document]" and _match_complex(
            parent, compounds[:-1], combinators[:-1]
        )
    while parent is not None and parent.tag != "[document]":
        if _match_complex(parent, compounds[:-1], combinators[:-1]):
            return True
        parent = parent.parent
    return False


def _walk(node: HtmlNode):
    # Iterative pre-order (document order). A recursive generator costs a
    # Python frame per DOM level, so a hostile deeply-nested page (10k
    # <div>s costs the scraper nothing to emit) would RecursionError
    # inside the extraction UDF and kill the task — bs4's descendants
    # generator is iterative for the same reason (hostile-HTML battery).
    stack = [c for c in reversed(node.children) if isinstance(c, HtmlNode)]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(c for c in reversed(n.children) if isinstance(c, HtmlNode))


def select(root: HtmlNode, selector: str) -> list[HtmlNode]:
    """All elements matching the selector list, in document order, unique
    (bs4 ``soup.select`` semantics)."""
    parsed = parse_selector(selector)
    out = []
    for node in _walk(root):
        if any(_match_complex(node, comps, combs) for comps, combs in parsed):
            out.append(node)
    return out


def select_one(root: HtmlNode, selector: str) -> HtmlNode | None:
    """First match in document order (bs4 ``soup.select_one``)."""
    parsed = parse_selector(selector)
    for node in _walk(root):
        if any(_match_complex(node, comps, combs) for comps, combs in parsed):
            return node
    return None


def get_text(node: HtmlNode, separator: str = "", strip: bool = False) -> str:
    """Concatenated descendant text (bs4 ``get_text`` semantics: with
    ``strip`` each fragment is stripped and empties are skipped).

    Iterative for the same reason as :func:`_walk` — per-fragment
    document order is preserved by pushing children reversed."""
    parts: list[str] = []
    stack = list(reversed(node.children))
    while stack:
        child = stack.pop()
        if isinstance(child, HtmlNode):
            stack.extend(reversed(child.children))
        else:
            frag = child.strip() if strip else child
            if frag or not strip:
                parts.append(frag)
    return separator.join(parts)


def select_ladder(root: HtmlNode, selectors: list[str]) -> HtmlNode | None:
    """The reference's title-extraction ladder (any_scraper.py:519-535):
    try selectors in order, first selector that matches anything wins."""
    for sel in selectors:
        node = select_one(root, sel)
        if node is not None:
            return node
    return None

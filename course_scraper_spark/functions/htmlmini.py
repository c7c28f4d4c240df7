"""Minimal deterministic HTML scanning for the synthetic web.

The sandbox has no bs4/lxml, and the synthetic pages we crawl are produced
by our own generator (:mod:`course_scraper_spark.synth.world`) with a
strict, regular markup shape. This module is the single shared tokenizer
used by BOTH the Spark-side pandas UDFs and the single-process oracle, so
"document order" means the same thing everywhere — mirroring what
BeautifulSoup's ``find_all``/``select`` document-order guarantees give the
reference (reference ``src/crawler.py:200,214,248``).

Supported constructs (everything the generator emits):

* anchors            ``<a href="...">text</a>``
* leaf elements      ``<tag class="..." [attr="..."]>text</tag>`` and
                     void ``<img ... />``
* block containers   ``<div class="X"> ...leaf elements... </div>``
                     (no same-tag nesting inside a block)

CSS selector subset (enough for the reference's JSON-CSS schema format,
``src/prompts/defaults.py:48-74`` / ``src/modern_campus.json``): for a
``>``/space combinator chain only the LAST simple selector is matched,
within the block scope; simple selectors may be ``tag``, ``.class``,
``#id``, ``tag.class``, ``tag#id``, ``tag[attr="val"]``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ANCHOR_RE = re.compile(r"<a\b[^>]*?\bhref=\"([^\"]*)\"[^>]*>", re.IGNORECASE)
# tr > td[colspan="2"] > a[href]  (reference src/crawler.py:214)
_MC_LISTING_RE = re.compile(
    r"<tr[^>]*>\s*<td[^>]*\bcolspan=\"2\"[^>]*>\s*<a\b[^>]*?\bhref=\"([^\"]*)\"[^>]*>",
    re.IGNORECASE,
)
_ELEM_RE = re.compile(
    r"<(?P<tag>[a-zA-Z][a-zA-Z0-9]*)\b(?P<attrs>[^>]*?)(?P<void>/)?>"
    r"(?:(?P<text>[^<]*)</(?P=tag)>)?",
    re.DOTALL,
)
_ATTR_RE = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*\"([^\"]*)\"")
_TAG_STRIP_RE = re.compile(r"<[^>]+>")


def extract_hrefs(html: str) -> list[str]:
    """All ``<a href>`` values in document order (cf. crawler.py:200,248)."""
    return _ANCHOR_RE.findall(html)


def extract_mc_listing_hrefs(html: str) -> list[str]:
    """Hrefs under ``tr > td[colspan="2"] > a`` in document order
    (Modern-Campus listing rule, crawler.py:214)."""
    return _MC_LISTING_RE.findall(html)


@dataclass
class Elem:
    tag: str
    attrs: dict[str, str]
    text: str
    pos: int  # character offset — document order key

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()


def scan_elements(fragment: str, base_pos: int = 0) -> list[Elem]:
    """Flat scan of leaf elements in a fragment, document order."""
    out = []
    for m in _ELEM_RE.finditer(fragment):
        attrs = dict(_ATTR_RE.findall(m.group("attrs") or ""))
        text = m.group("text")
        out.append(
            Elem(
                tag=m.group("tag").lower(),
                attrs=attrs,
                text=text if text is not None else "",
                pos=base_pos + m.start(),
            )
        )
    return out


@dataclass(frozen=True)
class SimpleSelector:
    tag: str | None
    cls: str | None
    elem_id: str | None
    attr: tuple[str, str] | None

    def matches(self, e: Elem) -> bool:
        if self.tag is not None and e.tag != self.tag:
            return False
        if self.cls is not None and self.cls not in e.classes:
            return False
        if self.elem_id is not None and e.attrs.get("id") != self.elem_id:
            return False
        if self.attr is not None and e.attrs.get(self.attr[0]) != self.attr[1]:
            return False
        return True


_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*)?"
    r"(?:\.(?P<cls>[-\w]+))?"
    r"(?:#(?P<id>[-\w]+))?"
    r"(?:\[(?P<attr>[-\w]+)=\"(?P<val>[^\"]*)\"\])?$"
)


def parse_selector(selector: str) -> SimpleSelector:
    """Parse the LAST simple selector of a combinator chain."""
    last = re.split(r"\s*>\s*|\s+", selector.strip())[-1]
    m = _SIMPLE_RE.match(last)
    if not m:
        raise ValueError(f"unsupported selector: {selector!r}")
    attr = (m.group("attr"), m.group("val")) if m.group("attr") else None
    return SimpleSelector(
        tag=m.group("tag").lower() if m.group("tag") else None,
        cls=m.group("cls"),
        elem_id=m.group("id"),
        attr=attr,
    )


def select(elems: list[Elem], selector: str) -> list[Elem]:
    sel = parse_selector(selector)
    return [e for e in elems if sel.matches(e)]


def find_blocks(html: str, base_selector: str) -> list[tuple[int, str]]:
    """Split a page into (start_pos, inner_html) blocks matching
    ``baseSelector`` (a ``tag.class`` selector on a container tag).

    The generator never nests a block tag inside itself, so a non-greedy
    scan to the first close tag is exact.
    """
    sel = parse_selector(base_selector)
    tag = sel.tag or "div"
    pat = re.compile(rf"<{tag}\b([^>]*)>(.*?)</{tag}>", re.DOTALL | re.IGNORECASE)
    out = []
    for m in pat.finditer(html):
        attrs = dict(_ATTR_RE.findall(m.group(1)))
        e = Elem(tag=tag, attrs=attrs, text="", pos=m.start())
        if sel.matches(e):
            out.append((m.start(2), m.group(2)))
    return out


def inner_text(fragment: str) -> str:
    """Concatenated text with tags stripped (crude but exact on our HTML)."""
    return _TAG_STRIP_RE.sub("", fragment)

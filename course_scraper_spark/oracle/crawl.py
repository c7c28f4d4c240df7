"""Single-process oracle crawler.

A faithful re-statement of the reference BFS (``src/crawler.py:126-272``)
using the same data structures (deque + set), run against the synthetic
``pages`` table instead of the network. Every Spark crawl result is judged
against this: final seen set (sorted, crawler.py:63), exact visit order,
and per-URL depth.

Semantics checklist (each encoded below, with the reference line):

* queue of ``(url, depth)``, seen-check at pop        crawler.py:167,186-189,232-234
* generic branch: mark seen, stop expanding at
  ``depth == max_depth`` (the URL IS in seen)          crawler.py:235
* Modern-Campus branch: ``depth >= max_depth`` skips
  BEFORE marking seen                                  crawler.py:187
* MC: ``preview_course_nopop.php`` URLs added to seen
  without visiting; only ``content.php`` URLs found
  under ``tr>td[colspan=2]>a`` are enqueued            crawler.py:211-226
* fetch failure: URL stays in seen, no expansion       crawler.py:191-196,238-243
* filters F1-F5 in extraction order                    crawler.py:198-209,245-257
* enqueue candidates only if not seen at extraction
  time (dupes still possible; resolved at pop)         crawler.py:225,259
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlparse

from ..config import SourceConfig
from ..functions.htmlmini import extract_hrefs, extract_mc_listing_hrefs
from ..synth.world import fetch_ok


@dataclass
class OracleCrawlResult:
    seen_sorted: list[str]
    visit_order: list[tuple[str, int]]  # (url, depth) in exact visit sequence
    fetched: list[str] = field(default_factory=list)  # successfully fetched urls
    failed: list[str] = field(default_factory=list)


class PageStore:
    """Dict-backed stand-in for the web, built from the pages table."""

    def __init__(self, pages_pdf):
        self._by_url = {
            r.url: (r.html, r.status_code, r.fetch_mode) for r in pages_pdf.itertuples()
        }

    def fetch(self, url: str) -> str | None:
        """None = fetch failed (render_utils.py ladder collapsed)."""
        rec = self._by_url.get(url)
        if rec is None:
            return None
        html, status, mode = rec
        return html if fetch_ok(status, mode) else None

    def root_html(self, url: str) -> str | None:
        rec = self._by_url.get(url)
        if rec is None or rec[1] >= 400:
            return None  # raise_for_status on the root fetch, crawler.py:180
        return rec[0]


def oracle_crawl(source: SourceConfig, store: PageStore, make_root_filter: bool = True) -> OracleCrawlResult:
    root_url = source.root_url
    start = urlparse(source.url_base_exclude or root_url)
    domain = start.netloc
    root_path = (start.path.rstrip("/") + "/") if start.path else "/"

    regexes = [re.compile(p) for p in source.effective_exclude_patterns]

    def inside(u: str) -> bool:
        p = urlparse(u)
        return p.netloc == domain and (p.path.startswith(root_path) if make_root_filter else True)

    def excluded(u: str) -> bool:
        return any(rx.search(u) for rx in regexes)

    seen: set[str] = set()
    queue: deque[tuple[str, int]] = deque([(root_url, 0)])
    visit_order: list[tuple[str, int]] = []
    fetched: list[str] = []
    failed: list[str] = []

    catalog_html = store.root_html(root_url)
    if catalog_html is None:
        raise RuntimeError(f"root fetch failed for {root_url}")

    if "Modern Campus Catalog" in catalog_html:
        while queue:
            url, depth = queue.popleft()
            if url in seen or depth >= source.crawl_depth:
                continue
            seen.add(url)
            visit_order.append((url, depth))
            html = store.fetch(url)
            if html is None:
                failed.append(url)
                continue
            fetched.append(url)
            base = f"{urlparse(url).scheme}://{urlparse(url).netloc}"
            for href in extract_hrefs(html):
                href = href.split("#")[0]
                if not href or href.startswith(("mailto:", "tel:")):
                    continue
                full = urljoin(base, href)
                if not inside(full) and not source.include_external:
                    continue
                if excluded(full):
                    continue
                if "preview_course_nopop.php" in full:
                    seen.add(full)
            for href in extract_mc_listing_hrefs(html):
                href = href.split("#")[0]
                if not href or href.startswith(("mailto:", "tel:")):
                    continue
                full = urljoin(base, href)
                if not inside(full) and not source.include_external:
                    continue
                if excluded(full):
                    continue
                if full not in seen and "content.php" in full:
                    queue.append((full, depth + 1))
    else:
        while queue:
            url, depth = queue.popleft()
            if url in seen:
                continue
            seen.add(url)
            visit_order.append((url, depth))
            if depth == source.crawl_depth:
                continue
            html = store.fetch(url)
            if html is None:
                failed.append(url)
                continue
            fetched.append(url)
            base = f"{urlparse(url).scheme}://{urlparse(url).netloc}"
            for href in extract_hrefs(html):
                href = href.split("#", 1)[0]
                if not href or href.startswith(("mailto:", "tel:")):
                    continue
                full = urljoin(base, href)
                if not inside(full) and not source.include_external:
                    continue
                if excluded(full):
                    continue
                if full not in seen:
                    queue.append((full, depth + 1))

    return OracleCrawlResult(
        seen_sorted=sorted(seen), visit_order=visit_order, fetched=fetched, failed=failed
    )

"""Single-process extraction oracle (mirrors ``src/scraper.py:26-162``).

Given the URLs a crawl produced, apply the JSON-CSS schema page by page,
clean, filter and normalize exactly as the reference scraper does, and
additionally emit the span-sequence docs payload (BASELINE input shape).
The Spark span engine (:mod:`course_scraper_spark.operators.spans`) is
judged against this output row-for-row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.jsoncss import clean_records, extract_records, extract_spans, finalize_records
from .crawl import PageStore


@dataclass
class OracleScrapeResult:
    records: list[dict] = field(default_factory=list)
    good_urls: set[str] = field(default_factory=set)
    bad_urls: set[str] = field(default_factory=set)
    errors: list[str] = field(default_factory=list)
    docs: list[dict] = field(default_factory=list)  # {doc_id, spans}


def oracle_scrape(urls: list[str], schema: dict, store: PageStore) -> OracleScrapeResult:
    res = OracleScrapeResult()
    # F7: skip URLs containing "archive" before any fetch (scraper.py:84)
    current_urls = [u for u in urls if "archive" not in u]
    for url in current_urls:
        html = store.fetch(url)
        if html is None:
            res.errors.append(f"No extracted content from {url}")
            continue
        items = extract_records(html, schema)
        if not items:
            res.errors.append(f"No extracted content from {url}")
            continue
        items = clean_records(items)
        if items:
            res.good_urls.add(url)
        records, errs = finalize_records(items, url)
        res.records.extend(records)
        res.errors.extend(errs)
        res.docs.append({"doc_id": url, "spans": extract_spans(html, schema)})
    # bad = set(urls) - good (scraper.py:36) — note: over the ORIGINAL list,
    # so archive-skipped URLs land in bad, like the reference.
    res.bad_urls = set(urls) - res.good_urls
    return res

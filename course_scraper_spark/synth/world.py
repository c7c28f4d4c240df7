"""Deterministic synthetic web (FIXTURES.md §2-§5).

Replaces live HTTP: the fetch operator resolves URLs against the ``pages``
table instead of the network. Everything is a pure function of
``(host, page_index)`` via crc32 — no RNG state — so the same world can be
built driver-side as pandas (tests) or distributed via ``spark.range →
mapInPandas`` (bench scale) with identical bytes.

Encoded reference behaviors:

* Zipf(1.2) host sizes — 1-2 mega hosts exercise skew/salting.
* link decoys: ``#fragment``, ``mailto:``, ``tel:``, ``.pdf``/``.jpg``,
  external hosts, missing pages (dead fetch) — filters F1-F5 + error path.
* per-page status codes + fetch_mode model the reference's
  static→retry→Playwright-fallback ladder (render_utils.py:43-102):
  success iff ``status < 400`` OR (``status ∈ {403,404,429}`` AND the page
  is dynamic-renderable). 5xx/static-only-errors fail after retries.
* one Modern-Campus host (host index 1 when n_hosts > 1): root HTML
  contains the literal ``Modern Campus Catalog``; listing pages are
  ``content.php?navoid=N`` reachable only through
  ``<tr><td colspan="2"><a href>`` rows; course pages are
  ``preview_course_nopop.php?coid=N`` (collected into seen *without*
  visiting, crawler.py:211-212).
* course-block text deliberately contains HTML entities, NBSP, bullets,
  newline runs and the reference's boilerplate strings so clean_text
  (scraper.py:48-65) is exercised byte-for-byte; some blocks lack a
  description (required-field filter, scraper.py:138); some have
  multi-valued codes (normalization, scraper.py:140-156).

The JSON-CSS schemas follow the reference schema format
(prompts/defaults.py:48-74); the Modern-Campus schema mirrors
``src/modern_campus.json``'s shape but uses non-self-nesting block tags
(our selector subset scans flat blocks — htmlmini.py docstring).
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass

import pandas as pd

from ..config import SourceConfig


def _h(*parts) -> int:
    """Stable 32-bit hash (crc32) — the world's only randomness source."""
    return zlib.crc32("|".join(str(p) for p in parts).encode())


@dataclass(frozen=True)
class WorldSpec:
    n_hosts: int = 8
    total_pages: int = 400
    zipf_s: float = 1.2
    seed: int = 42
    # bench-realism knobs (defaults preserve the small fixture worlds):
    branching: int = 3      # tree fan-out per page
    extra_links: int = 0    # additional in-scope cross links per page
    filler_paras: int = 0   # boilerplate paragraphs inflating page bytes
    max_courses: int = 5    # course blocks per detail page ∈ [0, max)

    def host_name(self, k: int) -> str:
        if k == 1 and self.n_hosts > 1:
            return "mc-catalog.example.edu"
        return f"h{k:03d}.example.edu"

    def is_mc(self, k: int) -> bool:
        return k == 1 and self.n_hosts > 1

    def host_sizes(self) -> list[int]:
        w = [(k + 1) ** -self.zipf_s for k in range(self.n_hosts)]
        tot = sum(w)
        sizes = [max(4, int(round(self.total_pages * x / tot))) for x in w]
        return sizes


# --------------------------------------------------------------------------
# page-level pure functions
# --------------------------------------------------------------------------

TITLE_POOL = [
    "CS&amp;{n} Intro to  Data   Engineering",
    "MATH {n}: Calculus • Advanced Topics",
    "ENG {n} – Writing\nWorkshop",
    "BIO {n} Genetics &amp; Genomics Lab",
    "HIST {n} World History Help (opens a new window)",
]

DESC_POOL = [
    "Covers storage &amp; retrieval,\n  query planning,   and distributed execution.",
    "A survey of  methods • tools •  practice.\nPrerequisite: none.",
    "Students will explore topics in depth. Add to My Favorites Share this "
    "PageFacebook this Page Tweet this Page Print Help Meets weekly.",
    "2023-2024 Undergraduate CatalogAdd to Portfolio Detailed study of systems.",
    "Hands-on projects and   readings. Print (opens a new window) Final exam required.",
]

CREDITS_POOL = ["3", "4", "1-5", "3.0", "2"]


def page_url(spec: WorldSpec, k: int, i: int, n_pages: int) -> str:
    host = spec.host_name(k)
    if spec.is_mc(k):
        if i == 0:
            return f"https://{host}/"
        return f"https://{host}/content.php?catoid=1&navoid={i}"
    if i == 0:
        return f"https://{host}/catalog/"
    n_sections = max(1, n_pages // 8)
    return f"https://{host}/catalog/sec{i % n_sections}/p{i}.html"


def mc_preview_url(spec: WorldSpec, k: int, j: int) -> str:
    return f"https://{spec.host_name(k)}/preview_course_nopop.php?catoid=1&coid={j}"


def fetch_status(spec: WorldSpec, k: int, i: int) -> tuple[int, str]:
    """(status_code, fetch_mode). Root pages always healthy."""
    if i == 0:
        return 200, "static"
    r = _h(spec.seed, "status", spec.host_name(k), i) % 29
    if r == 1:
        return 403, "dynamic"  # retries then Playwright fallback succeeds
    if r == 2:
        return 404, "dynamic"  # immediate fallback succeeds
    if r == 3:
        return 429, "static"  # retries, fallback has no JS payload -> fail
    if r == 4:
        return 503, "static"  # retries exhausted, no fallback branch -> fail
    return 200, "static"


def fetch_ok(status: int, fetch_mode: str) -> bool:
    """render_utils.py:43-102 ladder collapsed to its deterministic result."""
    return status < 400 or (status in (403, 404, 429) and fetch_mode == "dynamic")


def _course_block(host: str, i: int, b: int, seed: int) -> str:
    r = _h(seed, "blk", host, i, b)
    title = TITLE_POOL[r % len(TITLE_POOL)].replace("{n}", str(100 + r % 400))
    desc = DESC_POOL[(r >> 3) % len(DESC_POOL)]
    credits = CREDITS_POOL[(r >> 6) % len(CREDITS_POOL)]
    n_codes = 1 + (r >> 8) % 3
    dept = ["CS", "MATH", "ENG", "BIO", "HIST"][r % 5]
    codes = "".join(
        f'<span class="course-code"> {dept}&nbsp;{100 + (r + 7 * c) % 400} </span>'
        for c in range(n_codes)
    )
    has_desc = (r >> 11) % 4 != 0  # ~25% of blocks miss the description
    has_title = (r >> 13) % 11 != 0  # rare missing title
    parts = [f'<div class="course">']
    if has_title:
        parts.append(f'<h3 class="course-title">{title}</h3>')
    parts.append(codes)
    if has_desc:
        parts.append(f'<p class="course-desc">{desc}</p>')
    parts.append(f'<span class="course-credits">{credits}</span>')
    if (r >> 15) % 2 == 0:
        parts.append(f'<img class="course-media" src="img://{host}/{r % 9999}.png"/>')
    parts.append("</div>")
    return "\n".join(parts)


def _generic_links(spec: WorldSpec, k: int, i: int, n_pages: int) -> list[str]:
    """Outbound hrefs of generic page i, document order, pure function.

    Tree children (3i+1..3i+3) + a cross link + decoys. Mix of absolute,
    root-relative and bare-relative forms to exercise F3.
    """
    host = spec.host_name(k)
    n_sections = max(1, n_pages // 8)
    hrefs: list[str] = []
    b = spec.branching
    for j in range(b * i + 1, b * i + b + 1):
        if j < n_pages:
            form = _h(spec.seed, "form", host, i, j) % 3
            url = page_url(spec, k, j, n_pages)
            if form == 0:
                hrefs.append(url)  # absolute
            elif form == 1:
                hrefs.append(f"/catalog/sec{j % n_sections}/p{j}.html")  # root-relative
            else:
                hrefs.append(f"catalog/sec{j % n_sections}/p{j}.html")  # bare-relative
    cross = (7 * i + 5) % n_pages
    hrefs.append(page_url(spec, k, cross, n_pages) + "#section-2")  # fragment decoy
    hrefs.append("/catalog/")  # back to root (dup, dedup path)
    for t in range(spec.extra_links):
        j = _h(spec.seed, "xl", host, i, t) % n_pages
        hrefs.append(page_url(spec, k, j, n_pages))
    # decoys — filters F1/F2/F5 and the dead-fetch path
    r = _h(spec.seed, "decoy", host, i)
    hrefs.append(f"mailto:registrar@{host}")
    hrefs.append("tel:+15551234")
    hrefs.append("/catalog/files/bulletin.pdf")
    hrefs.append("/assets/logo.png")
    if r % 3 == 0:
        hrefs.append(f"https://www.outside-{r % 7}.org/catalog/")  # external
    if r % 4 == 0:
        hrefs.append(f"/catalog/search?q=term{r % 50}")
    if r % 5 == 0:
        hrefs.append(f"/catalog/archive/old{i}.html")
    if r % 11 == 0:
        hrefs.append(f"/catalog/missing{i}.html")  # fetch will fail (no page row)
    return hrefs


def generic_page_html(spec: WorldSpec, k: int, i: int, n_pages: int) -> str:
    host = spec.host_name(k)
    is_hub = i < max(2, n_pages // 6)
    r = _h(spec.seed, "page", host, i)
    n_courses = 0 if is_hub else (r % spec.max_courses)
    blocks = "\n".join(_course_block(host, i, b, spec.seed) for b in range(n_courses))
    anchors = "\n".join(
        f'<a href="{href}">link-{n}</a>' for n, href in enumerate(_generic_links(spec, k, i, n_pages))
    )
    filler = "\n".join(
        f'<p class="filler">{DESC_POOL[(r + fp) % len(DESC_POOL)] * 3}</p>'
        for fp in range(spec.filler_paras)
    )
    return (
        f"<html><head><title>{host} catalog page {i}</title></head>\n<body>\n"
        f'<div class="nav">Catalog Home • Help (opens a new window)</div>\n'
        f"{blocks}\n<p class=\"links\">\n{anchors}\n</p>\n{filler}\n"
        f'<div class="footer">Page (opens a new window) &copy; {host}</div>\n'
        f"</body></html>"
    )


def _mc_preview_block(spec: WorldSpec, k: int, j: int) -> str:
    host = spec.host_name(k)
    r = _h(spec.seed, "mcprev", host, j)
    title = TITLE_POOL[r % len(TITLE_POOL)].replace("{n}", str(100 + r % 400))
    desc = DESC_POOL[(r >> 3) % len(DESC_POOL)]
    return (
        '<section class="block_content_outer">\n'
        f'<h1 id="course_preview_title">{title}</h1>\n'
        f'<p class="course-desc">{desc}</p>\n'
        f'<span class="course-credits">{CREDITS_POOL[(r >> 6) % len(CREDITS_POOL)]}</span>\n'
        "</section>"
    )


def mc_page_html(spec: WorldSpec, k: int, i: int, n_pages: int) -> str:
    """Modern-Campus page: listing rows in tr>td[colspan=2], preview links
    as plain anchors (crawler.py:183-226 branch)."""
    host = spec.host_name(k)
    rows = []
    b = spec.branching
    for j in range(b * i + 1, b * i + b + 1):
        if j < n_pages:
            rows.append(
                f'<tr><td colspan="2"><a href="/content.php?catoid=1&navoid={j}">Section {j}</a></td></tr>'
            )
    # decoy row that is NOT content.php (must not be enqueued)
    rows.append('<tr><td colspan="2"><a href="/about.php">About</a></td></tr>')
    previews = "\n".join(
        f'<a href="/preview_course_nopop.php?catoid=1&coid={10 * i + c}">Course {10 * i + c}</a>'
        for c in range(3)
    )
    banner = "Modern Campus Catalog" if i == 0 else "Catalog Section"
    return (
        f"<html><head><title>{host} — {banner}</title></head>\n<body>\n"
        f'<div class="nav">{banner} • Help (opens a new window)</div>\n'
        f"<table><tbody>\n" + "\n".join(rows) + "\n</tbody></table>\n"
        f"{previews}\n"
        f'<a href="mailto:help@{host}">mail</a>\n'
        f'<a href="/files/catalog.pdf">pdf</a>\n'
        f"</body></html>"
    )


def mc_preview_html(spec: WorldSpec, k: int, j: int) -> str:
    host = spec.host_name(k)
    return (
        f"<html><head><title>{host} course {j}</title></head>\n<body>\n"
        f"{_mc_preview_block(spec, k, j)}\n"
        f'<a href="/content.php?catoid=1&navoid=1">back</a>\n'
        f"</body></html>"
    )


def aux_page_html(spec: WorldSpec, host: str, kind: str, i: int) -> str:
    """search/archive filler pages (visited only when not excluded)."""
    return (
        f"<html><head><title>{host} {kind} {i}</title></head><body>\n"
        f'<div class="nav">{kind} results</div>\n'
        f'<a href="/catalog/">home</a>\n</body></html>'
    )


# --------------------------------------------------------------------------
# table builders (pandas; spark variant in synth/spark_world.py)
# --------------------------------------------------------------------------


def build_pages(spec: WorldSpec) -> pd.DataFrame:
    rows = []
    sizes = spec.host_sizes()
    for k in range(spec.n_hosts):
        host = spec.host_name(k)
        n_pages = sizes[k]
        for i in range(n_pages):
            status, mode = fetch_status(spec, k, i)
            if spec.is_mc(k):
                html = mc_page_html(spec, k, i, n_pages)
                template = "modern_campus"
            else:
                html = generic_page_html(spec, k, i, n_pages)
                template = "generic_list" if i < max(2, n_pages // 6) else "generic_detail"
            rows.append((page_url(spec, k, i, n_pages), host, html, status, mode, template))
        if spec.is_mc(k):
            for i in range(n_pages):
                for c in range(3):
                    j = 10 * i + c
                    rows.append(
                        (mc_preview_url(spec, k, j), host, mc_preview_html(spec, k, j), 200, "static", "modern_campus_preview")
                    )
        else:
            for i in range(n_pages):
                r = _h(spec.seed, "decoy", host, i)
                if r % 4 == 0:
                    # keyed on the term, not i: colliding search URLs from
                    # different pages must render identical rows
                    rows.append(
                        (f"https://{host}/catalog/search?q=term{r % 50}", host, aux_page_html(spec, host, "search", r % 50), 200, "static", "aux")
                    )
                if r % 5 == 0:
                    rows.append(
                        (f"https://{host}/catalog/archive/old{i}.html", host, aux_page_html(spec, host, "archive", i), 200, "static", "aux")
                    )
    df = pd.DataFrame(rows, columns=["url", "host", "html", "status_code", "fetch_mode", "template_id"])
    return df.drop_duplicates(subset=["url"]).reset_index(drop=True)


GENERIC_SCHEMA = {
    "name": "Generic Course Detail",
    "baseSelector": "div.course",
    "fields": [
        {"name": "course_title", "selector": "h3.course-title", "type": "text"},
        {"name": "course_description", "selector": "p.course-desc", "type": "text"},
        {
            "name": "course_code",
            "selector": "span.course-code",
            "type": "list",
            "fields": [{"name": "text", "type": "text"}],
        },
        {"name": "course_credits", "selector": "span.course-credits", "type": "text"},
        {"name": "course_media", "selector": "img.course-media", "type": "attribute", "attribute": "src"},
    ],
}

# Shape mirrors src/modern_campus.json (block container + title-by-id),
# adapted to non-self-nesting tags for our selector subset.
MC_SCHEMA = {
    "name": "Course Details",
    "baseSelector": "section.block_content_outer",
    "fields": [
        {"name": "course_title", "selector": "h1#course_preview_title", "type": "text"},
        {"name": "course_description", "selector": "p.course-desc", "type": "text"},
        {"name": "course_credits", "selector": "span.course-credits", "type": "text"},
    ],
}


def build_sources(spec: WorldSpec) -> list[SourceConfig]:
    out = []
    sizes = spec.host_sizes()
    for k in range(spec.n_hosts):
        host = spec.host_name(k)
        name = f"src_{host.split('.')[0]}"
        if spec.is_mc(k):
            out.append(
                SourceConfig(
                    source_id=f"LOCAL_{name}",
                    name=name,
                    root_url=f"https://{host}/",
                    schema_url=mc_preview_url(spec, k, 1),
                    crawl_depth=3,
                )
            )
            continue
        excl = ["search", "archive"] if k % 3 == 0 else None
        base_exclude = f"https://{host}/" if k % 5 == 2 else None
        # schema_url points at the first detail page (hub pages have no
        # course blocks and would fail schema validation by design)
        first_detail = min(max(2, sizes[k] // 6), sizes[k] - 1)
        out.append(
            SourceConfig(
                source_id=f"LOCAL_{name}",
                name=name,
                root_url=f"https://{host}/catalog/",
                schema_url=page_url(spec, k, first_detail, sizes[k]),
                crawl_depth=4 + k % 3,
                url_exclude_patterns=excl,
                url_base_exclude=base_exclude,
            )
        )
    return out


def build_robots(spec: WorldSpec) -> pd.DataFrame:
    rows = []
    for k in range(spec.n_hosts):
        host = spec.host_name(k)
        delay = 0.5 if k == 0 else (2.0 if k == 3 else None)  # None -> 1.0 default
        rows.append((host, delay, ["/private/"]))
    return pd.DataFrame(rows, columns=["host", "crawl_delay", "disallow"])


def build_schemas(spec: WorldSpec) -> pd.DataFrame:
    rows = []
    for s in build_sources(spec):
        schema = MC_SCHEMA if "mc-catalog" in s.root_url else GENERIC_SCHEMA
        rows.append((s.source_id, json.dumps(schema)))
    return pd.DataFrame(rows, columns=["source_id", "schema_json"])

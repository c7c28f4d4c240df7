"""Spec-based synthetic transport: serves the world WITHOUT a pages table.

``world_transport_factory`` (operators/fetch.py) broadcasts a url→page
dict — fine at test scale, but a 300k-page heavy world is GBs of html on
the driver. The world is a PURE FUNCTION of (host, page_index)
(synth/world.py), so :class:`SpecTransport` instead inverts the URL back
to (k, i) and regenerates status/mode/html on demand inside the
executor — O(spec) closure bytes, zero driver memory, any corpus size.

Equality with the dict transport over every URL the generator emits is
pinned by tests/test_fetch_http.py::test_spec_transport_equals_world.
URLs outside the generator's shapes (e.g. the deliberate
``/catalog/missing{i}.html`` dead links) resolve to a connection error,
exactly like the pages-table miss.
"""

from __future__ import annotations

import re

from ..operators.fetch import FetchResponse
from .world import (
    WorldSpec,
    aux_page_html,
    fetch_status,
    generic_page_html,
    mc_page_html,
    mc_preview_html,
)

_GENERIC_HOST = re.compile(r"^h(\d{3})\.example\.edu$")
_GEN_PAGE = re.compile(r"^/catalog/sec(\d+)/p(\d+)\.html$")
_MC_PAGE = re.compile(r"^/content\.php\?catoid=1&navoid=(\d+)$")
_MC_PREVIEW = re.compile(r"^/preview_course_nopop\.php\?catoid=1&coid=(\d+)$")
_AUX_SEARCH = re.compile(r"^/catalog/search\?q=term(\d+)$")
_AUX_ARCHIVE = re.compile(r"^/catalog/archive/old(\d+)\.html$")
_URL = re.compile(r"^https://([^/]+)(/.*)$")


class SpecTransport:
    """Resolve URLs by regenerating the page from the WorldSpec."""

    def __init__(self, spec: WorldSpec):
        self.spec = spec
        self._sizes = spec.host_sizes()

    def _host_k(self, host: str) -> int | None:
        if host == "mc-catalog.example.edu" and self.spec.n_hosts > 1:
            return 1
        m = _GENERIC_HOST.match(host)
        if m:
            k = int(m.group(1))
            if k < self.spec.n_hosts and not self.spec.is_mc(k):
                return k
        return None

    def _resolve(self, url: str):
        m = _URL.match(url)
        if not m:
            return None
        host, path = m.group(1), m.group(2)
        k = self._host_k(host)
        if k is None:
            return None
        n_pages = self._sizes[k]
        spec = self.spec
        if spec.is_mc(k):
            if path == "/":
                i = 0
            elif (mm := _MC_PAGE.match(path)) and int(mm.group(1)) < n_pages:
                i = int(mm.group(1))
            elif mm := _MC_PREVIEW.match(path):
                # previews exist for j = 10*i + c (c<3, i<n_pages); only
                # generator-linked ids are ever requested
                return 200, "static", mc_preview_html(spec, k, int(mm.group(1)))
            else:
                return None
            status, mode = fetch_status(spec, k, i)
            return status, mode, mc_page_html(spec, k, i, n_pages)
        if path == "/catalog/":
            i = 0
        elif (mm := _GEN_PAGE.match(path)) and int(mm.group(2)) < n_pages:
            i = int(mm.group(2))
        elif mm := _AUX_SEARCH.match(path):
            return 200, "static", aux_page_html(spec, host, "search", int(mm.group(1)))
        elif mm := _AUX_ARCHIVE.match(path):
            return 200, "static", aux_page_html(spec, host, "archive", int(mm.group(1)))
        else:
            return None
        status, mode = fetch_status(spec, k, i)
        return status, mode, generic_page_html(spec, k, i, n_pages)

    # -- transport protocol (operators/fetch.py) ---------------------------
    def get(self, url: str, headers: dict | None = None) -> FetchResponse:
        row = self._resolve(url)
        if row is None:
            return FetchResponse(None, None, None)
        status, mode, html = row
        return FetchResponse(status, html if status < 400 else None, mode)

    def render(self, url: str) -> FetchResponse:
        row = self._resolve(url)
        if row is None:
            return FetchResponse(None, None, None)
        status, mode, html = row
        if mode == "dynamic":
            return FetchResponse(200, html, "dynamic")
        return FetchResponse(status, None, mode)


def spec_transport_factory(spec: WorldSpec):
    """Factory closure for fetch_http: ships only the (tiny) spec."""
    return lambda: SpecTransport(spec)

"""JSON-CSS extraction engine (the reference's schema format, in pure
Python over :mod:`htmlmini`).

Implements the schema document format of the reference
(``src/prompts/defaults.py:48-74``; concrete instance
``src/modern_campus.json``): ``{name, baseSelector, fields[{name,
selector, type[, attribute, fields]}]}`` with field types ``text``,
``attribute`` and ``list`` (of nested ``text`` fields). This is the
*spec* shared by the single-process oracle and the Spark pandas UDFs —
the Spark side distributes it over Arrow batches, it never changes the
semantics.

Like lxml/bs4 in the reference scraper, element text is entity-decoded at
extraction time; the reference's ``clean_text`` then runs its own
``html.unescape`` on top (scraper.py:51) — we reproduce that double
behavior exactly. ``course_code`` list entries are *not* clean_text'd by
the reference (only ``str.strip`` during normalization,
scraper.py:140-156) — also reproduced.
"""

from __future__ import annotations

import html as _html
from typing import Any

from .htmlmini import Elem, find_blocks, scan_elements, select
from .text import clean_text

# span kinds, FIXTURES.md §1
TEXT_KINDS = ("course_title", "course_description", "course_code", "course_credits")
MEDIA_FIELD_NAMES = ("course_media", "media")


def _page_scan(html: str, base_selector: str):
    """ONE regex pass over the page: full element list + per-block
    element slices (block membership by position range). The hot parse
    path used to rescan every block for records and again for spans —
    3 passes per page; this shares the single pass."""
    blocks = find_blocks(html, base_selector)
    elems = scan_elements(html)
    per_block = []
    for start, inner in blocks:
        end = start + len(inner)
        per_block.append([e for e in elems if start <= e.pos < end])
    return elems, per_block


def _record_from_elems(elems: list, schema: dict) -> dict[str, Any]:
    rec: dict[str, Any] = {}
    for f in schema.get("fields", []):
        matches = select(elems, f["selector"])
        if not matches:
            continue
        ftype = f.get("type", "text")
        if ftype == "text":
            rec[f["name"]] = _html.unescape(matches[0].text)
        elif ftype == "attribute":
            rec[f["name"]] = matches[0].attrs.get(f.get("attribute", ""), "")
        elif ftype == "list":
            inner_name = (f.get("fields") or [{"name": "text"}])[0].get("name", "text")
            rec[f["name"]] = [{inner_name: _html.unescape(m.text)} for m in matches]
    return rec


def extract_records(html: str, schema: dict) -> list[dict[str, Any]]:
    """One dict per baseSelector block, raw (pre-clean) field values.

    text/attribute fields: first match wins; list fields: every match, as
    ``[{inner_name: text}, ...]``.
    """
    _, per_block = _page_scan(html, schema["baseSelector"])
    return [_record_from_elems(elems, schema) for elems in per_block]


def clean_records(items: list[dict]) -> list[dict]:
    """The reference's post-extraction cleanup loop (scraper.py:119-129):
    clean every string field; flatten one level of nested dicts into the
    parent under the inner keys; leave lists untouched."""
    cleaned = []
    for obj in items:
        if isinstance(obj, dict):
            for k, v in list(obj.items()):
                if isinstance(v, str):
                    obj[k] = clean_text(v)
                elif isinstance(v, dict):
                    for key, val in v.items():
                        if isinstance(val, str):
                            obj[key] = clean_text(val)
        cleaned.append(obj)
    return cleaned


def normalize_course_code(raw_codes: list) -> str | None:
    """Multi-valued code -> canonical string (scraper.py:140-156):
    str() -> strip -> drop empties -> sorted(set) -> '_'.join; None if all
    empty."""
    str_codes: list[str] = []
    for code in raw_codes:
        if isinstance(code, dict):
            txt = str(code.get("text", "")).strip()
        else:
            txt = str(code).strip()
        if txt:
            str_codes.append(txt)
    if not str_codes:
        return None
    return "_".join(sorted(set(str_codes)))


def finalize_records(items: list[dict], source_url: str) -> tuple[list[dict], list[str]]:
    """Required-field filter + code normalization + ``_source_url`` tag
    (scraper.py:137-158). Returns (records, error_messages)."""
    records, errors = [], []
    for item in items:
        if (
            ("course_title" in item)
            and ("course_description" in item)
            and item["course_title"]
            and item["course_description"]
        ):
            item = dict(item)
            item["_source_url"] = source_url
            if "course_code" in item and isinstance(item["course_code"], list) and item["course_code"]:
                norm = normalize_course_code(item["course_code"])
                if norm is not None:
                    item["course_code"] = norm
                else:
                    item.pop("course_code", None)
            records.append(item)
        else:
            errors.append(f"missing required fields: {sorted(item.keys())}")
    return records, errors


# --------------------------------------------------------------------------
# span sequences — the BASELINE docs payload
# --------------------------------------------------------------------------


def _span_pairs(all_elems: list, per_block: list, schema: dict) -> list[tuple[str, Elem]]:
    """(kind, elem) pairs for every span-bearing element, document order."""
    pairs: list[tuple[str, Elem]] = []
    for e in all_elems:
        if e.tag == "div" and "nav" in e.classes:
            pairs.append(("nav", e))
        elif e.tag == "div" and "footer" in e.classes:
            pairs.append(("boilerplate", e))
    for elems in per_block:
        for f in schema.get("fields", []):
            kind = "media" if f["name"] in MEDIA_FIELD_NAMES or f.get("type") == "attribute" else f["name"]
            for m in select(elems, f["selector"]):
                pairs.append((kind, m))
    pairs.sort(key=lambda p: p[1].pos)
    return pairs


def _spans_from_pairs(pairs: list[tuple[str, Elem]]) -> list[dict]:
    spans = []
    for kind, e in pairs:
        if kind == "media":
            ref = e.attrs.get("src", "")
            spans.append({"kind": "media", "text": None, "media_ref": ref, "offset": len(spans)})
        else:
            spans.append(
                {
                    "kind": kind,
                    "text": clean_text(_html.unescape(e.text)),
                    "media_ref": None,
                    "offset": len(spans),
                }
            )
    return spans


def extract_spans(html: str, schema: dict) -> list[dict]:
    """The interleaved text+media span sequence of one page
    (BASELINE.json input_hint shape). Text spans are clean_text'd; media
    spans carry ``media_ref`` and NULL text. ``offset`` = position in
    document order."""
    all_elems, per_block = _page_scan(html, schema["baseSelector"])
    return _spans_from_pairs(_span_pairs(all_elems, per_block, schema))


def extract_page(html: str, schema: dict) -> tuple[list[dict[str, Any]], list[dict]]:
    """Fused hot path: (raw records, spans) from ONE page scan — the UDF
    entry point; semantically identical to calling
    :func:`extract_records` + :func:`extract_spans`."""
    all_elems, per_block = _page_scan(html, schema["baseSelector"])
    records = [_record_from_elems(elems, schema) for elems in per_block]
    spans = _spans_from_pairs(_span_pairs(all_elems, per_block, schema))
    return records, spans

"""DocTags → span-sequence parser (M18) + prediction format negotiation.

The reference converts doctags predictions through docling_core's
``DocTagsDocument`` (base_evaluator.py:42-62, file_provider.py:152-192).
This is a minimal from-scratch parser of the public DocTags surface
grammar — ``<doctag><tag><loc_a><loc_b><loc_c><loc_d>text</tag>…`` with
list wrappers and self-closed media elements — producing the canonical
span schema directly.

Kind mapping: ``title``→title, ``section_header_level_N``→
section_header, ``text``/``paragraph``→text, ``list_item`` (inside
``ordered_list``/``unordered_list`` wrappers)→list_item, ``caption``→
caption, ``code``→code, ``formula``→formula, ``picture``→picture
(media_ref assigned, empty text), ``otsl``→table (token stream kept as
text), ``page_header``/``page_footer`` pass through. ``<loc_N>`` tokens
(0-500 grid) are stripped from text; the first four become the span's
bbox.

``parse_markdown_spans`` is the inverse of
``functions.spans.spans_to_markdown`` (the ``.md`` negotiation
fallback).
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"<([^<>]+)>")
_LOC_RE = re.compile(r"<loc_(\d+)>")

_KIND_MAP = {
    "title": "title",
    "text": "text",
    "paragraph": "text",
    "list_item": "list_item",
    "caption": "caption",
    "code": "code",
    "formula": "formula",
    "page_header": "page_header",
    "page_footer": "page_footer",
    "footnote": "footnote",
    "checkbox_selected": "checkbox_selected",
    "checkbox_unselected": "checkbox_unselected",
}
_WRAPPERS = {"doctag", "ordered_list", "unordered_list", "chart"}
_MEDIA = {"picture": "picture", "otsl": "table"}


def parse_doctags(doctags: str, doc_id: str = "") -> list[dict]:
    """DocTags string → ordered span dicts
    ``(kind, text, media_ref, offset [, bbox])``; unknown tags are
    treated as text-bearing elements of kind ``text`` (lenient, a batch
    kernel must not throw on one odd tag)."""
    spans: list[dict] = []
    pos = 0
    n = len(doctags)
    stack: list[str] = []
    cur_tag: str | None = None
    cur_text: list[str] = []
    cur_locs: list[int] = []

    def flush():
        nonlocal cur_tag, cur_text, cur_locs
        if cur_tag is None:
            return
        kind = _KIND_MAP.get(cur_tag)
        if kind is None and cur_tag.startswith("section_header"):
            kind = "section_header"
        media_ref = ""
        text = " ".join(" ".join(cur_text).split())
        if cur_tag in _MEDIA:
            kind = _MEDIA[cur_tag]
            if cur_tag == "picture":
                media_ref = f"doctags/{doc_id}/{len(spans)}"
                text = ""
        if kind is None:
            kind = "text"
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "offset": len(spans),
                "bbox": cur_locs[:4] if len(cur_locs) >= 4 else None,
            }
        )
        cur_tag, cur_text, cur_locs = None, [], []

    for m in _TAG_RE.finditer(doctags):
        literal = doctags[pos:m.start()]
        if literal.strip() and cur_tag is not None:
            cur_text.append(literal.strip())
        pos = m.end()
        tag = m.group(1)
        if tag.startswith("loc_"):
            if cur_tag is not None:
                try:
                    cur_locs.append(int(tag[4:]))
                except ValueError:
                    pass
            continue
        if tag.startswith("/"):
            name = tag[1:]
            if cur_tag is not None and name == cur_tag:
                flush()
            elif name in _WRAPPERS and stack and stack[-1] == name:
                stack.pop()
            continue
        if cur_tag == "otsl":
            # OTSL cell/structure tokens (<fcel>, <ecel>, <nl>, <ched>,
            # …) are PART of the table's token stream — the documented
            # "otsl → table (token stream kept as text)" mapping — not
            # new elements; treating them as elements exploded one
            # table into empty-table + per-cell text spans
            cur_text.append(f"<{tag}>")
            continue
        if tag in _WRAPPERS:
            stack.append(tag)
            continue
        # a new opening tag implies the previous unclosed element ended
        flush()
        cur_tag = tag
    tail = doctags[pos:n]
    if tail.strip() and cur_tag is not None:
        cur_text.append(tail.strip())
    flush()
    return spans


def parse_markdown_spans(md: str) -> list[dict]:
    """Markdown → span sequence (inverse of ``spans_to_markdown``):
    ``# ``→title, ``## ``→section_header, ``- ``→list_item, else text;
    blocks split on blank lines."""
    spans = []
    for block in re.split(r"\n\s*\n", md):
        block = " ".join(block.split())
        if not block:
            continue
        if block.startswith("## "):
            kind, text = "section_header", block[3:]
        elif block.startswith("# "):
            kind, text = "title", block[2:]
        elif block.startswith("- "):
            kind, text = "list_item", block[2:]
        else:
            kind, text = "text", block
        spans.append(
            {"kind": kind, "text": text, "media_ref": "",
             "offset": len(spans)}
        )
    return spans


def parse_prediction_payload(payload: str, suffix: str,
                             doc_id: str = "") -> list[dict]:
    """Format dispatch for negotiated prediction payloads (M19)."""
    if suffix == ".dt":
        return parse_doctags(payload, doc_id)
    return parse_markdown_spans(payload)

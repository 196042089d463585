"""Canonical Arrow schemas for the engine.

The central table is ``documents``: one row per interleaved text+media
document with

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

This is the Arrow formalization of the reference's ``DoclingDocument``
body: an ordered sequence of labeled items iterated depth-first
(reference: docling_eval/datamodels/dataset_record.py:21-73; span kinds
mirror DocItemLabel as used in
docling_eval/prediction_providers/base_prediction_provider.py:38-76).
``offset`` is the document-order (reading-order) index; the per-row
invariant everywhere is span-sequence equality on
``(kind, text, media_ref)`` in ``offset`` order.

Media spans carry ``media_ref`` (e.g. ``pic/<doc>/<n>``) and empty
``text`` — media bytes are NEVER inlined into the row (the reference
inlines base64 into JSON, docling_eval/utils/utils.py:107-113; at scale
that explodes row width, so we keep refs into a side table).
"""

from __future__ import annotations

import pyarrow as pa

# ----------------------------------------------------------------------------
# span kinds ≈ DocItemLabel (reference: base_prediction_provider.py:38-76)
# ----------------------------------------------------------------------------
ALL_KINDS: tuple[str, ...] = (
    "title",
    "section_header",
    "text",
    "paragraph",
    "list_item",
    "caption",
    "footnote",
    "page_header",
    "page_footer",
    "formula",
    "code",
    "table",
    "picture",
    "checkbox_selected",
    "checkbox_unselected",
    "document_index",
    "reference",
)

#: furniture layer — stripped by main-content extraction
#: (reference content-layer logic: markdown_text_evaluator.py:83-105 keeps a
#: label subset; headers/footers are page furniture)
FURNITURE_KINDS: tuple[str, ...] = ("page_header", "page_footer")

#: spans whose payload lives behind ``media_ref``
MEDIA_KINDS: tuple[str, ...] = ("picture", "table")

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

SPAN_TYPE = pa.list_(SPAN_STRUCT)


def documents_schema() -> pa.Schema:
    """Schema of the canonical interleaved ``documents`` table."""
    return pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("spans", SPAN_TYPE),
        ]
    )


def predictions_schema() -> pa.Schema:
    """Extraction output: input identity + extracted spans + status.

    ``status`` mirrors the reference's skip-and-count semantics
    (base_prediction_provider.py:366-376): per-row failures become a
    status value, never a task retry loop.
    """
    return pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("spans", SPAN_TYPE),
            pa.field("n_spans", pa.int32()),
            pa.field("status", pa.string()),
        ]
    )

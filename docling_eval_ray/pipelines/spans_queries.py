"""Span-level pipelines registered as rows-only queries.

These run over the deterministic interleaved lift of the flat documents
table (sources.interleaved). Not SQL-expressible (the span synthesis and
extraction semantics live in Python), so the driver records rows-only
checks; the span-sequence invariant is covered by golden-equality tests
in tests/test_flagship.py.
"""

from __future__ import annotations

from ..functions.spans import span_kind_counts, spans_to_markdown
from ..pipelines.flagship import flagship


def markdown_export(sf_dir: str):
    """Extracted spans → markdown projection (reference M16,
    markdown_text_evaluator.py:241-251)."""
    ds = flagship(sf_dir)
    return ds.map_batches(
        lambda t: spans_to_markdown(t).select(["doc_id", "markdown"]),
        batch_format="pyarrow",
    )


def span_kind_census(sf_dir: str):
    """Label census over extracted spans (reference G4 two-pass label
    scan, layout_evaluator.py:496-563): per-batch partial counts →
    one small groupby-sum."""
    from ray.data.aggregate import Sum

    ds = flagship(sf_dir)
    partials = ds.map_batches(span_kind_counts, batch_format="pyarrow")
    return partials.groupby("kind").aggregate(Sum("n", alias_name="n"))


def _explode_spans(ds):
    """Vectorized span explode: nested (doc_id, spans) → one row per
    span (doc_id, offset, kind, text, media_ref) via ListArray.flatten
    + parent-index take."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans)
        doc_ids = t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        return pa.table(
            {
                "doc_id": doc_ids.take(parent),
                "offset": pc.cast(flat.field("offset"), pa.int64()),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def flagship_spans_flat(sf_dir: str):
    """The flagship extraction output EXPLODED to one row per span
    ``(doc_id, offset, kind, text, media_ref)`` — this puts the core
    span-sequence invariant itself under the driver's strong hash gate:
    the DuckDB oracle re-derives every extracted span (kind, text,
    media_ref, document-order offset) from the flat documents table via
    the recursive chunk-walk CTE."""
    return _explode_spans(flagship(sf_dir))


def html_spans_flat(sf_dir: str):
    """The raw-HTML extraction path under the SAME strong gate: the DOM
    boilerplate scorer (functions/html_extract.py) over the
    deterministic HTML rendition must reproduce the identical span
    stream — chrome (nav/header/footer/aside, link-dense divs) stripped,
    title/sections/lists/figures/captions/text surviving in document
    order. Shares flagship_spans_flat's oracle SQL verbatim."""
    from ..functions.html_extract import html_extraction

    return _explode_spans(html_extraction(sf_dir))


def markdown_token_prf(sf_dir: str, records=None):
    """Token-SET precision/recall/F1 between the gt and mutated-pred
    markdown projections (the set-metric slice of the reference's
    markdown bundle, markdown_text_evaluator.py:218-226) — DuckDB-
    oracle-able because set intersection is SQL-expressible
    (list_intersect over regexp_extract_all tokens).

    Tokenizer: explicit ASCII character classes, NOT \\w — Python re
    \\w is Unicode-aware while DuckDB RE2 \\w is ASCII-only, which
    would silently break the hash gate on the first non-ASCII text;
    the explicit classes behave identically in both engines for any
    input (non-ASCII letters tokenize as single punctuation-class
    chars on BOTH sides)."""
    import re

    import numpy as np
    import pyarrow as pa

    from ..functions.textmetrics import set_prf
    from .evaluate import _md, _metric_schema, _status_filter, eval_records

    ascii_token = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]")

    schema = _metric_schema(
        doc_id=pa.string(), precision=pa.float64(), recall=pa.float64(),
        f1=pa.float64(),
    )
    ds = records if records is not None else eval_records(sf_dir)

    def metric(t: pa.Table) -> pa.Table:
        t = _status_filter(t)
        gts = _md(t, "gt_spans")
        preds = _md(t, "pred_spans")
        rows = []
        for did, g, p in zip(t["doc_id"].to_pylist(), gts, preds):
            m = set_prf(ascii_token.findall(g), ascii_token.findall(p))
            rows.append(
                {
                    "doc_id": did,
                    "precision": float(np.round(m["precision"], 6)),
                    "recall": float(np.round(m["recall"], 6)),
                    "f1": float(np.round(m["f1"], 6)),
                }
            )
        return pa.Table.from_pylist(rows, schema=schema)

    return ds.map_batches(metric, batch_format="pyarrow")


def sliced_spans_flat(sf_dir: str):
    """The S9 sliding-window slicer output exploded to one row per
    ``(slice_id, offset, kind, text, media_ref)`` — puts the slicer
    itself under the driver's strong hash gate: the oracle re-derives
    the RAW interleaved span stream (page furniture, nav boilerplate,
    whitespace-noisy paragraphs — `_RAW_SPANS_CTE`) and windows it with
    the same stride/overlap arithmetic."""
    from ..stages.slicer import sliced_documents

    flat = _explode_spans(sliced_documents(sf_dir))
    return flat.map_batches(
        lambda t: t.rename_columns(
            ["slice_id", "offset", "kind", "text", "media_ref"]
        ),
        batch_format="pyarrow",
    )


def skew_spans_flat(sf_dir: str):
    """The SKEW-AWARE extraction path (size-bucketed LPT scheduling,
    stages/extract.py:extract_skew_aware — the north rule's "skew from
    heavy documents handled via size-bucketed repartitioning" clause)
    under the same strong hash gate as flagship_spans_flat: rebucketing
    and descending-cost ordering must not change one span of one
    document. Shares flagship_spans_flat's oracle SQL verbatim."""
    from ..sources.interleaved import read_interleaved_documents
    from ..stages.extract import extract_skew_aware

    out = extract_skew_aware(read_interleaved_documents(sf_dir))
    return _explode_spans(out.select_columns(["doc_id", "spans"]))

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

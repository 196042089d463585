"""Flagship pipeline: interleaved documents → main-content extraction.

The Ray-Data rebuild of the reference's ``create-eval`` lifecycle
(cli/main.py:883-967 → base_prediction_provider.py:308-417): read the
canonical documents table, run the stateful extraction stage as an
actor pool over Arrow batches, emit the predictions table
``(doc_id, spans, n_spans, status)``.

Streaming end-to-end: nothing materializes the corpus; consumption is a
sink (``write_parquet``) or the driver's small take.
"""

from __future__ import annotations

from ..sources.interleaved import read_interleaved_documents
from ..stages.extract import extract_main_content


def flagship(sf_dir: str, *, concurrency: int | tuple[int, int] | None = None,
             batch_size: int | None = None):
    """documents.parquet → interleave → extract. Returns a lazy Dataset."""
    docs = read_interleaved_documents(sf_dir)
    return extract_main_content(
        docs, concurrency=concurrency, batch_size=batch_size
    )

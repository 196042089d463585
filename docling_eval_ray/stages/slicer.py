"""Document slicer — the reference's sliding-window PDF slicer (S9,
cli/main.py:774-821 ``create_sliced_pdfs``) re-expressed on span
sequences: flat_map each document into overlapping span-window slices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT


def slice_documents(ds, *, slice_length: int = 8, overlap: int = 2):
    """One row per (doc, window): doc_id becomes ``<doc_id>#<k>``,
    spans are the window's spans with offsets renumbered 0..len-1.
    Stride = slice_length − overlap; the final partial window is kept.
    """
    if overlap >= slice_length:
        raise ValueError("overlap must be < slice_length")
    stride = slice_length - overlap

    def fn(t: pa.Table) -> pa.Table:
        out_ids: list[str] = []
        kinds: list[str] = []
        texts: list[str] = []
        media: list[str] = []
        offs: list[int] = []
        list_offsets = [0]
        for r in t.to_pylist():
            spans = r["spans"]
            n = len(spans)
            if n == 0:
                # zero-span docs (extraction failures, fully-stripped
                # boilerplate) keep one empty slice — rows must never
                # silently vanish from the corpus accounting
                out_ids.append(f"{r['doc_id']}#0")
                list_offsets.append(len(kinds))
                continue
            starts = list(range(0, max(1, n - overlap), stride)) or [0]
            for k, s0 in enumerate(starts):
                window = spans[s0 : s0 + slice_length]
                if not window:
                    continue
                out_ids.append(f"{r['doc_id']}#{k}")
                for i, sp in enumerate(window):
                    kinds.append(sp["kind"])
                    texts.append(sp["text"])
                    media.append(sp["media_ref"])
                    offs.append(i)
                list_offsets.append(len(kinds))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(media, pa.string()),
                pa.array(offs, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "spans": pa.ListArray.from_arrays(
                    pa.array(list_offsets, pa.int32()), struct
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def sliced_documents(sf_dir: str, *, slice_length: int = 8, overlap: int = 2):
    """Rows-only query: interleaved docs → overlapping span windows."""
    from ..sources.interleaved import read_interleaved_documents

    return slice_documents(
        read_interleaved_documents(sf_dir),
        slice_length=slice_length,
        overlap=overlap,
    )

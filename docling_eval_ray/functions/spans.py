"""Span-column kernels: markdown export, census, hashing, equality.

All operate vectorized on the flattened span representation
(``ListArray.flatten`` + ``list_parent_indices``) — no per-row Python in
hot paths.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_list_array(col) -> pa.ListArray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    return col


def spans_to_markdown(batch: pa.Table, spans_col: str = "spans") -> pa.Table:
    """Project a span sequence to markdown text — the reference's
    main-content text projection (markdown_text_evaluator.py:241-251:
    ``export_to_markdown`` with image placeholders and a label subset).

    title → ``# text``, section_header → ``## text``, list_item →
    ``- text``, media → empty placeholder (dropped), everything else →
    its text. Spans join with ``\\n\\n`` in offset order.
    """
    spans = _as_list_array(batch.column(spans_col))
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind")
    texts = flat.field("text")

    prefixed = pc.binary_join_element_wise(
        pc.case_when(
            pc.make_struct(
                pc.equal(kinds, "title"),
                pc.equal(kinds, "section_header"),
                pc.equal(kinds, "list_item"),
            ),
            pa.array(["# "] * len(flat), pa.string()),
            pa.array(["## "] * len(flat), pa.string()),
            pa.array(["- "] * len(flat), pa.string()),
            pa.array([""] * len(flat), pa.string()),
        ),
        texts,
        "",
    )
    keep = pc.greater(pc.utf8_length(texts), 0).to_numpy(zero_copy_only=False)

    # rebuild a list<string> of kept pieces per row and join with the
    # separator entirely in Arrow (no Python loop over spans)
    n_rows = batch.num_rows
    kept_parent = parent[keep]
    counts = np.bincount(kept_parent, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    if isinstance(prefixed, pa.ChunkedArray):
        prefixed = prefixed.combine_chunks()
    kept_pieces = prefixed.filter(pa.array(keep))
    piece_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), kept_pieces
    )
    joined = pc.binary_join(piece_lists, "\n\n")

    return batch.append_column("markdown", joined)


def span_kind_counts(batch: pa.Table, spans_col: str = "spans") -> pa.Table:
    """Partial aggregate: per-batch (kind → count) over exploded spans.

    Feed the result to ``groupby("kind").aggregate(Sum("n"))`` — the
    partial+final pattern that avoids shuffling every span
    (reference's label census is a full two-pass scan,
    layout_evaluator.py:496-563).
    """
    spans = _as_list_array(batch.column(spans_col))
    kinds = spans.flatten().field("kind")
    vc = pc.value_counts(kinds)
    return pa.table(
        {
            "kind": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def add_doc_hash(batch: pa.Table, spans_col: str = "spans") -> pa.Table:
    """SHA-256 content hash over the canonical span serialization —
    the exact-dedup / partition key (reference: utils/utils.py:43-52
    hashes the original binary; we hash the logical content).
    """
    spans = _as_list_array(batch.column(spans_col))
    flat = spans.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"), "\x1f"
    )
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    vals = joined.to_pylist()
    hashes = []
    for i in range(batch.num_rows):
        h = hashlib.sha256()
        for v in vals[offsets[i] : offsets[i + 1]]:
            h.update(v.encode())
            h.update(b"\x1e")
        hashes.append(h.hexdigest())
    return batch.append_column("doc_hash", pa.array(hashes, pa.string()))


def span_sequences_equal(
    a: pa.Table, b: pa.Table, spans_col: str = "spans"
) -> bool:
    """The per-row invariant: span-sequence equality on
    ``(kind, text, media_ref)`` in offset order, compared doc_id-aligned.
    """
    sa = a.sort_by("doc_id")
    sb = b.sort_by("doc_id")
    if sa.num_rows != sb.num_rows:
        return False
    if not pc.all(pc.equal(sa["doc_id"], sb["doc_id"])).as_py():
        return False

    def canon(t: pa.Table):
        spans = _as_list_array(t.column(spans_col))
        flat = spans.flatten()
        lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        tup = list(
            zip(
                flat.field("kind").to_pylist(),
                flat.field("text").to_pylist(),
                flat.field("media_ref").to_pylist(),
            )
        )
        return [tuple(tup[offsets[i] : offsets[i + 1]]) for i in range(t.num_rows)]

    return canon(sa) == canon(sb)

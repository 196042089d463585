"""OTSL table GT builder (M3: otsl_table_dataset_builder.py:88-257):
raw (OTSL token stream + cell texts + cell bboxes) records → table
ground truth with an HTML rendition, page tokens and the canonical span
row.

Reference semantics:
* the OTSL stream defines the grid with span counting (our
  ``functions.tables.parse_otsl`` ≙ doclaynet_v2_builder.py:82-254);
* cell TEXTS attach to content/header cells in row-major anchor order
  (the reference zips ``table_data.table_cells`` with the page tokens,
  otsl_table_dataset_builder.py:196-199 — strict, counts must match);
* page tokens are (id, bbox, text) triples
  (``create_page_tokens``, otsl_table_dataset_builder.py:88-122);
* the record carries the table as one provenance item over the page
  (otsl_table_dataset_builder.py:202-225) — here the canonical
  ``spans`` column holds one ``table`` span whose ``media_ref`` keys
  the table payload, plus per-cell text spans in token order.

Input fixtures are committed JSON-lines files with rows
``{doc_id, otsl, cell_texts, cell_bboxes, width, height}`` (original
synthetic tables — no reference data).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT
from ..functions.tables import cells_to_html, grid_shape, parse_otsl

TOKEN_STRUCT = pa.struct(
    [
        pa.field("id", pa.int32()),
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
        pa.field("text", pa.string()),
    ]
)

OTSL_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("html", pa.string()),
        pa.field("n_rows", pa.int32()),
        pa.field("n_cols", pa.int32()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("page_tokens", pa.list_(TOKEN_STRUCT)),
        pa.field("status", pa.string()),
    ]
)

SAMPLE_JSONL = str(
    Path(__file__).resolve().parents[2]
    / "tests/data/otsl_sample/tables.jsonl"
)


def _build_one(rec: dict) -> dict:
    cells = parse_otsl(rec["otsl"])
    # content/header anchors take texts in row-major anchor order;
    # ecel anchors stay empty (reference zip is strict: counts of
    # text-bearing cells and provided texts must match)
    texts = list(rec.get("cell_texts", []))
    bboxes = list(rec.get("cell_bboxes", []))
    content = [c for c in cells if c.text != ""]
    if len(content) != len(texts):
        return {
            "doc_id": rec["doc_id"], "html": "", "n_rows": 0, "n_cols": 0,
            "spans": [], "page_tokens": [],
            "status": "cell_count_mismatch",
        }
    tokens = []
    for i, (cell, text) in enumerate(zip(content, texts)):
        cell.text = text
        bb = bboxes[i] if i < len(bboxes) else [0.0, 0.0, 0.0, 0.0]
        tokens.append(
            {"id": i, "l": float(bb[0]), "t": float(bb[1]),
             "r": float(bb[2]), "b": float(bb[3]), "text": text}
        )
    html = cells_to_html(cells)
    n_rows, n_cols = grid_shape(cells)
    spans = [
        {"kind": "table", "text": "",
         "media_ref": f"otsl/{rec['doc_id']}", "offset": 0}
    ] + [
        {"kind": "text", "text": t["text"], "media_ref": "",
         "offset": i + 1}
        for i, t in enumerate(tokens)
    ]
    return {
        "doc_id": rec["doc_id"], "html": html,
        "n_rows": n_rows, "n_cols": n_cols,
        "spans": spans, "page_tokens": tokens, "status": "success",
    }


def build_otsl_gt(jsonl_path: str):
    """JSON-lines of OTSL table records → Dataset(OTSL_GT_SCHEMA);
    malformed rows (count mismatches) become status rows, never raises
    (skip-and-count)."""
    import ray.data as rd

    ds = rd.read_binary_files([jsonl_path])

    def build(t: pa.Table) -> pa.Table:
        rows = []
        for raw in t["bytes"].to_pylist():
            for line in raw.decode().splitlines():
                if line.strip():
                    rows.append(_build_one(json.loads(line)))
        return pa.Table.from_pylist(rows, schema=OTSL_GT_SCHEMA)

    return ds.map_batches(build, batch_format="pyarrow")


def otsl_gt_build(sf_dir: str = ""):
    """Driver query over the committed sample tables (``sf_dir``
    unused, as for the other raw-fixture queries)."""
    return build_otsl_gt(SAMPLE_JSONL)


OTSL_FLAT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_cols", pa.int64()),
    ]
)


def otsl_gt_flat(sf_dir: str = ""):
    """Hash-oracled flat view of ``otsl_gt_build``: the span rows of
    every successfully-built table plus its grid shape. The DuckDB
    oracle re-derives tokenization, the content-anchor↔text zip (and
    its strict count check — mismatched rows contribute zero flat rows
    on both sides) and the grid geometry from the committed JSONL:
    n_rows = token-row count and n_cols = max row length, which equal
    ``grid_shape``'s span-arithmetic for any well-formed OTSL stream
    (every continuation token occupies a grid position, so the maxima
    coincide)."""

    def explode(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            if r["status"] != "success":
                continue
            for sp in r["spans"]:
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "offset": sp["offset"],
                        "kind": sp["kind"],
                        "text": sp["text"],
                        "media_ref": sp["media_ref"],
                        "n_rows": r["n_rows"],
                        "n_cols": r["n_cols"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=OTSL_FLAT_SCHEMA)

    return build_otsl_gt(SAMPLE_JSONL).map_batches(
        explode, batch_format="pyarrow"
    )

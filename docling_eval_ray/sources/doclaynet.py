"""DocLayNet-style ground-truth builder — a REAL benchmark GT builder
(M3) over committed raw page-annotation JSON, via
``read_binary_files → map_batches(build_gt)``.

Reference semantics (dataset_builders/doclaynet_v1_builder.py):

* integer ``category_id`` → label via the 1..11 category map
  (doclaynet_v1_builder.py:144-156); an id outside the map fails the
  document (the reference's per-doc try/except skip-and-count,
  doclaynet_v1_builder.py:381-385 — here a ``status`` column, never a
  dropped row);
* blacklisted ``page_hash`` documents are skipped entirely
  (doclaynet_v1_builder.py:317-320);
* boxes arrive as [l, t, w, h] and convert to ltrb
  (``ltwh_to_ltrb``, doclaynet_v1_builder.py:158-170), then flip to
  bottom-left origin against the page height (the
  ``to_bottom_left_origin`` step, doclaynet_v1_builder.py:216-220);
* element text = the space-join of its ``pdf_cells`` texts
  (doclaynet_v1_builder.py:344-347);
* elements are added in annotation order; consecutive ``list_item``
  elements share one list group, any other label closes it
  (``update_doc_with_gt`` current_list rules,
  doclaynet_v1_builder.py:230-277) — surfaced here as the
  ``n_list_groups`` counter;
* pictures carry no text but an image reference (here the ``media_ref``
  side-table key, per the repo's no-inline-media rule); tables keep
  their joined cell text (the reference's single-cell TableData).

Output row: ``doc_id`` (page hash), canonical ``spans`` (kind = label,
offset = annotation order), ``boxes`` (bottom-left-origin ltrb, one per
span), counters, ``status``.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT

#: doclaynet_v1_builder.py:144-156
CATEGORY_MAP = {
    1: "caption",
    2: "footnote",
    3: "formula",
    4: "list_item",
    5: "page_footer",
    6: "page_header",
    7: "picture",
    8: "section_header",
    9: "table",
    10: "text",
    11: "title",
}

BOX_STRUCT = pa.struct(
    [
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
    ]
)

DOCLAYNET_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("boxes", pa.list_(BOX_STRUCT)),
        pa.field("n_elements", pa.int32()),
        pa.field("n_list_groups", pa.int32()),
        pa.field("status", pa.string()),
    ]
)

SAMPLE_DIR = str(
    Path(__file__).resolve().parents[2] / "tests/data/doclaynet_sample"
)

#: page hashes excluded up front (doclaynet_v1_builder.py:317-320);
#: the committed sample includes one to exercise the skip
BLACKLISTED_PAGE_HASHES = frozenset({"page-blacklisted-0001"})


def _ltwh_to_ltrb(box: list[float]) -> tuple[float, float, float, float]:
    l, t, w, h = box
    return (l, t, l + w, t + h)


def build_doclaynet_record(data: dict) -> dict:
    """One page-annotation dict → canonical GT row (pure kernel)."""
    page_hash = data["metadata"]["page_hash"]
    height = float(data["image"]["height"])
    labels = [CATEGORY_MAP[int(c)] for c in data["category_id"]]
    contents = [
        " ".join(cell["text"] for cell in cells)
        for cells in data["pdf_cells"]
    ]
    spans, boxes = [], []
    n_list_groups = 0
    in_list = False
    for i, (label, box, content) in enumerate(
        zip(labels, data["bboxes"], contents)
    ):
        if label == "list_item":
            if not in_list:
                n_list_groups += 1
                in_list = True
        else:
            in_list = False
        l, t, r, b = _ltwh_to_ltrb([float(v) for v in box])
        # top-left → bottom-left origin (y flips against page height)
        boxes.append({"l": l, "t": height - t, "r": r, "b": height - b})
        spans.append(
            {
                "kind": label,
                "text": "" if label == "picture" else content,
                "media_ref": (
                    f"img/{page_hash}/{i}" if label == "picture" else ""
                ),
                "offset": i,
            }
        )
    return {
        "doc_id": page_hash,
        "spans": spans,
        "boxes": boxes,
        "n_elements": len(spans),
        "n_list_groups": n_list_groups,
        "status": "ok",
    }


def build_doclaynet_gt(root: str, *,
                       blacklist: frozenset = BLACKLISTED_PAGE_HASHES):
    """Annotation folder → Dataset(DOCLAYNET_GT_SCHEMA)."""
    import ray.data as rd

    paths = sorted(str(p) for p in Path(root).glob("*.json"))
    ds = rd.read_binary_files(paths, include_paths=True)

    def build(t: pa.Table) -> pa.Table:
        rows = []
        for p, raw in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            try:
                data = json.loads(raw)
                if data["metadata"]["page_hash"] in blacklist:
                    continue  # doclaynet_v1_builder.py:317-320
                rows.append(build_doclaynet_record(data))
            except Exception as e:  # per-doc skip-and-count
                rows.append(
                    {
                        "doc_id": Path(p).stem,
                        "spans": [],
                        "boxes": [],
                        "n_elements": 0,
                        "n_list_groups": 0,
                        "status": f"error: {type(e).__name__}",
                    }
                )
        return pa.Table.from_pylist(rows, schema=DOCLAYNET_GT_SCHEMA)

    return ds.map_batches(build, batch_format="pyarrow")


def doclaynet_gt_build(sf_dir: str = ""):
    """Driver query over the committed raw sample (``sf_dir`` unused —
    the input is the raw benchmark sample, as for the other builders)."""
    return build_doclaynet_gt(SAMPLE_DIR)


DOCLAYNET_FLAT_SCHEMA = pa.schema(
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
        pa.field("n_list_groups", pa.int64()),
    ]
)


def doclaynet_gt_flat(sf_dir: str = ""):
    """Hash-oracled flat view of ``doclaynet_gt_build``: one row per
    element with the flipped-origin bbox (rounded 6) and the per-doc
    counters. The DuckDB oracle re-derives the category map, blacklist
    + bad-category skips, ltwh→ltrb + origin flip, pdf_cells text join
    and the consecutive-list-group count from the committed raw JSONs
    (error-status docs contribute zero flat rows on both sides)."""
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
                        "n_list_groups": r["n_list_groups"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=DOCLAYNET_FLAT_SCHEMA)

    return build_doclaynet_gt(SAMPLE_DIR).map_batches(
        explode, batch_format="pyarrow"
    )

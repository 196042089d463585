"""Deterministic synthesis of the FIXTURES.md F3-F7 schemas.

Each generator is a pure function of the seed row ids (seed=42
convention), produces EXACTLY the documented schema, and has a consuming
evaluator pipeline in ``pipelines.fixture_eval`` with known-answer
behavior:

  F3 layout_boxes     (doc_id, page_no, gt_boxes, pred_boxes)
  F4 tables_otsl_html (doc_id, table_id, gt_html, pred_html, gt_otsl,
                       n_rows, n_cols, is_complex)
  F5 ocr_pages        (doc_id, page_no, cells, pred_cells)
  F6 kv_graph         (doc_id, cells, links)
  F7 reading_order    (doc_id, page_no, elements, perm)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BOX = [
    ("l", pa.float32()), ("t", pa.float32()),
    ("r", pa.float32()), ("b", pa.float32()),
]

F3_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("gt_boxes", pa.list_(pa.struct(_BOX + [("label", pa.string())]))),
    ("pred_boxes", pa.list_(pa.struct(
        _BOX + [("label", pa.string()), ("score", pa.float32())]))),
])

F4_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("table_id", pa.int32()),
    ("gt_html", pa.string()),
    ("pred_html", pa.string()),
    ("gt_otsl", pa.string()),
    ("n_rows", pa.int32()),
    ("n_cols", pa.int32()),
    ("is_complex", pa.bool_()),
])

F5_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("cells", pa.list_(pa.struct(
        _BOX + [("text", pa.string()), ("confidence", pa.float32())]))),
    ("pred_cells", pa.list_(pa.struct(
        _BOX + [("text", pa.string()), ("confidence", pa.float32())]))),
])

F6_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("cells", pa.list_(pa.struct(
        [("cell_id", pa.int32()), ("text", pa.string())] + _BOX))),
    ("links", pa.list_(pa.struct(
        [("source", pa.int32()), ("target", pa.int32())]))),
])

F7_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page_no", pa.int32()),
    ("elements", pa.list_(pa.struct(
        _BOX + [("label", pa.string()), ("true_order", pa.int32())]))),
    ("perm", pa.list_(pa.int32())),
])

_LABELS = ("text", "section_header", "table", "picture", "list_item")


def _det_rng(i: int, salt: int) -> np.random.Generator:
    # hash() is salted per process — use an explicit mix instead
    return np.random.default_rng((i * 1_000_003 + salt * 7919 + 42) % (2**31))


def layout_boxes_fixture(n_docs: int = 60) -> pa.Table:
    """F3: identical boxes (mAP=1) for i%3==0, shifted at fixed IoU for
    i%3==1, label-mismatched for i%3==2; doc 0 has empty pred."""
    rows = []
    for i in range(n_docs):
        rng = _det_rng(i, 3)
        n = int(rng.integers(2, 8))
        gt = []
        for k in range(n):
            l = float(5 + (k % 2) * 50)
            t = float(5 + (k // 2) * 12)
            gt.append({"l": l, "t": t, "r": l + 40.0, "b": t + 10.0,
                       "label": _LABELS[k % len(_LABELS)]})
        mode = i % 3
        pred = []
        if i != 0:
            for k, g in enumerate(gt):
                p = dict(g)
                if mode == 1:
                    p = {**p, "l": p["l"] + 2.0, "r": p["r"] + 2.0}
                elif mode == 2 and k == 0:
                    p = {**p, "label": _LABELS[(k + 1) % len(_LABELS)]}
                p["score"] = float(0.95 - 0.05 * k)
                pred.append(p)
        rows.append({"doc_id": f"doc-{i:06d}", "page_no": 1,
                     "gt_boxes": gt, "pred_boxes": pred})
    return pa.Table.from_pylist(rows, schema=F3_SCHEMA)


def tables_otsl_html_fixture(n_tables: int = 40) -> pa.Table:
    """F4: simple + rowspan/colspan grids with matching OTSL strings;
    i%4==1 gets a single-cell text edit in pred."""
    from ..functions.tables import cells_to_html, grid_shape, parse_otsl

    rows = []
    for i in range(n_tables):
        n_r = 2 + i % 3
        n_c = 2 + (i // 3) % 2
        complex_ = i % 5 == 0
        otsl_rows = []
        for r in range(n_r):
            toks = []
            c = 0
            while c < n_c:
                if complex_ and r == 0 and c == 0:
                    toks += ["fcel", "lcel"]
                    c += 2
                else:
                    toks.append("ched" if r == 0 else "fcel")
                    c += 1
            otsl_rows.append(" ".join(toks))
        otsl = " nl ".join(otsl_rows) + " nl"
        cells = parse_otsl(otsl)
        # give cells deterministic text
        for k, cell in enumerate(cells):
            cell.text = f"t{i}c{k}" if cell.text else ""
        gt_html = cells_to_html(cells)
        pred_html = (
            gt_html.replace(f"t{i}c1", f"t{i}c1x", 1) if i % 4 == 1
            else gt_html
        )
        gr, gc = grid_shape(cells)
        rows.append(
            {"doc_id": f"doc-{i:06d}", "table_id": i, "gt_html": gt_html,
             "pred_html": pred_html, "gt_otsl": otsl, "n_rows": gr,
             "n_cols": gc, "is_complex": complex_}
        )
    return pa.Table.from_pylist(rows, schema=F4_SCHEMA)


def ocr_pages_fixture(n_pages: int = 50) -> pa.Table:
    """F5: identical text (CER=0) for i%3==0, a one-char edit for i%3==1,
    missing pred page (CER=1) for i%3==2."""
    rows = []
    for i in range(n_pages):
        rng = _det_rng(i, 5)
        n = int(rng.integers(2, 6))
        cells = []
        for k in range(n):
            cells.append(
                {"l": 5.0, "t": 5.0 + 12 * k, "r": 90.0, "b": 14.0 + 12 * k,
                 "text": f"line {i} {k} content", "confidence": 0.98}
            )
        mode = i % 3
        if mode == 0:
            pred = [dict(c) for c in cells]
        elif mode == 1:
            pred = [dict(c) for c in cells]
            pred[0] = {**pred[0], "text": pred[0]["text"].replace("o", "0")}
        else:
            pred = []
        rows.append({"doc_id": f"doc-{i:06d}", "page_no": 1,
                     "cells": cells, "pred_cells": pred})
    return pa.Table.from_pylist(rows, schema=F5_SCHEMA)


def kv_graph_fixture(n_docs: int = 40) -> pa.Table:
    """F6: one case per classify_cells rule per doc (leaf→VALUE,
    source-only→KEY, mid-with-leaf-children→KEY, else UNSPECIFIED)."""
    rows = []
    for i in range(n_docs):
        cells = [
            {"cell_id": k, "text": f"c{k}", "l": 1.0 * k, "t": 0.0,
             "r": 1.0 * k + 1, "b": 1.0} for k in range(5)
        ]
        # 0→1 (key→value), 2→3→4 (key→unspec? 3 has child 4 which is
        # leaf → 3 is KEY; 2 is source-only KEY)
        links = [{"source": 0, "target": 1}, {"source": 2, "target": 3},
                 {"source": 3, "target": 4}]
        if i % 2 == 1:
            # add a deeper chain making a mid node UNSPECIFIED
            cells.append({"cell_id": 5, "text": "c5", "l": 5.0, "t": 0.0,
                          "r": 6.0, "b": 1.0})
            links.append({"source": 4, "target": 5})
        rows.append({"doc_id": f"doc-{i:06d}", "cells": cells,
                     "links": links})
    return pa.Table.from_pylist(rows, schema=F6_SCHEMA)


def reading_order_fixture(n_docs: int = 50) -> pa.Table:
    """F7: column-major elements with true_order + a seeded permutation;
    ARD of a perfect reconstruction = 1.0."""
    from ..functions.reading_order import column_major_boxes

    rows = []
    for i in range(n_docs):
        rng = _det_rng(i, 7)
        n = int(rng.integers(4, 12))
        boxes = column_major_boxes(n)
        elements = [
            {"l": float(b[0]), "t": float(b[1]), "r": float(b[2]),
             "b": float(b[3]), "label": _LABELS[k % len(_LABELS)],
             "true_order": k}
            for k, b in enumerate(boxes)
        ]
        perm = rng.permutation(n).astype(np.int32).tolist()
        rows.append({"doc_id": f"doc-{i:06d}", "page_no": 1,
                     "elements": elements, "perm": perm})
    return pa.Table.from_pylist(rows, schema=F7_SCHEMA)

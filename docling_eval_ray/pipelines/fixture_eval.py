"""Evaluators over the F3-F7 fixture schemas (sources.fixtures).

These consume EXACTLY the FIXTURES.md shapes — the contract a driver- or
user-synthesized fixture table would arrive in — and run the same metric
kernels as the document-level evaluators. Registered as rows-only
queries (fixtures are self-generated; known-answer behavior is asserted
in tests)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.graphs import classify_cells
from ..functions.layout import image_map
from ..functions.tables import parse_otsl, teds
from ..functions.textmetrics import cer
from ..sources.fixtures import (
    kv_graph_fixture,
    layout_boxes_fixture,
    ocr_pages_fixture,
    reading_order_fixture,
    tables_otsl_html_fixture,
)


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def fixture_layout_eval(sf_dir: str = ""):
    """F3 → per-image mAP (normalized ltrb boxes, labels, scores)."""

    def metric(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            gt = r["gt_boxes"]
            pred = r["pred_boxes"]
            gt_b = np.array([[b["l"], b["t"], b["r"], b["b"]] for b in gt])
            gt_l = np.array([b["label"] for b in gt])
            if pred:
                p_b = np.array(
                    [[b["l"], b["t"], b["r"], b["b"]] for b in pred]
                )
                p_l = np.array([b["label"] for b in pred])
                p_s = np.array([b["score"] for b in pred])
            else:
                p_b = np.zeros((0, 4))
                p_l = np.array([])
                p_s = np.array([])
            m = image_map(gt_b, gt_l, p_b, p_l, p_s)
            rows.append(
                {"doc_id": r["doc_id"],
                 "image_map": round(float(m), 6) if not np.isnan(m) else None}
            )
        return pa.Table.from_pylist(rows)

    return _ds(layout_boxes_fixture()).map_batches(
        metric, batch_format="pyarrow"
    )


def fixture_table_eval(sf_dir: str = ""):
    """F4 → TEDS struct/struct+text + OTSL↔HTML structural cross-check
    (the OTSL parse of gt_otsl must TEDS-match gt_html at 1.0)."""
    from ..functions.tables import cells_to_html

    def metric(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            otsl_cells = parse_otsl(r["gt_otsl"])
            otsl_html = cells_to_html(otsl_cells)
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "table_id": r["table_id"],
                    "teds_struct": round(
                        teds(r["gt_html"], r["pred_html"],
                             structure_only=True), 6),
                    "teds": round(
                        teds(r["gt_html"], r["pred_html"]), 6),
                    "otsl_html_struct_match": round(
                        teds(r["gt_html"], otsl_html,
                             structure_only=True), 6),
                    "is_complex": r["is_complex"],
                }
            )
        return pa.Table.from_pylist(rows)

    return _ds(tables_otsl_html_fixture()).map_batches(
        metric, batch_format="pyarrow"
    )


def fixture_ocr_eval(sf_dir: str = ""):
    """F5 → CER over concatenated cell text (missing page → CER 1.0,
    reference ocr_evaluator.py:108-113)."""

    def metric(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            gt_text = " ".join(c["text"] for c in r["cells"])
            pred_text = " ".join(c["text"] for c in r["pred_cells"])
            c = cer(gt_text, pred_text)
            rows.append(
                {"doc_id": r["doc_id"], "cer": round(c, 6),
                 "char_accuracy": round(1 - c, 6)}
            )
        return pa.Table.from_pylist(rows)

    return _ds(ocr_pages_fixture()).map_batches(metric, batch_format="pyarrow")


def fixture_kv_eval(sf_dir: str = ""):
    """F6 → degree-rule labels per cell (exploded rows)."""

    def metric(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            ids = [c["cell_id"] for c in r["cells"]]
            links = [(l["source"], l["target"]) for l in r["links"]]
            labels = classify_cells(ids, links)
            for cid in ids:
                rows.append(
                    {"doc_id": r["doc_id"], "cell_id": cid,
                     "label": labels[cid]}
                )
        return pa.Table.from_pylist(rows)

    return _ds(kv_graph_fixture()).map_batches(metric, batch_format="pyarrow")


def fixture_reading_order_eval(sf_dir: str = ""):
    """F7 → apply the seeded permutation, reconstruct with XY-cut, score
    ARD_norm against true_order (expected 1.0 on column layouts)."""

    from ..functions.reading_order import score_reconstruction

    def metric(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            els = sorted(r["elements"], key=lambda e: e["true_order"])
            boxes = np.array([[e["l"], e["t"], e["r"], e["b"]] for e in els])
            perm = np.array(r["perm"])
            ard = score_reconstruction(boxes, perm)
            rows.append({"doc_id": r["doc_id"], "ard_norm": round(ard, 6)})
        return pa.Table.from_pylist(rows)

    return _ds(reading_order_fixture()).map_batches(
        metric, batch_format="pyarrow"
    )

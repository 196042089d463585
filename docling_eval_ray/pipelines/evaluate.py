"""Evaluator pipelines — the Ray rebuild of the reference's `evaluate`
lifecycle (cli/main.py:406-531): read eval records → status filter →
per-row metric map_batches → stats aggregate.

Ground-truth/prediction pairs are synthesized deterministically from the
flagship extraction output (the F2 fixture shape): per ``doc_id % 10``
the prediction is mutated in a controlled way so every metric has known
expected behavior —

    0 → drop one middle span          (recall loss)
    1 → swap two adjacent spans       (reading-order error)
    2 → edit one span's text          (text/CER error)
    3 → prediction missing            (status=failure: filtered + counted,
                                       reference base_evaluator.py:95-98)
    else → identical                  (metric == perfect)

Per-row failures stay rows with a ``status`` column (skip-and-count,
base_prediction_provider.py:366-376); the evaluators filter and count
them exactly like the reference's rejection counters (G9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT
from ..functions.geometry import pivot_iou_mapping
from ..functions.layout import (
    ap_from_pooled_masks,
    detection_tp_masks,
    image_map,
)
from ..functions.spans import spans_to_markdown
from ..functions.tables import grid_shape, parse_html_table, teds
from ..functions.textmetrics import ard_norm, cer, text_metrics
from .flagship import flagship

# NOTE the breadth of module-scope imports above: the *_metric fns in
# this module are passed to map_batches DIRECTLY (they run on workers),
# so any relative import inside them would die on workers that can't
# import the repo path — module globals ship by value, runtime imports
# don't (the cloudpickle-by-value invariant in __init__.py).

# ---------------------------------------------------------------------------
# fixture synthesis (F2): gt_spans + pred_spans + status
# ---------------------------------------------------------------------------


def _mutate(spans: list[dict], mode: int) -> list[dict]:
    out = [dict(s) for s in spans]
    if mode == 0 and len(out) > 2:
        del out[len(out) // 2]
    elif mode == 1 and len(out) > 2:
        i = len(out) // 3
        out[i], out[i + 1] = out[i + 1], out[i]
    elif mode == 2 and out:
        i = len(out) // 2
        out[i] = {**out[i], "text": out[i]["text"] + " xq"}
    for k, s in enumerate(out):
        s["offset"] = k
    return out


#: explicit schema: a failure-only batch would otherwise infer
#: pred_spans as list<null> (Table.from_pylist) and split the dataset
#: into incompatible block schemas
_EVAL_SCHEMA = None


def _eval_schema() -> pa.Schema:
    global _EVAL_SCHEMA
    if _EVAL_SCHEMA is None:
        _EVAL_SCHEMA = pa.schema(
            [
                pa.field("doc_id", pa.string()),
                pa.field("gt_spans", pa.list_(SPAN_STRUCT)),
                pa.field("pred_spans", pa.list_(SPAN_STRUCT)),
                pa.field("status", pa.string()),
            ]
        )
    return _EVAL_SCHEMA


def eval_records(sf_dir: str):
    """documents → (doc_id, gt_spans, pred_spans, status) eval table.

    The drop/swap/edit mutations are expressed on the FLATTENED span
    arrays (take-index arithmetic over ``ListArray.flatten`` +
    per-row offsets, the same pattern as stages/extract.py) — no
    per-row Python dict rebuilding on this widest-path stage. ``_mutate``
    above remains the row-level specification; a property test asserts
    the vectorized form matches it."""
    import pyarrow.compute as pc

    gt = flagship(sf_dir)

    def derive(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0)
        n_rows = len(spans)
        flat = spans.flatten()

        doc_num = (
            pc.cast(pc.list_element(pc.split_pattern(t["doc_id"], "-"), 1),
                    pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        mode = doc_num % 10
        L = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(L, out=starts[1:])

        out_len = L.copy()
        out_len[(mode == 0) & (L > 2)] -= 1
        out_len[mode == 3] = 0
        new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(out_len, out=new_offsets[1:])
        total = int(new_offsets[-1])

        row = np.repeat(np.arange(n_rows), out_len)
        j = np.arange(total, dtype=np.int64) - np.repeat(
            new_offsets[:-1], out_len
        )
        take_idx = starts[row] + j

        # mode 0: drop the middle span — indices past it shift right
        drop_rows = (mode == 0) & (L > 2)
        take_idx += ((drop_rows[row]) & (j >= (L[row] // 2))).astype(np.int64)
        # mode 1: swap adjacent spans at L//3
        swap_rows = (mode == 1) & (L > 2)
        swap_pos = L[row] // 3
        take_idx += (swap_rows[row] & (j == swap_pos)).astype(np.int64)
        take_idx -= (swap_rows[row] & (j == swap_pos + 1)).astype(np.int64)
        # mode 2: text edit at the middle span (index unchanged)
        edit_mask = (mode == 2)[row] & (j == (L[row] // 2)) & (L[row] > 0)

        taken_kind = flat.field("kind").take(pa.array(take_idx))
        taken_text = flat.field("text").take(pa.array(take_idx))
        taken_media = flat.field("media_ref").take(pa.array(take_idx))
        if edit_mask.any():
            taken_text = pc.if_else(
                pa.array(edit_mask),
                pc.binary_join_element_wise(taken_text, "xq", " "),
                taken_text,
            )
        pred_struct = pa.StructArray.from_arrays(
            [taken_kind.combine_chunks()
             if isinstance(taken_kind, pa.ChunkedArray) else taken_kind,
             taken_text.combine_chunks()
             if isinstance(taken_text, pa.ChunkedArray) else taken_text,
             taken_media.combine_chunks()
             if isinstance(taken_media, pa.ChunkedArray) else taken_media,
             pa.array(j.astype(np.int32), pa.int32())],
            fields=list(_eval_schema().field("pred_spans").type.value_type),
        )
        pred_spans = pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32), pa.int32()), pred_struct
        )
        status = pa.array(
            np.where(mode == 3, "failure", "success"), pa.string()
        )
        return pa.Table.from_arrays(
            [t["doc_id"].combine_chunks()
             if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
             spans, pred_spans, status],
            schema=_eval_schema(),
        )

    return gt.map_batches(derive, batch_format="pyarrow")


def _metric_schema(**fields: pa.DataType) -> pa.Schema:
    """Explicit output schema for metric map_batches fns: a batch whose
    rows all filtered out (e.g. every row status=failure) must still
    yield a table with the full column set, or the dataset splits into
    incompatible block schemas (same hazard _eval_schema guards)."""
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


_MARKDOWN_SCHEMA = _metric_schema(
    doc_id=pa.string(), bleu=pa.float64(), f1=pa.float64(),
    precision=pa.float64(), recall=pa.float64(), edit_distance=pa.float64(),
    meteor=pa.float64(),
)
_OCR_SCHEMA = _metric_schema(
    doc_id=pa.string(), cer=pa.float64(), char_accuracy=pa.float64()
)
_RO_SCHEMA = _metric_schema(doc_id=pa.string(), ard_norm=pa.float64())
_LAYOUT_SCHEMA = _metric_schema(doc_id=pa.string(), image_map=pa.float64())
_TABLES_SCHEMA = _metric_schema(
    doc_id=pa.int64(), teds_struct=pa.float64(), teds=pa.float64(),
    is_complex=pa.bool_(), delta_rows=pa.int64(), delta_cols=pa.int64(),
)
_TIMINGS_SCHEMA = _metric_schema(
    doc_id=pa.string(), sec_per_doc=pa.float64(), sec_per_page=pa.float64()
)


def _md(t: pa.Table, col: str) -> list[str]:
    tmp = pa.table({"doc_id": t["doc_id"], "spans": t[col]})
    return spans_to_markdown(tmp)["markdown"].to_pylist()


def _status_filter(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.filter(pc.equal(t["status"], "success"))


# ---------------------------------------------------------------------------
# evaluators (per-doc metric map_batches; M20 family)
# ---------------------------------------------------------------------------


def _markdown_metric(t: pa.Table) -> pa.Table:
    t = _status_filter(t)
    gts = _md(t, "gt_spans")
    preds = _md(t, "pred_spans")
    rows = []
    for did, g, p in zip(t["doc_id"].to_pylist(), gts, preds):
        m = text_metrics(g, p)
        rows.append(
            {
                "doc_id": did,
                "bleu": round(m["bleu"], 6),
                "f1": round(m["f1"], 6),
                "precision": round(m["precision"], 6),
                "recall": round(m["recall"], 6),
                "edit_distance": round(m["edit_distance"], 6),
                "meteor": round(m["meteor"], 6),
            }
        )
    return pa.Table.from_pylist(rows, schema=_MARKDOWN_SCHEMA)


def evaluate_markdown(sf_dir: str, records=None):
    """Markdown text metrics per doc (markdown_text_evaluator analogue):
    bleu / f1 / precision / recall / edit_distance / meteor over the
    span→markdown projection (reference bundle incl. METEOR,
    markdown_text_evaluator.py:203-239)."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_markdown_metric, batch_format="pyarrow")


def _ocr_metric(t: pa.Table) -> pa.Table:
    t = _status_filter(t)
    gts = _md(t, "gt_spans")
    preds = _md(t, "pred_spans")
    rows = []
    for did, g, p in zip(t["doc_id"].to_pylist(), gts, preds):
        c = cer(g, p)
        # np.round (not builtin round): bit-matches DuckDB round_even
        # in last-ulp cases — this evaluator is oracle-gated
        rows.append(
            {
                "doc_id": did,
                "cer": float(np.round(c, 6)),
                "char_accuracy": float(np.round(1.0 - c, 6)),
            }
        )
    return pa.Table.from_pylist(rows, schema=_OCR_SCHEMA)


def evaluate_ocr(sf_dir: str, records=None):
    """Character error rate per doc (ocr_evaluator analogue); missing
    prediction text → CER 1.0."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_ocr_metric, batch_format="pyarrow")


def _ro_metric(t: pa.Table) -> pa.Table:
    t = _status_filter(t)
    rows = []
    from collections import defaultdict, deque

    for r in t.to_pylist():
        gt, pred = r["gt_spans"], r["pred_spans"]
        key = lambda s: (s["kind"], s["text"], s["media_ref"])
        # positional alignment: duplicate spans match in order (a
        # plain dict would collapse duplicates onto one index)
        pred_pos = defaultdict(deque)
        for i, s in enumerate(pred):
            pred_pos[key(s)].append(i)
        order = [
            pred_pos[key(s)].popleft() if pred_pos[key(s)] else i
            for i, s in enumerate(gt)
        ]
        ard, _ = ard_norm(order)
        # np.round: oracle-gated (see evaluate_ocr note)
        rows.append(
            {"doc_id": r["doc_id"], "ard_norm": float(np.round(ard, 6))}
        )
    return pa.Table.from_pylist(rows, schema=_RO_SCHEMA)


def evaluate_reading_order(sf_dir: str, records=None):
    """ARD_norm per doc (readingorder_evaluator analogue): the predicted
    order is where each GT span ended up in the prediction (matched on
    (kind, text, media_ref); unmatched spans keep their GT position)."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_ro_metric, batch_format="pyarrow")


def rejection_counts(sf_dir: str):
    """Status / rejection counters (G9, base_evaluator.py:95-98):
    grouped count over the status column — SQL-oracle-able because the
    failure rule is doc_id % 10 == 3."""
    from ray.data.aggregate import Sum

    ds = eval_records(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t["status"])
        return pa.table(
            {
                "status": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Sum("n", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# layout evaluation over synthesized boxes (F3)
# ---------------------------------------------------------------------------


def _pred_shift(doc_num: int) -> float:
    """Prediction-box jitter for mutated docs — the ONE definition of
    the rule (the layout oracle's analytic 0.3 expectation and the
    comparison-HTML overlays both depend on it)."""
    return 2.0 if doc_num % 10 in (0, 1, 2) else 0.0


def _doc_boxes(doc_num: int, n_spans: int):
    """Deterministic page layout for a doc: one box per span on a
    100×100 page, two columns."""
    boxes = []
    for i in range(n_spans):
        col = i % 2
        row = i // 2
        l = 5.0 + col * 50.0
        t = 5.0 + row * 12.0
        boxes.append([l, t, l + 40.0, t + 10.0])
    return np.array(boxes, dtype=np.float64)


def _layout_metric(t: pa.Table) -> pa.Table:
    t = _status_filter(t)
    rows = []
    for r in t.to_pylist():
        doc_num = int(r["doc_id"].split("-")[1])
        gt_spans = r["gt_spans"]
        n = len(gt_spans)
        if n == 0:
            continue
        gt_boxes = _doc_boxes(doc_num, n)
        gt_labels = np.array([s["kind"] for s in gt_spans])
        shift = _pred_shift(doc_num)
        pred_boxes = gt_boxes + shift
        pred_labels = gt_labels.copy()
        scores = np.linspace(0.95, 0.5, n)
        m = image_map(gt_boxes, gt_labels, pred_boxes, pred_labels,
                      scores)
        rows.append(
            {"doc_id": r["doc_id"],
             "image_map": float(np.round(m, 6))
             if not np.isnan(m) else None}
        )
    return pa.Table.from_pylist(rows, schema=_LAYOUT_SCHEMA)


def evaluate_layout(sf_dir: str, records=None):
    """Per-image mAP[0.5:0.95] (layout_evaluator M20/G3 analogue) over
    deterministic per-doc box layouts; prediction boxes are jittered for
    mutated docs (shift → lower IoU)."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_layout_metric, batch_format="pyarrow")


_BBOX_TEXT_SCHEMA = None


def _bbox_text_metric(t: pa.Table) -> pa.Table:
    global _BBOX_TEXT_SCHEMA
    if _BBOX_TEXT_SCHEMA is None:
        _BBOX_TEXT_SCHEMA = _metric_schema(
            doc_id=pa.string(), match_idx=pa.int32(), n_true=pa.int64(),
            n_pred=pa.int64(), is_orphan=pa.bool_(), bleu=pa.float64(),
            f1=pa.float64(), precision=pa.float64(), recall=pa.float64(),
            edit_distance=pa.float64(), meteor=pa.float64(),
        )
    schema = _BBOX_TEXT_SCHEMA
    t = _status_filter(t)
    rows = []
    for r in t.to_pylist():
        doc_num = int(r["doc_id"].split("-")[1])
        gt = [s for s in r["gt_spans"] if s["text"]]
        pred = [s for s in r["pred_spans"] if s["text"]]
        shift = _pred_shift(doc_num)
        gt_boxes = _doc_boxes(doc_num, len(gt))
        pred_boxes = _doc_boxes(doc_num, len(pred)) + shift
        pivot_is_true, mappings, orphans = pivot_iou_mapping(
            gt_boxes, pred_boxes
        )
        texts_piv = gt if pivot_is_true else pred
        texts_oth = pred if pivot_is_true else gt
        match_idx = 0
        for pid, oids in mappings.items():
            piv_txt = texts_piv[pid]["text"]
            oth_txt = " ".join(texts_oth[o]["text"] for o in oids)
            true_txt = piv_txt if pivot_is_true else oth_txt
            pred_txt = oth_txt if pivot_is_true else piv_txt
            m = text_metrics(true_txt, pred_txt)
            rows.append(
                {
                    "doc_id": r["doc_id"], "match_idx": match_idx,
                    "n_true": 1 if pivot_is_true else len(oids),
                    "n_pred": len(oids) if pivot_is_true else 1,
                    "is_orphan": False,
                    **{k: round(m[k], 6)
                       for k in ("bleu", "f1", "precision", "recall",
                                 "edit_distance", "meteor")},
                }
            )
            match_idx += 1
        for tid in orphans:
            m = text_metrics(gt[tid]["text"], "")
            rows.append(
                {
                    "doc_id": r["doc_id"], "match_idx": match_idx,
                    "n_true": 1, "n_pred": 0, "is_orphan": True,
                    **{k: round(m[k], 6)
                       for k in ("bleu", "f1", "precision", "recall",
                                 "edit_distance", "meteor")},
                }
            )
            match_idx += 1
    return pa.Table.from_pylist(rows, schema=schema)


def evaluate_bbox_text(sf_dir: str, records=None):
    """Matched-bbox text evaluation (reference
    bbox_text_evaluator.py:100-327): per doc, text-bearing GT and pred
    spans get deterministic page boxes; the fewer-box side pivots, every
    other-side box maps to its max-IoU pivot box, orphan TRUE boxes
    become empty-prediction matches; each match scores the full text
    metric bundle (bleu/f1/precision/recall/edit_distance/meteor,
    None→0). One output row per match."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_bbox_text_metric, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# table evaluation (F4): OTSL/HTML fixtures → TEDS
# ---------------------------------------------------------------------------


def _doc_table_html(doc_num: int) -> tuple[str, str, bool]:
    """Deterministic (gt_html, pred_html, is_complex) per doc."""
    n_rows = 2 + doc_num % 3
    n_cols = 2 + (doc_num // 3) % 3
    complex_ = doc_num % 4 == 0

    def cell(r, c):
        return f"c{doc_num % 7}r{r}c{c}"

    rows = []
    for r in range(n_rows):
        tds = []
        c = 0
        while c < n_cols:
            if complex_ and r == 0 and c == 0:
                tds.append(f'<td colspan="2">{cell(r, c)}</td>')
                c += 2
            else:
                tds.append(f"<td>{cell(r, c)}</td>")
                c += 1
        rows.append("<tr>" + "".join(tds) + "</tr>")
    gt = "<table>" + "".join(rows) + "</table>"
    if doc_num % 10 == 2:
        pred = gt.replace(cell(1, 1), cell(1, 1) + "x", 1)
    elif doc_num % 10 == 0:
        pred = gt.replace(f"<td>{cell(n_rows - 1, n_cols - 1)}</td>", "", 1)
    else:
        pred = gt
    return gt, pred, complex_


def _tables_metric(t: pa.Table) -> pa.Table:
    rows = []
    for doc_num in t["doc_id"].to_pylist():
        gt, pred, complex_ = _doc_table_html(int(doc_num))
        g_cells = parse_html_table(gt)
        p_cells = parse_html_table(pred)
        gr, gc = grid_shape(g_cells)
        pr, pc_ = grid_shape(p_cells)
        rows.append(
            {
                "doc_id": int(doc_num),
                "teds_struct": round(
                    teds(gt, pred, structure_only=True), 6
                ),
                "teds": round(teds(gt, pred, structure_only=False), 6),
                "is_complex": bool(complex_),
                "delta_rows": gr - pr,
                "delta_cols": gc - pc_,
            }
        )
    return pa.Table.from_pylist(rows, schema=_TABLES_SCHEMA)


def evaluate_tables(sf_dir: str):
    """TEDS per synthesized table, struct-only and struct+text, plus the
    complexity split key (table_evaluator G7) and row/col deltas (G8)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(_tables_metric, batch_format="pyarrow")


def _timings_metric(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    t = _status_filter(t)
    doc_num = (
        pc.cast(pc.list_element(pc.split_pattern(t["doc_id"], "-"), 1),
                pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    n = np.maximum(
        1,
        pc.list_value_length(t["gt_spans"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64),
    )
    n_pages = 1 + n // 12
    total = np.round(0.01 * n + 0.005 * (doc_num % 7), 6)
    return pa.Table.from_arrays(
        [
            t["doc_id"].combine_chunks()
            if isinstance(t["doc_id"], pa.ChunkedArray)
            else t["doc_id"],
            pa.array(total, pa.float64()),
            pa.array(np.round(total / n_pages, 6), pa.float64()),
        ],
        schema=_TIMINGS_SCHEMA,
    )


def evaluate_timings(sf_dir: str, records=None):
    """Timings evaluator (G6, evaluators/timings_evaluator.py:99-129):
    per-doc pipeline seconds + seconds/page distributions. Timings are
    synthesized deterministically from document size (the reference
    reads docling profiling dicts). Fully vectorized — the metric is
    pure arithmetic over span counts, no row iteration."""
    ds = records if records is not None else eval_records(sf_dir)
    return ds.map_batches(_timings_metric, batch_format="pyarrow")


_CORPUS_MAP_PARTIAL_SCHEMA = None


def corpus_layout_map(sf_dir: str, *, class_shards: int = 1):
    """Corpus-level mAP (G2), distributed per class.

    The reference gathers EVERYTHING into one torchmetrics state
    (layout_evaluator.py:246-266); the distributable decomposition is:
    matching is per-image (row-local), so each row emits only its
    detections' ``(label, score, tp-bitmask-over-IoU-thresholds)``
    triples plus per-class gt-count partials — boxes never leave the
    task. One shuffle keyed on the class label pools each class's
    detections in one task, which sorts by score and computes the AP.
    The driver sees #classes rows. Per-class state is n_detections ×
    16 bytes (documented bound: 10⁸ detections/class ≈ 1.6 GB).

    ``class_shards > 1`` engages the two-level reduce for a
    detection-dominant class: shard tasks pool hash-slices of each
    class's (score, tp) partials in parallel and the per-class root
    merges the pre-pooled runs — identical values (same multiset, same
    deterministic order), with the straggler's sort/match work spread
    across shards."""
    global _CORPUS_MAP_PARTIAL_SCHEMA
    if _CORPUS_MAP_PARTIAL_SCHEMA is None:
        _CORPUS_MAP_PARTIAL_SCHEMA = _metric_schema(
            label=pa.string(), is_det=pa.bool_(), score=pa.float64(),
            mask=pa.int64(), n_gt=pa.int64(), tiebreak=pa.int64(),
        )
    schema = _CORPUS_MAP_PARTIAL_SCHEMA
    ds = eval_records(sf_dir)

    def emit(t: pa.Table) -> pa.Table:
        t = _status_filter(t)
        rows = []
        for r in t.to_pylist():
            doc_num = int(r["doc_id"].split("-")[1])
            n = len(r["gt_spans"])
            if n == 0:
                continue
            gt_boxes = _doc_boxes(doc_num, n)
            labels = np.array([s["kind"] for s in r["gt_spans"]])
            shift = _pred_shift(doc_num)
            pred_boxes = gt_boxes + shift
            scores = np.linspace(0.95, 0.5, n)
            for cls in np.unique(labels):
                m = labels == cls
                sc, masks = detection_tp_masks(
                    gt_boxes[m], pred_boxes[m], scores[m]
                )
                rows.append(
                    {"label": str(cls), "is_det": False, "score": 0.0,
                     "mask": 0, "n_gt": int(m.sum()), "tiebreak": 0}
                )
                for i in range(len(sc)):
                    rows.append(
                        {"label": str(cls), "is_det": True,
                         "score": float(sc[i]), "mask": int(masks[i]),
                         "n_gt": 0,
                         "tiebreak": doc_num * 1000 + i}
                    )
        return pa.Table.from_pylist(rows, schema=schema)

    partials = ds.map_batches(emit, batch_format="pyarrow")

    def per_class_ap(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for label, sub in g.groupby("label", sort=False):
            n_gt = int(sub.loc[~sub["is_det"], "n_gt"].sum())
            det = sub[sub["is_det"]]
            ap = ap_from_pooled_masks(
                det["score"].to_numpy(np.float64),
                det["mask"].to_numpy(np.int64),
                n_gt,
                tiebreak=det["tiebreak"].to_numpy(np.int64),
            )
            out.append({"label": label, "ap": ap})
        return pd.DataFrame(out, columns=["label", "ap"])

    from ..functions.groups import bucketed_group_apply

    if class_shards > 1:
        # two-level pooling for a detection-dominant class: the straggler
        # single per-class task is split into `class_shards` shard tasks
        # that each sort/pool their hash-slice of the class's detections
        # and emit ONE run row (score/mask/tiebreak lists + n_gt
        # partial); the per-class root then reduces pre-pooled runs —
        # the (score, tp) arrays are mergeable, so values are identical
        # to the single-level path (same multiset, same total order).
        import pyarrow.compute as pc

        def add_shard(t: pa.Table) -> pa.Table:
            tb = t["tiebreak"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "shard",
                pa.array((tb % class_shards).astype(np.int64), pa.int64()),
            )

        sharded = partials.map_batches(add_shard, batch_format="pyarrow")

        def shard_pool(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for (label, _s), sub in g.groupby(["label", "shard"],
                                              sort=False):
                det = sub[sub["is_det"]].sort_values(
                    ["score", "tiebreak"], ascending=[False, True],
                    kind="mergesort",
                )
                out.append(
                    {
                        "label": label,
                        "n_gt_part": int(
                            sub.loc[~sub["is_det"], "n_gt"].sum()
                        ),
                        "scores": det["score"].to_numpy(
                            np.float64).tolist(),
                        "masks": det["mask"].to_numpy(np.int64).tolist(),
                        "tiebreaks": det["tiebreak"].to_numpy(
                            np.int64).tolist(),
                    }
                )
            return pd.DataFrame(
                out,
                columns=["label", "n_gt_part", "scores", "masks",
                         "tiebreaks"],
            )

        runs = bucketed_group_apply(
            sharded, ["label", "shard"], shard_pool
        )

        def merge_runs(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for label, sub in g.groupby("label", sort=False):
                n_gt = int(sub["n_gt_part"].sum())
                sc = np.concatenate(
                    [np.asarray(x, np.float64) for x in sub["scores"]]
                ) if len(sub) else np.array([], np.float64)
                mk = np.concatenate(
                    [np.asarray(x, np.int64) for x in sub["masks"]]
                ) if len(sub) else np.array([], np.int64)
                tb = np.concatenate(
                    [np.asarray(x, np.int64) for x in sub["tiebreaks"]]
                ) if len(sub) else np.array([], np.int64)
                ap = ap_from_pooled_masks(sc, mk, n_gt, tiebreak=tb)
                out.append({"label": label, "ap": ap})
            return pd.DataFrame(out, columns=["label", "ap"])

        per_class = bucketed_group_apply(
            runs, ["label"], merge_runs
        ).take_all()  # #classes rows — tiny by construction
    else:
        per_class = bucketed_group_apply(
            partials, ["label"], per_class_ap
        ).take_all()  # #classes rows — tiny by construction
    vals = [r["ap"] for r in per_class if not np.isnan(r["ap"])]
    rows = [
        {"label": "__overall__",
         "ap": round(float(np.mean(vals)), 6) if vals else None}
    ] + [
        {"label": r["label"], "ap": round(float(r["ap"]), 6)}
        for r in sorted(per_class, key=lambda r: r["label"])
        if not np.isnan(r["ap"])
    ]
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("label", pa.string()), ("ap", pa.float64())])
    )


# ---------------------------------------------------------------------------
# consolidation (G10/J5): tiny driver-side matrix over the aggregates
# ---------------------------------------------------------------------------


def evaluation_summary(sf_dir: str) -> pd.DataFrame:
    """The consolidation matrix (aggregations/consolidator.py analogue):
    one row per (modality, metric) with the corpus mean.

    Single-pass shape: the metric kernels are all row-local, so ONE
    ``map_batches`` over the STREAMING eval-records output runs every
    records-based modality on each batch and emits tiny
    (modality, metric, sum, n) partial rows — the records table is never
    materialized (the round-2 build held it corpus-sized in the object
    store to share across seven separate passes). The tables modality
    reads its own source and emits the same partial shape; one
    |modalities×metrics|-row groupby merges everything, and only that
    pivot reaches the driver."""
    import pyarrow.compute as pc

    from ..functions.groups import final_groupby_sum

    def _partial_rows(mt: pa.Table, modality: str, cols: list[str]):
        mods, mets, ss, ns = [], [], [], []
        for c in cols:
            arr = pc.cast(mt[c], pa.float64())
            s = pc.sum(arr)  # null-skipping
            n = pc.count(arr, mode="only_valid")
            mods.append(modality)
            mets.append(c)
            ss.append(float(s.as_py()) if s.is_valid else 0.0)
            ns.append(int(n.as_py()))
        return mods, mets, ss, ns

    def fused(t: pa.Table) -> pa.Table:
        mods, mets, ss, ns = [], [], [], []
        for modality, fn, cols in _SUMMARY_RECORD_MODALITIES:
            m, k, s, n = _partial_rows(fn(t), modality, cols)
            mods += m; mets += k; ss += s; ns += n
        return pa.table(
            {
                "modality": pa.array(mods, pa.string()),
                "metric": pa.array(mets, pa.string()),
                "s": pa.array(ss, pa.float64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    def tables_partial(t: pa.Table) -> pa.Table:
        mods, mets, ss, ns = _partial_rows(
            _tables_metric(t), "tables", ["teds_struct", "teds"]
        )
        return pa.table(
            {
                "modality": pa.array(mods, pa.string()),
                "metric": pa.array(mets, pa.string()),
                "s": pa.array(ss, pa.float64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    import ray.data as rd

    # batch per BLOCK (batch_size=None): Ray's 1024-row default would
    # coalesce the read's split blocks into ~5 fat tasks and serialize
    # the metric CPU (TEDS + per-doc text metrics dominate this op —
    # 16.8 s -> ~4 s at sf0.1/32 CPUs with per-block tasks)
    rec_partials = eval_records(sf_dir).map_batches(
        fused, batch_format="pyarrow", batch_size=None
    )
    # split the single-row-group fixture read: the tables modality pays
    # two TEDS computations per doc, and one block = ONE serial task
    # doing all of them (the op's critical path before this fix)
    from ..sources.interleaved import synth_read_blocks

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        override_num_blocks=synth_read_blocks(sf_dir,
                                              docs_per_block=128),
    )
    tab_partials = docs.map_batches(tables_partial, batch_format="pyarrow",
                                    batch_size=None)
    final = final_groupby_sum(
        rec_partials.union(tab_partials), ["modality", "metric"], ["s", "n"]
    ).to_pandas()  # |modality × metric| rows — driver-sized by construction
    final["mean"] = [
        round(s / n, 6) if n else float("nan")
        for s, n in zip(final["s"], final["n"])
    ]
    return (
        final[["modality", "metric", "mean", "n"]]
        .sort_values(["modality", "metric"])
        .reset_index(drop=True)
    )


#: records-based modalities fused into the single summary pass
#: (tables reads its own source; see evaluation_summary)
_SUMMARY_RECORD_MODALITIES = [
    ("markdown", _markdown_metric,
     ["bleu", "f1", "precision", "recall", "edit_distance", "meteor"]),
    ("ocr", _ocr_metric, ["cer", "char_accuracy"]),
    ("reading_order", _ro_metric, ["ard_norm"]),
    ("layout", _layout_metric, ["image_map"]),
    ("timings", _timings_metric, ["sec_per_doc", "sec_per_page"]),
    ("bbox_text", _bbox_text_metric, ["bleu", "f1", "meteor"]),
]

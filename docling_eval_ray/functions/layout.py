"""Layout detection metrics: COCO-style average precision (numpy).

Reference computes corpus + per-image mAP[0.5:0.95] with torchmetrics
``MeanAveragePrecision`` (layout_evaluator.py:246-349). This is a
from-scratch numpy implementation of the same public COCO protocol:
per-class greedy score-ordered matching at IoU thresholds
0.50:0.05:0.95, 101-point interpolated AP, mean over classes present in
ground truth.
"""

from __future__ import annotations

import numpy as np

from .geometry import iou_matrix

IOU_THRESHOLDS = np.arange(0.5, 0.96, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _ap_single_class(gt: np.ndarray, pred: np.ndarray,
                     scores: np.ndarray, iou_thr: float) -> float:
    """AP for one class / one image set at one IoU threshold.

    ``gt``: (n,4) ltrb; ``pred``: (m,4); ``scores``: (m,).
    """
    if len(gt) == 0:
        return np.nan  # class absent from GT → excluded from the mean
    if len(pred) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    pred = pred[order]
    m = iou_matrix(pred, gt)
    matched = np.zeros(len(gt), dtype=bool)
    tp = np.zeros(len(pred))
    fp = np.zeros(len(pred))
    for i in range(len(pred)):
        row = np.where(matched, -1.0, m[i])
        j = int(np.argmax(row))
        if row[j] >= iou_thr:
            matched[j] = True
            tp[i] = 1
        else:
            fp[i] = 1
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / len(gt)
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # precision envelope + 101-point interpolation (COCO)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    interp = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(interp.mean())


def image_map(gt_boxes: np.ndarray, gt_labels: np.ndarray,
              pred_boxes: np.ndarray, pred_labels: np.ndarray,
              pred_scores: np.ndarray) -> float:
    """mAP[0.5:0.95] for one image: mean over GT-present classes and IoU
    thresholds (per-image metric, reference layout_evaluator.py:268-349)."""
    classes = np.unique(gt_labels) if len(gt_labels) else np.array([])
    if len(classes) == 0:
        return np.nan
    aps = []
    for cls in classes:
        g = gt_boxes[gt_labels == cls]
        msk = pred_labels == cls
        p, s = pred_boxes[msk], pred_scores[msk]
        for thr in IOU_THRESHOLDS:
            aps.append(_ap_single_class(g, p, s, thr))
    vals = [a for a in aps if not np.isnan(a)]
    return float(np.mean(vals)) if vals else np.nan


def detection_tp_masks(gt: np.ndarray, pred: np.ndarray,
                       scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-image matching state for the DISTRIBUTED corpus mAP: for one
    image and one class, return ``(sorted_scores, tp_mask)`` where bit
    ``ti`` of ``tp_mask[i]`` says detection ``i`` (score-ordered) is a
    true positive at ``IOU_THRESHOLDS[ti]``. Matching is row-local —
    only these (score, mask) pairs leave the task, never boxes."""
    order = np.argsort(-scores, kind="stable")
    pred_s, sc = pred[order], scores[order]
    m = iou_matrix(pred_s, gt)
    masks = np.zeros(len(pred_s), dtype=np.int64)
    for ti, thr in enumerate(IOU_THRESHOLDS):
        matched = np.zeros(len(gt), dtype=bool)
        for i in range(len(pred_s)):
            row = np.where(matched, -1.0, m[i])
            j = int(np.argmax(row)) if len(row) else -1
            if j >= 0 and row[j] >= thr:
                matched[j] = True
                masks[i] |= 1 << ti
    return sc, masks


def ap_from_pooled_masks(scores: np.ndarray, masks: np.ndarray,
                         n_gt: int,
                         tiebreak: np.ndarray | None = None) -> float:
    """AP (mean over IoU thresholds) from per-class POOLED detection
    (score, tp_mask) pairs — the final step of the distributed corpus
    mAP; math identical to ``corpus_map``'s pooled computation."""
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    if tiebreak is None:
        order = np.argsort(-scores, kind="stable")
    else:
        order = np.lexsort((tiebreak, -scores))
    masks = masks[order]
    aps = []
    for ti in range(len(IOU_THRESHOLDS)):
        tp = ((masks >> ti) & 1).astype(np.float64)
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(1.0 - tp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        for i in range(len(precision) - 2, -1, -1):
            precision[i] = max(precision[i], precision[i + 1])
        idx = np.searchsorted(recall, RECALL_POINTS, side="left")
        interp = np.where(
            idx < len(precision),
            precision[np.minimum(idx, len(precision) - 1)],
            0.0,
        )
        aps.append(float(interp.mean()))
    return float(np.mean(aps))


def corpus_map(per_class_inputs: dict) -> dict:
    """Corpus mAP over gathered per-image detections.

    ``per_class_inputs``: class → list of (gt_boxes, pred_boxes, scores)
    per image. Returns {"map": float, "per_class": {cls: ap}} — mean
    over classes of the AP averaged over IoU thresholds, detections
    pooled across images per class (COCO protocol; the reference
    gathers everything into one torchmetrics update, G2).
    """
    per_class = {}
    for cls, triples in per_class_inputs.items():
        aps = []
        for thr in IOU_THRESHOLDS:
            # pool: concatenate predictions (scored) with image offsets
            # and match within each image
            tp_all, fp_all, scores_all, n_gt = [], [], [], 0
            for gt, pred, scores in triples:
                n_gt += len(gt)
                if len(pred) == 0:
                    continue
                order = np.argsort(-scores, kind="stable")
                pred_s, sc = pred[order], scores[order]
                m = iou_matrix(pred_s, gt)
                matched = np.zeros(len(gt), dtype=bool)
                tp = np.zeros(len(pred_s))
                for i in range(len(pred_s)):
                    j, best = -1, thr
                    for g in range(len(gt)):
                        if not matched[g] and m[i, g] >= best:
                            best, j = m[i, g], g
                    if j >= 0:
                        matched[j] = True
                        tp[i] = 1
                tp_all.append(tp)
                fp_all.append(1 - tp)
                scores_all.append(sc)
            if n_gt == 0:
                aps.append(np.nan)
                continue
            if not scores_all:
                aps.append(0.0)
                continue
            scores_cat = np.concatenate(scores_all)
            order = np.argsort(-scores_cat, kind="stable")
            tp_cum = np.cumsum(np.concatenate(tp_all)[order])
            fp_cum = np.cumsum(np.concatenate(fp_all)[order])
            recall = tp_cum / n_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            interp = np.where(
                idx < len(precision),
                precision[np.minimum(idx, len(precision) - 1)],
                0.0,
            )
            aps.append(float(interp.mean()))
        vals = [a for a in aps if not np.isnan(a)]
        per_class[cls] = float(np.mean(vals)) if vals else np.nan
    vals = [v for v in per_class.values() if not np.isnan(v)]
    return {
        "map": float(np.mean(vals)) if vals else np.nan,
        "per_class": per_class,
    }

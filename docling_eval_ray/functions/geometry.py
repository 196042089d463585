"""BBox geometry kernels (vectorized numpy).

Reference: IoU layout_evaluator.py:409-423; origin flip / scale
layout_evaluator.py:628-661; ltwh→ltrb doclaynet_v1_builder.py:158-170;
clamp tableformer_provider.py:441-447. Boxes here are ``(l, t, r, b)``
in a top-left-origin coordinate system, arrays of shape (n, 4).
"""

from __future__ import annotations

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (n,4) × (m,4) ltrb boxes → (n,m)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out


def ltwh_to_ltrb(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    out[:, 2] = boxes[:, 0] + boxes[:, 2]
    out[:, 3] = boxes[:, 1] + boxes[:, 3]
    return out


def flip_origin(boxes: np.ndarray, page_height: float) -> np.ndarray:
    """Bottom-left origin ↔ top-left origin flip."""
    out = boxes.copy()
    out[:, 1] = page_height - boxes[:, 3]
    out[:, 3] = page_height - boxes[:, 1]
    return out


def scale_boxes(boxes: np.ndarray, sx: float, sy: float) -> np.ndarray:
    out = boxes.copy()
    out[:, [0, 2]] *= sx
    out[:, [1, 3]] *= sy
    return out


def clamp_boxes(boxes: np.ndarray, w: float, h: float) -> np.ndarray:
    out = boxes.copy()
    out[:, [0, 2]] = np.clip(out[:, [0, 2]], 0, w)
    out[:, [1, 3]] = np.clip(out[:, [1, 3]], 0, h)
    return out


def areas(boxes: np.ndarray) -> np.ndarray:
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )


def pivot_iou_mapping(true_boxes: np.ndarray, pred_boxes: np.ndarray):
    """The bbox-text matching scheme (reference
    bbox_text_evaluator.py:181-292): the side with FEWER boxes is the
    pivot; every box of the other side maps to its max-IoU pivot box
    (no threshold — even IoU 0 maps); true boxes that end up in no
    mapping are orphans.

    Returns ``(pivot_is_true, mappings, orphan_trues)`` where
    ``mappings`` is pivot_id → [other ids] in other-side order and
    ``orphan_trues`` lists unmatched TRUE box indices.
    """
    nt, npred = len(true_boxes), len(pred_boxes)
    pivot_is_true = nt <= npred
    piv = true_boxes if pivot_is_true else pred_boxes
    oth = pred_boxes if pivot_is_true else true_boxes
    mappings: dict[int, list[int]] = {}
    if len(piv) and len(oth):
        best = iou_matrix(oth, piv).argmax(axis=1)
        for oid, pid in enumerate(best):
            mappings.setdefault(int(pid), []).append(oid)
    if pivot_is_true:
        orphan_trues = [i for i in range(nt) if i not in mappings]
    else:
        mapped = {o for v in mappings.values() for o in v}
        orphan_trues = [i for i in range(nt) if i not in mapped]
    return pivot_is_true, mappings, orphan_trues


def greedy_iou_match(gt: np.ndarray, pred: np.ndarray,
                     iou_threshold: float = 0.5):
    """Greedy max-IoU matching (reference bbox_text_evaluator.py:181-292
    pivot-matching flavor): repeatedly take the globally best remaining
    (gt, pred) pair above the threshold. Returns (pairs, unmatched_gt,
    unmatched_pred)."""
    m = iou_matrix(gt, pred)
    pairs = []
    used_g, used_p = set(), set()
    while True:
        masked = m.copy()
        if used_g:
            masked[list(used_g), :] = -1
        if used_p:
            masked[:, list(used_p)] = -1
        if masked.size == 0:
            break
        gi, pi = np.unravel_index(np.argmax(masked), masked.shape)
        if masked[gi, pi] < iou_threshold:
            break
        pairs.append((int(gi), int(pi), float(m[gi, pi])))
        used_g.add(int(gi))
        used_p.add(int(pi))
    un_g = [i for i in range(len(gt)) if i not in used_g]
    un_p = [i for i in range(len(pred)) if i not in used_p]
    return pairs, un_g, un_p

"""Reading-order reconstruction: recursive XY-cut over layout boxes.

The reference's ``ReadingOrderPredictor`` (A3) is a learned model; the
public geometric baseline is recursive XY-cut (Nagy & Seth 1984):
recursively split the page at the widest empty horizontal gap, then the
widest vertical gap (column detection), and read top-to-bottom,
left-to-right within leaves. Deterministic — no model weights.
"""

from __future__ import annotations

import numpy as np

# module-scope: score_reconstruction runs inside worker eval batches
from .textmetrics import ard_norm


def _gaps(starts: np.ndarray, ends: np.ndarray) -> list[tuple[float, float]]:
    """Maximal empty intervals between sorted [start, end) extents."""
    order = np.argsort(starts, kind="stable")
    out = []
    cur_end = None
    for i in order:
        s, e = starts[i], ends[i]
        if cur_end is not None and s > cur_end:
            out.append((cur_end, s))
        cur_end = e if cur_end is None else max(cur_end, e)
    return out


def xy_cut_leaves(boxes: np.ndarray, *, min_gap: float = 0.0) -> list[np.ndarray]:
    """XY-cut leaf REGIONS of (n, 4) ltrb boxes, in reading order.

    The recursive-cut tree's leaves are the page's atomic layout
    regions (paragraph blocks, table bodies, figures) — the same
    segmentation ``xy_cut_order`` reads in order; region detection
    (``functions/regions.py``) classifies them.

    Iterative (explicit work stack): with uniform spacing every split
    peels one box, so recursion depth would be O(n) — a ~2000-box page
    (an ~80k-char document) blew the interpreter recursion limit.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    out: list[np.ndarray] = []
    work: list[np.ndarray] = [np.arange(len(boxes))]

    def split(ids: np.ndarray):
        """Return (first, second) sub-regions or None for a leaf."""
        b = boxes[ids]
        # candidate splits: widest empty y-gap (stacked regions) vs
        # widest empty x-gap (column gutter); take the WIDER one — a
        # column gutter is wider than inter-paragraph spacing, so this
        # is what detects multi-column layouts
        # min_gap: ignore gaps at or under this width — 0 for full
        # decomposition (reading order), >0 to stop at block boundaries
        # (region segmentation): intra-table cell gutters and line
        # spacing stay merged, real block separations still split
        ygaps = [g for g in _gaps(b[:, 1], b[:, 3]) if g[1] - g[0] > min_gap]
        xgaps = [g for g in _gaps(b[:, 0], b[:, 2]) if g[1] - g[0] > min_gap]
        ycut = max(ygaps, key=lambda g: g[1] - g[0]) if ygaps else None
        xcut = max(xgaps, key=lambda g: g[1] - g[0]) if xgaps else None
        yw = ycut[1] - ycut[0] if ycut else -1.0
        xw = xcut[1] - xcut[0] if xcut else -1.0
        if ycut is not None and yw >= xw:
            mid = (ycut[0] + ycut[1]) / 2
            top = ids[b[:, 3] <= mid]
            bot = ids[b[:, 1] >= mid]
            if len(top) and len(bot):
                return top, bot
        if xcut is not None:
            mid = (xcut[0] + xcut[1]) / 2
            left = ids[b[:, 2] <= mid]
            right = ids[b[:, 0] >= mid]
            if len(left) and len(right):
                return left, right
        if ycut is not None and yw < xw:
            mid = (ycut[0] + ycut[1]) / 2
            top = ids[b[:, 3] <= mid]
            bot = ids[b[:, 1] >= mid]
            if len(top) and len(bot):
                return top, bot
        return None

    while work:
        ids = work.pop()
        if len(ids) == 0:
            continue
        if len(ids) == 1:
            out.append(ids)
            continue
        parts = split(ids)
        if parts is None:
            # leaf: top-to-bottom, then left-to-right, then stable index
            b = boxes[ids]
            order = np.lexsort((ids, b[:, 0], b[:, 1]))
            out.append(ids[order])
        else:
            first, second = parts
            work.append(second)
            work.append(first)  # LIFO: first region is processed first

    return out


def xy_cut_order(boxes: np.ndarray) -> list[int]:
    """Reading order of (n, 4) ltrb boxes as a permutation of 0..n−1:
    the concatenation of the ordered leaves' ordered members."""
    out: list[int] = []
    for leaf in xy_cut_leaves(boxes):
        out.extend(leaf.tolist())
    return out


def column_major_boxes(n: int) -> np.ndarray:
    """Two-column page layout in true reading order: left column
    top-to-bottom, then right column (the order XY-cut defines). Shared
    by the reconstruction query and the F7 fixture generator."""
    per_col = (n + 1) // 2
    boxes = []
    for i in range(n):
        col = 0 if i < per_col else 1
        row = i if col == 0 else i - per_col
        l = 5.0 + col * 50.0
        t_ = 5.0 + row * 12.0
        boxes.append([l, t_, l + 40.0, t_ + 10.0])
    return np.asarray(boxes)


def score_reconstruction(boxes: np.ndarray, perm: np.ndarray) -> float:
    """Shuffle ``boxes`` (in true order) by ``perm``, reconstruct with
    XY-cut, and return ARD_norm of the recovered order vs truth."""
    pred = xy_cut_order(np.asarray(boxes)[perm])
    # pred[i] = position in shuffled order; map back to true element ids
    recovered = [int(perm[j]) for j in pred]
    # order[true_idx] = predicted rank of that element
    rank = {elem: r for r, elem in enumerate(recovered)}
    order = [rank[i] for i in range(len(boxes))]
    return ard_norm(order)[0]


def reading_order_reconstruction(sf_dir: str):
    """Rows-only query: shuffle each doc's deterministic layout boxes
    with a doc-seeded permutation, reconstruct reading order with
    XY-cut, and score ARD_norm against the true order (the reference's
    evaluator loop, readingorder_evaluator.py:156-271, with the learned
    predictor swapped for the geometric baseline — and the intentional
    shuffle seeded per doc_id for determinism)."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for did, n_chars in zip(t["doc_id"].to_pylist(),
                                t["n_chars"].to_pylist()):
            n = max(2, int(n_chars) // 40)
            boxes = column_major_boxes(n)
            rng = np.random.default_rng(int(did))  # seeded per doc
            perm = rng.permutation(n)
            ard = score_reconstruction(boxes, perm)
            rows.append(
                {"doc_id": f"doc-{int(did):06d}", "n_elements": n,
                 "ard_norm": round(ard, 6)}
            )
        return pa.Table.from_pylist(rows)

    return ds.map_batches(fn, batch_format="pyarrow")

"""Table/figure region detection over layout boxes.

The north star's PDF-layout-parse stage names *table/figure region
detection* alongside reading-order reconstruction; the reference
carries these as learned-model labels flowing into its layout mAP
evaluator (``docling_eval/evaluators/layout_evaluator.py`` — label
sets include table / picture / text). The public geometric baseline
implemented here:

1. **Segment**: the XY-cut leaf regions
   (``reading_order.xy_cut_leaves``) are the page's atomic blocks —
   the same recursive gap-split that defines reading order also
   defines region boundaries, so segmentation and ordering share one
   pass and one partitioning assumption (gaps wider than intra-block
   spacing).
2. **Classify** each leaf, deterministically:
   * ``figure`` — a single box whose area ≥ ``FIGURE_MIN_AREA``
     (images/charts surface as one large element, not token grids);
   * ``table``  — grid alignment: ≥2 distinct x-start columns AND ≥2
     distinct y-start rows AND the cell count fills ≥
     ``TABLE_MIN_FILL`` of the C×R grid (paragraph lines share ONE
     x-start, so running text never matches);
   * ``text``   — everything else.

Every token lands in exactly one region (the leaves partition the
page), so downstream span reassembly can key on (doc, region, order).
"""

from __future__ import annotations

import numpy as np

from .reading_order import xy_cut_leaves

#: a single standalone box at least this large is a figure/image.
FIGURE_MIN_AREA = 1500.0
#: fraction of the C×R grid that must be occupied to call it a table.
TABLE_MIN_FILL = 0.6
#: coordinate quantum when clustering x/y starts into columns/rows.
GRID_SNAP = 2.0
#: segmentation stops at gaps ≤ this width: cell gutters / line spacing
#: stay merged into one region, true block separations still split.
REGION_MIN_GAP = 8.0


def classify_region(boxes: np.ndarray) -> str:
    """Kind of one leaf region's (n, 4) ltrb boxes: table/figure/text."""
    boxes = np.asarray(boxes, dtype=np.float64)
    n = len(boxes)
    if n == 1:
        area = float(
            (boxes[0, 2] - boxes[0, 0]) * (boxes[0, 3] - boxes[0, 1])
        )
        return "figure" if area >= FIGURE_MIN_AREA else "text"
    cols = np.unique(np.round(boxes[:, 0] / GRID_SNAP))
    rows = np.unique(np.round(boxes[:, 1] / GRID_SNAP))
    c, r = len(cols), len(rows)
    if c >= 2 and r >= 2 and n >= TABLE_MIN_FILL * c * r:
        return "table"
    return "text"


def detect_page_regions(boxes: np.ndarray) -> list[dict]:
    """Segment + classify one page's (n, 4) ltrb boxes.

    Returns one dict per region, in reading order: ``region_id`` (rank
    in reading order), ``kind``, the region's bounding ltrb, and
    ``n_tokens``. The regions partition the input boxes.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    out: list[dict] = []
    if len(boxes) == 0:
        return out
    for rid, leaf in enumerate(
        xy_cut_leaves(boxes, min_gap=REGION_MIN_GAP)
    ):
        b = boxes[leaf]
        out.append(
            {
                "region_id": rid,
                "kind": classify_region(b),
                "l": float(b[:, 0].min()),
                "t": float(b[:, 1].min()),
                "r": float(b[:, 2].max()),
                "b": float(b[:, 3].max()),
                "n_tokens": int(len(leaf)),
            }
        )
    return out


# ---------------------------------------------------------------------------
# deterministic page archetypes (the synthetic corpus' layout classes)
# ---------------------------------------------------------------------------


def table_page_boxes(n_rows: int = 4, n_cols: int = 3) -> np.ndarray:
    """A title line over an aligned n_rows×n_cols cell grid."""
    boxes = [[5.0, 5.0, 90.0, 12.0]]  # title spans the page width
    for r in range(n_rows):
        for c in range(n_cols):
            l = 5.0 + c * 30.0
            t = 30.0 + r * 12.0
            boxes.append([l, t, l + 24.0, t + 9.0])
    return np.asarray(boxes)


def figure_page_boxes() -> np.ndarray:
    """One large image box with a caption paragraph well below it."""
    boxes = [[10.0, 5.0, 90.0, 60.0]]  # 80×55 = 4400 ≥ FIGURE_MIN_AREA
    for i in range(3):  # caption lines share an x-start (text, not table)
        t = 80.0 + i * 10.0
        boxes.append([10.0, t, 70.0, t + 8.0])
    return np.asarray(boxes)


def region_detection(sf_dir: str):
    """Rows-only driver query: deterministic per-doc page layouts (the
    archetype — two-column text / titled table grid / figure+caption —
    is md5-chosen per doc_id, grid dims doc-seeded), segmented and
    classified per batch. One streaming map_batches, no shuffle; at
    corpus scale the page boxes arrive from the PDF-parse stage instead
    of the synthesizer and the stage is unchanged."""
    import pyarrow as pa
    import ray.data as rd

    from .reading_order import column_major_boxes
    from .tokens import md5_prefix32

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for did, n_chars in zip(t["doc_id"].to_pylist(),
                                t["n_chars"].to_pylist()):
            h = md5_prefix32(str(did))
            arch = h % 3
            if arch == 0:
                boxes = column_major_boxes(max(2, int(n_chars) // 40))
            elif arch == 1:
                boxes = table_page_boxes(3 + h // 3 % 4, 2 + h // 12 % 3)
            else:
                boxes = figure_page_boxes()
            for reg in detect_page_regions(boxes):
                rows.append({"doc_id": f"doc-{int(did):06d}", **reg})
        # explicit schema: an all-filtered batch must not become a
        # zero-column table and split the dataset's block schemas
        return pa.Table.from_pylist(rows, schema=pa.schema({
            "doc_id": pa.string(), "region_id": pa.int64(),
            "kind": pa.string(), "l": pa.float64(), "t": pa.float64(),
            "r": pa.float64(), "b": pa.float64(), "n_tokens": pa.int64(),
        }))

    return ds.map_batches(fn, batch_format="pyarrow")


def region_kind_census(sf_dir: str):
    """Oracled census over the full detector: per region kind, the
    corpus-wide region count. The archetype → region-kind mapping is
    deterministic (arch 0 → two text columns, arch 1 → title text +
    table grid, arch 2 → figure + caption text), so DuckDB can replay
    the census from md5(doc_id) alone — one misclassified page anywhere
    breaks the hash. Partial counts per batch; the final groupby is
    3 rows."""
    import pandas as pd

    from .groups import count_partial, final_groupby_sum

    regs = region_detection(sf_dir)
    out = final_groupby_sum(
        regs.map_batches(count_partial("kind", "n_regions"),
                         batch_format="pyarrow"),
        ["kind"], ["n_regions"],
    ).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"kind": pd.Series([], dtype=str),
             "n_regions": pd.Series([], dtype=np.int64)}
        )
    return out

"""functions/regions.py — XY-cut region segmentation + classification."""

import numpy as np

from docling_eval_ray.functions.reading_order import (
    column_major_boxes,
    xy_cut_leaves,
    xy_cut_order,
)
from docling_eval_ray.functions.regions import (
    REGION_MIN_GAP,
    classify_region,
    detect_page_regions,
    figure_page_boxes,
    region_detection,
    table_page_boxes,
)


def test_archetype_known_answers():
    regs = detect_page_regions(table_page_boxes())
    assert [r["kind"] for r in regs] == ["text", "table"]
    assert regs[1]["n_tokens"] == 12  # 4x3 grid body

    regs = detect_page_regions(figure_page_boxes())
    assert [r["kind"] for r in regs] == ["figure", "text"]

    regs = detect_page_regions(column_major_boxes(10))
    assert [r["kind"] for r in regs] == ["text", "text"]  # two columns
    # reading order: left column region before right column region
    assert regs[0]["l"] < regs[1]["l"]


def test_regions_partition_tokens():
    for boxes in (table_page_boxes(5, 4), figure_page_boxes(),
                  column_major_boxes(31)):
        leaves = xy_cut_leaves(boxes, min_gap=REGION_MIN_GAP)
        seen = np.concatenate(leaves)
        assert sorted(seen.tolist()) == list(range(len(boxes)))
        regs = detect_page_regions(boxes)
        assert sum(r["n_tokens"] for r in regs) == len(boxes)
        # region bounds cover their tokens
        for r in regs:
            assert r["l"] < r["r"] and r["t"] < r["b"]


def test_classify_rules():
    # 2x2 aligned grid -> table
    grid = np.array([[0, 0, 8, 8], [20, 0, 28, 8],
                     [0, 20, 8, 28], [20, 20, 28, 28]], dtype=float)
    assert classify_region(grid) == "table"
    # same boxes but ragged x-starts -> text (no column alignment)
    ragged = grid.copy()
    ragged[2, 0] += 7.0
    ragged[3, 0] -= 7.0
    assert classify_region(ragged) == "text"
    # single large box -> figure; single small box -> text
    assert classify_region(np.array([[0, 0, 50, 40.0]])) == "figure"
    assert classify_region(np.array([[0, 0, 10, 5.0]])) == "text"


def test_min_gap_zero_keeps_full_decomposition():
    # ordering path unchanged: full decomposition == leaf concatenation
    b = column_major_boxes(9)
    rng = np.random.default_rng(1)
    perm = rng.permutation(9)
    rec = [int(perm[j]) for j in xy_cut_order(b[perm])]
    assert rec == list(range(9))


def test_region_detection_query(ray_session):
    df = region_detection("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    kinds = set(df["kind"])
    assert kinds == {"text", "table", "figure"}
    # every doc got at least one region and contiguous region ids
    g = df.groupby("doc_id")["region_id"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # archetype shares: each appears in a nontrivial fraction of docs
    per_doc = df.groupby("doc_id")["kind"].apply(set)
    n = len(per_doc)
    assert sum("table" in s for s in per_doc) > 0.15 * n
    assert sum("figure" in s for s in per_doc) > 0.15 * n

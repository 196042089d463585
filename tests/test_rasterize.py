"""From-scratch PDF page rasterizer (functions/rasterize.py +
sources/pdf.py:rasterize_pdf_pages): geometry, determinism, clipping,
and the real-PNG round trip over the committed PDF fixtures."""

import numpy as np
import pytest

from docling_eval_ray.functions.rasterize import (
    FONT5X7,
    rasterize_text_page,
)


def test_font_shapes_and_distinctness():
    for ch, g in FONT5X7.items():
        assert g.shape == (7, 5), ch
        assert g.dtype == np.uint8
    # all non-space printable glyphs carry ink and O/0, I/1 differ
    assert FONT5X7["O"].sum() > 0 and (FONT5X7["O"] != FONT5X7["0"]).any()
    assert (FONT5X7["I"] != FONT5X7["1"]).any()


def test_page_dims_and_background():
    page = rasterize_text_page(200.0, 100.0, [], scale=2.0)
    assert page.shape == (200, 400)
    assert (page == 255).all()  # empty page = all paper


def test_text_ink_lands_in_the_gt_box():
    """Ink must appear exactly inside the (x, page_h−y−size) →
    (x+0.5·size·len, page_h−y) cell the PDF GT builder assigns."""
    op = {"x": 20.0, "y": 50.0, "size": 10.0, "text": "HELLO"}
    page = rasterize_text_page(200.0, 100.0, [op], scale=1.0)
    ys, xs = np.nonzero(page == 0)
    assert len(ys) > 0
    top, bottom = 100 - 50 - 10, 100 - 50
    left, right = 20, 20 + round(0.5 * 10 * 5)
    assert ys.min() >= top and ys.max() < bottom
    assert xs.min() >= left and xs.max() < right
    # nothing outside the band
    outside = page.copy()
    outside[top:bottom, left:right] = 255
    assert (outside == 255).all()


def test_deterministic_and_scale_consistent():
    ops = [{"x": 5.0, "y": 5.0, "size": 8.0, "text": "abc123"}]
    a = rasterize_text_page(100.0, 50.0, ops, scale=2.0)
    b = rasterize_text_page(100.0, 50.0, ops, scale=2.0)
    assert (a == b).all()
    # doubling scale quadruples-ish the ink pixel count
    small = (rasterize_text_page(100.0, 50.0, ops, scale=1.0) == 0).sum()
    big = (a == 0).sum()
    assert 2.5 * small <= big <= 6 * small


def test_overflow_ops_clip_not_raise():
    ops = [
        {"x": -10.0, "y": 2.0, "size": 10.0, "text": "LEFT"},
        {"x": 95.0, "y": 2.0, "size": 10.0, "text": "RIGHTRIGHT"},
        {"x": 5.0, "y": 200.0, "size": 10.0, "text": "ABOVE"},
    ]
    page = rasterize_text_page(100.0, 50.0, ops, scale=1.0)
    assert page.shape == (50, 100)


def test_rasterize_pdf_pages_roundtrip(ray_session):
    """Committed fixture PDFs → per-page PNG bitmaps through the real
    parser and the real PNG codec; dims follow page geometry × scale
    and every non-blank page carries ink."""
    from docling_eval_ray.functions.png import decode_png
    from docling_eval_ray.sources.pdf import pdf_page_rasters

    out = pdf_page_rasters("").to_pandas()
    assert len(out) == 3  # report#1, report#2, memo#1
    assert set(out["doc_id"]) == {"report#1", "report#2", "memo#1"}
    for _, r in out.iterrows():
        img = decode_png(bytes(r["png"]))
        assert img.shape == (r["height"], r["width"])
        assert r["n_ink"] > 0
        assert (np.asarray(img) == 0).sum() == r["n_ink"]
    rep1 = out[out["doc_id"] == "report#1"].iloc[0]
    assert rep1["width"] == round(612 * 2.0)
    assert rep1["height"] == round(792 * 2.0)
    # the two report pages differ in content → different ink counts
    rep2 = out[out["doc_id"] == "report#2"].iloc[0]
    assert rep1["n_ink"] != rep2["n_ink"]


def test_rasterize_matches_gt_boxes(ray_session):
    """Every ink pixel of a rasterized fixture page lies inside the
    union of that page's GT boxes (the geometry contract the module
    docstring states)."""
    from pathlib import Path

    from docling_eval_ray.functions.pdf import (
        extract_pdf_text,
        pdf_page_sizes,
    )
    from docling_eval_ray.sources.pdf import SAMPLE_DIR, build_pdf_records

    data = (Path(SAMPLE_DIR) / "report.pdf").read_bytes()
    recs = extract_pdf_text(data)
    geom = pdf_page_sizes(data)
    rows = build_pdf_records("report", data)
    from docling_eval_ray.functions.rasterize import rasterize_text_page

    for pg, row in zip(geom, rows):
        page_ops = [r for r in recs if r["page_no"] == pg["page_no"]]
        img = rasterize_text_page(pg["page_w"], pg["page_h"], page_ops,
                                  scale=1.0)
        mask = np.zeros_like(img, bool)
        for b in row["boxes"]:
            mask[int(np.floor(b["t"])):int(np.ceil(b["b"])) + 1,
                 int(np.floor(b["l"])):int(np.ceil(b["r"])) + 1] = True
        ys, xs = np.nonzero(img == 0)
        assert mask[ys, xs].all(), "ink outside GT boxes"

"""OmniDocBench-style GT builder: committed raw fixture tree →
expected span sequences (omnidocbench_builder.py:120-421 semantics)."""

from docling_eval_ray.sources.dpbench import PAGE_H, PAGE_W
from docling_eval_ray.sources.omnidocbench import (
    SAMPLE_DIR,
    build_omnidocbench_gt,
)


def test_omnidocbench_span_sequences(ray_session):
    df = build_omnidocbench_gt(SAMPLE_DIR).to_pandas().set_index("doc_id")
    # page_4.jpg has no manifest entry → skipped (:370-373)
    assert sorted(df.index) == ["page_1.jpg", "page_2.jpg", "page_3.jpg"]

    p1 = df.loc["page_1.jpg"]
    assert [s["kind"] for s in p1["spans"]] == [
        "page_header", "section_header", "text", "table", "caption",
        "picture", "caption", "page_footer",
    ]
    # title text is NOT newline-flattened (the reference passes it
    # verbatim to add_heading, :215-216)
    assert p1["spans"][1]["text"] == "A Study of\nLayouts"
    # table html parsed through the M4 grid parser, reading order
    assert p1["spans"][3]["text"] == "Model F1 base 0.81"
    assert p1["spans"][5]["media_ref"] == "img:page_1.jpg:5"
    assert [s["offset"] for s in p1["spans"]] == list(range(8))
    assert p1["n_tables"] == 1 and p1["n_figures"] == 1

    p2 = df.loc["page_2.jpg"]
    assert [s["kind"] for s in p2["spans"]] == [
        "formula", "caption", "text", "text", "text", "text",
        "footnote", "page_footer",
    ]
    # missing text → the reference's literal placeholder (:182-185)
    assert p2["spans"][5]["text"] == "&lt;omitted text for text_block&gt;"
    # unknown category skipped but counted (:319-320)
    assert p2["n_unknown"] == 1
    # offsets stay contiguous across the skipped element
    assert [s["offset"] for s in p2["spans"]] == list(range(8))

    p3 = df.loc["page_3.jpg"]
    assert [s["kind"] for s in p3["spans"]] == [
        "text", "text", "text", "picture", "footnote", "footnote",
    ]
    assert p3["n_figures"] == 1 and p3["n_tables"] == 0


def test_omnidocbench_poly_bbox_scaling(ray_session):
    """Bbox is the min/max scan over the 8-coord poly, scaled by
    page/gt page size (omnidocbench_builder.py:187-206)."""
    df = build_omnidocbench_gt(SAMPLE_DIR).to_pandas().set_index("doc_id")
    # page_1 gt size 1000x1400; header poly spans x:[50,950] y:[20,60]
    box = df.loc["page_1.jpg"]["boxes"][0]
    assert abs(box["l"] - 50 * PAGE_W / 1000) < 1e-9
    assert abs(box["r"] - 950 * PAGE_W / 1000) < 1e-9
    assert abs(box["t"] - 20 * PAGE_H / 1400) < 1e-9
    assert abs(box["b"] - 60 * PAGE_H / 1400) < 1e-9
    # boxes align 1:1 with emitted spans (skipped element drops its box)
    p2 = df.loc["page_2.jpg"]
    assert len(p2["boxes"]) == len(p2["spans"])

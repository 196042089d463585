"""DPBench-style GT builder: committed raw fixture → expected span
sequences (dpbench_builder.py:120-361 semantics)."""

from docling_eval_ray.sources.dpbench import (
    PAGE_H,
    PAGE_W,
    SAMPLE_DIR,
    build_dpbench_gt,
)


def test_dpbench_builder_span_sequences(ray_session):
    df = build_dpbench_gt(SAMPLE_DIR).to_pandas().set_index("doc_id")
    assert sorted(df.index) == ["doc_a", "doc_b", "doc_c"]

    b = df.loc["doc_b"]
    kinds = [s["kind"] for s in b["spans"]]
    assert kinds == ["page_header", "section_header", "text", "table",
                     "caption", "page_footer"]
    # newline flattening (dpbench_builder.py:154)
    assert b["spans"][0]["text"] == "Quarterly Report Draft"
    # HTML table parsed through the M4 grid parser, reading order
    assert b["spans"][3]["text"] == "Region Rev EMEA 10 APAC 12"
    # offsets are contiguous element order
    assert [s["offset"] for s in b["spans"]] == list(range(6))
    assert b["n_tables"] == 1 and b["n_pictures"] == 0

    a = df.loc["doc_a"]
    kinds = [s["kind"] for s in a["spans"]]
    assert kinds == ["picture", "caption", "list_item", "formula",
                     "footnote"]
    assert a["spans"][0]["media_ref"] == "img:doc_a:0"
    assert a["n_pictures"] == 1

    c = df.loc["doc_c"]
    # Index → two-column grid: last token of each line lands in col 2
    assert c["spans"][0]["kind"] == "document_index"
    assert c["spans"][0]["text"] == (
        "Introduction 1 Methods 4 Results 9"
    )
    assert c["spans"][1]["kind"] == "picture"
    assert c["n_tables"] == 1 and c["n_pictures"] == 1


def test_dpbench_polygon_bbox_scaling(ray_session):
    """Bbox is the min/max scan over the (unordered) polygon, scaled
    by the page size (dpbench_builder.py:142-163)."""
    df = build_dpbench_gt(SAMPLE_DIR).to_pandas().set_index("doc_id")
    box = df.loc["doc_b"]["boxes"][0]
    assert abs(box["l"] - 0.1 * PAGE_W) < 1e-9
    assert abs(box["r"] - 0.9 * PAGE_W) < 1e-9
    assert abs(box["t"] - 0.02 * PAGE_H) < 1e-9
    assert abs(box["b"] - 0.05 * PAGE_H) < 1e-9

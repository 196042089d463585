"""DocLayNet-style GT builder: span-sequence equality against the
committed raw fixtures, blacklist skip, error status, list grouping,
bbox origin flip."""

import json

from docling_eval_ray.sources.doclaynet import (
    SAMPLE_DIR,
    build_doclaynet_record,
    doclaynet_gt_build,
)


def test_builder_output(ray_session):
    df = doclaynet_gt_build().to_pandas().set_index("doc_id")
    # blacklisted page dropped entirely; bad-category page kept as error
    assert "page-blacklisted-0001" not in df.index
    assert df.loc["page-dddd-0004", "status"].startswith("error")
    assert (df.drop("page-dddd-0004").loc[:, "status"] == "ok").all()

    rich = df.loc["page-aaaa-0001"]
    kinds = [s["kind"] for s in rich["spans"]]
    assert kinds == ["title", "list_item", "list_item", "text", "picture",
                     "caption", "list_item", "list_item", "table"]
    # two separate runs of list items → two list groups
    assert rich["n_list_groups"] == 2
    # offsets are annotation order, contiguous from 0
    assert [s["offset"] for s in rich["spans"]] == list(range(9))
    # picture: no text, media_ref side-table key
    pic = rich["spans"][4]
    assert pic["text"] == "" and pic["media_ref"] == "img/page-aaaa-0001/4"
    # content is the pdf_cells join
    assert rich["spans"][0]["text"] == "Annual Report"
    assert rich["spans"][8]["text"] == "cell grid"


def test_bbox_bottom_left_origin():
    raw = json.load(open(f"{SAMPLE_DIR}/page-aaaa-0001.json"))
    rec = build_doclaynet_record(raw)
    b0 = rec["boxes"][0]  # ltwh [50, 40, 500, 30] on height-792 page
    assert (b0["l"], b0["r"]) == (50.0, 550.0)
    # y flips: t_new = H - t_top, b_new = H - (t_top + h)
    assert (b0["t"], b0["b"]) == (792.0 - 40.0, 792.0 - 70.0)


def test_span_sequence_equality_golden():
    """Exact span-sequence (kind, text, media_ref, offset) for the
    simple page — the per-row invariant the north rule names."""
    raw = json.load(open(f"{SAMPLE_DIR}/page-bbbb-0002.json"))
    rec = build_doclaynet_record(raw)
    assert rec["spans"] == [
        {"kind": "page_header", "text": "running head", "media_ref": "",
         "offset": 0},
        {"kind": "section_header", "text": "Section One", "media_ref": "",
         "offset": 1},
        {"kind": "text", "text": "lorem ipsum", "media_ref": "", "offset": 2},
        {"kind": "footnote", "text": "see note", "media_ref": "", "offset": 3},
        {"kind": "formula", "text": "E=mc2", "media_ref": "", "offset": 4},
        {"kind": "page_footer", "text": "page 7", "media_ref": "",
         "offset": 5},
    ]

"""CVAT annotation round-trip: XML -> reading-ordered span sequence with
merges, captions, footnotes; images lacking a reading order are counted,
not raised."""

from docling_eval_ray.sources.cvat import (
    SAMPLE_XML,
    build_cvat_gt,
    cvat_to_spans,
    find_box,
    parse_cvat_xml,
)


def test_find_box_prefers_smallest_containing():
    boxes = [
        {"label": "section", "l": 0, "t": 0, "r": 100, "b": 100, "text": ""},
        {"label": "text", "l": 10, "t": 10, "r": 40, "b": 40, "text": ""},
        {"label": "bad", "l": 50, "t": 50, "r": 50, "b": 60, "text": ""},
    ]
    assert find_box(boxes, (20, 20)) == 1   # nested: smallest area wins
    assert find_box(boxes, (80, 80)) == 0
    assert find_box(boxes, (300, 300)) == -1
    assert find_box(boxes, (50, 55)) == 0   # invalid box skipped


def test_cvat_round_trip(ray_session):
    rows = {r["doc_id"]: r for r in build_cvat_gt(SAMPLE_XML).take_all()}
    assert set(rows) == {"page_001.png", "page_002.png"}

    ok = rows["page_001.png"]
    assert ok["status"] == "success"
    got = [(s["kind"], s["text"], s["media_ref"]) for s in ok["spans"]]
    assert got == [
        ("title", "Quarterly Summary", ""),
        ("text", "First paragraph starts here and continues in a second box",
         ""),
        ("picture", "", "cvat/page_001.png/3"),
        ("caption", "Figure 1: trend", ""),
        ("text", "Closing remarks", ""),
        ("footnote", "1 source: internal", ""),
    ]
    assert [s["offset"] for s in ok["spans"]] == list(range(6))

    skipped = rows["page_002.png"]
    assert skipped["status"] == "no_reading_order"
    assert skipped["spans"] == [] and skipped["n_boxes"] == 1


def test_cvat_reading_order_revisit_skipped():
    images = parse_cvat_xml(open(SAMPLE_XML).read())
    img = images[0]
    # revisit box 0 twice in reading order: emitted once
    img["polylines"][0]["points"] = [
        (105, 20), (105, 60), (105, 20), (105, 295)
    ]
    spans, status = cvat_to_spans(img)
    assert status == "success"
    assert [s["kind"] for s in spans] == [
        "title", "text", "text", "footnote"
    ]

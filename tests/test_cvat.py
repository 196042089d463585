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
    spans, status, _ = cvat_to_spans(img)
    assert status == "success"
    assert [s["kind"] for s in spans] == [
        "title", "text", "text", "footnote"
    ]


# ---------------------------------------------------------------------------
# pre-annotation writer round trip
# ---------------------------------------------------------------------------


def test_cvat_preannotation_roundtrip(ray_session, tmp_path):
    """GT spans → task XML files → reader: span sequences survive the
    round trip (kind, text, order; media boxes re-ref through the
    cvat/<name>/<boxid> convention)."""
    from docling_eval_ray.sources.cvat import (
        build_cvat_gt,
        write_cvat_preannotations,
    )
    from docling_eval_ray.sources.dpbench import SAMPLE_DIR, build_dpbench_gt

    gt = build_dpbench_gt(SAMPLE_DIR)
    src = gt.to_pandas().set_index("doc_id")

    receipts = write_cvat_preannotations(
        gt.select_columns(["doc_id", "spans", "boxes"]), str(tmp_path)
    ).to_pandas()
    # bucketed task files, one per bucket, named like the reference
    assert all(p.startswith(str(tmp_path) + "/task_") for p in receipts["path"])
    assert receipts["n_images"].sum() == len(src)

    back = build_cvat_gt(sorted(receipts["path"])).to_pandas()
    back = back.set_index("doc_id")
    assert sorted(back.index) == sorted(src.index)
    for doc_id in src.index:
        a, b = src.loc[doc_id]["spans"], back.loc[doc_id]["spans"]
        assert [s["kind"] for s in a] == [s["kind"] for s in b]
        assert [s["offset"] for s in a] == [s["offset"] for s in b]
        from docling_eval_ray.datamodel.schema import MEDIA_KINDS

        for sa, sb in zip(a, b):
            if sa["kind"] in MEDIA_KINDS:
                # media-kind boxes (picture AND table in the CVAT
                # convention — regions get cropped, not transcribed)
                # re-reference through the reader's cvat/<name>/<boxid>
                assert sb["media_ref"].startswith(f"cvat/{doc_id}/")
                assert sb["text"] == ""
            else:
                assert sa["text"] == sb["text"]


def test_cvat_image_xml_escaping(ray_session):
    """Attribute text with XML-hostile characters survives write+parse."""
    from docling_eval_ray.sources.cvat import (
        parse_cvat_xml,
        spans_to_cvat_image_xml,
    )

    spans = [{"kind": "text", "text": 'a < b & "c" > d', "media_ref": "",
              "offset": 0}]
    boxes = [{"l": 1.0, "t": 2.0, "r": 3.0, "b": 4.0}]
    xml = ('<?xml version="1.0" encoding="utf-8"?>\n<annotations>\n'
           + spans_to_cvat_image_xml("doc&x", spans, boxes, img_id=0,
                                     width=100, height=100)
           + "\n</annotations>")
    img = parse_cvat_xml(xml)[0]
    assert img["name"] == "doc&x"
    assert img["boxes"][0]["text"] == 'a < b & "c" > d'
    assert img["boxes"][0]["l"] == 1.0


def test_roundtrip_survives_nested_boxes(ray_session, tmp_path):
    """Regression: a box whose CENTER falls inside a smaller nested box
    (figure containing its caption) must survive the round trip — the
    writer picks an anchor point find_box resolves back to the right
    box instead of blindly using the center."""
    import ray.data as rd

    from docling_eval_ray.sources.cvat import (
        build_cvat_gt,
        write_cvat_preannotations,
    )

    spans = [
        {"kind": "picture", "text": "", "media_ref": "m/0", "offset": 0},
        {"kind": "caption", "text": "the caption", "media_ref": "",
         "offset": 1},
        {"kind": "text", "text": "body text", "media_ref": "", "offset": 2},
    ]
    boxes = [
        {"l": 0.0, "t": 0.0, "r": 100.0, "b": 100.0},   # figure
        {"l": 40.0, "t": 40.0, "r": 60.0, "b": 60.0},   # nested: holds
        # the figure's center (50, 50)
        {"l": 0.0, "t": 120.0, "r": 100.0, "b": 140.0},
    ]
    ds = rd.from_items([{"doc_id": "docX", "spans": spans, "boxes": boxes}])
    receipts = write_cvat_preannotations(ds, str(tmp_path)).to_pandas()
    back = build_cvat_gt(sorted(receipts["path"])).to_pandas()
    row = back.iloc[0]
    assert row["status"] == "success"
    got = [(s["kind"], s["text"]) for s in row["spans"]]
    assert got == [("picture", ""), ("caption", "the caption"),
                   ("text", "body text")]


def test_malformed_box_is_status_row_not_crash(ray_session, tmp_path):
    """A box missing a coordinate poisons only its image (status row),
    never the batch task."""
    from docling_eval_ray.sources.cvat import build_cvat_gt

    xml = """<?xml version="1.0"?>
<annotations>
  <image id="0" name="bad_doc" width="100" height="100">
    <box label="text" xtl="1" ytl="1" xbr="50"></box>
  </image>
  <image id="1" name="good_doc" width="100" height="100">
    <box label="text" xtl="1" ytl="1" xbr="50" ybr="20">
      <attribute name="text">hello</attribute>
    </box>
    <polyline label="reading_order" points="25,10"/>
  </image>
</annotations>"""
    p = tmp_path / "task.xml"
    p.write_text(xml)
    df = build_cvat_gt(str(p)).to_pandas().set_index("doc_id")
    assert df.loc["bad_doc", "status"] == "malformed_box"
    assert df.loc["good_doc", "status"] == "success"
    assert [s["text"] for s in df.loc["good_doc", "spans"]] == ["hello"]


def _img(boxes, polylines, name="page.png"):
    return {"name": name, "boxes": boxes, "polylines": polylines,
            "malformed": False}


def _box(i, label, text=""):
    return {"label": label, "l": 10.0 * i, "t": 0.0, "r": 10.0 * i + 8,
            "b": 8.0, "text": text}


def _line(label, *boxids):
    # points at the center of each referenced box
    return {"label": label,
            "points": [(10.0 * i + 4, 4.0) for i in boxids]}


def test_grouped_pictures_absorb_members():
    """A picture heading a group/next_figure line represents the whole
    group: members are consumed and never re-emitted
    (get_grouped_images, cvat_dataset_builder.py:585-663)."""
    from docling_eval_ray.sources.cvat import cvat_to_spans

    boxes = [_box(0, "picture"), _box(1, "picture"), _box(2, "text", "t")]
    img = _img(boxes, [
        _line("reading_order", 0, 1, 2),
        _line("next_figure", 0, 1),
    ])
    spans, status, _ = cvat_to_spans(img)
    assert status == "success"
    assert [s["kind"] for s in spans] == ["picture", "text"]
    assert spans[0]["media_ref"].endswith("/0")


def test_list_group_emits_members_consecutively():
    """A list_item heading a group line pulls its members in as
    consecutive list-item spans (add_listitems_to_group semantics),
    even when the reading order visits them later."""
    from docling_eval_ray.sources.cvat import cvat_to_spans

    boxes = [_box(0, "list_item", "one"), _box(1, "text", "mid"),
             _box(2, "list_item", "two"), _box(3, "list_item", "three")]
    img = _img(boxes, [
        _line("reading_order", 0, 1, 2, 3),
        _line("group", 0, 2, 3),
    ])
    spans, status, _ = cvat_to_spans(img)
    assert status == "success"
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("list_item", "one"), ("list_item", "two"),
        ("list_item", "three"), ("text", "mid"),
    ]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_linked_caption_never_emitted_standalone():
    """A caption that is the target of a to_caption line is only
    emitted via its parent — even if the reading order reaches it
    FIRST (the reference's is_linked skip)."""
    from docling_eval_ray.sources.cvat import cvat_to_spans

    boxes = [_box(0, "caption", "fig caption"), _box(1, "picture"),
             _box(2, "text", "body")]
    img = _img(boxes, [
        _line("reading_order", 0, 1, 2),
        _line("to_caption", 1, 0),
    ])
    spans, status, _ = cvat_to_spans(img)
    assert status == "success"
    assert [s["kind"] for s in spans] == ["picture", "caption", "text"]
    assert spans[1]["text"] == "fig caption"


def test_unlinked_caption_emits_standalone():
    from docling_eval_ray.sources.cvat import cvat_to_spans

    boxes = [_box(0, "caption", "orphan"), _box(1, "text", "body")]
    img = _img(boxes, [_line("reading_order", 0, 1)])
    spans, status, _ = cvat_to_spans(img)
    assert [s["kind"] for s in spans] == ["caption", "text"]


def test_to_value_lines_parsed_and_ignored():
    from docling_eval_ray.sources.cvat import cvat_to_spans

    boxes = [_box(0, "text", "k"), _box(1, "text", "v")]
    img = _img(boxes, [
        _line("reading_order", 0, 1),
        _line("to_value", 0, 1),
    ])
    spans, status, _ = cvat_to_spans(img)
    assert status == "success"
    assert [s["text"] for s in spans] == ["k", "v"]


def test_cvat_multiple_reading_orders_skip_image():
    """The reference's contains_reading_order gate demands EXACTLY ONE
    reading_order polyline (cvat_dataset_builder.py:1299-1302, gated at
    :1331): an image with two is skipped entirely — no spans from
    either polyline, distinct status for the census."""
    images = parse_cvat_xml(open(SAMPLE_XML).read())
    img = images[0]
    ro = dict(img["polylines"][0])
    img["polylines"].append(ro)  # second reading_order line
    spans, status, _ = cvat_to_spans(img)
    assert status == "multiple_reading_order"
    assert spans == []


def test_find_table_data_injection():
    """Reference find_table_data semantics: first pre-converted table
    with IoU strictly above 0.90 donates its structure; no match (or a
    boundary IoU of exactly the cutoff) leaves the empty marker."""
    from docling_eval_ray.sources.cvat import find_table_data

    gt_box = {"l": 0.0, "t": 0.0, "r": 100.0, "b": 100.0}
    exact = {"l": 0.0, "t": 0.0, "r": 100.0, "b": 100.0,
             "otsl": "<fcel>a<nl>"}
    near = {"l": 0.0, "t": 0.0, "r": 100.0, "b": 104.0,
            "otsl": "<fcel>b<nl>"}   # IoU 100/104 ≈ 0.962
    far = {"l": 500.0, "t": 500.0, "r": 600.0, "b": 600.0,
           "otsl": "<fcel>z<nl>"}
    # document order wins: 'near' precedes 'exact'
    assert find_table_data(gt_box, [far, near, exact]) == "<fcel>b<nl>"
    assert find_table_data(gt_box, [far]) == ""
    assert find_table_data(gt_box, []) == ""
    # strict >: a candidate at exactly the cutoff does NOT match
    at_cutoff = {"l": 0.0, "t": 0.0, "r": 100.0, "b": 90.0, "otsl": "x"}
    assert find_table_data(gt_box, [at_cutoff], iou_cutoff=0.90) == ""


def test_cvat_table_source_wiring(ray_session, tmp_path):
    """End-to-end: a table span gets an IoU-matched donated structure
    in the table_data sidecar (keyed by span offset) when table_source
    is passed to build_cvat_gt; the span sequence itself is untouched
    (table is a media kind — its text stays empty by invariant)."""
    xml = """<annotations>
  <image name="tbl.png" width="400" height="400">
    <box label="table" xtl="10" ytl="10" xbr="200" ybr="150">
      <attribute name="text">raw cell text</attribute>
    </box>
    <polyline label="reading_order" points="100,80"/>
  </image>
</annotations>"""
    p = tmp_path / "annotations.xml"
    p.write_text(xml)
    from docling_eval_ray.sources.cvat import build_cvat_gt

    plain = build_cvat_gt(str(p)).take_all()[0]
    assert [s["kind"] for s in plain["spans"]] == ["table"]
    assert plain["table_data"] == []  # no source, no donations

    source = {"tbl.png": [
        {"l": 10.0, "t": 10.0, "r": 200.0, "b": 152.0,
         "otsl": "<fcel>q1<fcel>q2<nl>"},
    ]}
    injected = build_cvat_gt(str(p), table_source=source).take_all()[0]
    # span sequence identical to the plain build (media-kind invariant)
    assert injected["spans"] == plain["spans"]
    assert injected["table_data"] == [
        {"offset": 0, "otsl": "<fcel>q1<fcel>q2<nl>"}
    ]
    # unmatched source -> empty donation marker recorded for the span
    empty = build_cvat_gt(
        str(p), table_source={"tbl.png": []}
    ).take_all()[0]
    assert empty["table_data"] == [{"offset": 0, "otsl": ""}]


def test_cvat_zip_source(ray_session, tmp_path):
    """CVAT task-zip ingestion (reference unzip_annotation_files /
    get_annotation_files): a zip of two annotation XMLs yields the rows
    of both members, in namelist order, identical to reading the bare
    XMLs; non-XML members are ignored."""
    import io
    import zipfile

    xml_a = """<annotations><image name="a.png" width="10" height="10">
      <box label="text" xtl="1" ytl="1" xbr="9" ybr="9">
        <attribute name="text">alpha</attribute></box>
      <polyline label="reading_order" points="5,5"/>
    </image></annotations>"""
    xml_b = xml_a.replace("a.png", "b.png").replace("alpha", "beta")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("task_1/annotations.xml", xml_a)
        zf.writestr("task_2/annotations.xml", xml_b)
        zf.writestr("README.txt", "not an annotation")
    zp = tmp_path / "export.zip"
    zp.write_bytes(buf.getvalue())

    rows = {r["doc_id"]: r for r in build_cvat_gt(str(zp)).take_all()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"]["spans"][0]["text"] == "alpha"
    assert rows["b.png"]["spans"][0]["text"] == "beta"
    assert all(r["status"] == "success" for r in rows.values())

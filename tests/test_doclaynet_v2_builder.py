"""DocLayNet-v2 combined builder: layout dispatch WITH embedded-OTSL
table parsing in one builder (reference doclaynet_v2_builder.py:474-716
semantics; fixtures are original synthetic pages)."""

from docling_eval_ray.sources.doclaynet_v2 import (
    build_doclaynet_v2_record,
    doclaynet_v2_gt_build,
)


def test_span_equality_known_answer():
    """Exact span-sequence (kind, text, media_ref, offset) for the
    composite page: title/text dispatch, embedded-OTSL table, list
    grouping, picture media_ref."""
    import json
    from pathlib import Path

    data = json.loads(
        (
            Path(__file__).parent / "data/doclaynet_v2_sample/page_aa01.json"
        ).read_text()
    )
    rec = build_doclaynet_v2_record(data)
    assert rec["spans"] == [
        {"kind": "title", "text": "Annual Report", "media_ref": "",
         "offset": 0},
        {"kind": "text", "text": "Introductory paragraph.",
         "media_ref": "", "offset": 1},
        {"kind": "table", "text": "", "media_ref": "table/page_aa01/0",
         "offset": 2},
        {"kind": "list_item", "text": "first item", "media_ref": "",
         "offset": 3},
        {"kind": "list_item", "text": "second item", "media_ref": "",
         "offset": 4},
        {"kind": "text", "text": "Closing text.", "media_ref": "",
         "offset": 5},
        {"kind": "picture", "text": "", "media_ref": "img/page_aa01/6",
         "offset": 6},
    ]
    assert rec["n_list_groups"] == 1
    # embedded OTSL parsed into the real grid with cell texts attached
    (tbl,) = rec["tables"]
    assert tbl["from_otsl"] and (tbl["n_rows"], tbl["n_cols"]) == (2, 2)
    for cell in ("Metric", "Value", "Revenue", "42"):
        assert cell in tbl["html"]
    # top-left → bottom-left origin flip against page height 100
    assert rec["boxes"][0] == {"l": 10.0, "t": 95.0, "r": 190.0, "b": 85.0}


def test_builder_dataset(ray_session):
    df = doclaynet_v2_gt_build().to_pandas().set_index("doc_id")
    assert len(df) == 4
    # per-doc skip-and-count: the malformed page is a status row
    assert df.loc["page_zz99", "status"].startswith("error:")
    assert (df.drop("page_zz99").status == "success").all()
    # fallback table (no otsl_seq) is a single cell holding the text
    bb = df.loc["page_bb02"]
    (tbl,) = bb["tables"]
    assert not tbl["from_otsl"]
    assert (tbl["n_rows"], tbl["n_cols"]) == (1, 1)
    assert "plain table text" in tbl["html"]
    # unknown label fell back to text (v2 leniency), counted
    assert bb["n_fallback_labels"] == 1
    assert bb["spans"][3]["kind"] == "text"
    # key_value_region became a group, no text span payload
    assert bb["n_groups"] == 1 and bb["spans"][2]["text"] == ""
    # document_index parses its OTSL with a colspan
    cc = df.loc["page_cc03"]
    (tbl,) = cc["tables"]
    assert tbl["from_otsl"] and (tbl["n_rows"], tbl["n_cols"]) == (2, 2)
    assert 'colspan="2"' in tbl["html"]

"""PixParse-style OCR GT builder: word cells, ltwh→ltrb, missing-image
skip, error status, XY-cut reading order."""

from docling_eval_ray.sources.pixparse import pixparse_gt_build


def test_builder_output(ray_session):
    df = pixparse_gt_build().to_pandas().set_index("doc_id")
    # missing-image folder skipped entirely; malformed JSON kept as error
    assert "idl-noimg" not in df.index
    assert df.loc["idl-bad", "status"].startswith("error")

    d1 = df.loc["idl-0001"]
    assert d1["n_words"] == 5 and d1["n_pages"] == 1
    assert d1["image_bytes"] > 0
    assert d1["media_ref"] == "img/idl-0001/page1"
    # spans keep source order with contiguous offsets
    assert [s["offset"] for s in d1["spans"]] == list(range(5))
    assert [s["kind"] for s in d1["spans"]] == ["word"] * 5
    # ltwh -> ltrb
    w0 = d1["words"][0]
    assert (w0["l"], w0["t"], w0["r"], w0["b"]) == (10.0, 60.0, 90.0, 80.0)
    assert w0["score"] == 0.99

    # XY-cut: header first, then left column, then right column
    texts = [d1["spans"][i]["text"] for i in d1["reading_order"]]
    assert texts == ["Header", "Left1", "Left2", "Right1", "Right2"]


def test_multipage_word_census(ray_session):
    df = pixparse_gt_build().to_pandas().set_index("doc_id")
    d2 = df.loc["idl-0002"]
    assert d2["n_pages"] == 2 and d2["n_words"] == 3
    assert [s["text"] for s in d2["spans"]] == ["alpha", "beta", "gamma"]

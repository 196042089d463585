"""OTSL table GT builder: token stream + cell texts -> grid/HTML/page
tokens, with skip-and-count on malformed rows."""

from docling_eval_ray.functions.tables import parse_html_table, teds
from docling_eval_ray.sources.otsl_tables import SAMPLE_JSONL, build_otsl_gt


def _rows(ray_session):
    return {r["doc_id"]: r for r in build_otsl_gt(SAMPLE_JSONL).take_all()}


def test_otsl_builder_simple(ray_session):
    rows = _rows(ray_session)
    t = rows["tab_simple"]
    assert t["status"] == "success"
    assert (t["n_rows"], t["n_cols"]) == (2, 2)
    cells = parse_html_table(t["html"])
    assert [(c.row, c.col, c.text, c.is_header) for c in cells] == [
        (0, 0, "Name", True), (0, 1, "Qty", True),
        (1, 0, "Bolt", False), (1, 1, "4", False),
    ]
    assert [s["text"] for s in t["spans"][1:]] == ["Name", "Qty", "Bolt", "4"]
    assert t["spans"][0]["kind"] == "table"
    assert [tok["id"] for tok in t["page_tokens"]] == [0, 1, 2, 3]
    assert teds(t["html"], t["html"]) == 1.0


def test_otsl_builder_spans(ray_session):
    rows = _rows(ray_session)
    wide = rows["tab_colspan"]
    cells = {(c.row, c.col): c for c in parse_html_table(wide["html"])}
    assert cells[(0, 0)].colspan == 2
    assert cells[(0, 0)].text == "Wide header cell"
    assert cells[(1, 1)].text == ""  # ecel stays empty, takes no text

    sp = rows["tab_2dspan"]
    cells = {(c.row, c.col): c for c in parse_html_table(sp["html"])}
    assert cells[(0, 0)].rowspan == 2 and cells[(0, 0)].colspan == 2
    assert cells[(0, 0)].text == "Big"
    assert (sp["n_rows"], sp["n_cols"]) == (2, 3)


def test_otsl_builder_skip_and_count(ray_session):
    rows = _rows(ray_session)
    bad = rows["tab_bad"]
    assert bad["status"] == "cell_count_mismatch"
    assert bad["spans"] == [] and bad["html"] == ""

"""HTML table parser, OTSL parser, TEDS known-answer cases (F4)."""

import pytest

from docling_eval_ray.functions.tables import (
    cells_to_html,
    grid_shape,
    parse_html_table,
    parse_otsl,
    teds,
)

SIMPLE = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
SPANNED = ('<table><tr><td rowspan="2">x</td><td>b</td></tr>'
           "<tr><td>d</td></tr></table>")


def test_parse_simple_grid():
    cells = parse_html_table(SIMPLE)
    assert len(cells) == 4
    assert grid_shape(cells) == (2, 2)
    assert [(c.row, c.col, c.text) for c in cells] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c"), (1, 1, "d")
    ]


def test_parse_rowspan_occupancy():
    cells = parse_html_table(SPANNED)
    assert grid_shape(cells) == (2, 2)
    # second-row cell must be pushed to col 1 (col 0 occupied by rowspan)
    last = cells[-1]
    assert (last.row, last.col, last.text) == (1, 1, "d")


def test_parse_colspan_headers():
    html = ('<table><tr><th colspan="2">h</th></tr>'
            "<tr><td>a</td><td>b</td></tr></table>")
    cells = parse_html_table(html)
    assert cells[0].colspan == 2 and cells[0].is_header
    assert grid_shape(cells) == (2, 2)


def test_otsl_simple():
    cells = parse_otsl("fcel fcel nl fcel fcel nl")
    assert grid_shape(cells) == (2, 2)
    assert all(c.rowspan == 1 and c.colspan == 1 for c in cells)


def test_otsl_spans():
    # 2x2 with a horizontal merge in row 0 and a vertical merge in col 0
    cells = parse_otsl("fcel lcel nl fcel fcel nl")
    anchors = {(c.row, c.col): c for c in cells}
    assert anchors[(0, 0)].colspan == 2
    cells = parse_otsl("fcel fcel nl ucel fcel nl")
    anchors = {(c.row, c.col): c for c in cells}
    assert anchors[(0, 0)].rowspan == 2


def test_otsl_headers():
    cells = parse_otsl("ched ched nl fcel fcel nl")
    assert sum(c.is_header for c in cells) == 2


def test_teds_identical():
    assert teds(SIMPLE, SIMPLE) == 1.0
    assert teds(SPANNED, SPANNED, structure_only=True) == 1.0


def test_teds_cell_edit():
    edited = SIMPLE.replace(">d<", ">dd<")
    # structure unchanged → struct-only still 1.0
    assert teds(SIMPLE, edited, structure_only=True) == 1.0
    # text changed → struct+text strictly below 1, above 0.8
    v = teds(SIMPLE, edited, structure_only=False)
    assert 0.8 < v < 1.0


def test_teds_structure_change():
    dropped = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    v = teds(SIMPLE, dropped, structure_only=True)
    assert v < 1.0
    # span mismatch costs
    v2 = teds(SIMPLE, SPANNED, structure_only=True)
    assert v2 < 1.0


def test_teds_empty():
    assert teds("<table></table>", "<table></table>") == 1.0
    assert teds("", SIMPLE) == 0.0


def test_cells_roundtrip():
    cells = parse_html_table(SPANNED)
    html2 = cells_to_html(cells)
    assert teds(SPANNED, html2, structure_only=False) == 1.0


def test_span_attr_junk_values_degrade_to_one():
    from docling_eval_ray.functions.tables import parse_html_table

    # percentage / junk colspan must degrade to 1, not parse to 50
    cells = parse_html_table(
        '<table><tr><td colspan="50%">a</td><td>b</td></tr></table>'
    )
    assert [(c.row, c.col, c.colspan) for c in cells] == [(0, 0, 1), (0, 1, 1)]
    cells = parse_html_table(
        '<table><tr><td colspan="">a</td><td rowspan="junk">b</td>'
        '<td rowspan="0">c</td></tr></table>'
    )
    assert all(c.colspan == 1 and c.rowspan == 1 for c in cells)


def test_cells_to_html_escapes_special_chars():
    from docling_eval_ray.functions.tables import (
        cells_to_html,
        parse_html_table,
        teds,
    )

    cells = parse_html_table("<table><tr><td>a &lt; b &amp; c</td></tr></table>")
    assert cells[0].text == "a < b & c"
    html = cells_to_html(cells)
    # round-trip preserves the text through escaping
    assert parse_html_table(html)[0].text == "a < b & c"
    assert teds(html, html) == 1.0

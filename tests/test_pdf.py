"""From-scratch PDF text layer (M6): writer/extractor roundtrip, the
§9.4 text machine, the committed-fixture GT builder, page slicing."""

from pathlib import Path

import pytest

from docling_eval_ray.functions.pdf import (
    _extract_page_text,
    encode_pdf,
    extract_pdf_text,
)
from docling_eval_ray.sources.pdf import (
    SAMPLE_DIR,
    build_pdf_records,
    pdf_gt_build,
    slice_pdf,
)

PAGES = [
    {"width": 612, "height": 792, "texts": [
        {"x": 72, "y": 720, "size": 18, "text": "Title of Document"},
        {"x": 72, "y": 690, "size": 11,
         "text": "Body with (parens) and \\ backslash."},
    ]},
    {"width": 595, "height": 842, "texts": [
        {"x": 50, "y": 800, "size": 14, "text": "Page two heading"},
        {"x": 50, "y": 780, "size": 10, "text": "Second page body."},
    ]},
]


def test_roundtrip_compressed_and_raw():
    for compress in (True, False):
        recs = extract_pdf_text(encode_pdf(PAGES, compress=compress))
        assert [r["text"] for r in recs] == [
            t["text"] for p in PAGES for t in p["texts"]
        ]
        assert [(r["x"], r["y"], r["size"]) for r in recs] == [
            (t["x"], t["y"], float(t["size"]))
            for p in PAGES for t in p["texts"]
        ]
        assert [r["page_no"] for r in recs] == [1, 1, 2, 2]
        assert recs[2]["page_w"] == 595.0 and recs[2]["page_h"] == 842.0


def test_writer_deterministic():
    assert encode_pdf(PAGES) == encode_pdf(PAGES)


def test_text_machine_operators():
    """TD sets leading; T* and ' advance by it; TJ concatenates; hex
    strings decode; Tm positions absolutely (PDF 1.7 §9.4.2-9.4.3)."""
    content = b"""BT
/F1 12 Tf
20 TL
72 700 Td
(line one) Tj
0 -14 TD
(line two) Tj
T*
(line three) Tj
(line four) '
[ (kern) -120 (ed ar) 30 (ray) ] TJ
1 0 0 1 300 500 Tm
<48656C6C6F20686578> Tj
ET"""
    recs = _extract_page_text(content, 1)
    assert [(r["x"], r["y"], r["text"]) for r in recs] == [
        (72.0, 700.0, "line one"),
        (72.0, 686.0, "line two"),
        (72.0, 672.0, "line three"),
        (72.0, 658.0, "line four"),
        (72.0, 658.0, "kerned array"),
        (300.0, 500.0, "Hello hex"),
    ]


def test_string_escapes():
    content = rb"""BT /F1 10 Tf 0 0 Td
(octal: \101\102, nl: \n, paren: \(x\), cont: a\
b) Tj ET"""
    (rec,) = _extract_page_text(content, 1)
    assert rec["text"] == "octal: AB, nl: \n, paren: (x), cont: ab"


def test_extractor_rejects_non_pdf():
    with pytest.raises(ValueError):
        extract_pdf_text(b"\x89PNG not a pdf")


def test_fixtures_regenerate_identically():
    """The committed fixture bytes must match the generator's output —
    the determinism contract that makes them committable."""
    import importlib.util

    tools = Path(__file__).resolve().parents[1] / "tools/make_pdf_fixture.py"
    spec = importlib.util.spec_from_file_location("make_pdf_fixture", tools)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert (Path(SAMPLE_DIR) / "report.pdf").read_bytes() == mod.report_pdf()
    assert (Path(SAMPLE_DIR) / "memo.pdf").read_bytes() == mod.memo_pdf()


def test_build_pdf_records_known_answer():
    data = (Path(SAMPLE_DIR) / "report.pdf").read_bytes()
    rows = build_pdf_records("report", data)
    assert [r["doc_id"] for r in rows] == ["report#1", "report#2"]
    p1 = rows[0]
    kinds = [s["kind"] for s in p1["spans"]]
    texts = [s["text"] for s in p1["spans"]]
    assert kinds[0] == "title"                      # largest, first
    assert texts[0] == "Quarterly Extraction Report"
    assert kinds[texts.index("1. Overview")] == "section_header"
    assert kinds[texts.index("page 1 of 2")] == "page_footer"
    assert all(k == "text" for k, t in zip(kinds, texts)
               if t.startswith(("This", "Escapes", "Throughput")))
    # span-sequence invariant: offsets contiguous 0..n-1
    assert [s["offset"] for s in p1["spans"]] == list(range(len(kinds)))
    # boxes align 1:1, top-left origin within the page
    assert len(p1["boxes"]) == len(p1["spans"])
    for b in p1["boxes"]:
        assert 0 <= b["t"] < b["b"] <= 792.0 and 0 <= b["l"] < b["r"]
    p2 = rows[1]
    assert p2["n_headers"] == 1                     # "3. Appendix"
    assert p2["spans"][0]["kind"] == "section_header"


def test_builder_failure_row_on_corrupt_pdf():
    rows = build_pdf_records("bad", b"%PDF-1.4\ngarbage")
    # unparseable-but-PDF-headed input yields zero pages → no rows is
    # wrong; the builder must surface SOMETHING. Truly corrupt bytes
    # (no %PDF) produce one failure row.
    rows = build_pdf_records("bad", b"not a pdf at all")
    assert len(rows) == 1 and rows[0]["status"].startswith("failure:")
    assert rows[0]["spans"] == []


def test_slice_pdf_pages_standalone():
    data = (Path(SAMPLE_DIR) / "report.pdf").read_bytes()
    parts = slice_pdf(data)
    assert len(parts) == 2
    whole = extract_pdf_text(data)
    for i, part in enumerate(parts, start=1):
        page = extract_pdf_text(part)
        orig = [r for r in whole if r["page_no"] == i]
        assert [(r["x"], r["y"], r["size"], r["text"]) for r in page] == [
            (r["x"], r["y"], r["size"], r["text"]) for r in orig
        ]
        assert all(r["page_no"] == 1 for r in page)


def test_pdf_gt_build_dataset(ray_session):
    df = pdf_gt_build("").to_pandas()
    assert len(df) == 3  # report has 2 pages, memo 1
    assert set(df["status"]) == {"success"}
    assert (df["n_elements"] > 0).all()
    memo = df[df["doc_id"] == "memo#1"].iloc[0]
    assert memo["page_w"] == 595.0
    texts = [s["text"] for s in memo["spans"]]
    assert "Latin-1 bytes: café, naïve, Ångström." in texts


def test_flate_stream_ending_in_eol_bytes_roundtrips():
    """Regression: a compressed content stream whose LAST deflate byte
    is 0x0A/0x0D must not be truncated by endstream-EOL stripping (the
    direct /Length is authoritative). 'hello world 1000' reproduces a
    trailing-EOL deflate stream."""
    from docling_eval_ray.functions.pdf import encode_pdf, extract_pdf_text

    for i in range(1500):
        txt = f"hello world {i}"
        data = encode_pdf([{"width": 612, "height": 792, "texts": [
            {"x": 72, "y": 700, "size": 12, "text": txt}]}])
        recs = extract_pdf_text(data)
        assert recs and recs[0]["text"] == txt


def test_blank_pages_survive_build_and_slice():
    """Regression: a page with zero show-ops is legal and must emit an
    empty-span GT row and its own slice — never silently vanish."""
    from docling_eval_ray.functions.pdf import encode_pdf, pdf_page_sizes
    from docling_eval_ray.sources.pdf import build_pdf_records, slice_pdf

    data = encode_pdf([
        {"width": 612, "height": 792, "texts": [
            {"x": 72, "y": 700, "size": 12, "text": "page one"}]},
        {"width": 612, "height": 792, "texts": []},          # blank
        {"width": 400, "height": 500, "texts": [
            {"x": 50, "y": 400, "size": 10, "text": "page three"}]},
    ])
    assert [p["page_no"] for p in pdf_page_sizes(data)] == [1, 2, 3]
    rows = build_pdf_records("doc", data)
    assert [r["doc_id"] for r in rows] == ["doc#1", "doc#2", "doc#3"]
    assert rows[1]["spans"] == [] and rows[1]["status"] == "success"
    assert rows[1]["page_w"] == 612.0
    assert rows[2]["page_w"] == 400.0  # geometry from the page tree
    slices = slice_pdf(data)
    assert len(slices) == 3
    assert build_pdf_records("s1", slices[1])[0]["spans"] == []

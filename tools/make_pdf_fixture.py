"""Generate the committed PDF fixtures under tests/data/pdf_sample/.

Deterministic (fixed zlib level, fixed content), so the committed bytes
are reproducible: re-running this script must leave git clean.

Run from the repo root: python tools/make_pdf_fixture.py
"""

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from docling_eval_ray.functions.pdf import encode_pdf  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests/data/pdf_sample"


def report_pdf() -> bytes:
    """Two US-Letter pages: title + sections + body + footer."""
    return encode_pdf([
        {"width": 612, "height": 792, "texts": [
            {"x": 72, "y": 740, "size": 20,
             "text": "Quarterly Extraction Report"},
            {"x": 72, "y": 708, "size": 14, "text": "1. Overview"},
            {"x": 72, "y": 688, "size": 11,
             "text": "This document exercises the from-scratch PDF "
                     "text layer."},
            {"x": 72, "y": 672, "size": 11,
             "text": "Escapes: (parens), back\\slash, and a tab\tstop."},
            {"x": 72, "y": 640, "size": 14, "text": "2. Findings"},
            {"x": 72, "y": 620, "size": 11,
             "text": "Throughput grew 24 percent quarter over quarter."},
            {"x": 72, "y": 40, "size": 8, "text": "page 1 of 2"},
        ]},
        {"width": 612, "height": 792, "texts": [
            {"x": 72, "y": 740, "size": 14, "text": "3. Appendix"},
            {"x": 72, "y": 720, "size": 11,
             "text": "Second page body line one."},
            {"x": 72, "y": 704, "size": 11,
             "text": "Second page body line two."},
            {"x": 72, "y": 40, "size": 8, "text": "page 2 of 2"},
        ]},
    ])


def memo_pdf() -> bytes:
    """One A4 page, uncompressed streams (the raw-stream decode path)."""
    return encode_pdf([
        {"width": 595, "height": 842, "texts": [
            {"x": 50, "y": 800, "size": 16, "text": "Memo: fixtures"},
            {"x": 50, "y": 770, "size": 10,
             "text": "Uncompressed content stream variant."},
            {"x": 50, "y": 754, "size": 10,
             "text": "Latin-1 bytes: café, naïve, Ångström."},
        ]},
    ], compress=False)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "report.pdf").write_bytes(report_pdf())
    (OUT / "memo.pdf").write_bytes(memo_pdf())
    print("wrote", sorted(p.name for p in OUT.glob("*.pdf")))


if __name__ == "__main__":
    main()

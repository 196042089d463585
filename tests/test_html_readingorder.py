"""Raw-HTML main-content extraction + XY-cut reading-order
reconstruction."""

import numpy as np
import pytest

from docling_eval_ray.functions.html_extract import (
    html_to_spans,
    synth_html_for_doc,
)
from docling_eval_ray.functions.reading_order import xy_cut_order

SF_DIR = "/root/testdata/sf0.001"


HTML = """
<html><head><script>nope()</script><style>.x{}</style></head><body>
<nav><a href="/">home</a> <a href="/b">blog</a></nav>
<header>site masthead</header>
<h1>Main Title</h1>
<p>This is the first real paragraph with enough text to keep.</p>
<div><a href="/x">more</a> <a href="/y">links</a> <a href="/z">nav</a></div>
<h2>Section</h2>
<li>a list item with content</li>
<img src="pic/0">
<figcaption>a caption here</figcaption>
<p>Another real paragraph that survives <a href="/ref">with one link</a>
inside a longer text body.</p>
<aside><a href="/ads">sponsored</a></aside>
<footer>copyright</footer>
</body></html>
"""


def test_html_to_spans_strips_boilerplate():
    spans = html_to_spans(HTML)
    kinds = [s["kind"] for s in spans]
    texts = [s["text"] for s in spans]
    assert kinds[0] == "title" and texts[0] == "Main Title"
    assert "section_header" in kinds and "list_item" in kinds
    assert "picture" in kinds and "caption" in kinds
    # chrome gone: nav/header/footer/aside/script/style
    joined = " ".join(texts)
    assert "home" not in joined and "masthead" not in joined
    assert "sponsored" not in joined and "copyright" not in joined
    assert "nope()" not in joined
    # link-heavy div dropped, link-bearing long paragraph kept
    assert not any("more links" in t for t in texts)
    assert any("Another real paragraph" in t for t in texts)
    # offsets contiguous
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_html_extraction_pipeline(ray_session):
    from docling_eval_ray.functions.html_extract import html_extraction

    df = html_extraction(SF_DIR).to_pandas()
    assert len(df) == 500
    for spans in df.head(25)["spans"]:
        kinds = {s["kind"] for s in spans}
        assert "title" in kinds
        texts = " ".join(s["text"] for s in spans)
        assert "masthead" not in texts and "sponsored" not in texts


def test_synth_html_deterministic():
    a = synth_html_for_doc(7, "one two three four five six seven")
    assert a == synth_html_for_doc(7, "one two three four five six seven")
    assert "<nav>" in a and "<footer>" in a


# --- XY-cut ----------------------------------------------------------------

def test_xy_cut_single_column():
    boxes = np.array([[0, 30, 10, 40], [0, 0, 10, 10], [0, 15, 10, 25]],
                     dtype=float)
    assert xy_cut_order(boxes) == [1, 2, 0]


def test_xy_cut_two_columns():
    # left column (x 0-10), right column (x 50-60), true order: left
    # top/bottom then right top/bottom
    boxes = np.array(
        [
            [0, 0, 10, 10],    # 0 left-top
            [50, 0, 60, 10],   # 1 right-top
            [0, 20, 10, 30],   # 2 left-bottom
            [50, 20, 60, 30],  # 3 right-bottom
        ],
        dtype=float,
    )
    assert xy_cut_order(boxes) == [0, 2, 1, 3]


def test_xy_cut_stacked_sections():
    # a full-width header above two columns: header first
    boxes = np.array(
        [
            [0, 0, 60, 8],     # 0 header (full width)
            [0, 20, 10, 30],   # 1 left
            [50, 20, 60, 30],  # 2 right
        ],
        dtype=float,
    )
    assert xy_cut_order(boxes) == [0, 1, 2]


def test_reading_order_reconstruction(ray_session):
    from docling_eval_ray.functions.reading_order import (
        reading_order_reconstruction,
    )

    df = reading_order_reconstruction(SF_DIR).to_pandas()
    assert len(df) == 500
    # XY-cut recovers column-major layouts exactly despite the seeded
    # shuffle
    assert (df["ard_norm"] == 1.0).all()

"""Text visualization sinks (S10/S11 analogues, matplotlib-free).

The reference renders per-metric stats tables (stats.py:30-51
``to_table``), histograms (stats.py:53-74) and per-doc comparison HTML
(visualisation/visualisations.py). Here: deterministic text renderers —
the stats table in the reference's exact column layout, an ASCII
histogram, and a per-doc span diff."""

from __future__ import annotations

import numpy as np

# Module-scope, not lazy: page_underlay_rgb / overlay_comparison_html /
# boxes_image run INSIDE worker sink batches; runtime relative imports
# there die on workers that can't import the repo path. media/png/jpeg
# are leaf-wards modules — cycle-safe.
from ..functions.jpeg import decode_jpeg
from ..functions.png import (
    boxes_image,
    decode_png,
    draw_boxes_over,
    encode_png,
    resize_nearest,
)
from ..stages.media import HEADER_SIZE, synth_media_payload


def stats_to_table(stats: dict, metric_name: str) -> tuple[list[list[str]], list[str]]:
    """The reference's DatasetStatistics.to_table: one row per bin with
    probability / cumulative accuracy columns (stats.py:30-51)."""
    headers = [metric_name, "prob [%]", "acc [%]", "1-acc [%]", "total"]
    table: list[list[str]] = []
    total = stats["total"]
    bins, hist = stats["bins"], stats["hist"]
    cumsum = 0.0
    if total > 0:
        for i in range(len(bins) - 1):
            table.append(
                [
                    f"({bins[i]:.3f}, {bins[i + 1]:.3f}]",
                    f"{100.0 * float(hist[i]) / float(total):.2f}",
                    f"{100.0 * cumsum:.2f}",
                    f"{100.0 * (1.0 - cumsum):.2f}",
                    f"{hist[i]}",
                ]
            )
            cumsum += float(hist[i]) / float(total)
    return table, headers


def render_table(table: list[list[str]], headers: list[str]) -> str:
    widths = [
        max(len(headers[c]), *(len(r[c]) for r in table)) if table else len(headers[c])
        for c in range(len(headers))
    ]
    def fmt(row):
        return " | ".join(v.ljust(w) for v, w in zip(row, widths))
    lines = [fmt(headers), "-+-".join("-" * w for w in widths)]
    lines += [fmt(r) for r in table]
    return "\n".join(lines)


def ascii_histogram(stats: dict, width: int = 40) -> str:
    """Deterministic text histogram (stand-in for the matplotlib PNG)."""
    bins, hist = stats["bins"], stats["hist"]
    peak = max(hist) if hist and max(hist) > 0 else 1
    lines = []
    for i, h in enumerate(hist):
        bar = "#" * round(width * h / peak)
        lines.append(f"({bins[i]:7.3f}, {bins[i + 1]:7.3f}] {h:6d} {bar}")
    return "\n".join(lines)


def span_diff(gt_spans: list[dict], pred_spans: list[dict]) -> str:
    """Per-doc comparison view: aligned span listing with change marks
    (the text analogue of the reference's side-by-side HTML)."""
    key = lambda s: (s["kind"], s["text"], s["media_ref"])
    gt_keys = [key(s) for s in gt_spans]
    pred_keys = [key(s) for s in pred_spans]
    pred_set = set(pred_keys)
    gt_set = set(gt_keys)
    lines = []
    for s in gt_spans:
        mark = " " if key(s) in pred_set else "-"
        lines.append(f"{mark} [{s['offset']:3d}] {s['kind']:15s} {s['text'][:60]}")
    for s in pred_spans:
        if key(s) not in gt_set:
            lines.append(f"+ [{s['offset']:3d}] {s['kind']:15s} {s['text'][:60]}")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# per-doc comparison HTML sink (S11, visualisations.py:79-226 analogue)
# ---------------------------------------------------------------------------

_COMP_CSS = (
    "body{font-family:monospace}table{border-collapse:collapse}"
    "td,th{border:1px solid #999;padding:2px 6px;vertical-align:top}"
    ".miss{background:#fdd}.extra{background:#dfd}.page{display:inline-block;"
    "margin:4px}"
)


def _svg_page(boxes, color: str, order_line: bool = True,
              size: int = 300) -> str:
    """Render boxes (ltrb on a 100x100 page) + reading-order polyline as
    inline SVG — the PIL-free analogue of the reference's page overlay
    (readingorder_evaluator.py:298-498 draws arrows on page images)."""
    parts = [
        f'<svg class="page" width="{size}" height="{size}" '
        f'viewBox="0 0 100 100" style="border:1px solid #333">'
    ]
    centers = []
    for i, (l, t, r, b) in enumerate(boxes):
        parts.append(
            f'<rect x="{l:.1f}" y="{t:.1f}" width="{r - l:.1f}" '
            f'height="{b - t:.1f}" fill="none" stroke="{color}" '
            f'stroke-width="0.6"/>'
        )
        parts.append(
            f'<text x="{l + 1:.1f}" y="{t + 3:.1f}" font-size="3" '
            f'fill="{color}">{i}</text>'
        )
        centers.append(((l + r) / 2, (t + b) / 2))
    if order_line and len(centers) > 1:
        pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in centers)
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="#888" '
            f'stroke-width="0.4" stroke-dasharray="2,1"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def comparison_html(doc_id: str, gt_spans: list[dict],
                    pred_spans: list[dict], gt_boxes=None,
                    pred_boxes=None) -> str:
    """One document's side-by-side GT vs prediction page: SVG box
    overlays with the reading-order polyline plus an aligned span table
    with missing/extra highlighting (HTML-escaped text)."""
    import html as _html

    key = lambda s: (s["kind"], s["text"], s["media_ref"])
    gt_set = {key(s) for s in gt_spans}
    pred_set = {key(s) for s in pred_spans}
    rows = []
    for i in range(max(len(gt_spans), len(pred_spans))):
        cells = []
        for spans, other in ((gt_spans, pred_set), (pred_spans, gt_set)):
            if i < len(spans):
                s = spans[i]
                cls = "" if key(s) in other else (
                    " class=\"miss\"" if spans is gt_spans
                    else " class=\"extra\"")
                cells.append(
                    f"<td{cls}>[{s['offset']}] {s['kind']}: "
                    f"{_html.escape(s['text'][:80])}</td>"
                )
            else:
                cells.append("<td></td>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    svgs = ""
    if gt_boxes is not None and pred_boxes is not None:
        svgs = (
            "<div>" + _svg_page(gt_boxes, "#04a") +
            _svg_page(pred_boxes, "#a40") + "</div>"
        )
    return (
        f"<!DOCTYPE html><html><head><style>{_COMP_CSS}</style></head>"
        f"<body><h2>{_html.escape(doc_id)}</h2>{svgs}"
        f"<table><tr><th>ground truth</th><th>prediction</th></tr>"
        + "".join(rows) + "</table></body></html>"
    )


def write_comparison_html(eval_ds, out_dir: str):
    """Side-effect HTML sink over an eval-records Dataset
    ((doc_id, gt_spans, pred_spans, status) rows): one HTML file per
    document under ``out_dir``, written inside ``map_batches`` (each
    task writes its own batch's files — embarrassingly parallel, no
    driver gather). Returns a Dataset of (doc_id, path, n_bytes)."""
    from pathlib import Path

    import numpy as np
    import pyarrow as pa

    Path(out_dir).mkdir(parents=True, exist_ok=True)

    from ..pipelines.evaluate import _doc_boxes, _pred_shift
    # closure-bound at driver time: sink runs on workers off-repo

    def sink(t: pa.Table) -> pa.Table:

        ids, paths, sizes = [], [], []
        for r in t.to_pylist():
            doc_num = int(r["doc_id"].split("-")[-1])
            gt = r["gt_spans"]
            pred = r["pred_spans"]
            shift = _pred_shift(doc_num)
            html = comparison_html(
                r["doc_id"], gt, pred,
                gt_boxes=_doc_boxes(doc_num, len(gt)),
                pred_boxes=np.asarray(_doc_boxes(doc_num, len(pred)))
                + shift,
            )
            p = Path(out_dir) / f"{r['doc_id']}.html"
            p.write_text(html)
            ids.append(r["doc_id"])
            paths.append(str(p))
            sizes.append(len(html))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return eval_ds.map_batches(sink, batch_format="pyarrow")


def page_underlay_rgb(doc_id: str, *, width: int = 256,
                      height: int = 256) -> "np.ndarray":
    """Deterministic RGB page image for a document — the underlay the
    reference gets from ``record.ground_truth_page_images``
    (visualisation/visualisations.py:79-226 draws bbox overlays over
    the rasterized page). No PDF rasterizer ships in this container, so
    the page pixels come from the same deterministic media synthesis
    the decode stages use: refs whose seed selects the PNG/JPEG branch
    are REAL encoded images round-tripped through the from-scratch
    codecs; the rest get a flat light-gray page with deterministic
    faint texture (visibly an underlay, never all-white)."""
    payload = synth_media_payload(f"page/{doc_id}")
    body = payload[HEADER_SIZE:]
    img = None
    try:
        if body[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(body)
        elif body[:2] == b"\xff\xd8":
            img = decode_jpeg(body)
    except Exception:
        img = None  # corrupt body → textured stub, same as pixel census
    if img is not None:
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        # lighten so colored box strokes stay legible over noise pixels
        rgb = resize_nearest(img[:, :, :3], height, width)
        return (192 + rgb.astype(np.uint16) // 4).astype(np.uint8)
    import hashlib

    raw = b"".join(
        hashlib.blake2b(body + i.to_bytes(2, "big"), digest_size=64).digest()
        for i in range(-(-height * width // 64))
    )
    tex = np.frombuffer(raw[: height * width], dtype=np.uint8)
    page = (230 + (tex % 16)).astype(np.uint8).reshape(height, width)
    return np.repeat(page[:, :, None], 3, axis=2)


def overlay_comparison_html(doc_id: str, gt_spans: list[dict],
                            pred_spans: list[dict], gt_boxes, pred_boxes,
                            page_img) -> str:
    """Image-underlay twin of ``comparison_html`` (the reference's
    visualisations.py:79-226 page overlay): GT boxes (blue) and
    prediction boxes (red) each stroked over the SAME page image,
    encoded by the from-scratch PNG codec and embedded as base64 data
    URIs, followed by the aligned span table."""
    import base64
    import html as _html

    def as_dicts(arr):
        import numpy as np

        return [{"l": b[0], "t": b[1], "r": b[2], "b": b[3]}
                for b in np.asarray(arr).reshape(-1, 4)]

    imgs = []
    for boxes, color in ((gt_boxes, (31, 80, 180)),
                         (pred_boxes, (200, 40, 40))):
        over = draw_boxes_over(page_img, as_dicts(boxes),
                               page_w=100.0, page_h=100.0, color=color)
        b64 = base64.b64encode(encode_png(over)).decode("ascii")
        imgs.append(f'<img src="data:image/png;base64,{b64}" '
                    f'style="border:1px solid #333"/>')
    body = comparison_html(doc_id, gt_spans, pred_spans)
    # splice the underlay pair in where the SVG block would sit
    marker = f"<h2>{_html.escape(doc_id)}</h2>"
    return body.replace(
        marker, marker + "<div>" + "".join(imgs) + "</div>", 1
    )


def write_overlay_html(eval_ds, out_dir: str, *, width: int = 256,
                       height: int = 256):
    """Side-effect sink: one image-underlay overlay page per document
    (GT layer + prediction layer over the same page image), same
    embarrassingly-parallel shape as ``write_comparison_html`` — each
    map_batches task writes its own batch's files, returns
    (doc_id, path, n_bytes)."""
    from pathlib import Path

    import numpy as np
    import pyarrow as pa

    Path(out_dir).mkdir(parents=True, exist_ok=True)

    from ..pipelines.evaluate import _doc_boxes, _pred_shift
    # closure-bound at driver time: sink runs on workers off-repo

    def sink(t: pa.Table) -> pa.Table:

        ids, paths, sizes = [], [], []
        for r in t.to_pylist():
            doc_num = int(r["doc_id"].split("-")[-1])
            gt = r["gt_spans"]
            pred = r["pred_spans"]
            page = page_underlay_rgb(r["doc_id"], width=width,
                                     height=height)
            html = overlay_comparison_html(
                r["doc_id"], gt, pred,
                _doc_boxes(doc_num, len(gt)),
                np.asarray(_doc_boxes(doc_num, len(pred)))
                + _pred_shift(doc_num),
                page,
            )
            p = Path(out_dir) / f"{r['doc_id']}.overlay.html"
            p.write_text(html)
            ids.append(r["doc_id"])
            paths.append(str(p))
            sizes.append(len(html))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return eval_ds.map_batches(sink, batch_format="pyarrow")


def write_comparison_png(eval_ds, out_dir: str, *, width: int = 256,
                         height: int = 256):
    """PNG twin of ``write_comparison_html`` (reference S11 renders PNG
    pages via matplotlib, readingorder_evaluator.py:298-498): one PNG
    per document — GT page left, prediction page right, 4px divider —
    rasterized with numpy and encoded by the from-scratch stdlib codec
    (``functions/png.py``). Same embarrassingly-parallel sink shape:
    each map_batches task writes its own batch's files; returns
    (doc_id, path, n_bytes)."""
    from pathlib import Path

    import numpy as np
    import pyarrow as pa

    Path(out_dir).mkdir(parents=True, exist_ok=True)

    from ..pipelines.evaluate import _doc_boxes, _pred_shift

    def sink(t: pa.Table) -> pa.Table:

        def as_dicts(arr):
            return [{"l": b[0], "t": b[1], "r": b[2], "b": b[3]}
                    for b in np.asarray(arr).reshape(-1, 4)]

        ids, paths, sizes = [], [], []
        for r in t.to_pylist():
            doc_num = int(r["doc_id"].split("-")[-1])
            gt_boxes = as_dicts(_doc_boxes(doc_num, len(r["gt_spans"])))
            pred_boxes = as_dicts(
                np.asarray(_doc_boxes(doc_num, len(r["pred_spans"])))
                + _pred_shift(doc_num)
            )
            # _doc_boxes pages are 100×100 (evaluate.py geometry)
            gt_img = boxes_image(gt_boxes, width=width, height=height,
                                 page_w=100.0, page_h=100.0)
            pred_img = boxes_image(pred_boxes, width=width, height=height,
                                   page_w=100.0, page_h=100.0)
            divider = np.full((height, 4, 3), 0, np.uint8)
            png = encode_png(np.hstack([gt_img, divider, pred_img]))
            p = Path(out_dir) / f"{r['doc_id']}.png"
            p.write_bytes(png)
            ids.append(r["doc_id"])
            paths.append(str(p))
            sizes.append(len(png))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return eval_ds.map_batches(sink, batch_format="pyarrow")

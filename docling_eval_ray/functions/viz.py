"""Text visualization sinks (S10/S11 analogues, matplotlib-free).

The reference renders per-metric stats tables (stats.py:30-51
``to_table``), histograms (stats.py:53-74) and per-doc comparison HTML
(visualisation/visualisations.py). Here: deterministic text renderers —
the stats table in the reference's exact column layout, an ASCII
histogram, and a per-doc span diff."""

from __future__ import annotations


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

"""Per-stage latency/throughput metrics from Ray Data execution stats.

The north rule requires the pipeline to *emit throughput and per-stage
latency metrics* (reference: the per-modality timing tables of
``evaluators/timings_evaluator.py`` — here generalized to every
pipeline stage). Ray Data already measures everything per operator;
this module parses ``Dataset.stats()`` into structured rows so lineage
records (``state/lineage.py``) and the job runner can persist them:

    [{"stage": "ReadParquet->SplitBlocks(8)", "tasks": 1, "blocks": 8,
      "wall_s": 0.28, "rows_out": 500, "bytes_out": 8000,
      "rows_per_s": 1799.4}, ...]

Parsing the text summary (not private executor internals) keeps this
stable across Ray point releases: the header line and the starred
"Output …"/"throughput" lines are the documented stats format.
"""

from __future__ import annotations

import re

_HEADER = re.compile(
    r"^Operator\s+\d+\s+(?P<name>.+?):\s+(?P<tasks>\d+)\s+tasks executed,"
    r"\s+(?P<blocks>\d+)\s+blocks produced in\s+(?P<wall>[\d.]+)s",
    re.MULTILINE,
)
_ROWS = re.compile(r"Output num rows per block:.*?([\d]+)\s+total")
_BYTES = re.compile(r"Output size bytes per block:.*?([\d]+)\s+total")
_THROUGHPUT = re.compile(r"Ray Data throughput:\s+([\d.]+)\s+rows/s")


def parse_dataset_stats(stats_text: str) -> list[dict]:
    """Parse ``Dataset.stats()`` text into one dict per pipeline stage."""
    out: list[dict] = []
    headers = list(_HEADER.finditer(stats_text))
    for i, h in enumerate(headers):
        # the operator's detail block runs until the next header (or EOF)
        end = headers[i + 1].start() if i + 1 < len(headers) else len(
            stats_text
        )
        block = stats_text[h.end():end]
        rows = _ROWS.search(block)
        nbytes = _BYTES.search(block)
        thr = _THROUGHPUT.search(block)
        out.append(
            {
                "stage": h.group("name"),
                "tasks": int(h.group("tasks")),
                "blocks": int(h.group("blocks")),
                "wall_s": float(h.group("wall")),
                "rows_out": int(rows.group(1)) if rows else None,
                "bytes_out": int(nbytes.group(1)) if nbytes else None,
                "rows_per_s": float(thr.group(1)) if thr else None,
            }
        )
    return out


def dataset_stage_metrics(ds) -> list[dict]:
    """Per-stage metrics for an executed Dataset ([] if none parseable —
    metrics must never fail a committed partition)."""
    try:
        return parse_dataset_stats(ds.stats())
    except Exception:
        return []


def merge_stage_metrics(per_partition: list[list[dict]]) -> list[dict]:
    """Aggregate per-partition stage metrics by stage name (sum wall/
    rows/bytes/tasks) — the job-level per-stage latency table."""
    agg: dict[str, dict] = {}
    for metrics in per_partition:
        for m in metrics:
            a = agg.setdefault(
                m["stage"],
                {"stage": m["stage"], "tasks": 0, "blocks": 0,
                 "wall_s": 0.0, "rows_out": 0, "bytes_out": 0},
            )
            a["tasks"] += m["tasks"]
            a["blocks"] += m["blocks"]
            a["wall_s"] = round(a["wall_s"] + m["wall_s"], 3)
            if m.get("rows_out"):
                a["rows_out"] += m["rows_out"]
            if m.get("bytes_out"):
                a["bytes_out"] += m["bytes_out"]
    return list(agg.values())

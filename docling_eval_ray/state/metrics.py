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

Two operator header forms exist in the stats text:

* map-style — ``Operator 1 ReadParquet: 1 tasks executed, 8 blocks
  produced in 0.28s``;
* all-to-all (Aggregate / Sort / shuffle) — ``Operator 2 Aggregate:
  executed in 2.51s`` followed by indented Suboperator blocks.

Both are parsed (a latency table that silently omits the shuffle —
usually the most expensive stage — would be worse than none). For
all-to-all operators the rows/bytes are taken from the LAST suboperator
that reports them (the output side); ``tasks``/``blocks`` stay None.

Parsing the text summary (not private executor internals) keeps this
stable across Ray point releases.
"""

from __future__ import annotations

import re

_HEADER = re.compile(
    r"^Operator\s+\d+\s+(?P<name>.+?):\s+"
    r"(?:(?P<tasks>\d+)\s+tasks executed,"
    r"\s+(?P<blocks>\d+)\s+blocks produced in\s+(?P<wall>[\d.]+)s"
    r"|executed in\s+(?P<wall2>[\d.]+)s)",
    re.MULTILINE,
)
_ROWS = re.compile(r"Output num rows per block:.*?([\d]+)\s+total")
_BYTES = re.compile(r"Output size bytes per block:.*?([\d]+)\s+total")
_THROUGHPUT = re.compile(r"Ray Data throughput:\s+([\d.]+)\s+rows/s")


def _last(pattern: re.Pattern, text: str):
    hit = None
    for hit in pattern.finditer(text):
        pass
    return hit


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
        # dataset-LEVEL sections ("Dataset throughput:", iterator
        # breakdown) trail the operators; without this cut an operator
        # with no throughput line of its own (the common all-to-all
        # tail) would absorb the dataset-level "Ray Data throughput"
        # and report whole-pipeline throughput as its own
        tail = re.search(r"^Dataset (?:throughput|iterator|memory)",
                         block, re.MULTILINE)
        if tail:
            block = block[: tail.start()]
        is_map = h.group("tasks") is not None
        # all-to-all blocks list suboperators; take the LAST reported
        # rows/bytes (the output side), first throughput line otherwise
        rows = (_ROWS.search(block) if is_map else _last(_ROWS, block))
        nbytes = (_BYTES.search(block) if is_map else _last(_BYTES, block))
        thr = _THROUGHPUT.search(block)
        out.append(
            {
                "stage": h.group("name"),
                "tasks": int(h.group("tasks")) if is_map else None,
                "blocks": int(h.group("blocks")) if is_map else None,
                "wall_s": float(h.group("wall") or h.group("wall2")),
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


def _acc(slot, value):
    """None-aware accumulate: never conflate 'not reported' with 0."""
    if value is None:
        return slot
    return value if slot is None else slot + value


def merge_stage_metrics(per_partition: list[list[dict]]) -> list[dict]:
    """Aggregate per-partition stage metrics by stage name (sum wall/
    rows/bytes/tasks; unreported fields stay None instead of a fake 0)
    — the job-level per-stage latency table. The merged ``rows_per_s``
    is recomputed as total rows over summed wall time."""
    agg: dict[str, dict] = {}
    for metrics in per_partition:
        for m in metrics:
            a = agg.setdefault(
                m["stage"],
                {"stage": m["stage"], "tasks": None, "blocks": None,
                 "wall_s": 0.0, "rows_out": None, "bytes_out": None},
            )
            a["tasks"] = _acc(a["tasks"], m.get("tasks"))
            a["blocks"] = _acc(a["blocks"], m.get("blocks"))
            a["wall_s"] = round(a["wall_s"] + m["wall_s"], 3)
            a["rows_out"] = _acc(a["rows_out"], m.get("rows_out"))
            a["bytes_out"] = _acc(a["bytes_out"], m.get("bytes_out"))
    for a in agg.values():
        a["rows_per_s"] = (
            round(a["rows_out"] / a["wall_s"], 1)
            if a["rows_out"] is not None and a["wall_s"] > 0
            else None
        )
    return list(agg.values())

"""Registries + multi-evaluation orchestration (reference §2.10/§3.3).

* plain-dict registries (reference cli/main.py:152-225 `get_dataset_builder`,
  :228-403 `get_prediction_provider`): benchmark → source factory and
  provider → stage factory; users extend by registering callables.
* ``MultiEvaluator`` analogue (aggregations/multi_evalutor.py:142-283):
  run (benchmark × modality) evaluations with JSON-file result caching
  and dataset-level resume (skip when the cached JSON exists), then
  consolidate to the summary matrix.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

SOURCE_REGISTRY: dict[str, Callable] = {}
EVALUATOR_REGISTRY: dict[str, Callable] = {}


def register_source(name: str):
    def deco(fn):
        SOURCE_REGISTRY[name] = fn
        return fn

    return deco


def register_evaluator(name: str):
    def deco(fn):
        EVALUATOR_REGISTRY[name] = fn
        return fn

    return deco


def _bootstrap() -> None:
    from ..sources.interleaved import read_interleaved_documents
    from . import evaluate as ev

    SOURCE_REGISTRY.setdefault("interleaved", read_interleaved_documents)
    EVALUATOR_REGISTRY.setdefault("markdown", ev.evaluate_markdown)
    EVALUATOR_REGISTRY.setdefault("ocr", ev.evaluate_ocr)
    EVALUATOR_REGISTRY.setdefault("reading_order", ev.evaluate_reading_order)
    EVALUATOR_REGISTRY.setdefault("layout", ev.evaluate_layout)
    EVALUATOR_REGISTRY.setdefault("tables", ev.evaluate_tables)
    EVALUATOR_REGISTRY.setdefault("timings", ev.evaluate_timings)


# ---------------------------------------------------------------------------
# multi-evaluation with caching
# ---------------------------------------------------------------------------


def run_all_evaluations(sf_dir: str, out_dir: str,
                        modalities: list[str] | None = None) -> dict:
    """Run every registered evaluator over ``sf_dir``, caching each
    result as ``out_dir/evaluation_<modality>.json`` (resume = skip when
    the JSON exists, the reference's evaluation-level cache,
    multi_evalutor.py:268-273). Returns {modality: summary dict}."""
    from ..stages.stats import compute_stats

    _bootstrap()
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    results: dict[str, dict] = {}
    for name in modalities or sorted(EVALUATOR_REGISTRY):
        cache = Path(out_dir) / f"evaluation_{name}.json"
        if cache.exists():
            try:
                results[name] = json.loads(cache.read_text())
                results[name]["cached"] = True
                continue
            except json.JSONDecodeError:
                # truncated cache from a crash mid-write: recompute
                cache.unlink()
        ds = EVALUATOR_REGISTRY[name](sf_dir)
        schema = ds.schema()
        metric_cols = [
            n
            for n, t in zip(schema.names, schema.types)
            if str(t) in ("double", "float") and n != "doc_id"
        ]
        summary: dict = {"modality": name, "metrics": {}}
        mat = ds.materialize()  # small per-doc metric table, reused per col
        for col in metric_cols:
            summary["metrics"][col] = compute_stats(mat, col)
        # atomic cache write: temp + rename, so a crash never leaves a
        # truncated JSON behind
        import os

        tmp = cache.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(summary))
        os.replace(tmp, cache)
        summary["cached"] = False
        results[name] = summary
    return results


def consolidate(results: dict) -> "object":
    """Pivot {modality: summary} to the consolidation matrix
    (consolidator.py:143-205 analogue) — tiny, driver-side pandas."""
    import pandas as pd

    rows = []
    for modality, summary in sorted(results.items()):
        for metric, stats in sorted(summary.get("metrics", {}).items()):
            rows.append(
                {
                    "modality": modality,
                    "metric": metric,
                    "mean": round(stats["mean"], 6),
                    "median": round(stats["median"], 6),
                    "std": round(stats["std"], 6),
                    "total": stats["total"],
                }
            )
    return pd.DataFrame(rows)


def write_consolidation_workbook(df, out_path: str) -> str:
    """S10 Excel consolidation sink (consolidator.py:73-141): the
    consolidation matrix written as ONE sheet of stacked per-modality
    subtables, each preceded by a modality header row, columns
    width-fitted.

    With openpyxl present this writes a real ``.xlsx`` via
    ``pd.ExcelWriter``; this container has no Excel engine, so the
    portable fallback writes the identical stacked layout as
    ``<out>/consolidation.csv`` plus ``<out>/workbook.json`` recording
    the sheet name, per-modality start rows and fitted column widths —
    the exact state the reference's ``_format_excel`` derives.
    """
    import pandas as pd

    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    blocks = []
    layout = {"sheet": "consolidation", "modalities": {}, "col_widths": {}}
    startrow = 0
    for modality, sub in df.groupby("modality", sort=True):
        layout["modalities"][modality] = {"header_row": startrow + 1,
                                          "n_rows": len(sub)}
        header = pd.DataFrame(
            [[modality] + [""] * (len(df.columns) - 1)], columns=df.columns
        )
        blocks.append(header)
        blocks.append(sub)
        startrow += 1 + len(sub) + 1  # header + subtable + blank spacer
        blocks.append(
            pd.DataFrame([[""] * len(df.columns)], columns=df.columns)
        )
    stacked = pd.concat(blocks, ignore_index=True)
    for col in stacked.columns:
        layout["col_widths"][col] = int(
            max([len(str(col))] + [len(str(v)) for v in stacked[col]])
        )

    try:
        import openpyxl  # noqa: F401  (absent in this container)

        xlsx = out / "consolidation.xlsx"
        with pd.ExcelWriter(xlsx, engine="openpyxl") as writer:
            stacked.to_excel(writer, sheet_name=layout["sheet"], index=False)
        return str(xlsx)
    except ImportError:
        csv = out / "consolidation.csv"
        stacked.to_csv(csv, index=False)
        (out / "workbook.json").write_text(json.dumps(layout, indent=1))
        return str(csv)

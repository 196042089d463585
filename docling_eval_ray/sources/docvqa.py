"""DocVQA-style GT builder (M3 + G11: docvqa_builder.py:83-246): flat
QA rows → one record per document, grouped DISTRIBUTED.

Reference semantics:
* rows (docId, question, answers[]) are sorted by docId and grouped
  adjacent (docvqa_builder.py:209-240) — here the group-by-doc is the
  canonical Ray shape: ``bucketed_group_apply`` on ``doc_id`` (one
  shuffle; all of a doc's rows meet in one task), in-group order fixed
  by ``question_id`` (the reference relies on dataset order; an
  explicit key keeps the output deterministic under parallel reads);
* per document, cells interleave question (KEY) then its answers
  (VALUE) with sequential cell ids (docvqa_builder.py:105-143);
* each answer links BOTH ways: question→answer ``to_value`` and
  answer→question ``to_key`` (docvqa_builder.py:128-142).

The canonical ``spans`` column carries the cells in id order
(kind = key/value, offset = cell id).
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT

QA_LINK_STRUCT = pa.struct(
    [
        pa.field("source", pa.int32()),
        pa.field("target", pa.int32()),
        pa.field("label", pa.string()),
    ]
)

DOCVQA_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("links", pa.list_(QA_LINK_STRUCT)),
        pa.field("n_questions", pa.int32()),
        pa.field("n_cells", pa.int32()),
    ]
)

SAMPLE_JSONL = str(
    Path(__file__).resolve().parents[2]
    / "tests/data/docvqa_sample/qa.jsonl"
)


def _doc_record(doc_id: str, qa_items: list[dict]) -> dict:
    spans, links = [], []
    index = 0
    for qa in qa_items:
        spans.append(
            {"kind": "key", "text": qa["question"], "media_ref": "",
             "offset": index}
        )
        answer_index = index + 1
        for answer in qa["answers"]:
            spans.append(
                {"kind": "value", "text": answer, "media_ref": "",
                 "offset": answer_index}
            )
            links.append(
                {"source": index, "target": answer_index,
                 "label": "to_value"}
            )
            links.append(
                {"source": answer_index, "target": index,
                 "label": "to_key"}
            )
            answer_index += 1
        index = answer_index
    return {
        "doc_id": doc_id, "spans": spans, "links": links,
        "n_questions": len(qa_items), "n_cells": len(spans),
    }


def build_docvqa_gt(jsonl_path: str):
    """QA JSON-lines → Dataset(DOCVQA_GT_SCHEMA), one row per doc."""
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    raw = rd.read_binary_files([jsonl_path])

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for b in t["bytes"].to_pylist():
            for line in b.decode().splitlines():
                if line.strip():
                    r = json.loads(line)
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "question_id": int(r["question_id"]),
                            "question": r["question"],
                            "answers_json": json.dumps(r["answers"]),
                        }
                    )
        return pa.Table.from_pylist(rows)

    flat = raw.map_batches(parse, batch_format="pyarrow")

    def group_docs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "question_id"], kind="mergesort")
        out = []
        for doc_id, sub in g.groupby("doc_id", sort=False):
            qa_items = [
                {"question": q, "answers": json.loads(a)}
                for q, a in zip(sub["question"], sub["answers_json"])
            ]
            out.append(_doc_record(doc_id, qa_items))
        return pd.DataFrame(
            out,
            columns=["doc_id", "spans", "links", "n_questions", "n_cells"],
        )

    return bucketed_group_apply(flat, ["doc_id"], group_docs)


def docvqa_gt_build(sf_dir: str = ""):
    """Driver query over the committed sample QA rows."""
    return build_docvqa_gt(SAMPLE_JSONL)


DOCVQA_FLAT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("n_questions", pa.int64()),
        pa.field("n_cells", pa.int64()),
    ]
)


def docvqa_gt_flat(sf_dir: str = ""):
    """Hash-oracled flat view of ``docvqa_gt_build``: one row per
    QA-graph cell with the per-doc counters. The DuckDB oracle
    re-derives the question/answer interleaving and sequential cell
    ids from the committed ``qa.jsonl`` with a window-sum over
    ``1 + len(answers)`` (VERDICT r4 ask #3)."""

    def explode(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            for sp in r["spans"]:
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "offset": sp["offset"],
                        "kind": sp["kind"],
                        "text": sp["text"],
                        "n_questions": r["n_questions"],
                        "n_cells": r["n_cells"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=DOCVQA_FLAT_SCHEMA)

    return build_docvqa_gt(SAMPLE_JSONL).map_batches(
        explode, batch_format="pyarrow"
    )

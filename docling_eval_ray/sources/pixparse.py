"""PixParse-style OCR ground-truth builder — a REAL benchmark GT
builder (M3) over committed per-document folders, via
``read_binary_files → map_batches(build_gt)``.

Reference semantics (dataset_builders/pixparse_builder.py):

* one folder per document holding ``ground_truth.json`` (pages of
  parallel ``text`` / ``bbox`` / ``score`` arrays) and an
  ``original.tif`` page image (pixparse_builder.py:116-186);
* a folder with a ground truth but NO image file is skipped
  (pixparse_builder.py:141-144);
* every OCR word becomes a text cell: box arrives as [l, t, w, h] and
  converts to ltrb top-left origin, text + confidence carried
  (pixparse_builder.py:93-110);
* the image itself rides as an opaque binary (here: a ``media_ref``
  side-table key + byte count — this repo never inlines media).

Beyond the reference, the builder emits a ``reading_order`` column —
the XY-cut permutation of the word boxes (functions/reading_order.py) —
so the OCR GT plugs directly into the reading-order evaluator; the span
sequence itself keeps the file's original word order (offset = source
position), matching the reference's textline_cells order.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT
from ..functions.reading_order import xy_cut_order

WORD_STRUCT = pa.struct(
    [
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
        pa.field("text", pa.string()),
        pa.field("score", pa.float64()),
    ]
)

PIXPARSE_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("words", pa.list_(WORD_STRUCT)),
        pa.field("reading_order", pa.list_(pa.int32())),
        pa.field("media_ref", pa.string()),
        pa.field("image_bytes", pa.int64()),
        pa.field("n_pages", pa.int32()),
        pa.field("n_words", pa.int32()),
        pa.field("status", pa.string()),
    ]
)

SAMPLE_DIR = str(
    Path(__file__).resolve().parents[2] / "tests/data/pixparse_sample"
)


def build_pixparse_record(doc_id: str, gt_data: dict,
                          image_n_bytes: int) -> dict:
    """ground_truth.json dict (+ image size) → canonical GT row."""
    spans, words = [], []
    n_pages = 0
    for page in gt_data["pages"]:
        n_pages += 1
        for text, bbox, score in zip(page["text"], page["bbox"],
                                     page["score"]):
            l, t, w, h = (float(v) for v in bbox)
            words.append(
                {
                    "l": l, "t": t, "r": l + w, "b": t + h,
                    "text": text, "score": float(score),
                }
            )
            spans.append(
                {
                    "kind": "word",
                    "text": text,
                    "media_ref": "",
                    "offset": len(spans),
                }
            )
    boxes = np.array(
        [[wd["l"], wd["t"], wd["r"], wd["b"]] for wd in words],
        dtype=np.float64,
    ).reshape(-1, 4)
    order = xy_cut_order(boxes) if len(words) else []
    return {
        "doc_id": doc_id,
        "spans": spans,
        "words": words,
        "reading_order": [int(i) for i in order],
        "media_ref": f"img/{doc_id}/page1",
        "image_bytes": image_n_bytes,
        "n_pages": n_pages,
        "n_words": len(words),
        "status": "ok",
    }


def build_pixparse_gt(root: str):
    """Folder-of-folders → Dataset(PIXPARSE_GT_SCHEMA).

    Only the ``ground_truth.json`` files are read as the Dataset (one
    independent record per document — no cross-file grouping, no
    repartition); each task probes its sibling ``original.tif`` on the
    shared store, mirroring the reference's existence check
    (pixparse_builder.py:141-144). Folders without an image are
    skipped."""
    import ray.data as rd

    paths = sorted(str(p) for p in Path(root).rglob("ground_truth.json"))
    ds = rd.read_binary_files(paths, include_paths=True)

    def build(t: pa.Table) -> pa.Table:
        rows = []
        for p, raw in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            folder = Path(p).parent
            image = folder / "original.tif"
            if not image.exists():
                continue  # pixparse_builder.py:141-144
            try:
                gt = json.loads(raw)
                rows.append(
                    build_pixparse_record(
                        folder.name, gt, image.stat().st_size
                    )
                )
            except Exception as e:  # per-doc skip-and-count
                rows.append(
                    {
                        "doc_id": folder.name,
                        "spans": [], "words": [], "reading_order": [],
                        "media_ref": "", "image_bytes": 0,
                        "n_pages": 0, "n_words": 0,
                        "status": f"error: {type(e).__name__}",
                    }
                )
        return pa.Table.from_pylist(rows, schema=PIXPARSE_GT_SCHEMA)

    return ds.map_batches(build, batch_format="pyarrow")


def pixparse_gt_build(sf_dir: str = ""):
    """Driver query over the committed raw sample."""
    return build_pixparse_gt(SAMPLE_DIR)


PIXPARSE_FLAT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
        pa.field("score", pa.float64()),
        pa.field("media_ref", pa.string()),
        pa.field("image_bytes", pa.int64()),
        pa.field("n_pages", pa.int64()),
        pa.field("n_words", pa.int64()),
    ]
)


def pixparse_gt_flat(sf_dir: str = ""):
    """Hash-oracled flat view of ``pixparse_gt_build``: one row per OCR
    word in SOURCE order (offset = file position — the span order the
    builder emits; the beyond-reference XY-cut ``reading_order`` column
    is pytest-covered separately). The DuckDB oracle re-derives the
    folder pairing (ground_truth.json ⋈ original.tif via glob/read_blob
    — the missing-image skip), the typed-schema parse with
    ignore_errors (the malformed-JSON doc contributes zero flat rows on
    both sides), ltwh→ltrb and the page/word census."""
    import numpy as np

    def explode(t: pa.Table) -> pa.Table:
        rows = []
        for r in t.to_pylist():
            if r["status"] != "ok":
                continue
            for sp, wd in zip(r["spans"], r["words"]):
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "offset": sp["offset"],
                        "kind": sp["kind"],
                        "text": sp["text"],
                        "l": float(np.round(wd["l"], 6)),
                        "t": float(np.round(wd["t"], 6)),
                        "r": float(np.round(wd["r"], 6)),
                        "b": float(np.round(wd["b"], 6)),
                        "score": float(np.round(wd["score"], 6)),
                        "media_ref": r["media_ref"],
                        "image_bytes": r["image_bytes"],
                        "n_pages": r["n_pages"],
                        "n_words": r["n_words"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=PIXPARSE_FLAT_SCHEMA)

    return build_pixparse_gt(SAMPLE_DIR).map_batches(
        explode, batch_format="pyarrow"
    )

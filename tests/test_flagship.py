"""Flagship extraction: span-sequence invariant vs an independent
single-process reference implementation (golden equality, the
reference repo's conformance style — SURVEY.md §5)."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_eval_ray.datamodel.schema import FURNITURE_KINDS, SPAN_STRUCT
from docling_eval_ray.functions.spans import span_sequences_equal
from docling_eval_ray.pipelines.flagship import flagship
from docling_eval_ray.sources.interleaved import synth_spans_for_doc

SF_DIR = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def reference_extract(spans: list[dict]) -> list[dict]:
    """Independent row-at-a-time reimplementation of the extraction
    semantics (furniture strip, link-density boilerplate strip,
    whitespace normalize, offset renumber)."""
    out = []
    for s in spans:
        if s["kind"] in FURNITURE_KINDS:
            continue
        text = _WS.sub(" ", s["text"]).strip()
        if s["kind"] in ("text", "paragraph"):
            toks = text.count(" ") + 1
            if text.count("|") / toks >= 0.25:
                continue
        if not text and not s["media_ref"]:
            continue
        out.append(
            {
                "kind": s["kind"],
                "text": text,
                "media_ref": s["media_ref"],
                "offset": len(out),
            }
        )
    return out


def _expected_table() -> pa.Table:
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        rows.append(
            {
                "doc_id": f"doc-{did:06d}",
                "spans": reference_extract(synth_spans_for_doc(did, text)),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(SPAN_STRUCT))]
        ),
    )


def test_flagship_span_sequence_equality():
    got = pa.concat_tables(
        [pa.table(b) for b in flagship(SF_DIR).iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    expected = _expected_table()
    assert got.num_rows == expected.num_rows == 500
    assert span_sequences_equal(got, expected)


def test_flagship_properties():
    ds = flagship(SF_DIR)
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    assert set(t["status"].to_pylist()) == {"success"}
    for spans in t["spans"].to_pylist():
        kinds = [s["kind"] for s in spans]
        assert not (set(kinds) & set(FURNITURE_KINDS))
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        for s in spans:
            if s["media_ref"]:
                assert s["kind"] in ("picture", "table")
            # normalized: no double spaces / leading-trailing ws
            assert "  " not in s["text"] and s["text"] == s["text"].strip()


def test_offsets_contiguous_in_source():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    spans = synth_spans_for_doc(
        docs["doc_id"][0].as_py(), docs["text"][0].as_py()
    )
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert spans[0]["kind"] == "page_header" and spans[-1]["kind"] == "page_footer"


@pytest.mark.parametrize("doc_id,text", [(7, "a b"), (3, ""), (0, "one two three")])
def test_synth_edge_cases(doc_id, text):
    spans = synth_spans_for_doc(doc_id, text)
    assert spans[0]["kind"] == "page_header"
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_synth_batch_matches_per_doc_spec():
    """_synth_batch's inlined fast rendition must equal the per-doc
    specification (synth_spans_for_doc) row-for-row — the guard that
    lets the batch path skip per-span dicts without drifting."""
    import pyarrow as pa

    from docling_eval_ray.sources.interleaved import (
        _synth_batch,
        synth_spans_for_doc,
    )

    texts = [
        "",  # empty → 'untitled' title, no chunks
        "one two",  # fewer than 3 title words
        ("alpha beta gamma " + "tok " * 57).strip(),  # every branch
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(20, 20 + len(texts))),
                               pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = _synth_batch(batch)
    for i in range(len(texts)):
        spec = synth_spans_for_doc(20 + i, texts[i])
        assert out["spans"][i].as_py() == spec
        assert out["doc_id"][i].as_py() == f"doc-{20 + i:06d}"

"""Cloud-provider harness (A5): retry on transient errors, permanent
failures trapped to status rows, token-bucket rate limiting, response
normalization."""

import time

import pytest

from docling_eval_ray.stages.providers import (
    ApiPredictionProvider,
    FakeDocApiClient,
    PermanentApiError,
    TokenBucket,
    api_predictions,
    normalize_api_response,
)


def test_normalize_api_response_known_answer():
    payload = (
        '{"Blocks": [{"BlockType": "LINE", "Text": "hello world"},'
        '{"BlockType": "TABLE", "Text": ""},'
        '{"BlockType": "FIGURE", "Text": ""},'
        '{"BlockType": "LINE", "Text": ""}]}'
    )
    spans = normalize_api_response(payload)
    assert [(s["kind"], s["text"], bool(s["media_ref"])) for s in spans] == [
        ("text", "hello world", False),
        ("table", "", True),
        ("picture", "", True),
    ]
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_retry_and_skip_and_count():
    """Transient docs succeed after retries (n_attempts > 1); permanent
    docs become status=failure rows — never raised exceptions."""
    import pyarrow as pa

    from docling_eval_ray.datamodel.schema import SPAN_STRUCT

    provider = ApiPredictionProvider(backoff_base_s=0.0)
    spans = [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]
    t = pa.table(
        {
            # 17 → transient (succeeds on 3rd attempt), 97 → permanent,
            # 5 → clean
            "doc_id": pa.array(["doc-000017", "doc-000097", "doc-000005"]),
            "spans": pa.array([spans, spans, spans],
                              pa.list_(SPAN_STRUCT)),
        }
    )
    out = provider(t).to_pylist()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["doc-000017"]["status"] == "success"
    assert by_id["doc-000017"]["n_attempts"] == 3
    assert by_id["doc-000097"]["status"] == "failure"
    assert by_id["doc-000097"]["prediction"] == ""
    assert by_id["doc-000005"]["status"] == "success"
    assert by_id["doc-000005"]["n_attempts"] == 1


def test_retry_exhaustion_becomes_failure():
    provider = ApiPredictionProvider(
        client_factory=lambda: FakeDocApiClient(transient_fails=10),
        max_retries=2, backoff_base_s=0.0,
    )
    import pyarrow as pa

    from docling_eval_ray.datamodel.schema import SPAN_STRUCT

    t = pa.table(
        {
            "doc_id": pa.array(["doc-000017"]),
            "spans": pa.array(
                [[{"kind": "text", "text": "x", "media_ref": "",
                   "offset": 0}]], pa.list_(SPAN_STRUCT)),
        }
    )
    out = provider(t).to_pylist()[0]
    assert out["status"] == "failure" and out["n_attempts"] == 3


def test_token_bucket_paces_calls():
    bucket = TokenBucket(rate_per_s=200.0, burst=1)
    t0 = time.monotonic()
    for _ in range(11):
        bucket.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.045  # 10 post-burst tokens at 200/s ≥ 50ms − slack
    assert TokenBucket(None).acquire() is None  # disabled: no pacing


def test_api_predictions_pipeline(ray_session):
    df = api_predictions("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    counts = df["status"].value_counts()
    assert counts.get("failure", 0) > 0  # permanent_every=97 docs
    assert (df[df["status"] == "success"]["n_attempts"] >= 1).all()
    # successful docs that needed retries are exactly the transient set
    retried = df[(df["n_attempts"] > 1) & (df["status"] == "success")]
    assert len(retried) > 0
    assert (retried["doc_id"].str.split("-").str[1].astype(int)
            % 17 == 0).all()
    ok = df[df["status"] == "success"].iloc[0]
    assert len(ok["pred_spans"]) > 0


def test_poisoned_normalize_stays_a_status_row(monkeypatch):
    """A payload that the normalizer cannot parse must become ONE
    aligned failure row (error class recorded), never a column-length
    mismatch (the double-append regression) or a raised exception."""
    import docling_eval_ray.stages.providers as prov

    def boom(payload):
        raise ValueError("malformed payload")

    monkeypatch.setattr(prov, "normalize_api_response", boom)
    import pyarrow as pa

    from docling_eval_ray.datamodel.schema import SPAN_STRUCT

    stage = prov.ApiPredictionProvider(rate_per_s=None)
    t = pa.table(
        {
            "doc_id": pa.array(["doc-000001", "doc-000002"], pa.string()),
            "spans": pa.array(
                [[{"kind": "text", "text": "a", "media_ref": "",
                   "offset": 0}]] * 2,
                pa.list_(SPAN_STRUCT),
            ),
        }
    )
    out = stage(t)
    assert out.num_rows == 2
    assert out["status"].to_pylist() == ["failure", "failure"]
    assert all(p.startswith("<error:ValueError>")
               for p in out["prediction"].to_pylist())


def test_normalize_azure_response_known_answer():
    """Azure role map + item order (tables, paragraphs, figures —
    mirroring convert_azure_output_to_docling's three loops)."""
    import json

    from docling_eval_ray.stages.providers import normalize_azure_response

    payload = json.dumps(
        {
            "pages": [{"page_number": 1, "width": 612, "height": 792}],
            "tables": [
                {
                    "row_count": 2,
                    "column_count": 2,
                    "cells": [
                        # deliberately out of order: normalizer sorts
                        # row-major by (row_index, column_index)
                        {"content": "d", "row_index": 1, "column_index": 1},
                        {"content": "a", "row_index": 0, "column_index": 0},
                        {"content": "c", "row_index": 1, "column_index": 0},
                        {"content": "b", "row_index": 0, "column_index": 1},
                    ],
                }
            ],
            "paragraphs": [
                {"content": "Doc Title", "role": "title"},
                {"content": "Intro", "role": "sectionHeading"},
                {"content": "Body text."},
                {"content": "p. 3", "role": "pageNumber"},
                {"content": "Conf 2024", "role": "pageHeader"},
                {"content": "fine print", "role": "pageFooter"},
                {"content": "see [1]", "role": "footnote"},
            ],
            "figures": [{"boundingRegions": [{"pageNumber": 1}]}],
        }
    )
    spans = normalize_azure_response(payload)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("table", "a b c d"),
        ("title", "Doc Title"),
        ("section_header", "Intro"),
        ("text", "Body text."),
        ("text", "p. 3"),
        ("page_header", "Conf 2024"),
        ("page_footer", "fine print"),
        ("text", "see [1]"),  # footnote folds to TEXT (reference :239)
        ("picture", ""),
    ]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert spans[0]["media_ref"] and spans[-1]["media_ref"]
    assert all(not s["media_ref"] for s in spans[1:-1])


def test_normalize_google_response_known_answer():
    """Google textAnchor slicing into the global text buffer; paragraphs
    before tables per page; header rows before body rows row-major."""
    import json

    from docling_eval_ray.stages.providers import normalize_google_response

    text = "Hello world.Col1Col2v1v2"
    seg = lambda a, b: {"textAnchor": {"textSegments": [
        {"startIndex": a, "endIndex": b}]}}
    payload = json.dumps(
        {
            "text": text,
            "pages": [
                {
                    "pageNumber": 1,
                    "paragraphs": [{"layout": seg(0, 12)}],
                    "tables": [
                        {
                            "headerRows": [{"cells": [
                                {"layout": seg(12, 16)},
                                {"layout": seg(16, 20)},
                            ]}],
                            "bodyRows": [{"cells": [
                                {"layout": seg(20, 22)},
                                {"layout": seg(22, 24)},
                            ]}],
                        }
                    ],
                }
            ],
        }
    )
    spans = normalize_google_response(payload)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("text", "Hello world."),
        ("table", "Col1 Col2 v1 v2"),
    ]
    # out-of-range anchor start resolves to empty text, and the empty
    # media-less paragraph is dropped (Textract-normalizer contract) —
    # never an exception
    bad = json.dumps({"text": "ab", "pages": [{"paragraphs": [
        {"layout": seg(5, 9)}]}]})
    assert normalize_google_response(bad) == []


@pytest.mark.parametrize("shape", ["textract", "azure", "google"])
def test_provider_shapes_roundtrip(shape):
    """Every provider dialect round-trips a span sequence through its
    fake client + normalizer with text content preserved (Google folds
    all prose kinds to 'text' and has no figure items — the reference's
    own fidelity limits)."""
    import pyarrow as pa

    from docling_eval_ray.datamodel.schema import SPAN_STRUCT
    from docling_eval_ray.stages.providers import (
        PROVIDER_SHAPES,
        ApiPredictionProvider,
    )

    spans = [
        {"kind": "title", "text": "T", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "body one", "media_ref": "", "offset": 1},
        {"kind": "table", "text": "h1 h2", "media_ref": "m/t/0",
         "offset": 2},
        {"kind": "picture", "text": "", "media_ref": "m/p/0", "offset": 3},
        {"kind": "text", "text": "tail", "media_ref": "", "offset": 4},
    ]
    client_factory, normalizer = PROVIDER_SHAPES[shape]
    provider = ApiPredictionProvider(
        client_factory=client_factory, normalizer=normalizer,
        backoff_base_s=0.0,
    )
    t = pa.table(
        {
            "doc_id": pa.array(["doc-000005"], pa.string()),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
        }
    )
    out = provider(t).to_pylist()[0]
    assert out["status"] == "success"
    got = out["pred_spans"]
    assert [s["offset"] for s in got] == list(range(len(got)))
    texts = " ".join(s["text"] for s in got if s["text"])
    for frag in ("T", "body one", "h1 h2", "tail"):
        assert frag in texts
    assert sum(s["kind"] == "table" for s in got) == 1
    if shape != "google":
        assert sum(s["kind"] == "picture" for s in got) == 1
    if shape == "azure":  # only Azure's role field preserves headings
        assert [s["kind"] for s in got if s["kind"] == "title"] == ["title"]


def test_api_predictions_shape_param(ray_session):
    from docling_eval_ray.stages.providers import api_predictions

    df = api_predictions("/root/testdata/sf0.001", shape="azure").to_pandas()
    assert len(df) == 500
    assert (df["status"] == "success").all()  # fakes raise only on textract
    assert df["pred_spans"].str.len().min() >= 0

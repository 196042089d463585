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

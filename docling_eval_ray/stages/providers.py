"""Cloud-API prediction provider stage (A5): rate-limited, retrying
actor pool.

The reference ships AWS/Azure/Google providers
(aws_prediction_provider.py:505-553, azure_prediction_provider.py:320-402,
google_prediction_provider.py:262-338) as per-row client calls with
try/except → status=FAILURE fallback, but NO rate cap or retry — at
cluster scale a provider stage must bound the aggregate request rate
and absorb transient API errors without tripping Ray task retries.
This module supplies that harness around a pluggable client:

* ``TokenBucket`` — per-actor rate limiter; aggregate rate =
  ``rate_per_s × concurrency`` (size the pool to the API quota).
* ``ApiPredictionProvider`` — callable class for
  ``map_batches(..., concurrency=N)``: client built once per actor
  (``__init__``), per-row call with exponential backoff on
  ``TransientApiError`` (deterministic jitter seeded per doc), permanent
  failures trapped into ``status='failure'`` (skip-and-count,
  base_prediction_provider.py:366-376 — NEVER a raised exception, so
  Ray does not retry-loop a poisoned row).
* ``normalize_api_response`` — the provider-output → span-sequence
  normalizer (analogue of convert_aws_output_to_docling,
  aws_prediction_provider.py:190-500) over a Textract-shaped
  ``{"Blocks": [{"BlockType", "Text"}]}`` payload.
* ``FakeDocApiClient`` — deterministic offline stand-in for the cloud
  client (this container has no network): emits a Textract-shaped
  response derived from the document's spans; raises transient errors
  on a fixed doc subset (exercises retry) and permanent errors on
  another (exercises skip-and-count).
"""

from __future__ import annotations

import json
import time

import numpy as np
import pyarrow as pa

# Module-scope, not lazy: __call__ runs on workers (actor pool); a
# runtime relative import there dies on workers that can't import the
# repo path. datamodel.schema is a leaf module — cycle-safe.
from ..datamodel.schema import SPAN_STRUCT


class TransientApiError(Exception):
    """Retriable (throttle / 5xx-shaped) API failure."""


class PermanentApiError(Exception):
    """Non-retriable (4xx-shaped) API failure."""


class TokenBucket:
    """Simple token-bucket rate limiter: ``acquire()`` blocks until a
    token is available. ``rate_per_s=None`` disables limiting."""

    def __init__(self, rate_per_s: float | None, burst: int = 1):
        self._rate = rate_per_s
        self._capacity = max(1, burst)
        self._tokens = float(self._capacity)
        self._last = time.monotonic()

    def acquire(self) -> None:
        if self._rate is None:
            return
        while True:
            now = time.monotonic()
            self._tokens = min(
                self._capacity, self._tokens + (now - self._last) * self._rate
            )
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return
            time.sleep((1.0 - self._tokens) / self._rate)


class FakeDocApiClient:
    """Deterministic offline client: Textract-shaped response from the
    document's own spans. ``transient_every`` docs throw a
    TransientApiError on their first ``transient_fails`` attempts;
    ``permanent_every`` docs always throw PermanentApiError."""

    def __init__(self, transient_every: int = 17, transient_fails: int = 2,
                 permanent_every: int = 97):
        self._transient_every = transient_every
        self._transient_fails = transient_fails
        self._permanent_every = permanent_every
        self._attempts: dict[str, int] = {}

    def analyze_document(self, doc_id: str, spans: list[dict]) -> str:
        doc_num = int(doc_id.split("-")[-1])
        if self._permanent_every and doc_num % self._permanent_every == 0:
            raise PermanentApiError(f"unsupported document {doc_id}")
        # attempt tracking only for transient-eligible docs, evicted on
        # success — per-actor state must stay bounded over a corpus pass
        if self._transient_every and doc_num % self._transient_every == 0:
            n = self._attempts[doc_id] = self._attempts.get(doc_id, 0) + 1
            if n <= self._transient_fails:
                raise TransientApiError(f"throttled {doc_id} (attempt {n})")
            self._attempts.pop(doc_id, None)
        blocks = [
            {
                "BlockType": "TABLE" if s["kind"] == "table"
                else "FIGURE" if s["kind"] == "picture"
                else "LINE",
                "Text": s["text"],
            }
            for s in spans
        ]
        return json.dumps({"Blocks": blocks})


def normalize_api_response(payload: str) -> list[dict]:
    """Textract-shaped JSON → canonical span sequence (the
    convert_*_output_to_docling analogue): LINE→text, TABLE→table,
    FIGURE→picture; blocks without text and without media are dropped."""
    data = json.loads(payload)
    spans = []
    for b in data.get("Blocks", []):
        bt = b.get("BlockType", "LINE")
        kind = {"TABLE": "table", "FIGURE": "picture"}.get(bt, "text")
        text = b.get("Text", "") or ""
        media = (
            f"api/{kind}/{len(spans)}" if kind in ("table", "picture")
            else ""
        )
        if not text and not media:
            continue
        spans.append(
            {"kind": kind, "text": text, "media_ref": media,
             "offset": len(spans)}
        )
    return spans


class FakeAzureApiClient:
    """Deterministic offline client emitting an Azure Document
    Intelligence-shaped ``analyze_result`` (the payload consumed by
    convert_azure_output_to_docling, azure_prediction_provider.py:114-315)
    derived from the document's own spans: paragraphs carry a ``role``
    per kind, table spans become ``tables`` entries with row/col-indexed
    cells, picture spans become ``figures`` entries."""

    _ROLE = {
        "title": "title",
        "section_header": "sectionHeading",
        "page_header": "pageHeader",
        "page_footer": "pageFooter",
        "footnote": "footnote",
    }

    def analyze_document(self, doc_id: str, spans: list[dict]) -> str:
        paragraphs, tables, figures = [], [], []
        poly = [0, 0, 10, 0, 10, 10, 0, 10]  # x1,y1,...,x4,y4 flat form
        region = [{"pageNumber": 1, "polygon": poly}]
        for s in spans:
            if s["kind"] == "table":
                cells = [
                    {"content": w, "row_index": 0, "column_index": i,
                     "row_span": 1, "column_span": 1,
                     "bounding_regions": region}
                    for i, w in enumerate(s["text"].split())
                ] or [{"content": s["text"], "row_index": 0,
                       "column_index": 0, "row_span": 1, "column_span": 1,
                       "bounding_regions": region}]
                tables.append(
                    {"row_count": 1,
                     "column_count": max(len(cells), 1),
                     "bounding_regions": region, "cells": cells}
                )
            elif s["kind"] == "picture":
                figures.append({"boundingRegions": region})
            else:
                para = {"content": s["text"],
                        "boundingRegions": region}
                role = self._ROLE.get(s["kind"])
                if role:
                    para["role"] = role
                paragraphs.append(para)
        return json.dumps(
            {"pages": [{"page_number": 1, "width": 612, "height": 792,
                        "words": []}],
             "tables": tables, "paragraphs": paragraphs,
             "figures": figures}
        )


class FakeGoogleApiClient:
    """Deterministic offline client emitting a Google Document-AI-shaped
    payload (consumed by convert_google_output_to_docling,
    google_prediction_provider.py:145-257): one global ``text`` buffer
    plus per-page paragraphs/tables whose content is addressed by
    textAnchor (startIndex, endIndex) segments into that buffer."""

    @staticmethod
    def _vertices():
        return [{"x": 0, "y": 0}, {"x": 10, "y": 0},
                {"x": 10, "y": 10}, {"x": 0, "y": 10}]

    def analyze_document(self, doc_id: str, spans: list[dict]) -> str:
        buf: list[str] = []
        pos = 0

        def anchor(text: str) -> dict:
            nonlocal pos
            start = pos
            buf.append(text)
            pos += len(text)
            return {"textAnchor": {"textSegments": [
                {"startIndex": start, "endIndex": pos}]},
                "boundingPoly": {"vertices": self._vertices()}}

        paragraphs, tables = [], []
        for s in spans:
            if s["kind"] == "table":
                words = s["text"].split() or [s["text"]]
                tables.append(
                    {"layout": {"boundingPoly":
                                {"vertices": self._vertices()}},
                     "headerRows": [],
                     "bodyRows": [{"cells": [
                         {"layout": anchor(w)} for w in words]}]}
                )
            elif s["kind"] == "picture":
                continue  # DocAI text layout has no figure item
            else:
                paragraphs.append({"layout": anchor(s["text"])})
        return json.dumps(
            {"text": "".join(buf),
             "pages": [{"pageNumber": 1,
                        "dimension": {"width": 612, "height": 792},
                        "paragraphs": paragraphs, "tables": tables}]}
        )


def _anchor_text(document: dict, layout: dict) -> str:
    """Resolve a Google textAnchor into the document's global text
    buffer (google_prediction_provider.py:173-185: concatenate
    [startIndex, endIndex) slices, guarded on buffer length)."""
    text = document.get("text") or ""
    out = []
    for seg in layout.get("textAnchor", {}).get("textSegments", []):
        start = int(seg.get("startIndex", 0))
        end = int(seg.get("endIndex", 0))
        if start < len(text):
            out.append(text[start:end])
    return "".join(out)


def normalize_azure_response(payload: str) -> list[dict]:
    """Azure Document Intelligence JSON → canonical span sequence
    (convert_azure_output_to_docling analogue,
    azure_prediction_provider.py:114-315). Mirrors the reference's item
    order — tables (:185), role-mapped paragraphs (:214), figures
    (:196) — and its role map: sectionHeading→section_header,
    title→title, pageHeader→page_header, pageFooter→page_footer,
    footnote/pageNumber/absent→text. Table text is the row-major cell
    join (cells sorted by (row_index, column_index))."""
    data = json.loads(payload)
    spans: list[dict] = []

    def emit(kind: str, text: str) -> None:
        media = (f"api/{kind}/{len(spans)}"
                 if kind in ("table", "picture") else "")
        spans.append({"kind": kind, "text": text, "media_ref": media,
                      "offset": len(spans)})

    for table in data.get("tables", []):
        cells = sorted(
            table.get("cells", []),
            key=lambda c: (c.get("row_index", 0), c.get("column_index", 0)),
        )
        emit("table", " ".join(
            c.get("content", "").strip() for c in cells
        ).strip())
    # role map mirrors the reference exactly: footnote and pageNumber
    # fold to TEXT (azure_prediction_provider.py:236-249)
    role_kind = {"sectionHeading": "section_header", "title": "title",
                 "pageHeader": "page_header", "pageFooter": "page_footer"}
    for para in data.get("paragraphs", []):
        kind = role_kind.get(para.get("role"), "text")
        text = para.get("content", "") or ""
        if not text:  # same contract as the Textract normalizer:
            continue  # no text and no media → dropped
        emit(kind, text)
    for _fig in data.get("figures", []):
        emit("picture", "")
    return spans


def normalize_google_response(payload: str) -> list[dict]:
    """Google Document AI JSON → canonical span sequence
    (convert_google_output_to_docling analogue,
    google_prediction_provider.py:145-257). Mirrors the reference's
    per-page order — paragraphs first (textAnchor slices into the
    global text buffer, :171-204), then tables appended at page end
    (:208-250, header rows before body rows, cells row-major). DocAI
    exposes no layout labels, so every paragraph is ``text`` (the
    reference's own TODO at :170)."""
    data = json.loads(payload)
    spans: list[dict] = []

    def emit(kind: str, text: str) -> None:
        media = (f"api/{kind}/{len(spans)}"
                 if kind in ("table", "picture") else "")
        spans.append({"kind": kind, "text": text, "media_ref": media,
                      "offset": len(spans)})

    for page in data.get("pages", []):
        for para in page.get("paragraphs", []):
            text = _anchor_text(data, para.get("layout", {}))
            if not text:  # Textract-normalizer contract: empty,
                continue  # media-less items are dropped
            emit("text", text)
        for table in page.get("tables", []):
            texts = []
            for row in (list(table.get("headerRows", []))
                        + list(table.get("bodyRows", []))):
                for cell in row.get("cells", []):
                    texts.append(
                        _anchor_text(data, cell.get("layout", {})).strip()
                    )
            emit("table", " ".join(t for t in texts if t).strip())
    return spans


#: provider shape registry: shape name → (client factory, normalizer).
#: The three reference providers (aws_prediction_provider.py:190-500,
#: azure_prediction_provider.py:114-315,
#: google_prediction_provider.py:145-257) differ only in these two
#: pieces; the retry/rate-limit/skip-and-count harness is shared.
#: The textract entry maps to normalizer=None so the provider falls
#: through to its documented LATE-BOUND default (None → the module
#: global ``normalize_api_response`` resolved at call time — the
#: contract test_poisoned_normalize monkeypatches). Early-binding here
#: would capture the function at registry-definition time and silently
#: break that contract for the default ``api_predictions`` path; only
#: the non-default azure/google shapes bind eagerly.
PROVIDER_SHAPES = {
    "textract": (FakeDocApiClient, None),
    "azure": (FakeAzureApiClient, normalize_azure_response),
    "google": (FakeGoogleApiClient, normalize_google_response),
}


class ApiPredictionProvider:
    """Actor-pool stage: rate-limited, retrying per-row API predict.

    State per actor (``__init__``, once): the client and the token
    bucket. ``__call__`` per batch: for each row, acquire a token, call
    the client with up to ``max_retries`` exponential-backoff retries on
    TransientApiError; anything else (or retry exhaustion) becomes
    ``status='failure'`` with an empty prediction.
    """

    def __init__(self, client_factory=FakeDocApiClient, *,
                 normalizer=None,
                 rate_per_s: float | None = None, max_retries: int = 3,
                 backoff_base_s: float = 0.001, seed: int = 42):
        self._client = client_factory()
        # None → the module-level Textract normalizer, resolved at CALL
        # time (keeps the function monkeypatchable / late-bound)
        self._normalize = normalizer
        self._bucket = TokenBucket(rate_per_s)
        self._max_retries = max_retries
        self._backoff = backoff_base_s
        self._seed = seed

    def _call_with_retry(self, doc_id: str, spans: list[dict]):
        import zlib

        rng = np.random.default_rng(
            (zlib.crc32(doc_id.encode()) ^ self._seed) & 0x7FFFFFFF
        )
        for attempt in range(self._max_retries + 1):
            self._bucket.acquire()
            try:
                return self._client.analyze_document(doc_id, spans), attempt + 1
            except Exception as exc:
                # stamp the TRUE request count on the exception: the
                # n_attempts accounting column must reflect calls MADE
                # (a permanent error on call 1 is one request, not
                # max_retries+1)
                exc.n_api_calls = attempt + 1
                if (not isinstance(exc, TransientApiError)
                        or attempt == self._max_retries):
                    raise
                # deterministic-jitter exponential backoff
                time.sleep(
                    self._backoff * (2 ** attempt) * (1 + rng.random())
                )
        raise RuntimeError("unreachable")

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        spans_col = t["spans"].to_pylist()
        preds, statuses, attempts, pred_spans = [], [], [], []
        for did, spans in zip(doc_ids, spans_col):
            try:
                payload, n = self._call_with_retry(did, spans)
                # normalize BEFORE any list append: if it raises (a
                # malformed payload), no column may be left one entry
                # longer than the others
                norm = (self._normalize or normalize_api_response)(payload)
                preds.append(payload)
                pred_spans.append(norm)
                statuses.append("success")
                attempts.append(n)
            except Exception as exc:
                # skip-and-count contract: failures are NEVER raised —
                # a malformed response / JSON error from a poisoned row
                # must not put Ray into task retry loops. The error
                # class is recorded in the prediction payload slot.
                if not isinstance(exc, (PermanentApiError,
                                        TransientApiError)):
                    preds.append(f"<error:{type(exc).__name__}>")
                else:
                    preds.append("")
                pred_spans.append([])
                statuses.append("failure")
                attempts.append(
                    getattr(exc, "n_api_calls", self._max_retries + 1)
                )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "prediction": pa.array(preds, pa.string()),
                "pred_spans": pa.array(pred_spans, pa.list_(SPAN_STRUCT)),
                "status": pa.array(statuses, pa.string()),
                "n_attempts": pa.array(attempts, pa.int32()),
            }
        )


def api_predictions(sf_dir: str, *, concurrency: int = 2,
                    rate_per_s: float | None = None,
                    shape: str = "textract"):
    """documents → rate-limited API prediction stage (actor pool: the
    client is per-actor state; aggregate request rate = rate_per_s ×
    concurrency). ``shape`` selects the provider response dialect —
    ``textract`` | ``azure`` | ``google`` (``PROVIDER_SHAPES``); the
    harness and output schema are identical across all three."""
    from ..sources.interleaved import read_interleaved_documents
    from .util import stage

    client_factory, normalizer = PROVIDER_SHAPES[shape]
    docs = read_interleaved_documents(sf_dir)
    return stage(
        docs, ApiPredictionProvider,
        kwargs=dict(client_factory=client_factory, normalizer=normalizer,
                    rate_per_s=rate_per_s),
        concurrency=concurrency, batch_size=256,
    )

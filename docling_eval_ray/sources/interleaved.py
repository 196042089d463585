"""Deterministic interleaved-document source.

The engine's canonical input is a table of interleaved text+media documents
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
(BASELINE input_hint). At production scale this is a Lance/Parquet table
read with ``ray.data.read_parquet`` — here we synthesize it
deterministically (pure function of ``(doc_id, text)``, no RNG state) from
the driver-provided flat ``documents.parquet``
(``/root/testdata/sf*/documents.parquet``: doc_id, text, lang, source,
n_chars), so tests and benchmarks need no external data.

The synthesized documents intentionally contain page furniture
(``page_header`` / ``page_footer``) and boilerplate navigation spans
(high link-density text) interleaved with real content and media
placeholders — exactly what the flagship main-content extraction stage
must strip (reference semantics: content-layer + label-subset filtering,
docling_eval/evaluators/markdown_text_evaluator.py:83-105, and span order
from DoclingDocument.iterate_items()).
"""

from __future__ import annotations

import pyarrow as pa

from ..datamodel.schema import SPAN_STRUCT


def chunk_plan(doc_id: int, words: list[str]):
    """Shared deterministic chunking plan: yields (branch, chunk, para)
    for every content chunk after the 3-word title. Both the span
    rendition (below) and the HTML rendition
    (functions/html_extract.synth_html_for_doc) consume THIS iterator so
    the two can never desynchronize."""
    i = 3
    para = 0
    while i < len(words):
        k = 4 + (doc_id + 3 * para) % 6  # 4..9 words per span
        chunk = " ".join(words[i : i + k])
        i += k
        r = (doc_id * 31 + para * 7) % 10
        yield r, chunk, para
        para += 1


def synth_spans_for_doc(doc_id: int, text: str) -> list[dict]:
    """Pure, deterministic: (doc_id, text) -> ordered span dicts.

    Layout per document:
      page_header, title, then a mix of section_header / list_item /
      picture+caption / nav-boilerplate / text paragraphs (chunk sizes and
      kind choices are hash-like functions of (doc_id, paragraph index)),
      closed by a page_footer. ``offset`` is 0..n-1 in document order.
    """
    words = text.split()
    spans: list[dict] = []

    def add(kind: str, txt: str, media: str = "") -> None:
        spans.append(
            {"kind": kind, "text": txt, "media_ref": media, "offset": len(spans)}
        )

    add("page_header", f"corpus-{doc_id % 7} · internal use only")
    add("title", " ".join(words[:3]) if words else "untitled")

    for r, chunk, para in chunk_plan(doc_id, words):
        if r == 0:
            add("section_header", chunk)
        elif r == 1:
            add("list_item", chunk)
        elif r == 2:
            add("picture", "", f"pic/{doc_id}/{para}")
            add("caption", chunk)
        elif r == 3:
            # navigation boilerplate: high link-density, must be stripped
            nav = " | ".join(chunk.split()[:4])
            add("text", f"home | {nav} | contact")
        elif r == 4 and para % 2 == 0:
            # whitespace-noisy paragraph: extraction must normalize it
            add("text", "  " + chunk.replace(" ", "   ", 2) + " ")
        else:
            add("text", chunk)

    add("page_footer", f"page 1 of 1 — doc {doc_id}")
    return spans


def _synth_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-enough batch builder: flat child arrays + list offsets."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()

    kinds: list[str] = []
    span_texts: list[str] = []
    media: list[str] = []
    offs: list[int] = []
    list_offsets = [0]
    # Inlined fast twin of synth_spans_for_doc: appends straight into
    # the flat child arrays — no per-span dict, no add() closure, no
    # offset bookkeeping object (~35% of headline synthesis CPU in
    # profile; tests/test_flagship.py asserts batch == spec row-for-row
    # so the two renditions cannot drift).
    k_app = kinds.append
    t_app = span_texts.append
    m_app = media.append
    for did, txt in zip(doc_ids, texts):
        doc_id = int(did)
        words = txt.split()
        base = len(kinds)
        k_app("page_header")
        t_app(f"corpus-{doc_id % 7} · internal use only")
        m_app("")
        k_app("title")
        t_app(" ".join(words[:3]) if words else "untitled")
        m_app("")
        for r, chunk, para in chunk_plan(doc_id, words):
            if r == 0:
                k_app("section_header")
                t_app(chunk)
                m_app("")
            elif r == 1:
                k_app("list_item")
                t_app(chunk)
                m_app("")
            elif r == 2:
                k_app("picture")
                t_app("")
                m_app(f"pic/{doc_id}/{para}")
                k_app("caption")
                t_app(chunk)
                m_app("")
            elif r == 3:
                nav = " | ".join(chunk.split()[:4])
                k_app("text")
                t_app(f"home | {nav} | contact")
                m_app("")
            elif r == 4 and para % 2 == 0:
                k_app("text")
                t_app("  " + chunk.replace(" ", "   ", 2) + " ")
                m_app("")
            else:
                k_app("text")
                t_app(chunk)
                m_app("")
        k_app("page_footer")
        t_app(f"page 1 of 1 — doc {doc_id}")
        m_app("")
        offs.extend(range(len(kinds) - base))
        list_offsets.append(len(kinds))

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(span_texts, pa.string()),
            pa.array(media, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{int(d):06d}" for d in doc_ids], pa.string()),
            "spans": spans,
        }
    )


def synth_read_blocks(sf_dir: str, *, docs_per_block: int = 320,
                      cap: int = 64) -> int:
    """override_num_blocks for PAYLOAD-SYNTHESIS consumers (media/audio
    pipelines): the fixture documents file is one parquet row group, so
    Ray's default read yields ~1 block and the per-doc payload
    synthesis (real PNG/JPEG/PCM encoding) runs serially in one task.
    Splitting the read to ~``docs_per_block`` docs per block spreads
    that CPU across the pool. Metadata-only (no data read). Production
    corpora are many fragments and never need this.

    Sizing (measured, r5): per-task dispatch on this host runs ~40 ms
    serial, so block count trades dispatch wall against parallelism —
    8/16/24/40 blocks gave 1.40/1.46/2.12/2.85 s walls for the sf0.1
    media chain. ~320 docs per block (16 tasks at sf0.1, task CPU
    ≈0.4 s) sits at the measured knee; the cap bounds dispatch wall
    at larger scale factors."""
    import pyarrow.parquet as pq

    rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(1, min(cap, -(-rows // docs_per_block)))


def read_interleaved_documents(sf_dir: str, **read_kwargs):
    """Read the flat documents table and lift it to the canonical
    interleaved schema ``(doc_id: string, spans: list<struct<...>>)``.

    Column-pruned at the read (only ``doc_id``, ``text`` leave storage).
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], **read_kwargs
    )
    return ds.map_batches(_synth_batch, batch_format="pyarrow")


def read_canonical_interleaved(path: str, **read_kwargs):
    """Read an ALREADY-interleaved table ``(doc_id: string, spans:
    list<struct<kind,text,media_ref,offset>>)`` — the production entry
    point of the north rule's input hint, where the corpus is a
    Lance/Parquet table of interleaved documents rather than flat text.

    Format negotiation is gated on what the environment provides:
    a ``*.lance`` dataset directory reads through ``ray.data.read_lance``
    when the ``lance`` package is importable (the north rule's storage
    format; absent in this container — the gate mirrors
    state/lineage.py), anything else through ``read_parquet``. Columns
    are pruned to the canonical pair either way."""
    import os

    import ray.data as rd

    cols = ["doc_id", "spans"]
    is_lance = path.rstrip("/").endswith(".lance") or os.path.isdir(
        os.path.join(path, "_versions")
    )
    if is_lance:
        try:
            import lance  # noqa: F401

            return rd.read_lance(path, columns=cols, **read_kwargs)
        except ImportError as e:  # pragma: no cover - lance absent here
            raise ImportError(
                "path looks like a Lance dataset but the 'lance' "
                "package is not installed"
            ) from e
    return rd.read_parquet(path, columns=cols, **read_kwargs)

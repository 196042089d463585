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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..datamodel.schema import SPAN_STRUCT

#: span-kind dictionary for the vectorized batch builder (module scope:
#: ships by value with cloudpickle, and pa.Array globals are picklable)
_KIND_DICT = pa.array(
    ["page_header", "title", "section_header", "list_item",
     "picture", "caption", "text", "page_footer"]
)
_K_HDR, _K_TITLE, _K_SEC, _K_LI, _K_PIC, _K_CAP, _K_TEXT, _K_FTR = range(8)
#: the 7 possible page_header strings, taken by doc_id % 7
_HEADER_DICT = pa.array(
    [f"corpus-{i} · internal use only" for i in range(7)]
)


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


def _one_chunk(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _synth_batch(batch: pa.Table) -> pa.Table:
    """Fully vectorized batch twin of ``synth_spans_for_doc``.

    All string work runs as Arrow kernels (split / binary_join / take /
    replace); the chunk plan is replayed with numpy per *paragraph step*
    across every still-active document (≤ n_words/4 steps, each a few
    array ops), and the per-doc interleave (header, title, chunk spans —
    picture+caption pairs for r==2 — footer) is assembled with take
    indices into pooled string arrays. No Python loop over documents or
    spans. tests/test_flagship.py pins this rendition equal to the
    per-doc spec row-for-row, so the two cannot drift (measured ~1.6x
    over the previous inlined-append loop, and it keeps large blocks
    cheap: per-span cost is flat in block size).
    """
    doc_arr = _one_chunk(batch["doc_id"])
    texts = _one_chunk(batch["text"])
    n = len(doc_arr)
    did = pc.cast(doc_arr, pa.int64()).to_numpy(zero_copy_only=False)

    # --- words: Python str.split() semantics (non-empty tokens) --------
    raw_split = pc.utf8_split_whitespace(texts)
    raw_flat = raw_split.flatten()
    raw_parent = pc.list_parent_indices(raw_split).to_numpy(
        zero_copy_only=False
    )
    nonempty = pc.greater(pc.utf8_length(raw_flat), 0).to_numpy(
        zero_copy_only=False
    )
    flat_words = raw_flat.filter(pa.array(nonempty))
    nw = np.bincount(raw_parent[nonempty], minlength=n).astype(np.int64)
    word_base = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nw, out=word_base[1:])

    # --- chunk plan, vectorized per para step (mirrors chunk_plan) -----
    i = np.full(n, 3, dtype=np.int64)
    active = np.nonzero(nw > 3)[0]
    cdoc_l, cs_l, ce_l, cr_l, cp_l = [], [], [], [], []
    para = 0
    while active.size:
        k = 4 + (did[active] + 3 * para) % 6
        start = i[active]
        end = np.minimum(start + k, nw[active])
        cdoc_l.append(active)
        cs_l.append(start)
        ce_l.append(end)
        cr_l.append((did[active] * 31 + para * 7) % 10)
        cp_l.append(np.full(active.size, para, dtype=np.int64))
        i[active] = start + k
        active = active[i[active] < nw[active]]
        para += 1
    if cdoc_l:
        cdoc = np.concatenate(cdoc_l)
        order = np.argsort(cdoc, kind="stable")  # → (doc, para) order
        cdoc = cdoc[order]
        cs = np.concatenate(cs_l)[order]
        ce = np.concatenate(ce_l)[order]
        cr = np.concatenate(cr_l)[order]
        cpara = np.concatenate(cp_l)[order]
    else:
        cdoc = cs = ce = cr = cpara = np.empty(0, dtype=np.int64)
    m = cdoc.size
    c_per_doc = np.bincount(cdoc, minlength=n).astype(np.int64)

    # --- title + chunk joins over ONE contiguous list array ------------
    # per doc the word ranges [0, min(3, nw)) (title) then chunk ranges
    # tile [3, nw) without gaps, so a single offsets vector covers all
    # titles and chunks in (doc, entry) order.
    e_per_doc = 1 + c_per_doc
    e_total = int(e_per_doc.sum())
    e_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(e_per_doc, out=e_off[1:])
    ends = np.empty(e_total, dtype=np.int64)
    title_pos = e_off[:-1]
    ends[title_pos] = word_base[:-1] + np.minimum(3, nw)
    chunk_entry = np.ones(e_total, dtype=bool)
    chunk_entry[title_pos] = False
    ends[chunk_entry] = word_base[cdoc] + ce
    offsets = np.empty(e_total + 1, dtype=np.int32)
    offsets[0] = 0
    offsets[1:] = ends.astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_words),
        " ",
    )
    title_text = pc.if_else(
        pa.array(nw == 0),
        pa.scalar("untitled"),
        joined.take(pa.array(title_pos, pa.int64())),
    )
    chunk_text = joined.filter(pa.array(chunk_entry))

    # --- branch transforms on subsets, merged back via inverse take ----
    is_r3 = cr == 3
    is_r4e = (cr == 4) & (cpara % 2 == 0)
    g_plain = np.nonzero(~(is_r3 | is_r4e))[0]
    g3 = np.nonzero(is_r3)[0]
    g4 = np.nonzero(is_r4e)[0]
    parts = [_one_chunk(chunk_text.take(pa.array(g_plain, pa.int64())))]
    if g3.size:  # "home | <first ≤4 words> | contact" navigation rows
        s3 = word_base[cdoc[g3]] + cs[g3]
        lens = np.minimum(cs[g3] + 4, ce[g3]) + word_base[cdoc[g3]] - s3
        gather = np.repeat(s3, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        noff = np.zeros(g3.size + 1, dtype=np.int32)
        np.cumsum(lens, out=noff[1:])
        nav = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(noff, pa.int32()),
                flat_words.take(pa.array(gather, pa.int64())),
            ),
            " | ",
        )
        parts.append(
            _one_chunk(
                pc.binary_join_element_wise(
                    pa.scalar("home"), nav, pa.scalar("contact"), " | "
                )
            )
        )
    else:
        parts.append(pa.array([], pa.string()))
    if g4.size:  # whitespace-noisy rows: "  " + 2 widened gaps + " "
        noisy = pc.replace_substring(
            chunk_text.take(pa.array(g4, pa.int64())),
            pattern=" ",
            replacement="   ",
            max_replacements=2,
        )
        parts.append(
            _one_chunk(
                pc.binary_join_element_wise(
                    pa.scalar("  "), noisy, pa.scalar(" "), ""
                )
            )
        )
    else:
        parts.append(pa.array([], pa.string()))
    perm = np.concatenate([g_plain, g3, g4]) if m else np.empty(0, np.int64)
    inv = np.argsort(perm, kind="stable")
    chunk_final = pa.concat_arrays(parts).take(pa.array(inv, pa.int64()))

    # --- per-chunk span expansion: r==2 → picture + caption ------------
    is_r2 = cr == 2
    spc = 1 + is_r2.astype(np.int64)
    sp_total = int(spc.sum())
    sp_chunk = np.repeat(np.arange(m, dtype=np.int64), spc)
    pos_in = np.arange(sp_total, dtype=np.int64) - np.repeat(
        np.cumsum(spc) - spc, spc
    )
    sp_r = cr[sp_chunk]
    is_pic = (sp_r == 2) & (pos_in == 0)
    code_map = np.full(10, _K_TEXT, dtype=np.int8)
    code_map[0] = _K_SEC
    code_map[1] = _K_LI
    code_map[2] = _K_CAP  # the r==2 second span; first overridden below
    sp_code = code_map[sp_r]
    sp_code[is_pic] = _K_PIC
    sp_text_idx = 2 * n + sp_chunk
    sp_text_idx[is_pic] = 2 * n + m  # the pooled "" slot
    r2_idx = np.nonzero(is_r2)[0]
    if r2_idx.size:
        pic_media = _one_chunk(
            pc.binary_join_element_wise(
                pa.scalar("pic"),
                pc.cast(pa.array(did[cdoc[r2_idx]]), pa.string()),
                pc.cast(pa.array(cpara[r2_idx]), pa.string()),
                "/",
            )
        )
    else:
        pic_media = pa.array([], pa.string())
    sp_media_idx = np.zeros(sp_total, dtype=np.int64)
    r2_rank = np.cumsum(is_r2) - 1
    sp_media_idx[is_pic] = 1 + r2_rank[sp_chunk[is_pic]]

    # --- per-doc stitch: header, title, [chunk spans], footer ----------
    r2_per_doc = np.bincount(cdoc[is_r2], minlength=n).astype(np.int64)
    total_d = 3 + c_per_doc + r2_per_doc
    lo = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total_d, out=lo[1:])
    total = int(lo[-1])
    hdr_pos = lo[:-1]
    ttl_pos = lo[:-1] + 1
    ftr_pos = lo[1:] - 1
    text_take = np.empty(total, dtype=np.int64)
    codes = np.empty(total, dtype=np.int8)
    media_take = np.zeros(total, dtype=np.int64)
    text_take[hdr_pos] = np.arange(n)
    text_take[ttl_pos] = n + np.arange(n)
    text_take[ftr_pos] = 2 * n + m + 1 + np.arange(n)
    codes[hdr_pos] = _K_HDR
    codes[ttl_pos] = _K_TITLE
    codes[ftr_pos] = _K_FTR
    mid = np.ones(total, dtype=bool)
    mid[hdr_pos] = False
    mid[ttl_pos] = False
    mid[ftr_pos] = False
    text_take[mid] = sp_text_idx
    codes[mid] = sp_code
    media_take[mid] = sp_media_idx

    did_str = pc.cast(pa.array(did), pa.string())
    text_pool = pa.concat_arrays(
        [
            _one_chunk(_HEADER_DICT.take(pa.array(did % 7, pa.int64()))),
            _one_chunk(title_text),
            _one_chunk(chunk_final),
            pa.array([""], pa.string()),
            _one_chunk(
                pc.binary_join_element_wise(
                    pa.scalar("page 1 of 1 — doc"), did_str, " "
                )
            ),
        ]
    )
    media_pool = pa.concat_arrays(
        [pa.array([""], pa.string()), _one_chunk(pic_media)]
    )
    struct = pa.StructArray.from_arrays(
        [
            _KIND_DICT.take(pa.array(codes, pa.int8())),
            text_pool.take(pa.array(text_take, pa.int64())),
            media_pool.take(pa.array(media_take, pa.int64())),
            pa.array(
                (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(lo[:-1], total_d)
                ).astype(np.int32),
                pa.int32(),
            ),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(
        pa.array(lo.astype(np.int32), pa.int32()), struct
    )
    doc_out = pc.binary_join_element_wise(
        pa.scalar("doc-"), pc.utf8_lpad(did_str, 6, "0"), ""
    )
    return pa.table({"doc_id": doc_out, "spans": spans})


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

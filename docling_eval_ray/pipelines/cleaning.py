"""Content-cleaning operators for training-data pipelines.

The second corpus-hygiene batch (sibling of ``corpus_ops``): the
cleaning steps a web-scale pretraining pipeline applies between raw
extraction (the flagship) and tokenization. Every op here is
DuckDB-oracled (pipelines/oracle.py) and shares the pinned whitespace
tokenization (functions/tokens.py) with the SQL side.

- ``pii_redact``       — regex PII scan + redaction (emails, IPv4,
  phone numbers): per-document match counts and the redacted text, all
  via vectorized RE2 kernels (``pc.count_substring_regex`` /
  ``pc.replace_substring_regex``). The corpus is synthetic word soup
  with no real PII, so the PII substrings are synthesized
  deterministically from ``doc_id`` inside the query — the same
  house pattern as the evaluator mutation synthesis (oracle.py
  ``_MUTATION_CTE``) — and the oracle replays the identical synthesis
  in SQL before redacting with ``regexp_replace(..., 'g')``. Both
  sides run RE2, so the pattern dialect is identical by construction.
- ``dedup_paragraphs`` — CCNet-style segment-level exact dedup
  (Wenzek et al. 2020 §3.1 dedup paragraphs by hash; here the segment
  is a fixed ``width``-token chunk since the synthetic corpus has no
  newlines): corpus-wide first occurrence of each distinct chunk wins
  (ordered by doc_id, then chunk index), losers are dropped, and each
  document's surviving text is reassembled in chunk order. Two bucketed
  shuffles — one on chunk text (winner marking), one on doc_id
  (reassembly) — both via ``bucketed_group_apply``; no driver-side
  state at all, so the shape holds at any corpus size.
- ``lm_perplexity``    — CCNet-style LM quality score: a unigram LM is
  trained on the corpus itself (token → global count via one
  partial+final groupby), then every document is scored with its
  per-token cross-entropy ``mean(-log2(count/total))`` and perplexity
  ``2^H``. The count table is vocabulary-sized, not corpus-sized; it is
  size-routed exactly like ``tfidf_topk``'s document-frequency side:
  broadcast dict under ``LM_BROADCAST_MAX_VOCAB``, distributed
  ``hash_join`` on token + per-doc ``bucketed_group_apply`` above it.

Scale notes: ``pii_redact`` is a single streaming map (no shuffle);
``dedup_paragraphs`` is two bucketed exchanges over (chunk, doc) rows —
the canonical dedup shape, skew-bounded by the bucket count;
``lm_perplexity`` moves one vocab-sized partial per batch through a
groupby and either broadcasts the result once (``ray.put``) or joins
it back distributed. Nothing materializes corpus-sized data on the
driver in any tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokens import md5_prefix32, tokens_series
from .relational import _final_groupby, _read

# ---------------------------------------------------------------------------
# pii_redact — vectorized regex PII scan + redaction
# ---------------------------------------------------------------------------

#: RE2 patterns (identical semantics in Arrow and DuckDB — both RE2).
PII_EMAIL = r"[a-z0-9]+@[a-z0-9]+\.com"
PII_IP = r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"555-[0-9]{4}"


def _synth_pii(t: pa.Table) -> pa.Table:
    """Append deterministic PII substrings to ``text`` based on
    ``doc_id`` (SQL replica: the CASE concatenation in the oracle).
    Roughly a third / quarter / fifth of documents get NO email / ip /
    phone respectively, so the no-match path is exercised too."""
    did = pc.cast(t["doc_id"], pa.int64())
    s = pc.cast(did, pa.string())

    def _mod_str(expr):
        return pc.cast(expr, pa.string())

    email = pc.binary_join_element_wise(
        " contact u", s, "@mail", _mod_str(_mod(did, 7)), ".com", ""
    )
    ip = pc.binary_join_element_wise(
        " from 10.", _mod_str(_mod(did, 256)), ".",
        _mod_str(_mod(pc.multiply_checked(did, 7), 256)), ".",
        _mod_str(_mod(did, 100)), ""
    )
    phone = pc.binary_join_element_wise(
        " call 555-", _mod_str(pc.add(_mod(did, 9000), 1000)), ""
    )
    empty = pa.array([""] * t.num_rows, pa.string())
    parts = [
        pc.if_else(pc.not_equal(_mod(did, 3), 0), email, empty),
        pc.if_else(pc.not_equal(_mod(did, 4), 0), ip, empty),
        pc.if_else(pc.not_equal(_mod(did, 5), 0), phone, empty),
    ]
    ptext = pc.binary_join_element_wise(t["text"], *parts, "")
    return pa.table({"doc_id": did, "ptext": ptext})


def _mod(arr, m: int):
    # doc_id ≥ 0 here, so % and C-style mod agree between engines
    return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))


def pii_redact(sf_dir: str):
    """documents → (doc_id, n_emails, n_ips, n_phones, redacted).

    Counts via ``pc.count_substring_regex``; redaction via chained
    ``pc.replace_substring_regex`` (email → ip → phone, the same fixed
    order as the oracle's nested ``regexp_replace``). One streaming
    map_batches, no shuffle, no state."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        p = _synth_pii(t)
        ptext = p["ptext"]
        out = {"doc_id": p["doc_id"]}
        for name, pat in (
            ("n_emails", PII_EMAIL),
            ("n_ips", PII_IP),
            ("n_phones", PII_PHONE),
        ):
            out[name] = pc.cast(
                pc.count_substring_regex(ptext, pat), pa.int64()
            )
        red = ptext
        for pat, repl in (
            (PII_EMAIL, "[EMAIL]"),
            (PII_IP, "[IP]"),
            (PII_PHONE, "[PHONE]"),
        ):
            red = pc.replace_substring_regex(red, pat, repl)
        out["redacted"] = red
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def pii_extract_emails(sf_dir: str):
    """Exploded (doc_id, email) rows — the regex-extraction/flat_map
    shape: every email match becomes its own output row, in match
    order. Same deterministic synthesis as ``pii_redact``; extraction
    via ``pc.extract_regex_span`` would need per-match loops, so the
    vectorized path is split-on-pattern bookkeeping:
    ``pc.split_pattern_regex`` on the NON-match spans would lose the
    matches, hence extract with one RE2 ``findall`` per row — but the
    synthesized text has ≤1 email per doc, so ``pc.extract_regex`` (one
    capture) covers it exactly; the multi-match generalization is the
    ``flat_map`` over per-row findall (kept vectorized here)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        p = _synth_pii(t)
        m = pc.extract_regex(p["ptext"], f"(?P<email>{PII_EMAIL})")
        email = pc.struct_field(m, "email")
        keep = pc.is_valid(email)
        return pa.table(
            {
                "doc_id": pc.filter(p["doc_id"], keep),
                "email": pc.filter(email, keep),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dedup_paragraphs — CCNet-style segment-level exact dedup
# ---------------------------------------------------------------------------

#: tokens per segment (the "paragraph" analogue for newline-free text)
PARA_WIDTH = 8


def _explode_chunks(t: pa.Table, width: int) -> pd.DataFrame:
    """(doc_id, cidx, ctext) — every ``width``-token chunk of every
    document, in document order. Token stream built with the Arrow
    replica tokenizer; the chunk join groups on INTEGER (doc, cidx)
    codes, so no string hashtables are involved."""
    toks = tokens_series(t["text"].to_pandas())
    doc_ids = t["doc_id"].to_numpy()
    lens = toks.str.len().to_numpy().astype(np.int64)
    flat = np.concatenate(
        [np.asarray(x, dtype=object) for x in toks]
    ) if len(toks) else np.empty(0, dtype=object)
    parent = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(len(flat)) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else [], lens
    )
    cidx = pos // width
    df = pd.DataFrame(
        {"p": parent, "cidx": cidx.astype(np.int64), "tok": flat}
    )
    # join tokens per (doc, chunk) — values are strings, keys are ints
    g = df.groupby(["p", "cidx"], sort=True)["tok"].agg(" ".join)
    g = g.reset_index()
    return pd.DataFrame(
        {
            "doc_id": doc_ids[g["p"].to_numpy()],
            "cidx": g["cidx"].to_numpy(),
            "ctext": g["tok"].to_numpy(),
        }
    )


def dedup_paragraphs(sf_dir: str, *, width: int = PARA_WIDTH):
    """documents → (doc_id, n_chunks, n_kept, kept_text).

    Chunk the token stream into ``width``-token segments, keep only the
    corpus-wide FIRST occurrence of each distinct segment (ordered by
    doc_id then chunk index — the deterministic CCNet tie-break), and
    reassemble each document from its surviving segments in order.

    Distribution: explode (streaming map) → bucketed shuffle on
    ``ctext`` to mark winners (exact string compares after an in-bucket
    sort; no hashtables on string keys) → bucketed shuffle on
    ``doc_id`` to reassemble. Both exchanges carry (chunk, doc) rows
    only; a hot chunk lands in one bucket but the bucket count bounds
    task memory (functions/groups.py)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    chunks = ds.map_batches(
        lambda t: _explode_chunks(t, width), batch_format="pyarrow"
    )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ctext", "doc_id", "cidx"], kind="mergesort")
        ct = g["ctext"].to_numpy()
        first = np.concatenate([[True], ct[1:] != ct[:-1]]) if len(ct) \
            else np.empty(0, dtype=bool)
        return g.assign(kept=first)

    marked = bucketed_group_apply(chunks, ["ctext"], mark)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "cidx"], kind="mergesort")
        out = g.groupby("doc_id", as_index=False, sort=True).agg(
            n_chunks=("kept", "size"), n_kept=("kept", "sum")
        )
        kept = g[g["kept"]]
        if len(kept):
            kt = kept.groupby("doc_id", as_index=False, sort=True)[
                "ctext"
            ].agg(" ".join)
            kt.columns = ["doc_id", "kept_text"]
        else:  # a bucket whose every chunk lost (fully-duplicated docs)
            kt = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "kept_text": pd.Series([], dtype=object),
                }
            )
        out = out.merge(kt, on="doc_id", how="left")
        out["kept_text"] = out["kept_text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "n_chunks": out["n_chunks"].to_numpy().astype(np.int64),
                "n_kept": out["n_kept"].to_numpy().astype(np.int64),
                "kept_text": out["kept_text"].to_numpy(),
            }
        )

    return bucketed_group_apply(marked, ["doc_id"], reassemble)


# ---------------------------------------------------------------------------
# lm_perplexity — corpus-trained unigram LM cross-entropy quality score
# ---------------------------------------------------------------------------

#: vocabulary sizes up to this are collected (vocab-sized — the
#: documented gate) and broadcast; larger go through the join tier
LM_BROADCAST_MAX_VOCAB = 200_000


def _doc_nll_frame(doc_ids: np.ndarray, nll: np.ndarray) -> pd.DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity) from per-token
    negative log-likelihoods grouped by integer doc id."""
    df = pd.DataFrame({"doc_id": doc_ids, "nll": nll})
    g = df.groupby("doc_id", as_index=False, sort=True).agg(
        n_tokens=("nll", "size"), s=("nll", "sum")
    )
    h = g["s"].to_numpy() / g["n_tokens"].to_numpy()
    return pd.DataFrame(
        {
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy().astype(np.int64),
            "cross_entropy": np.round(h, 6),
            "perplexity": np.round(np.exp2(h), 6),
        }
    )


def lm_perplexity(sf_dir: str, *,
                  broadcast_max_vocab: int = LM_BROADCAST_MAX_VOCAB,
                  extra_doc_cols: tuple = ()):
    """documents → (doc_id, n_tokens, cross_entropy, perplexity
    [, *extra_doc_cols]).

    Unigram LM trained on the corpus itself (no smoothing needed —
    every scored token is in the vocabulary by construction):
    ``p(tok) = count(tok)/total``; per-document cross-entropy is the
    mean ``-log2 p`` over its token stream, perplexity ``2^H``
    (CCNet-style quality signal, Wenzek et al. 2020 §3.3 with the
    in-container unigram stand-in for KenLM).

    Count table: one partial+final groupby (one row per distinct token
    per batch crosses the shuffle). Scoring tier is size-routed like
    ``tfidf_topk``: broadcast dict under ``broadcast_max_vocab``,
    distributed token join + per-doc bucketed aggregate above it.

    ``extra_doc_cols`` appends per-document columns (e.g. lang) to the
    output WITHOUT a separate corpus join — they ride the scoring pass
    (consumers like ``perplexity_buckets`` save a corpus-keyed
    exchange)."""
    import ray
    from ray.data.aggregate import Sum

    from .corpus_ops import _token_table

    extra = list(extra_doc_cols)
    # dedupe: extra may name a base column (e.g. "text" itself, which
    # quality_perplexity_corr rides to fuse its score kernel)
    ds = _read(sf_dir, "documents",
               columns=list(dict.fromkeys(["doc_id", "text", *extra])))

    def count_partial(t: pa.Table) -> pa.Table:
        ex = _token_table(t)
        g = pa.TableGroupBy(ex.select(["tok"]), ["tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["tok"], "c_part": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="c"))
        .materialize()
    )
    vocab = counts.count()
    total = float(sum(
        b["c"].to_numpy().sum()
        for b in counts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ))

    if vocab <= broadcast_max_vocab:
        lm = {}
        for b in counts.iter_batches(batch_format="pyarrow"):
            lm.update(zip(b["token"].to_pylist(), b["c"].to_numpy()))
        lm_ref = ray.put(lm)

        class _Scorer:
            def __init__(self, ref):
                self._lm = ray.get(ref)

            def __call__(self, t: pa.Table) -> pd.DataFrame:
                ex = _token_table(t)
                toks = ex["tok"].to_pandas()
                c = toks.map(self._lm).to_numpy().astype(np.float64)
                nll = -np.log2(c / total)
                out = _doc_nll_frame(ex["doc_id"].to_numpy(), nll)
                if extra:  # one row per doc in the batch — tiny merge
                    side = t.select(["doc_id", *extra]).to_pandas()
                    out = out.merge(side, on="doc_id", how="left")
                return out

        from ..stages.util import stage

        # actor pool: deserialize the vocab→count dict once per actor
        return stage(ds, _Scorer, args=(lm_ref,), batch_format="pyarrow",
                     concurrency=2)

    # distributed tier: exploded (doc_id, tok) ⋈ (token, c), then per-doc
    from ..functions.groups import bucketed_group_apply
    from ..functions.joins import hash_join

    def explode(t: pa.Table) -> pa.Table:
        ex = _token_table(t)
        cols = {"doc_id": ex["doc_id"], "token": ex["tok"]}
        if extra:  # constant per doc; repeated via the same parent take
            import pyarrow.compute as _pc

            parent = _pc.list_parent_indices(_pc.split_pattern_regex(
                _pc.utf8_trim(t["text"], characters=" "), r"\s+"))
            for col in extra:
                ecol = t[col]
                if isinstance(ecol, pa.ChunkedArray):
                    ecol = ecol.combine_chunks()
                cols[col] = ecol.take(parent)
        return pa.table(cols)

    tok_ds = ds.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(tok_ds, counts, "token")

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        nll = -np.log2(g["c"].to_numpy().astype(np.float64) / total)
        out = _doc_nll_frame(g["doc_id"].to_numpy(), nll)
        if extra:
            side = g.drop_duplicates("doc_id")[["doc_id", *extra]]
            out = out.merge(side, on="doc_id", how="left")
        return out

    return bucketed_group_apply(joined, ["doc_id"], per_doc)


# ---------------------------------------------------------------------------
# sentences_exploded — flat_map sentence segmentation with ordinals
# ---------------------------------------------------------------------------


#: segment boundary — a frequent corpus token standing in for '. '
SENT_DELIM = " scan "


def sentences_exploded(sf_dir: str):
    """Exploded (doc_id, sent_idx, sentence) rows — the sentence-
    segmentation / flat_map shape every pretraining cleaner needs
    before segment-level scoring (the synthetic corpus has no
    sentence punctuation, so the boundary is a frequent literal token,
    ' scan ' — same explode semantics). Vectorized: one
    ``pc.split_pattern`` per batch, then ``list_flatten`` + ``list_parent_indices`` and an
    arange-minus-starts ordinal (same zero-loop explode as the flagship
    span flattening, stages/extract.py). One streaming map, no shuffle;
    the split delimiter is a literal so Arrow and DuckDB
    ``string_split`` agree byte-for-byte."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        s = pc.split_pattern(text, pattern=SENT_DELIM)
        flat = pc.list_flatten(s)
        parent = pc.list_parent_indices(s)
        lens = pc.list_value_length(s).to_numpy().astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        idx = np.arange(int(lens.sum()), dtype=np.int64) - starts
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parent),
                "sent_idx": pa.array(idx, pa.int64()),
                "sentence": flat,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# gopher_quality_filter — multi-rule document quality gate
# ---------------------------------------------------------------------------

#: word-count bounds (Gopher rules use [50, 100k]; the synthetic corpus
#: runs 10-99 words, so [20, 80] keeps both accept and reject populated)
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 80
#: mean-word-length bounds (Gopher §A1.1: 3-10 chars)
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
#: require ≥2 distinct "stopwords" present (domain-adapted to the
#: synthetic data-engine vocabulary; Gopher uses English stopwords)
GOPHER_STOPWORDS = ("the", "scan", "join", "merge", "window")
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_filter(sf_dir: str):
    """(doc_id, n_words, mean_wl, stop_hits, keep) — the Gopher-style
    multi-rule quality gate (Rae et al. 2021 §A1.1: word-count bounds,
    mean-word-length bounds, stopword presence), fully vectorized:
    RE2 whitespace split count, char count net of whitespace, and one
    ``\\bword\\b`` match per stopword. ``keep`` is emitted (0/1) rather
    than filtering so the downstream router — and the oracle — see the
    per-rule evidence; mean_wl is compared on the 4dp-ROUNDED value on
    both engines so float drift cannot flip a verdict. One streaming
    map, no shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_gopher_table, batch_format="pyarrow")


def _gopher_table(t: pa.Table) -> pa.Table:
    """Per-batch Gopher gate kernel — module-level so fused consumers
    (``filter_agreement_kappa``) reuse it without a corpus join."""
    text = t["text"]
    trimmed = pc.utf8_trim(text, characters=" ")
    n_words = pc.cast(
        pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1),
        pa.int64(),
    )
    n_chars_ns = pc.utf8_length(
        pc.replace_substring_regex(text, r"\s", "")
    )
    mean_wl = np.round(
        pc.cast(n_chars_ns, pa.float64()).to_numpy(zero_copy_only=False)
        / pc.cast(n_words, pa.float64()).to_numpy(zero_copy_only=False),
        4,
    )
    hits = np.zeros(len(t), np.int64)
    for w in GOPHER_STOPWORDS:
        hits += (
            pc.match_substring_regex(text, rf"\b{w}\b")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    nw = n_words.to_numpy(zero_copy_only=False)
    keep = (
        (nw >= GOPHER_MIN_WORDS)
        & (nw <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MWL)
        & (mean_wl <= GOPHER_MAX_MWL)
        & (hits >= GOPHER_MIN_STOPWORDS)
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": n_words,
            "mean_wl": pa.array(mean_wl, pa.float64()),
            "stop_hits": pa.array(hits, pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# perplexity_buckets — CCNet head/middle/tail terciles per language
# ---------------------------------------------------------------------------

PPL_BUCKETS = ("head", "middle", "tail")


def perplexity_buckets(sf_dir: str):
    """documents → (doc_id, lang, perplexity, ppl_bucket).

    The CCNet bucketing step (Wenzek et al. 2020 §3.3): within each
    language, documents are split into equal thirds by LM perplexity —
    ``head`` (most fluent) / ``middle`` / ``tail`` — the standard
    quality-tier signal for pretraining-data selection.

    Exact at any scale WITHOUT a per-language sort-and-scan: the
    per-lang rank comes from ONE composite-key ``global_row_number``
    (range-partitioned rank, functions/ranks.py — two tiny exchanges
    plus one shuffle): key = lang_index·2⁴⁰ + round(cross_entropy·10⁶),
    so a single total order encodes (lang, ce, doc_id); per-lang offsets
    are an output-sized (#langs) driver aggregate. Bucket =
    ((rank_within_lang − 1)·3) // n_lang, the exact NTILE-free tercile.
    Ordering uses the ROUNDED cross-entropy (6 dp, same grid as the
    ``lm_perplexity`` oracle) with doc_id tiebreak, so the DuckDB
    replica's ``ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ce,
    doc_id)`` agrees exactly."""
    from ray.data.aggregate import Count

    from ..functions.ranks import global_row_number

    # lang rides the scoring pass (extra_doc_cols) — no corpus join
    ppl = lm_perplexity(sf_dir, extra_doc_cols=("lang",))

    def project(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "cross_entropy", "perplexity", "lang"])

    # materialize: consumed by BOTH the lang census and the rank chain —
    # without this the whole perplexity plan re-executes per consumer
    # (and global_row_number is a pipeline breaker anyway)
    joined = ppl.map_batches(project, batch_format="pyarrow").materialize()

    # output-sized driver state: one (lang, count) row per language
    lang_counts = (
        joined.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    )
    lang_counts = lang_counts.sort_values("lang").reset_index(drop=True)
    lang_idx = {l: i for i, l in enumerate(lang_counts["lang"])}
    lang_n = {l: int(n) for l, n in
              zip(lang_counts["lang"], lang_counts["n"])}
    offsets: dict[str, int] = {}
    run = 0
    for l in lang_counts["lang"]:
        offsets[l] = run
        run += lang_n[l]
    # the three maps are #langs-sized (bytes) — shipped in the closures

    def add_key(t: pa.Table) -> pa.Table:
        ce_int = np.rint(
            t["cross_entropy"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        lcodes = np.fromiter(
            (lang_idx[l] for l in t["lang"].to_pylist()),
            np.int64, t.num_rows,
        )
        key = lcodes * np.int64(1 << 40) + ce_int
        return t.append_column("__key", pa.array(key, pa.int64()))

    keyed = joined.map_batches(add_key, batch_format="pyarrow")
    ranked = global_row_number(keyed, "__key", tiebreak=["doc_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        offs, ns = offsets, lang_n
        langs_col = t["lang"].to_pylist()
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.fromiter((offs[l] for l in langs_col), np.int64, len(rn))
        n = np.fromiter((ns[l] for l in langs_col), np.int64, len(rn))
        tier = ((rn - 1 - off) * 3) // n  # 0 | 1 | 2 within the lang
        names = np.asarray(PPL_BUCKETS, dtype=object)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "perplexity": t["perplexity"],
                "ppl_bucket": pa.array(names[tier], pa.string()),
            }
        )

    return ranked.map_batches(bucketize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# quality_classifier_score — fastText-shaped hashed linear classifier
# ---------------------------------------------------------------------------

#: hashed feature space (fastText's hashing trick, Joulin et al. 2016
#: §2.1: unigrams + bigrams → fixed bucket count) and the integer
#: weight grid. Weights are a deterministic md5-derived stand-in for
#: trained parameters (no training corpora in this environment — same
#: convention as the LSH hyperplane matrix): w[b] =
#: md5_prefix32("w-{b}") % 2001 − 1000 ∈ [−1000, 1000], i.e. a fixed
#: 1e-3 lattice, so per-doc weight sums are INTEGERS and the DuckDB
#: replica is accumulation-order-proof.
QC_HASH_DIM = 1024
QC_W_MOD = 2001

_QC_W = np.array(
    [
        (md5_prefix32(f"w-{b}") % QC_W_MOD) - 1000
        for b in range(QC_HASH_DIM)
    ],
    dtype=np.int64,
)


def quality_classifier_score(sf_dir: str):
    """documents → (doc_id, n_feats, w_sum, logit, keep).

    The model-backed quality-classifier scoring stage every production
    pretraining pipeline runs (CCNet/GPT-3/LLaMA filter corpora with a
    fastText linear classifier): features are whitespace unigrams plus
    adjacent bigrams hashed into ``QC_HASH_DIM`` buckets, the score is
    the mean bucket weight (a linear model over a bag of hashed
    features), ``keep`` routes on logit ≥ 0 — equivalent to
    sigmoid ≥ 0.5 with NO transcendental on either engine, so the
    decision is bit-exact. One streaming map, no shuffle; per-batch
    features are ``np.unique``'d so each distinct token/bigram pays its
    md5 once (the corpus vocabulary is the working set, not the token
    stream)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_qc_frame, batch_format="pandas")


def _qc_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch hashed-linear-classifier kernel — module-level so
    fused consumers (``filter_agreement_kappa``) reuse it."""
    if True:
        n = len(df)
        if n == 0:
            z = np.array([], np.int64)
            return pd.DataFrame(
                {"doc_id": z, "n_feats": z, "w_sum": z,
                 "logit": np.array([], np.float64), "keep": z}
            )
        toks = tokens_series(df["text"])
        per_doc = []
        for lst in toks:
            per_doc.append(lst + [f"{a} {b}" for a, b in zip(lst, lst[1:])])
        lens = np.array([len(f) for f in per_doc], dtype=np.int64)
        flat = np.array(
            [x for f in per_doc for x in f], dtype=object
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        wu = np.array(
            [_QC_W[md5_prefix32(u) % QC_HASH_DIM] for u in uniq],
            dtype=np.int64,
        )
        vals = wu[inv]
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        s = np.add.reduceat(vals, offsets)  # lens ≥ 1 always (tokens(['']))
        logit = np.round(s / (1000.0 * lens), 6)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_feats": lens,
                "w_sum": s,
                "logit": logit,
                "keep": (s >= 0).astype(np.int64),
            }
        )


# ---------------------------------------------------------------------------
# filter_agreement_kappa — Cohen's κ between two quality raters
# ---------------------------------------------------------------------------


def filter_agreement_kappa(sf_dir: str):
    """One row: (n11, n10, n01, n00, po, pe, kappa) — inter-rater
    agreement between the Gopher rule gate and the hashed linear
    classifier (Cohen 1960). The question every pipeline owner asks
    before stacking filters: do they agree beyond chance? κ near 0 ⇒
    the second filter adds an independent signal; κ near 1 ⇒ it is
    redundant.

    EXACT: the 2×2 contingency is integer; ``po``, ``pe`` and κ are
    single divisions of int64 expressions (κ = (N·(n11+n00) −
    (r1·c1 + r0·c0)) / (N² − (r1·c1 + r0·c0)) — the algebraically
    cleared form, no chained float ops), so both engines round the same
    doubles. Shape: BOTH raters run fused in one streaming map over one
    corpus read (no join — the kernels are module-level and shared with
    their standalone queries); per-batch partial counts ride one
    4-integer row per batch through a single-key groupby."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        kg = _gopher_table(t)["keep"].to_numpy(zero_copy_only=False)
        kc = _qc_frame(t.to_pandas())["keep"].to_numpy()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n11": pa.array([int(((kg == 1) & (kc == 1)).sum())],
                                pa.int64()),
                "n10": pa.array([int(((kg == 1) & (kc == 0)).sum())],
                                pa.int64()),
                "n01": pa.array([int(((kg == 0) & (kc == 1)).sum())],
                                pa.int64()),
                "n00": pa.array([int(((kg == 0) & (kc == 0)).sum())],
                                pa.int64()),
            }
        )

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k"],
        ["n11", "n10", "n01", "n00"],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["k"])
        n11 = int(t["n11"][0].as_py())
        n10 = int(t["n10"][0].as_py())
        n01 = int(t["n01"][0].as_py())
        n00 = int(t["n00"][0].as_py())
        n = n11 + n10 + n01 + n00
        r1, r0 = n11 + n10, n01 + n00
        c1, c0 = n11 + n01, n10 + n00
        chance = r1 * c1 + r0 * c0
        po = np.round((n11 + n00) / n, 6)
        pe = np.round(chance / (n * n), 6)
        denom = n * n - chance
        # pe = 1 (both raters constant) leaves κ undefined; 0 by the
        # usual convention — mirrored in the oracle's CASE
        kappa = 0.0 if denom == 0 else np.round(
            (n * (n11 + n00) - chance) / denom, 6
        )
        return pa.table(
            {
                "n11": pa.array([n11], pa.int64()),
                "n10": pa.array([n10], pa.int64()),
                "n01": pa.array([n01], pa.int64()),
                "n00": pa.array([n00], pa.int64()),
                "po": pa.array([float(po)], pa.float64()),
                "pe": pa.array([float(pe)], pa.float64()),
                "kappa": pa.array([float(kappa)], pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# lm_perplexity_bigram — bigram LM with stupid backoff
# ---------------------------------------------------------------------------

#: BOS sentinel for "no previous token" (cannot collide with real
#: tokens: the stream is whitespace-split, and \x01 never appears in
#: the corpus vocabulary)
LM_BOS = "\x01"
#: stupid-backoff discount (Brants et al. 2007 §3: fixed 0.4, no
#: normalization — scores, not probabilities, which is all a
#: perplexity-style quality filter needs)
LM_BACKOFF = 0.4


def _seq_table(t: pa.Table) -> pa.Table:
    """Exploded (doc_id, tok, prev, is_first) in document order — the
    bigram-scoring stream. prev of a document's first token is
    ``LM_BOS``; everything is Arrow/numpy (no Python token loop)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim(t["text"], characters=" "), r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = pc.list_parent_indices(toks)
    flat = toks.flatten()
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    n = int(lens.sum())
    first = np.zeros(n, bool)
    first[np.cumsum(lens) - lens] = True  # lens ≥ 1 always (split(''))
    prev_idx = np.maximum(np.arange(n, dtype=np.int64) - 1, 0)
    prev = pc.if_else(
        pa.array(first), pa.scalar(LM_BOS), flat.take(pa.array(prev_idx))
    )
    doc_ids = t["doc_id"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    return pa.table(
        {
            "doc_id": doc_ids.take(parent),
            "tok": flat,
            "prev": prev,
            "is_first": pa.array(first),
        }
    )


def _even_docs(t: pa.Table) -> pa.Table:
    """Training-half filter: doc_id % 2 == 0."""
    return t.filter(
        pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), 0)
    )


def _backoff_nll(first: np.ndarray, cu: np.ndarray, cp: np.ndarray,
                 cb: np.ndarray, total: float) -> np.ndarray:
    """Per-token -log2 score under stupid backoff. ``cu``/``cp``/``cb``
    are float arrays with NaN for unseen (unigram of tok, unigram of
    prev, bigram count); the arithmetic mirrors the SQL oracle's CASE
    arms term for term."""
    with np.errstate(divide="ignore", invalid="ignore"):
        pu = np.where(np.isnan(cu), 1.0 / total, cu / total)
        nll_uni = -np.log2(pu)
        nll_bi = -np.log2(cb / cp)
        nll_back = -np.log2(LM_BACKOFF * pu)
    return np.where(first, nll_uni, np.where(~np.isnan(cb), nll_bi,
                                             nll_back))


def lm_perplexity_bigram(sf_dir: str, *,
                         broadcast_max_vocab: int = LM_BROADCAST_MAX_VOCAB):
    """documents → (doc_id, n_tokens, cross_entropy, perplexity).

    Bigram LM with stupid backoff (Brants et al. 2007): trained on the
    EVEN-doc_id half of the corpus, scored over every document — the
    realistic held-out perplexity-filter setup (CCNet trains KenLM on
    target-domain text and scores the crawl), and the reason backoff
    actually fires: odd documents contain bigrams (and tokens) the
    training half never saw. Scoring: first token → unigram
    p = c(w)/T (unseen → 1/T floor); elsewhere seen bigram →
    c(prev,w)/c(prev), else 0.4·p_uni(w).

    Same two-tier size routing as ``lm_perplexity``: count tables ride
    partial+final groupbys; under ``broadcast_max_vocab`` combined
    entries the two dicts broadcast once per actor, above it the token
    stream left-joins the count tables (3 bucketed exchanges) and
    per-doc aggregation is a bucketed group apply."""
    import ray
    from ray.data.aggregate import Sum

    from .corpus_ops import _token_table

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        ex = _token_table(_even_docs(t))
        g = pa.TableGroupBy(ex.select(["tok"]), ["tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["tok"], "c_part": pc.cast(g["count_all"], pa.int64())}
        )

    def big_partial(t: pa.Table) -> pa.Table:
        seq = _seq_table(_even_docs(t))
        seq = seq.filter(pc.invert(seq["is_first"]))
        g = pa.TableGroupBy(
            seq.select(["prev", "tok"]), ["prev", "tok"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev": g["prev"],
                "token": g["tok"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="c"))
        .materialize()
    )
    big = _final_groupby(
        ds.map_batches(big_partial, batch_format="pyarrow"),
        ["prev", "token"],
        ["c_part"],
    ).materialize()
    n_uni, n_big = uni.count(), big.count()
    total = float(sum(
        b["c"].to_numpy().sum()
        for b in uni.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ))

    if n_uni + n_big <= broadcast_max_vocab:
        u = {}
        for b in uni.iter_batches(batch_format="pyarrow"):
            u.update(zip(b["token"].to_pylist(), b["c"].to_numpy()))
        bg = {}
        for b in big.iter_batches(batch_format="pyarrow"):
            bg.update(
                zip(
                    (f"{p} {w}" for p, w in zip(b["prev"].to_pylist(),
                                                b["token"].to_pylist())),
                    b["c_part"].to_numpy(),
                )
            )
        refs = ray.put((u, bg, total))

        class _BigramScorer:
            def __init__(self, r):
                self._u, self._b, self._t = ray.get(r)

            def __call__(self, t: pa.Table) -> pd.DataFrame:
                seq = _seq_table(t)
                toks = seq["tok"].to_pandas()
                prevs = seq["prev"].to_pandas()
                cu = toks.map(self._u).to_numpy(np.float64, na_value=np.nan)
                cp = prevs.map(self._u).to_numpy(np.float64, na_value=np.nan)
                cb = (
                    prevs.str.cat(toks, sep=" ")
                    .map(self._b)
                    .to_numpy(np.float64, na_value=np.nan)
                )
                nll = _backoff_nll(
                    seq["is_first"].to_numpy(zero_copy_only=False),
                    cu, cp, cb, self._t,
                )
                return _doc_nll_frame(
                    seq["doc_id"].to_numpy(zero_copy_only=False), nll
                )

        from ..stages.util import stage

        return stage(ds, _BigramScorer, args=(refs,),
                     batch_format="pyarrow", concurrency=2)

    # distributed tier: seq ⟕ uni(tok) ⟕ uni(prev) ⟕ big(prev,tok)
    from ..functions.groups import bucketed_group_apply
    from ..functions.joins import hash_join

    seq_ds = ds.map_batches(_seq_table, batch_format="pyarrow")
    uni_tok = uni.map_batches(
        lambda t: pa.table({"tok": t["token"], "cu": t["c"]}),
        batch_format="pyarrow",
    )
    uni_prev = uni.map_batches(
        lambda t: pa.table({"prev": t["token"], "cp": t["c"]}),
        batch_format="pyarrow",
    )
    big_pw = big.map_batches(
        lambda t: pa.table(
            {"prev": t["prev"], "tok": t["token"], "cb": t["c_part"]}
        ),
        batch_format="pyarrow",
    )
    j = hash_join(seq_ds, uni_tok, "tok", how="left")
    j = hash_join(j, uni_prev, "prev", how="left")
    j = hash_join(j, big_pw, ["prev", "tok"], how="left")

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        nll = _backoff_nll(
            g["is_first"].to_numpy(bool),
            g["cu"].to_numpy(np.float64, na_value=np.nan),
            g["cp"].to_numpy(np.float64, na_value=np.nan),
            g["cb"].to_numpy(np.float64, na_value=np.nan),
            total,
        )
        return _doc_nll_frame(g["doc_id"].to_numpy(), nll)

    return bucketed_group_apply(j, ["doc_id"], per_doc)


# ---------------------------------------------------------------------------
# feature_information_gain — which metadata feature predicts quality?
# ---------------------------------------------------------------------------


def feature_information_gain(sf_dir: str):
    """(feature, n_values, h_label, info_gain) — one row per metadata
    feature (lang, source).

    The feature-selection question a routing pipeline asks before
    branching on metadata: how much does knowing ``lang`` (or
    ``source``) reduce uncertainty about the Gopher keep label?
    ``IG(F) = H(keep) − Σ_v (n_v/N)·H(keep|F=v)``, all probabilities
    from integer counts; log2 summation drift is ~1e-15, absorbed by
    the shared 6 dp rounding grid (the lm_perplexity tolerance
    argument). Shape: the Gopher kernel runs fused in the counting map
    (no join); one partial+final groupby moves ≤ |values|·2 integer
    rows; the finish sweep is value-census-sized."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        kg = _gopher_table(t)["keep"].to_numpy(zero_copy_only=False)
        frames = []
        for feat in ("lang", "source"):
            df = pd.DataFrame(
                {
                    "feature": pd.Series([feat] * len(t), dtype=object),
                    "val": t[feat].to_numpy(zero_copy_only=False),
                    "kg": kg,
                }
            )
            frames.append(
                df.groupby(["feature", "val", "kg"], as_index=False,
                           sort=False).size().rename(columns={"size": "n"})
            )
        out = pd.concat(frames)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["feature", "val", "kg"],
        ["n"],
    ).to_pandas()  # ≤ |langs|+|sources| × 2 rows

    rows = []
    for feat, g in agg.groupby("feature"):
        n_total = int(g["n"].sum())
        marg = g.groupby("kg")["n"].sum().to_numpy(np.float64)
        p = marg / n_total
        hk = float(-(p * np.log2(p)).sum())
        cond = 0.0
        vals = g.groupby("val")
        for _, gv in vals:
            nv = int(gv["n"].sum())
            pv = gv["n"].to_numpy(np.float64) / nv
            hv = float(-(pv * np.log2(pv)).sum())
            cond += (nv / n_total) * hv
        rows.append(
            (feat, len(vals), float(np.round(hk, 6)),
             float(np.round(hk - cond, 6)))
        )
    rows.sort()
    return pa.table(
        {
            "feature": pa.array([r[0] for r in rows], pa.string()),
            "n_values": pa.array([r[1] for r in rows], pa.int64()),
            "h_label": pa.array([r[2] for r in rows], pa.float64()),
            "info_gain": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# classifier_reliability_bins — calibration census of the QC score
# ---------------------------------------------------------------------------

#: fixed-width reliability bins over the bounded logit. Weights live in
#: [-1000, 1000] (``_QC_W``), so logit = w_sum/(1000·n_feats) ∈ [-1, 1]
#: and bin = floor((logit+1)/0.2) has the exact INTEGER form
#: ``(5·w_sum + 5000·n_feats) // (1000·n_feats)`` (numerator ≥ 0 by the
#: weight bound, so floor-vs-truncate division semantics can't differ).
QC_RELIABILITY_BINS = 10


def classifier_reliability_bins(sf_dir: str):
    """(bin, n_docs, n_pred_keep, n_pos, w_sum_total, pos_rate) — the
    reliability diagram every production quality classifier ships with:
    docs bucketed by classifier confidence (fixed-width logit bins),
    each bin reporting how many the classifier keeps vs how many pass
    the independent Gopher gate (``n_pos``). A calibrated filter shows
    ``pos_rate`` rising with ``bin``; a flat diagram means the score
    carries no signal and the keep threshold is arbitrary.

    Shape: the classifier and Gopher kernels run FUSED in one counting
    map (the ``filter_agreement_kappa`` pattern — no corpus join); bin
    assignment is exact integer arithmetic (no data-adaptive quantile
    pass, no float edge cases); the partial+final groupby moves ≤ 10
    integer rows per batch and the single ratio divides once at the
    end (house float-parity recipe)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"bin": z, "n_docs": z, "n_pred_keep": z,
                             "n_pos": z, "w_sum_total": z})
        qc = _qc_frame(t.select(["doc_id", "text"]).to_pandas())
        kg = _gopher_table(t)["keep"].to_numpy(zero_copy_only=False)
        s = qc["w_sum"].to_numpy()
        n = qc["n_feats"].to_numpy()
        b = np.minimum((5 * s + 5000 * n) // (1000 * n),
                       QC_RELIABILITY_BINS - 1)
        df = (
            pd.DataFrame(
                {
                    "bin": b.astype(np.int64),
                    "n_docs": np.ones(len(b), np.int64),
                    "n_pred_keep": qc["keep"].to_numpy(),
                    "n_pos": kg.astype(np.int64),
                    "w_sum_total": s.astype(np.int64),
                }
            )
            .groupby("bin", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], ["n_docs", "n_pred_keep", "n_pos", "w_sum_total"],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy()
        pos = t["n_pos"].to_numpy()
        return pa.table(
            {
                "bin": pc.cast(t["bin"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_pred_keep": pc.cast(t["n_pred_keep"], pa.int64()),
                "n_pos": pc.cast(t["n_pos"], pa.int64()),
                "w_sum_total": pc.cast(t["w_sum_total"], pa.int64()),
                "pos_rate": pa.array(np.round(pos / n, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k_anonymity_census — re-identification audit over a quasi-identifier
# ---------------------------------------------------------------------------

#: size-band width for the quasi-identifier (chars // band)
K_ANON_BAND = 256


def k_anonymity_census(sf_dir: str):
    """(class_size, n_classes, n_docs) — the k-anonymity histogram a
    privacy review asks for before releasing a corpus: docs are grouped
    by the quasi-identifier tuple (lang, source, n_chars // 256 band)
    and the census reports how many equivalence classes have each size.
    Classes of size 1 are singletons — a doc uniquely re-identifiable
    from its metadata alone; the corpus is k-anonymous at the smallest
    ``class_size`` present.

    Shape: per-batch (lang, source, band) count partials → one groupby
    (one row per QI combo per batch crosses the wire) → a second
    QI-census-sized groupby over class sizes. Nothing corpus-sized
    leaves the first map; all counts are integers."""
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "lang": t["lang"].to_numpy(zero_copy_only=False),
                    "source": t["source"].to_numpy(zero_copy_only=False),
                    "band": (t["n_chars"].to_numpy()
                             // K_ANON_BAND).astype(np.int64),
                }
            )
            .groupby(["lang", "source", "band"], as_index=False)
            .size()
            .rename(columns={"size": "k"})
        )
        df["k"] = df["k"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    census = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source", "band"], ["k"],
    )

    def to_size(t: pa.Table) -> pa.Table:
        k, c = np.unique(t["k"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "class_size": pa.array(k.astype(np.int64), pa.int64()),
                "n_classes": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    sizes = _final_groupby(
        census.map_batches(to_size, batch_format="pyarrow"),
        ["class_size"], ["n_classes"],
    )

    def finish(t: pa.Table) -> pa.Table:
        cs = t["class_size"].to_numpy()
        nc = t["n_classes"].to_numpy()
        return pa.table(
            {
                "class_size": pc.cast(t["class_size"], pa.int64()),
                "n_classes": pc.cast(t["n_classes"], pa.int64()),
                "n_docs": pa.array((cs * nc).astype(np.int64), pa.int64()),
            }
        )

    return sizes.map_batches(finish, batch_format="pyarrow")

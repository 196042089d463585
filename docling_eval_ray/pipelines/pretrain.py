"""End-to-end training-data pipeline composition.

The showpiece chain a pretraining corpus actually runs, as ONE
streaming Ray Data pipeline over a single corpus scan:

    quality gate (Gopher rules)  →  exact dedup (md5, min-doc_id wins)
    →  benchmark decontamination  →  greedy sequence packing

Stage fusion is the point: the per-document signals — token count,
mean word length, stopword hits, contamination flag, content
fingerprint — are all computed in one fused actor-pool ``map_batches``
pass (the benchmark gram set is eval-suite-sized and broadcast once
via ``ray.put``), so the corpus is READ EXACTLY ONCE and only
quality-passing rows (doc_id + a few scalars, never text) continue.
Downstream there are exactly two bucketed exchanges: one on the
content fingerprint (dedup winner), one on the pack bucket (greedy
packing) — the same shuffle budget as ``dedup_exact`` +
``pack_sequences`` run alone, with the filter/decontaminate stages
free-riding on the scan.

Order semantics (mirrored exactly by the SQL oracle): the dedup
winner is chosen among QUALITY-PASSING docs; contamination then drops
winners without resurrecting their duplicates (decontamination runs
last, as in practice — the benchmark set changes more often than the
corpus).

The whole chain is DuckDB-oracled end-to-end by composing the proven
fragments of its stages (gopher_quality_filter, dedup_exact,
decontaminate_ngrams, pack_sequences) into one recursive-CTE query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokens import sql_tokens, tokens_series
from .cleaning import (
    GOPHER_MAX_MWL,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MWL,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
)
from .corpus_ops import (
    BENCH_MAX_DOC_ID,
    PACK_BUCKET,
    PACK_CAP,
    PACK_SEQ_STRIDE,
    _doc_ngrams,
    _greedy_pack,
)
from .relational import _read


class _SignalPass:
    """Fused per-document signal computation: quality rules,
    contamination flag, and content fingerprint in one scan. The
    benchmark gram set is resolved from the object store once per
    actor."""

    def __init__(self, bench_ref):
        import ray

        self._bench: frozenset[str] = ray.get(bench_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t["text"]
        trimmed = pc.utf8_trim(text, characters=" ")
        n_words = (
            pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_chars_ns = (
            pc.utf8_length(pc.replace_substring_regex(text, r"\s", ""))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        mean_wl = np.round(n_chars_ns / n_words, 4)
        hits = np.zeros(len(t), np.int64)
        for w in GOPHER_STOPWORDS:
            hits += (
                pc.match_substring_regex(text, rf"\b{w}\b")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        keep = (
            (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_wl >= GOPHER_MIN_MWL)
            & (mean_wl <= GOPHER_MAX_MWL)
            & (hits >= GOPHER_MIN_STOPWORDS)
        )
        texts = pd.Series(t["text"].to_pylist())
        toks = tokens_series(texts)
        contaminated = np.array(
            [
                any(g in self._bench for g in _doc_ngrams(tk))
                for tk in toks
            ],
            dtype=np.int64,
        )
        fps = [hashlib.md5(s.encode()).hexdigest() for s in texts]
        out = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(n_words, pa.int64()),
                "contaminated": pa.array(contaminated, pa.int64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )
        # only quality survivors leave the scan — text never does
        return out.filter(pa.array(keep))


def training_data_pipeline(sf_dir: str):
    """(doc_id, n_tokens, seq_id, seq_offset) for every document that
    survives quality → dedup → decontamination, packed into
    fixed-capacity training sequences. See module docstring for the
    scan/shuffle budget."""
    import ray

    from ..functions.groups import bucketed_group_apply
    from ..stages.util import stage

    bench_t = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr=f"doc_id < {BENCH_MAX_DOC_ID}"
    )
    grams: set[str] = set()
    for row in bench_t.take_all():  # benchmark side: eval-suite-sized
        grams |= _doc_ngrams(sql_tokens(row["text"]))
    bench_ref = ray.put(frozenset(grams))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    signals = stage(ds, _SignalPass, args=(bench_ref,),
                    batch_format="pyarrow", concurrency=2)

    # exchange 1: dedup winner per fingerprint (min doc_id), carrying
    # the scalars — greatest-per-group, no join
    def winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fingerprint", "doc_id"], kind="mergesort")
        return g.groupby("fingerprint", sort=False).head(1)

    winners = bucketed_group_apply(signals, ["fingerprint"], winner)

    # decontamination drops winners (duplicates do not resurrect)
    clean = winners.filter(expr="contaminated == 0")

    def with_bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "bucket": pc.cast(
                    pc.floor(pc.divide(t["doc_id"], PACK_BUCKET)),
                    pa.int64(),
                ),
            }
        )

    counts = clean.map_batches(with_bucket, batch_format="pyarrow")

    # exchange 2: greedy packing inside doc_id-range buckets
    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        seq, start = _greedy_pack(g["n_tokens"].to_numpy(), PACK_CAP)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype(np.int64),
                "n_tokens": g["n_tokens"].to_numpy().astype(np.int64),
                "seq_id": g["bucket"].to_numpy().astype(np.int64)
                * PACK_SEQ_STRIDE + seq,
                "seq_offset": start,
            }
        )

    return bucketed_group_apply(counts, ["bucket"], pack_bucket)

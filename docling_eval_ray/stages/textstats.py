"""Text-analysis stages: language ID, winnowing fingerprints.

(Token counting and quality scoring are the oracled
``relational.token_counts`` / ``relational.quality_scores``.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokens import sql_tokens

#: tiny public stopword profiles (top function words per language);
#: classifier = argmax of stopword-hit rate, charset-gated for zh
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "no",
           "los", "las", "por", "con", "para", "del"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "ist", "des", "im", "nicht", "ein", "eine", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "est",
           "que", "dans", "pour", "qui", "au", "sur"},
}


class LangId:
    """Actor-pool language classifier: stopword-profile argmax with a
    CJK charset gate. Profiles compiled once per actor in ``__init__``
    (the reference's stateful-metric-object pattern, A4)."""

    def __init__(self):
        self._profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def classify(self, text: str) -> str:
        # charset gate: any CJK codepoint → zh
        if any("一" <= ch <= "鿿" for ch in text[:512]):
            return "zh"
        # SQL-replica tokenization; space-blank docs are the oracle's
        # trim(text)='' exclusion → 'und'
        if not text.strip(" "):
            return "und"
        toks = sql_tokens(text.lower())
        best, best_rate = "und", 0.0
        for lang, stops in self._profiles.items():
            rate = sum(t in stops for t in toks) / len(toks)
            if rate > best_rate:
                best, best_rate = lang, rate
        return best if best_rate > 0.0 else "und"

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self.classify(s) for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        )


def language_id(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from .util import stage

    return stage(ds, LangId)


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling Karp-Rabin hash + min-sampling;
# public scheme: Schleimer/Wilkerson/Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------

_BASE = np.uint64(1000003)
_WINDOW = 8  # winnowing window over k-gram hashes
_KGRAM = 16  # characters per k-gram


def winnow_fingerprints(text: str, kgram: int = _KGRAM,
                        window: int = _WINDOW) -> np.ndarray:
    """Rolling-hash k-gram fingerprints, min-sampled per window.

    Vectorized: one polynomial rolling hash over the char codes, then a
    sliding-window min via stride tricks. Returns sorted distinct
    fingerprints (uint64).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < kgram:
        return np.array([], dtype=np.uint64) if n == 0 else np.array(
            [np.uint64(sum(int(c) for c in data))], dtype=np.uint64
        )
    # powers and prefix hashes mod 2**64 (wrapping arithmetic)
    powers = np.ones(n, dtype=np.uint64)
    if n > 1:
        np.cumprod(np.full(n - 1, _BASE, dtype=np.uint64), out=powers[1:])
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(data * powers[::-1], out=prefix[1:])  # H(i) = sum c_j B^(n-1-j)
    # window [i, i+k): (prefix[i+k]-prefix[i]) * B^i has constant exponents
    # (n-1-t); multiply by B^{-(n-k)} (modular inverse mod 2^64, B odd) so
    # the hash equals sum c_{i+t} B^{k-1-t} — independent of the TEXT
    # length, making fingerprints comparable across documents
    inv = pow(int(_BASE), -1, 1 << 64)
    norm = np.uint64(pow(inv, n - kgram, 1 << 64))
    h = (prefix[kgram:] - prefix[:-kgram]) * powers[: n - kgram + 1] * norm
    if len(h) < window:
        return np.unique(h)
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def document_winnow(sf_dir: str):
    """Per-document winnowing summary: fingerprint count + min
    fingerprint (hex) — the content-defined dedup/plagiarism key."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ns, mins = [], []
        for s in t["text"].to_pylist():
            fps = winnow_fingerprints(s)
            ns.append(len(fps))
            mins.append(f"{int(fps.min()):016x}" if len(fps) else "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array(ns, pa.int64()),
                "min_fingerprint": pa.array(mins, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class LangIdConfusion:
    """Actor-pool confusion-census stage: classify each doc with the
    ``LangId`` kernel and fold straight into per-batch
    (lang_true, lang_pred) count partials — the labels ride the
    classification pass, so there is no corpus join."""

    def __init__(self):
        self._lid = LangId()

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self._lid.classify(s) for s in t["text"].to_pylist()]
        df = (
            pd.DataFrame(
                {
                    "lang_true": t["lang"].to_numpy(zero_copy_only=False),
                    "lang_pred": preds,
                }
            )
            .groupby(["lang_true", "lang_pred"], as_index=False)
            .size().rename(columns={"size": "n_docs"})
        )
        df["n_docs"] = df["n_docs"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)


def langid_confusion(sf_dir: str):
    """(lang_true, lang_pred, n_docs) — the confusion matrix of the
    heuristic language classifier against the corpus's ground-truth
    ``lang`` column: the evaluation a language-routing pipeline needs
    before trusting the classifier to split the corpus (per-language
    precision/recall fall straight out of the cells).

    Shape: one streaming actor-pool pass (profiles compiled once per
    actor); the groupby moves ≤ |langs|² count rows per batch."""
    import ray.data as rd

    from ..functions.groups import final_groupby_sum
    from .util import stage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    parts = stage(ds, LangIdConfusion)
    return final_groupby_sum(parts, ["lang_true", "lang_pred"],
                             ["n_docs"])

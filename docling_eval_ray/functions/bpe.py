"""BPE tokenizer training + application over the corpus — the
vocabulary-learning step a pretraining data pipeline runs before token
counting (public Sennrich et al. 2016 byte-pair-encoding algorithm;
the word-histogram formulation is the standard scalable shape: GPT-2's
reference trainer also iterates over word COUNTS, not the raw corpus).

Distributed shape:

* **train** — ONE corpus scan builds the exact (word, count) histogram
  (per-batch partial counts → one vocab-sized groupby, the census
  pattern); the merge loop then runs driver-side over the HISTOGRAM,
  which is vocabulary-sized (bounded: Heaps' law, ~10⁶ entries at
  100 TB), never corpus-sized. Deterministic: ties on pair frequency
  break lexicographically.
* **apply** — the learned merge list is tiny (n_merges rows); it ships
  in the closure and a second streaming pass re-segments each document
  and emits per-doc BPE token counts. No shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .tokens import sql_tokens

#: end-of-word sentinel (keeps merges from crossing word boundaries)
EOW = "</w>"
BPE_DEFAULT_MERGES = 20


def bpe_merges_from_histogram(
    histogram: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a word→count histogram.

    Pure kernel (drives both the pipeline and the known-answer tests).
    Returns ``[(left, right, pair_count), ...]`` in merge order; stops
    early when no pair occurs twice."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in sorted(histogram.items()) if w
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        # max count, lexicographically-smallest pair on ties
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((left, right, n))
        merged = left + right
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply learned merges (in training order) to one word."""
    syms = list(word) + [EOW]
    for left, right, _n in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [left + right]
            else:
                i += 1
    return syms


def _word_histogram(sf_dir: str) -> dict[str, int]:
    """Exact corpus word histogram: per-batch partial counts → one
    vocab-sized groupby (census pattern); the RESULT is vocab-sized and
    collected for the driver-side merge loop (the standard BPE-trainer
    state — gate on vocabulary size, not corpus size)."""
    import ray.data as rd

    from .groups import final_groupby_sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        words: dict[str, int] = {}
        for text in t["text"].to_pylist():
            for w in sql_tokens(text):
                if w:
                    words[w] = words.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(words), pa.string()),
                "n": pa.array(list(words.values()), pa.int64()),
            }
        )

    vocab = final_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["word"], ["n"]
    ).to_pandas()  # vocab-sized by construction
    return dict(zip(vocab["word"], vocab["n"]))


def bpe_train_merges(sf_dir: str, *, n_merges: int = BPE_DEFAULT_MERGES):
    """(rank, left, right, pair_count) merge table learned from the
    corpus — driver-sized output (n_merges rows). Non-SQL-expressible
    (iterative argmax over mutating state) → rows-only driver check;
    known-answer tested."""
    merges = bpe_merges_from_histogram(_word_histogram(sf_dir), n_merges)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def bpe_token_counts(sf_dir: str, *, n_merges: int = BPE_DEFAULT_MERGES):
    """Per-document BPE token counts under the corpus-trained merges:
    train (one scan + vocab groupby), then a second streaming pass
    re-segments each doc with the merge list shipped in the closure.
    The merge list is n_merges rows — broadcast state, no shuffle."""
    import ray.data as rd

    merges = bpe_merges_from_histogram(_word_histogram(sf_dir), n_merges)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        # per-batch memoization: corpus words repeat heavily, so each
        # distinct word segments once per batch
        cache: dict[str, int] = {}
        out = np.zeros(t.num_rows, np.int64)
        for i, text in enumerate(t["text"].to_pylist()):
            total = 0
            for w in sql_tokens(text):
                if not w:
                    continue
                n = cache.get(w)
                if n is None:
                    n = len(bpe_segment(w, merges))
                    cache[w] = n
                total += n
            out[i] = total
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "n_bpe_tokens": pa.array(out, pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")

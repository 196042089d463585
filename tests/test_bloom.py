"""Bloom-filter decontamination: one-sided error vs the exact op,
bounded FPR, and bit-exact partial merging."""

import numpy as np
import pytest

from docling_eval_ray.stages.bloom import BloomFilter, decontaminate_bloom

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_exact_equality_vs_exact_op(ray_session):
    """The Bloom tier's verify join makes its output IDENTICAL to the
    exact gram-set op: misses short-circuit (one-sided error — no false
    negatives by construction), and every Bloom pass is re-verified
    against the literal gram table, killing false positives. This is
    what lets the DuckDB oracle cover both tiers."""
    from docling_eval_ray.pipelines.corpus_ops import decontaminate_ngrams

    exact = decontaminate_ngrams(SF_DIR).to_pandas()
    approx = decontaminate_bloom(SF_DIR).to_pandas()

    e = exact.sort_values("doc_id").reset_index(drop=True)
    a = approx.sort_values("doc_id").reset_index(drop=True)
    assert list(e["doc_id"]) == list(a["doc_id"])
    assert (
        a["n_contaminated"].to_numpy() == e["n_contaminated"].to_numpy()
    ).all()
    assert (
        a["contaminated"].to_numpy() == e["contaminated"].to_numpy()
    ).all()
    # sanity: the benchmark self-hits are flagged
    assert a["contaminated"].to_numpy(bool).sum() > 0


def test_bloom_fpr_bounded():
    """Measured FPR on disjoint probes stays within 3x the theoretical
    rate for the sized filter."""
    bf = BloomFilter.sized_for(5_000, 0.01)
    members = [f"member-{i}" for i in range(5_000)]
    bf.add_many(members)
    assert bf.contains_many(members).all()  # zero false negatives

    probes = [f"absent-{i}" for i in range(20_000)]
    fp = float(bf.contains_many(probes).mean())
    assert fp <= 3 * max(bf.theoretical_fpr(5_000), 0.01)


def test_bloom_partial_merge_bit_exact():
    """OR-merged partials equal the filter built in one pass."""
    items = [f"gram-{i}" for i in range(1_000)]
    whole = BloomFilter(1 << 14, 5)
    whole.add_many(items)

    merged = BloomFilter(1 << 14, 5)
    for lo in range(0, 1_000, 137):
        part = BloomFilter(1 << 14, 5)
        part.add_many(items[lo:lo + 137])
        merged.merge(BloomFilter.from_bytes(part.to_bytes(), 5))
    assert np.array_equal(whole.words, merged.words)


def test_bloom_sizing_formula():
    """m/k follow the standard construction and scale with n and p."""
    small = BloomFilter.sized_for(1_000, 0.01)
    big = BloomFilter.sized_for(1_000_000, 0.01)
    tight = BloomFilter.sized_for(1_000, 0.0001)
    assert big.m > small.m and tight.m > small.m
    # ~9.6 bits/item at 1% → k ≈ 7
    assert 6 <= small.k <= 8
    with pytest.raises(AssertionError):
        BloomFilter(1 << 10, 3).merge(BloomFilter(1 << 11, 3))


def test_tree_reduce_many_partials(ray_session):
    """The pairwise OR tree over many forced partials (one per block)
    must produce the same filter as a single-pass build, with the
    driver never holding more than O(1) sketches."""
    import ray.data as rd

    from docling_eval_ray.stages.bloom import build_bloom_distributed

    items = [f"gram-{i}" for i in range(2_000)]
    # 40 blocks -> 40 leaf partials -> multi-level fanin-8 tree
    ds = rd.from_items([{"g": g} for g in items], override_num_blocks=40)

    def grams_of(t):
        return t["g"].to_pylist()

    bf = build_bloom_distributed(ds, grams_of, m_bits=1 << 14, k=5)
    whole = BloomFilter(1 << 14, 5)
    whole.add_many(items)
    assert np.array_equal(bf.words, whole.words)
    assert bf.contains_many(items).all()


def test_bloom_fp_calibration_contract(ray_session):
    """One-sided error holds (every true positive passes); counts match
    a direct local rebuild of the same filter; fp_rate lands near the
    theoretical rate for the fixed geometry."""
    import duckdb
    import numpy as np

    from docling_eval_ray.pipelines.corpus_ops import (
        BENCH_MAX_DOC_ID,
        DECON_NGRAM,
        _doc_ngrams,
    )
    from docling_eval_ray.functions.tokens import sql_tokens
    from docling_eval_ray.stages.bloom import (
        BLOOM_CAL_K,
        BLOOM_CAL_M,
        BloomFilter,
        bloom_fp_calibration,
    )

    sf = "/root/testdata/sf0.001"
    got = bloom_fp_calibration(sf).to_pylist()[0]
    assert got["n_bloom_pos"] >= got["n_true_pos"]
    assert got["n_false_pos"] == got["n_bloom_pos"] - got["n_true_pos"]

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).df()
    bench: set[str] = set()
    probes: set[str] = set()
    for _, r in docs.iterrows():
        gs = _doc_ngrams(sql_tokens(r["text"]), DECON_NGRAM)
        probes |= gs
        if r["doc_id"] < BENCH_MAX_DOC_ID:
            bench |= gs
    bf = BloomFilter(BLOOM_CAL_M, BLOOM_CAL_K)
    bf.add_many(sorted(bench))
    hits = bf.contains_many(sorted(probes))
    assert got["n_probes"] == len(probes)
    assert got["n_true_pos"] == len(bench)
    assert got["n_bloom_pos"] == int(hits.sum())
    theo = bf.theoretical_fpr(len(bench))
    assert 0.2 * theo <= got["fp_rate"] <= 5 * theo

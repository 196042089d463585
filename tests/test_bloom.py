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

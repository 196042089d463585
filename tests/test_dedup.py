"""Dedup family: MinHash-LSH recall on synthetic near-dups, SimHash
properties, winnowing fingerprints."""

import numpy as np
import pandas as pd
import pytest

from docling_eval_ray.stages.dedup import (
    MinHasher,
    _shingles,
    hamming64,
    minhash_candidates,
    simhash64,
)
from docling_eval_ray.stages.textstats import winnow_fingerprints


BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall green tree near the old stone wall "
        "under a bright blue summer sky full of small white clouds")


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher()
    near = BASE.replace("lazy", "sleepy")
    sig_a, sig_b = mh.signature(BASE), mh.signature(near)
    est = float((sig_a == sig_b).mean())
    true = _jaccard(BASE, near)
    assert abs(est - true) < 0.15


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = [
        " ".join(rng.choice(vocab, size=60).tolist()) for _ in range(60)
    ]
    # plant: one exact dup and one near-dup of doc 0
    docs.append(docs[0])
    docs.append(docs[0].replace("w", "x", 1))  # single-token edit
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
    ds = rd.from_pandas(df)
    pairs = minhash_candidates(ds).to_pandas()
    found = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (0, 60) in found           # exact dup always collides
    assert (0, 61) in found           # j≈0.95 near-dup: miss prob ~1e-7


def test_simhash_properties():
    a = simhash64(BASE)
    assert a == simhash64(BASE)                     # deterministic
    near = simhash64(BASE.replace("lazy", "sleepy"))
    far = simhash64(" ".join(f"z{i}" for i in range(40)))
    assert hamming64(a, near) < hamming64(a, far)
    assert hamming64(a, near) <= 16


def test_winnow_fingerprints():
    fps = winnow_fingerprints(BASE)
    assert len(fps) > 0
    assert np.array_equal(fps, winnow_fingerprints(BASE))  # deterministic
    # shared content → shared fingerprints
    shifted = "completely different prefix text here " + BASE
    common = np.intersect1d(fps, winnow_fingerprints(shifted))
    assert len(common) >= 0.5 * len(fps)
    # edge cases
    assert len(winnow_fingerprints("")) == 0
    assert len(winnow_fingerprints("short")) == 1

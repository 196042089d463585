"""functions/ranks.py — distributed global row numbering."""

import numpy as np
import pandas as pd
import pytest
import ray

from docling_eval_ray.functions.ranks import global_row_number


def _ds(df: pd.DataFrame, blocks: int):
    return ray.data.from_pandas(df).repartition(blocks)


def test_matches_argsort_rank(ray_session):
    rng = np.random.RandomState(7)
    keys = rng.permutation(5000) * 3  # sparse, unique
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    out = global_row_number(_ds(df, 13), "k", num_ranges=8).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, len(df) + 1)).all()
    assert (out["k"].to_numpy() == np.sort(keys)).all()


def test_ties_ordered_by_tiebreak(ray_session):
    df = pd.DataFrame(
        {"k": [5, 5, 5, 1, 1, 9], "t": [2, 0, 1, 1, 0, 0]}
    ).astype(np.int64)
    out = (
        global_row_number(_ds(df, 3), "k", tiebreak=["t"], num_ranges=4)
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    # rank order is (k, t) lexicographic: ties share a range by value
    assert out[["k", "t"]].values.tolist() == [
        [1, 0], [1, 1], [5, 0], [5, 1], [5, 2], [9, 0]]
    assert out["rn"].tolist() == [1, 2, 3, 4, 5, 6]


def test_single_block_and_skew(ray_session):
    # heavily skewed: one hot value + tail; ranks must stay a permutation
    keys = np.concatenate([np.full(200, 42), np.arange(100, 140)])
    df = pd.DataFrame({"k": keys.astype(np.int64),
                       "t": np.arange(len(keys), dtype=np.int64)})
    out = global_row_number(_ds(df, 5), "k", tiebreak=["t"],
                            num_ranges=16).to_pandas()
    assert sorted(out["rn"].tolist()) == list(range(1, len(keys) + 1))
    srt = out.sort_values("rn")
    assert (np.diff(srt["k"].to_numpy()) >= 0).all()


def test_property_random_multisets(ray_session):
    # randomized multiset keys at several shapes: rn is always the
    # 1-based permutation consistent with (k, t) lexicographic order
    rng = np.random.RandomState(11)
    for trial, (size, dom) in enumerate(
        [(1, 1), (7, 2), (64, 4), (300, 10), (999, 3)]
    ):
        k = rng.randint(0, dom, size=size).astype(np.int64)
        df = pd.DataFrame(
            {"k": k, "t": np.arange(size, dtype=np.int64)}
        )
        out = (
            global_row_number(
                _ds(df, blocks=min(7, size)), "k",
                tiebreak=["t"], num_ranges=5,
            )
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        assert out["rn"].tolist() == list(range(1, size + 1)), trial
        want = df.sort_values(["k", "t"]).reset_index(drop=True)
        assert out["k"].tolist() == want["k"].tolist(), trial
        assert out["t"].tolist() == want["t"].tolist(), trial

"""Internal-consistency properties for the window-v3 / segmentation /
quality-gate batch (sentences_exploded, gopher_quality_filter,
events_interarrival, events_cube, latest_event_per_user,
events_in_windows).

(Exact oracle equality is covered by the auto-parametrized
test_relational_oracle.py::test_query_matches_oracle.)
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from docling_eval_ray.pipelines import cleaning as cl
from docling_eval_ray.pipelines import relational as r

SF = "/root/testdata/sf0.001"


def test_sentences_exploded_reassembles(ray_session):
    """Joining each document's segments back with the delimiter, in
    sent_idx order, must reproduce the original text exactly."""
    df = cl.sentences_exploded(SF).to_pandas()
    orig = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    joined = (
        df.sort_values(["doc_id", "sent_idx"])
        .groupby("doc_id")["sentence"]
        .agg(cl.SENT_DELIM.join)
        .rename("text")
        .reset_index()
    )
    merged = orig.merge(joined, on="doc_id", suffixes=("", "_re"))
    assert len(merged) == len(orig)
    assert (merged["text"] == merged["text_re"]).all()
    # ordinals are contiguous 0..n-1 per doc
    g = df.groupby("doc_id")["sent_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.size()).all()


def test_gopher_filter_keep_consistent_with_evidence(ray_session):
    """`keep` must equal the conjunction of the three rules recomputed
    from the emitted per-rule evidence columns; both verdicts occur."""
    df = cl.gopher_quality_filter(SF).to_pandas()
    expect = (
        df["n_words"].between(cl.GOPHER_MIN_WORDS, cl.GOPHER_MAX_WORDS)
        & df["mean_wl"].between(cl.GOPHER_MIN_MWL, cl.GOPHER_MAX_MWL)
        & (df["stop_hits"] >= cl.GOPHER_MIN_STOPWORDS)
    ).astype(np.int64)
    assert (df["keep"] == expect).all()
    assert 0 < df["keep"].sum() < len(df)


def test_events_interarrival_gaps(ray_session):
    """Gaps are non-negative (in-group ordering held across buckets)
    and exactly one event per user is dropped as the window head."""
    df = r.events_interarrival(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    assert (df["gap_us"] >= 0).all()
    n_users = ev["user_id"].to_pandas().nunique()
    assert len(df) == len(ev) - n_users


def test_events_cube_margins_consistent(ray_session):
    """Each roll-up tier must sum to the grand total."""
    df = r.events_cube(SF)
    base = df[(df["event_type"] != "ALL") & (df["hr"] != -1)]
    by_type = df[(df["event_type"] != "ALL") & (df["hr"] == -1)]
    by_hr = df[(df["event_type"] == "ALL") & (df["hr"] != -1)]
    total = df[(df["event_type"] == "ALL") & (df["hr"] == -1)]
    assert len(total) == 1
    t = int(total["n"].iloc[0])
    assert int(base["n"].sum()) == t
    assert int(by_type["n"].sum()) == t
    assert int(by_hr["n"].sum()) == t


def test_latest_event_one_row_per_user_and_is_max(ray_session):
    df = r.latest_event_per_user(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    assert df["user_id"].is_unique
    mx = (
        ev.assign(ts_us=ev["ts"].to_numpy(dtype="datetime64[us]")
                  .astype(np.int64))
        .groupby("user_id")["ts_us"].max()
    )
    merged = df.merge(mx.rename("max_us"), on="user_id")
    assert (merged["ts_us"] == merged["max_us"]).all()


def test_events_in_windows_counts_bounded(ray_session):
    """Overlapping windows multiply coverage: summed window counts may
    exceed the corpus count, but each window's count is within it."""
    df = r.events_in_windows(SF).to_pandas()
    n = pq.read_table(f"{SF}/events.parquet", columns=["event_id"]).num_rows
    assert len(df) == len(r.RANGE_WINDOWS)
    assert (df["n_events"] <= n).all()
    assert df["n_events"].sum() >= n  # 5d windows stepped 3d cover all


def test_training_data_pipeline_invariants(ray_session):
    """Composition semantics: survivors are quality-passing dedup
    winners; packing never overflows the cap; offsets are consistent
    within each sequence."""
    from docling_eval_ray.pipelines import corpus_ops as co
    from docling_eval_ray.pipelines.pretrain import training_data_pipeline

    df = training_data_pipeline(SF).to_pandas()
    gq = cl.gopher_quality_filter(SF).to_pandas()
    kept_quality = set(gq.loc[gq["keep"] == 1, "doc_id"])
    assert set(df["doc_id"]) <= kept_quality
    assert df["doc_id"].is_unique
    # every sequence's docs tile [0, sum) without overflow past the cap
    g = df.sort_values(["seq_id", "seq_offset"]).groupby("seq_id")
    for _, grp in g:
        ends = grp["seq_offset"].to_numpy() + grp["n_tokens"].to_numpy()
        assert (grp["seq_offset"].to_numpy()[1:] == ends[:-1]).all()
        assert ends[-1] <= co.PACK_CAP or len(grp) == 1

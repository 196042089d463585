"""Outer-join tiers of hash_join + window-v2 kernel semantics.

(Exact oracle equality for the registered queries is covered by
test_relational_oracle.py::test_query_matches_oracle.)
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from docling_eval_ray.functions.joins import hash_join


def _mk(rows: dict) -> "rd.Dataset":
    return rd.from_arrow(pa.table(rows))


def test_hash_join_left_keeps_unmatched(ray_session):
    left = _mk({"k": pa.array([1, 2, 3], pa.int64()),
                "lv": pa.array([10, 20, 30], pa.int64())})
    right = _mk({"k": pa.array([2], pa.int64()),
                 "rv": pa.array([200], pa.int64())})
    out = hash_join(left, right, "k", how="left").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3]
    assert out["lv"].tolist() == [10, 20, 30]
    # unmatched right side is NULL, not NaN-decayed: dtype stays integer
    assert out["rv"].dropna().tolist() == [200]
    assert out["rv"].isna().sum() == 2
    arrow_out = hash_join(left, right, "k", how="left").schema()
    assert str(arrow_out.base_schema.field("rv").type) == "int64"


def test_hash_join_full_coalesces_keys(ray_session):
    left = _mk({"k": pa.array([1, 2], pa.int64()),
                "lv": pa.array([10, 20], pa.int64())})
    right = _mk({"k": pa.array([2, 3], pa.int64()),
                 "rv": pa.array([200, 300], pa.int64())})
    out = hash_join(left, right, "k", how="full").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    # key column is never null (coalesced from whichever side exists)
    assert out["k"].tolist() == [1, 2, 3]
    assert out.loc[2, "rv"] == 300 and pd.isna(out.loc[2, "lv"])
    assert out.loc[0, "lv"] == 10 and pd.isna(out.loc[0, "rv"])


def test_hash_join_rejects_unknown_how(ray_session):
    ds = _mk({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        hash_join(ds, ds, "k", how="right")


def test_ntile_exact_semantics(ray_session, tmp_path):
    """n=6 → quartile sizes 2,2,1,1 (first n%4 tiles get ceil(n/4))."""
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "lang": pa.array(["en"] * 6, pa.string()),
            "n_chars": pa.array([5, 1, 3, 9, 7, 2], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from docling_eval_ray.pipelines.relational import ntile_quartiles

    out = ntile_quartiles(str(tmp_path)).to_pandas()
    sizes = out.groupby("quartile").size()
    assert sizes.tolist() == [2, 2, 1, 1]
    # lowest n_chars land in quartile 1
    q1_docs = set(out[out["quartile"] == 1]["doc_id"])
    assert q1_docs == {1, 5}  # n_chars 1 and 2


def test_rollup_levels_consistent(ray_session):
    """Leaf counts sum to each lang subtotal; subtotals sum to the
    grand total."""
    from docling_eval_ray.pipelines.relational import lang_census_rollup

    out = lang_census_rollup("/root/testdata/sf0.001").to_pandas()
    grand = out[(out["lang"] == "ALL") & (out["source"] == "ALL")]
    leafs = out[(out["lang"] != "ALL") & (out["source"] != "ALL")]
    langs = out[(out["lang"] != "ALL") & (out["source"] == "ALL")]
    assert grand["n_docs"].iloc[0] == leafs["n_docs"].sum()
    assert langs["n_docs"].sum() == leafs["n_docs"].sum()
    per_lang = leafs.groupby("lang")["n_docs"].sum()
    for lang, n in langs.set_index("lang")["n_docs"].items():
        assert per_lang[lang] == n


def test_event_type_pivot_conserves_events(ray_session):
    """Sum of all pivot cells equals the event count."""
    import pyarrow.parquet as pq

    from docling_eval_ray.pipelines.relational import event_type_pivot

    out = event_type_pivot("/root/testdata/sf0.001").to_pandas()
    n_events = pq.read_metadata(
        "/root/testdata/sf0.001/events.parquet"
    ).num_rows
    assert out.drop(columns=["user_id"]).to_numpy().sum() == n_events


def test_zscore_outliers_all_exceed_cut(ray_session):
    from docling_eval_ray.pipelines.relational import (
        ZSCORE_CUT,
        zscore_outliers,
    )

    out = zscore_outliers("/root/testdata/sf0.001").to_pandas()
    assert (out["z"].abs() > ZSCORE_CUT).all()


def test_dedup_keep_canonical_partitions_corpus(ray_session):
    """kept ∪ dropped == corpus; kept contains every cluster_id and no
    non-canonical cluster member."""
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.dedup import (
        dedup_keep_canonical,
        near_dup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    kept = set(dedup_keep_canonical(sf).to_pandas()["doc_id"])
    cl = near_dup_clusters(sf).to_pandas()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    losers = set(cl[cl["doc_id"] != cl["cluster_id"]]["doc_id"])
    assert kept.isdisjoint(losers)
    assert len(kept) + len(losers) == n_docs
    assert set(cl["cluster_id"]).issubset(kept)

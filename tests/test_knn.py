"""Similarity search: brute-force exactness and IVF recall."""

import numpy as np
import pyarrow.parquet as pq

from docling_eval_ray.stages.knn import (
    KNN_QUERY,
    embedding_knn,
    embedding_knn_ivf,
)

SF_DIR = "/root/testdata/sf0.001"


def _brute_force_topk(k=10):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = np.asarray(KNN_QUERY, np.float64)
    q = q / np.linalg.norm(q)
    sim = m @ q
    order = np.lexsort((ids, -sim))[:k]
    return ids[order], sim[order]


def test_embedding_knn_matches_brute_force(ray_session):
    got = embedding_knn(SF_DIR).to_pandas()
    ids, sims = _brute_force_topk()
    assert got["vec_id"].tolist() == ids.tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), np.round(sims, 6))


def test_ivf_recall(ray_session):
    """IVF with label-cells + nprobe=3 must reach decent recall vs the
    exact per-vector neighbors (approximate by construction)."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    exact = {
        int(ids[i]): set(ids[np.argsort(-sims[i])[:10]].tolist())
        for i in range(len(ids))
    }
    got = embedding_knn_ivf(SF_DIR).to_pandas()
    by_q = got.groupby("vec_id")["neighbor_id"].apply(set)
    recalls = [
        len(by_q.get(q, set()) & exact[q]) / 10 for q in exact
    ]
    assert float(np.mean(recalls)) > 0.45  # 3/10 cells probed, random data


def test_ivf_build_never_reads_whole_table_on_driver(ray_session, monkeypatch):
    """The old IVF build pulled the full embeddings table via
    pq.read_table on the driver; the rebuilt one samples through
    ds.limit — pq.read_table must never be called."""
    import pyarrow.parquet as pq_mod

    def boom(*a, **k):
        raise AssertionError("driver-side whole-table read")

    monkeypatch.setattr(pq_mod, "read_table", boom)
    got = embedding_knn_ivf(SF_DIR).to_pandas()
    assert len(got) == 5000  # 500 vectors x k=10
    assert set(got.columns) == {"vec_id", "neighbor_id", "sim"}


def test_near_dup_size_routing(ray_session):
    """Above exact_max the near-dup query routes through the IVF cell
    variant: every emitted pair must be a TRUE near-dup (precision 1 —
    cell-local sims are exact), with decent recall vs the exact tier."""
    from docling_eval_ray.stages.knn import embedding_near_dups

    exact = embedding_near_dups(SF_DIR).to_pandas()
    routed = embedding_near_dups(SF_DIR, exact_max=10).to_pandas()
    e = set(map(tuple, exact[["vec_id_a", "vec_id_b"]].to_numpy()))
    r = set(map(tuple, routed[["vec_id_a", "vec_id_b"]].to_numpy()))
    assert r <= e
    assert len(r) >= 0.5 * len(e)


def test_derive_cells_grows_with_corpus():
    """n_cells scales with the metadata row count (the round-2 fixed
    10-cell index made per-cell work grow O((n/10)^2) with the corpus)."""
    from docling_eval_ray.stages.knn import (
        IVF_CELLS,
        IVF_MAX_CELLS,
        TARGET_CELL_ROWS,
        _derive_cells,
    )

    assert _derive_cells(1_000) == IVF_CELLS  # floor
    assert _derive_cells(100 * TARGET_CELL_ROWS) == 100
    assert _derive_cells(10**12) == IVF_MAX_CELLS  # cap: re-split takes over
    assert _derive_cells(4 * TARGET_CELL_ROWS) >= 4


def test_split_counts_bound_cells():
    """Cells with oversized estimated census split into hash parts so a
    task's member side stays ~target-bounded even under skew."""
    import numpy as np

    from docling_eval_ray.stages.knn import IVF_MAX_SPLIT, _split_counts

    est = np.array([100.0, 8192.0, 100_000.0, 10**9])
    s = _split_counts(est, target=8192)
    assert s[0] == 1 and s[1] == 1  # under the split threshold
    assert s[2] == 13  # ceil(100k / 8192)
    assert s[3] == IVF_MAX_SPLIT  # capped
    # members per part stay near target for the uncapped split cell
    assert est[2] / s[2] <= 8192


def test_near_dup_ivf_resplit_matches_unsplit(ray_session):
    """Forcing a tiny target so EVERY cell re-splits into triangle
    blocks must not lose pairs vs the unsplit IVF run (the block
    decomposition is exact within a cell)."""
    from docling_eval_ray.stages.knn import embedding_near_dups_ivf

    plain = embedding_near_dups_ivf(SF_DIR).to_pandas()
    split = embedding_near_dups_ivf(SF_DIR, target_cell_rows=16).to_pandas()
    p = set(map(tuple, plain[["vec_id_a", "vec_id_b"]].to_numpy()))
    s = set(map(tuple, split[["vec_id_a", "vec_id_b"]].to_numpy()))
    assert s == p


def test_knn_ivf_resplit_matches_unsplit(ray_session):
    """Member-shard re-split with query replication must return the
    same neighbor sets as the unsplit run (a query meets every member
    of a probed cell exactly once across that cell's shards)."""
    from docling_eval_ray.stages.knn import embedding_knn_ivf

    plain = embedding_knn_ivf(SF_DIR).to_pandas()
    split = embedding_knn_ivf(SF_DIR, target_cell_rows=16).to_pandas()
    a = plain.groupby("vec_id")["neighbor_id"].apply(set)
    b = split.groupby("vec_id")["neighbor_id"].apply(set)
    assert a.to_dict() == b.to_dict()


def test_ivf_recall_on_sorted_corpus(ray_session, tmp_path):
    """Centroid sampling must be unbiased on a corpus SORTED by a vector
    coordinate (a prefix `limit()` sample would train centroids on one
    region of the distribution and collapse recall)."""
    import pyarrow as pa

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    order = np.argsort(
        [e[0] for e in t["embedding"].to_pylist()], kind="stable"
    )
    sorted_t = t.take(pa.array(order))
    d = tmp_path / "sorted_sf"
    d.mkdir()
    pq.write_table(sorted_t, d / "embeddings.parquet")

    ids = sorted_t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(sorted_t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    exact = {
        int(ids[i]): set(ids[np.argsort(-sims[i])[:10]].tolist())
        for i in range(len(ids))
    }
    got = embedding_knn_ivf(str(d)).to_pandas()
    by_q = got.groupby("vec_id")["neighbor_id"].apply(set)
    recalls = [len(by_q.get(q, set()) & exact[q]) / 10 for q in exact]
    assert float(np.mean(recalls)) > 0.45  # same bar as the unsorted test


def test_label_pca_component_matches_direct(ray_session):
    """The streaming covariance-partial PCA must match a direct numpy
    PCA over each label's gathered vectors (same eigensolver, merged
    vs one-shot covariance — agreement to float-merge tolerance), with
    the sign canonicalized identically."""
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.knn import label_pca_component

    got = label_pca_component("/root/testdata/sf0.001").to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["label", "embedding"]).to_pandas()
    for lab, grp in t.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        cov = np.cov(m, rowvar=False, bias=True)
        vals, vecs = np.linalg.eigh(cov)
        want = vecs[:, -1]
        if want[np.argmax(np.abs(want))] < 0:
            want = -want
        sub = got[got["label"] == lab].sort_values("dim")
        assert np.allclose(sub["component"].to_numpy(), want, atol=1e-4)
        want_evr = vals[-1] / vals.sum()
        assert abs(sub["explained_var_ratio"].iloc[0] - want_evr) < 1e-4
        # unit length, sign canon
        assert abs(np.linalg.norm(sub["component"].to_numpy()) - 1) < 1e-3


def test_lsh_near_dups_subset_of_exact_and_perfect_on_clones(
        ray_session, tmp_path):
    """LSH near-dups: (a) every emitted pair is a TRUE near-dup with the
    exact tier's sim value (verification is exact); (b) identical /
    near-identical vectors agree on every sign bit, so planted clones
    are recalled with probability 1."""
    import pandas as pd
    import pyarrow as pa

    from docling_eval_ray.stages.knn import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    # (a) subset + sim parity on the driver-provided table
    ex = embedding_near_dups(SF_DIR).to_pandas()
    ls = embedding_near_dups_lsh(SF_DIR).to_pandas()
    exact = {(a, b): s for a, b, s in
             zip(ex.vec_id_a, ex.vec_id_b, ex.sim)}
    assert len(ls) > 0
    for a, b, s in zip(ls.vec_id_a, ls.vec_id_b, ls.sim):
        assert (a, b) in exact and s == exact[(a, b)]

    # (b) planted clones: 20 base vectors, each with an exact duplicate,
    # plus 60 noise vectors
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 64))
    noise = rng.normal(size=(60, 64))
    mat = np.concatenate([base, base, noise]).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    pa.parquet.write_table(
        pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(mat),
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"),
    )
    got = embedding_near_dups_lsh(str(tmp_path)).to_pandas()
    pairs = set(zip(got.vec_id_a, got.vec_id_b))
    for i in range(20):  # every clone pair recalled, sim 1.0
        assert (i, i + 20) in pairs


def test_hard_negatives_cross_label_topk(ray_session):
    """Exact tier: every emitted neighbor has a DIFFERENT label, ranks
    are 1..k per vec, and the selected neighbors really are the k most
    similar cross-label vectors (checked against a direct recompute)."""
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.knn import HARD_NEG_K, knn_hard_negatives

    got = knn_hard_negatives(SF_DIR).to_pandas()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels = dict(zip(ids, t["label"].to_numpy(zero_copy_only=False)))
    # cross-label invariant + rank shape
    assert (got["neighbor_rank"].groupby(got["vec_id"]).max()
            == HARD_NEG_K).all()
    for v, n in zip(got["vec_id"], got["neighbor_id"]):
        assert labels[v] != labels[n]
    # spot-check one vector against a direct recompute
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids_s, m_s = ids[order], m[order]
    lab_s = np.array([labels[i] for i in ids_s])
    v0 = int(ids_s[0])
    sims = np.round(m_s[0] @ m_s.T, 6)
    sims[lab_s == lab_s[0]] = -np.inf
    want = ids_s[np.lexsort((ids_s, -sims))[:HARD_NEG_K]]
    have = got[got["vec_id"] == v0].sort_values("neighbor_rank")
    assert have["neighbor_id"].tolist() == want.tolist()


def test_hard_negatives_ivf_tier(ray_session):
    """Forced IVF tier: never emits a same-label neighbor, carries the
    rank column, and recalls most of the exact tier's pairs."""
    from docling_eval_ray.stages.knn import knn_hard_negatives

    exact = knn_hard_negatives(SF_DIR).to_pandas()
    approx = knn_hard_negatives(SF_DIR, exact_max=0).to_pandas()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    labels = dict(zip(
        t["vec_id"].to_numpy(zero_copy_only=False),
        t["label"].to_numpy(zero_copy_only=False),
    ))
    for v, n in zip(approx["vec_id"], approx["neighbor_id"]):
        assert labels[v] != labels[n]
    assert set(approx.columns) == {"vec_id", "neighbor_id", "sim",
                                   "neighbor_rank"}
    e = set(zip(exact["vec_id"], exact["neighbor_id"]))
    a = set(zip(approx["vec_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall


def test_sq8_knn_close_to_exact(ray_session):
    """SQ8 top-k overlaps the exact top-k heavily (8-bit grid ≈ 0.4%
    quantization error per dim) and sims differ by < 0.02."""
    from docling_eval_ray.stages.knn import sq8_knn

    sq = sq8_knn(SF_DIR).to_pandas()
    ids, sims = _brute_force_topk()
    overlap = len(set(sq["vec_id"]) & set(ids.tolist()))
    assert overlap >= 7, overlap
    exact = dict(zip(ids.tolist(), sims))
    for v, s in zip(sq["vec_id"], sq["sim_sq"]):
        if v in exact:
            assert abs(s - exact[v]) < 0.02


def test_pq_knn_deterministic_and_sane(ray_session):
    """PQ: ADC distances are ≥ 0, the result is deterministic across
    runs, and the top-k contains mostly vectors the exact scan also
    ranks highly (coarse 8×8 codebooks — order-of-magnitude recall,
    not exactness, is the contract)."""
    from docling_eval_ray.stages.knn import pq_knn

    a = pq_knn(SF_DIR).to_pandas()
    b = pq_knn(SF_DIR).to_pandas()
    assert a.equals(b)
    assert (a["adc_dist"] >= 0).all() and len(a) == 10
    ids, _ = _brute_force_topk(k=100)
    overlap = len(set(a["vec_id"]) & set(ids.tolist()))
    assert overlap >= 3, overlap


def test_sq8_recall_at_k_panel(ray_session):
    """One row per panel query; overlap bounded by k; recall consistent
    with n_overlap; SQ8 at 8 bits/dim should retain most of the exact
    top-k on this corpus."""
    import numpy as np

    from docling_eval_ray.stages.knn import KNN_K, SQ8_RECALL_Q, sq8_recall_at_k

    df = sq8_recall_at_k("/root/testdata/sf0.001").to_pandas()
    assert list(df["query_id"]) == list(range(SQ8_RECALL_Q))
    assert ((df["n_overlap"] >= 0) & (df["n_overlap"] <= KNN_K)).all()
    assert np.allclose(df["recall"], np.round(df["n_overlap"] / KNN_K, 4))
    assert df["recall"].mean() >= 0.5


def test_mmr_diverse_topk_properties(ray_session):
    """Greedy MMR invariants: first pick is the global top-1, all picks
    come from the relevance pool, no duplicates, and the selection is
    less mutually similar than the plain top-k prefix (the point of MMR)."""
    from docling_eval_ray.stages.knn import MMR_K, MMR_POOL, mmr_diverse_topk

    got = mmr_diverse_topk(SF_DIR).to_pandas()
    assert list(got["mmr_rank"]) == list(range(1, MMR_K + 1))
    assert got["vec_id"].is_unique
    ids, sims = _brute_force_topk(k=MMR_POOL)
    assert got["vec_id"].iloc[0] == ids[0]
    assert set(got["vec_id"]) <= set(ids.tolist())

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    all_ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    by_id = {int(v): i for i, v in enumerate(all_ids)}

    def mean_pair_sim(sel):
        x = m[[by_id[int(v)] for v in sel]]
        s = x @ x.T
        n = len(sel)
        return (s.sum() - n) / (n * (n - 1))

    assert mean_pair_sim(got["vec_id"]) <= mean_pair_sim(ids[:MMR_K]) + 1e-9


def test_rrf_fusion_semantics(ray_session):
    """RRF ordering follows 1/(60+r) sums of the two constituent
    rankings, both top-1s outrank any single-system stragglers when
    they agree, and a doc ranked by both systems always beats one
    ranked the same by only one."""
    from docling_eval_ray.stages.knn import KNN_K, RRF_K0, rrf_fusion

    df = rrf_fusion(SF_DIR).to_pandas()
    assert list(df["fused_rank"]) == list(range(1, len(df) + 1))
    assert df["vec_id"].is_unique
    assert KNN_K <= len(df) <= 2 * KNN_K
    for row in df.itertuples():
        want = 0.0
        if row.rank_exact:
            want += 1.0 / (RRF_K0 + row.rank_exact)
        if row.rank_sq:
            want += 1.0 / (RRF_K0 + row.rank_sq)
        assert row.rrf_score == round(want, 6)
    # scores are non-increasing in fused_rank
    s = df["rrf_score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_embedding_outlier_scores_planted(ray_session, tmp_path):
    """A planted wild vector ranks first by diagonal Mahalanobis; the
    score equals a direct z-energy recompute with the same rounding."""
    import pandas as pd

    from docling_eval_ray.stages.knn import embedding_outlier_scores

    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (64, 8)).astype(np.float32)
    base[7] = 40.0  # the outlier
    pd.DataFrame(
        {
            "vec_id": pd.array(range(64), dtype="int64"),
            "embedding": list(base),
            "label": pd.array([0] * 64, dtype="int32"),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    got = embedding_outlier_scores(str(tmp_path), k=5).to_pandas()
    assert got["vec_id"].iloc[0] == 7
    assert list(got["outlier_rank"]) == [1, 2, 3, 4, 5]
    assert (got["score"].to_numpy()[:-1]
            >= got["score"].to_numpy()[1:]).all()

    x = base.astype(np.float64)
    sx = np.round(x.sum(axis=0), 6)
    sxx = np.round((x * x).sum(axis=0), 6)
    n = len(x)
    mu = sx / n
    var = sxx / n - mu * mu
    var = np.where(var <= 0, 1.0, var)
    want = np.round(((x - mu) ** 2 / var).sum(axis=1), 6)
    assert got["score"].iloc[0] == want[7]

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

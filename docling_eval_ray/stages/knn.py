"""Similarity search over the ``embeddings`` table (list<float> column).

* ``embedding_knn`` — exact brute-force cosine top-k: the query matrix is
  broadcast once; each batch computes a vectorized matmul and emits its
  LOCAL top-k, so only k rows per batch reach the final sort (the
  partial-top-k pattern; the global sort sees ~k × n_batches rows, not n).
* ``embedding_near_dups`` — all pairs above a cosine threshold,
  size-routed: ≤ ``EXACT_NEAR_DUP_MAX`` rows → exact tier (normalized
  corpus matrix broadcast once, block × corpus matmul, DuckDB-oracled);
  above it → ``embedding_near_dups_ivf`` (cell-local pair search, no
  broadcast).
* ``embedding_knn_ivf`` — the ANN scale path, fully distributed:
  spherical-k-means centroids from a BOUNDED unbiased hash-mod driver
  sample, cell count derived from the metadata row count
  (``n / TARGET_CELL_ROWS``), vectors shuffle-assigned to cells (hash
  re-split into shards when a cell's estimated census is oversized),
  queries replicated to their ``nprobe`` nearest cells' shards,
  shard-local tiled top-k, bucketed global merge. Approximate; recall
  measured in tests (≈0.69 on the random sf0.001 corpus at nprobe=4).

Float discipline: all math in float64 so results bit-match the DuckDB
oracle's ``list_cosine_similarity(CAST(embedding AS DOUBLE[]), ...)``
(measured max |Δ| = 1.1e-16 before rounding; rounded to 6 digits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: fixed deterministic query vector for the oracled top-k query
KNN_QUERY = [0.125] * 64
KNN_K = 10
NEAR_DUP_THRESHOLD = 0.45
#: centroid sampling bound: at most ~this many vectors ever reach the
#: driver (the ONLY driver-side step of the IVF family)
IVF_SAMPLE_MAX = 4096
IVF_CELLS = 10
#: cell sizing: the IVF entry points derive n_cells from the metadata
#: row count so the average cell holds ~TARGET_CELL_ROWS vectors —
#: a fixed cell count would make per-cell work grow O((n/cells)^2)
#: with the corpus (the round-2 scale-killer). Cells are capped at
#: IVF_MAX_CELLS (the driver k-means must stay sample-sized); beyond
#: cap×target vectors the per-cell RE-SPLIT below bounds task memory.
TARGET_CELL_ROWS = 8192
IVF_MAX_CELLS = 4096
#: per-cell re-split bound: a skewed cell holding > SPLIT_FACTOR×target
#: rows is hash-split into ≤ IVF_MAX_SPLIT sub-parts (triangle blocks
#: for the pair search, member shards for kNN), so one task never holds
#: more than ~SPLIT_FACTOR×target×2 vectors even under adversarial skew.
IVF_MAX_SPLIT = 64
SPLIT_FACTOR = 2.0
#: matmul tile: bound the similarity-matrix allocation inside a task
#: regardless of block size (tile × block instead of block × block)
_SIM_TILE = 4096


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic avalanche hash of int64 ids (vectorized)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _derive_cells(n: int, target: int = TARGET_CELL_ROWS) -> int:
    """n_cells from the corpus row count: average cell ≈ target rows."""
    import math

    return int(min(IVF_MAX_CELLS, max(IVF_CELLS, math.ceil(n / target))))


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def embedding_knn(sf_dir: str, *, query=None, k: int = KNN_K):
    """Exact top-k cosine neighbors of a fixed query vector."""
    import ray.data as rd

    q = np.asarray(query if query is not None else KNN_QUERY, np.float64)
    qn = q / np.linalg.norm(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t))
        sim = m @ qn
        order = np.argsort(-sim, kind="stable")[:k]
        return pa.table(
            {
                "vec_id": pa.array(
                    t["vec_id"].to_numpy(zero_copy_only=False)[order],
                    pa.int64(),
                ),
                "sim": pa.array(sim[order], pa.float64()),
            }
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    top = partial.sort(["sim", "vec_id"], descending=[True, False]).limit(k)

    def finish(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("sim"),
            "sim",
            pa.array(
                np.round(t["sim"].to_numpy(zero_copy_only=False), 6),
                pa.float64(),
            ),
        )

    return top.map_batches(finish, batch_format="pyarrow")


class _BlockPairwise:
    """Actor stage: batch-block × broadcast-corpus cosine, emit pairs
    above threshold with id_a < id_b."""

    def __init__(self, corpus_ref, threshold: float):
        import ray

        ids, mat = ray.get(corpus_ref)
        self._ids = ids
        self._mat = mat  # already normalized, float64
        self._t = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        block = _normalize(_emb_matrix(t))
        block_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        sims = block @ self._mat.T
        bi, cj = np.nonzero(sims >= self._t)
        a = block_ids[bi]
        b = self._ids[cj]
        keep = a < b
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(np.round(sims[bi, cj][keep], 6), pa.float64()),
            }
        )


#: above this corpus size the exact all-pairs path (which must broadcast
#: the full normalized matrix) is refused and near-dups route through
#: the IVF-bucketed variant — the broadcast stops being "small side"
#: around the point a worker heap can't hold corpus × 8 bytes × dim
EXACT_NEAR_DUP_MAX = 100_000


def embedding_near_dups(sf_dir: str, *, threshold: float = NEAR_DUP_THRESHOLD,
                        exact_max: int = EXACT_NEAR_DUP_MAX):
    """All embedding pairs with cosine ≥ threshold (embedding-cosine
    near-dup detection).

    Size-routed: corpora ≤ ``exact_max`` run the EXACT tier (normalized
    corpus matrix broadcast once via ``ray.put``, per-batch block×corpus
    matmul — this is the DuckDB-oracled path); larger corpora route
    through ``embedding_near_dups_ivf`` (cell-local pair search,
    approximate near the cell boundaries, nothing broadcast)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    if ds.count() > exact_max:  # metadata count: no scan
        return embedding_near_dups_ivf(sf_dir, threshold=threshold)
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy().astype(np.int64)
    mat = _normalize(
        np.array(full["embedding"].to_list(), dtype=np.float64)
    )
    ref = ray.put((ids, mat))
    from .util import stage

    return stage(ds, _BlockPairwise, args=(ref, threshold))


#: random-hyperplane LSH geometry (Charikar 2002 SimHash for cosine):
#: 128 Rademacher hyperplanes → 16 bands × 8 bits. Entries are derived
#: from md5 parity so the DuckDB oracle can rebuild the SAME matrix in
#: SQL — no literal matrix shipped in the query text.
LSH_N_BITS = 128
LSH_BAND_BITS = 8

_LSH_H: np.ndarray | None = None  # lazy: keeps module import cheap


def lsh_hyperplanes(n_bits: int = LSH_N_BITS, dim: int = 64) -> np.ndarray:
    """±1 hyperplane matrix, entry (b, d) = +1 iff the first 8 md5 hex
    digits of ``"{b}-{d}"`` are even — replicated verbatim by the SQL
    fragment in ``pipelines/oracle.py`` (md5 → UBIGINT % 2)."""
    global _LSH_H
    if (_LSH_H is None or _LSH_H.shape != (n_bits, dim)):
        import hashlib

        h = np.empty((n_bits, dim), np.float64)
        for b in range(n_bits):
            for d in range(dim):
                v = int(hashlib.md5(f"{b}-{d}".encode())
                        .hexdigest()[:8], 16)
                h[b, d] = 1.0 if v % 2 == 0 else -1.0
        _LSH_H = h
    return _LSH_H


def embedding_near_dups_lsh(sf_dir: str, *,
                            threshold: float = NEAR_DUP_THRESHOLD,
                            n_bits: int = LSH_N_BITS,
                            band_bits: int = LSH_BAND_BITS,
                            num_buckets: int = 32):
    """Cosine near-dups via random-hyperplane LSH banding — the
    broadcast-free scale tier beside the exact (≤100k) and IVF paths:
    two vectors are candidates iff they agree on ALL ``band_bits`` sign
    bits of at least one band; candidates are exact-verified (cosine ≥
    threshold), so output pairs are always TRUE near-dups and the LSH
    only controls recall (16 bands × 8 bits ⇒ a pair with bit-agreement
    p survives with 1-(1-p⁸)¹⁶). Deterministic end-to-end (md5-derived
    hyperplanes), hence DuckDB-oracled.

    Shape: one banding map (block×H matmul + bit-pack, rows replicated
    ×n_bands via arrow take) → ONE bucketed exchange on (band, bval)
    emitting in-group verified pairs (tiled matmul) → ONE pair-keyed
    exchange deduping band collisions. Nothing broadcast, nothing
    corpus-sized on the driver."""
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    n_bands = n_bits // band_bits
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def bandify(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t)
        H = lsh_hyperplanes(n_bits, X.shape[1])
        # round the projection before the sign test: BLAS vs SQL
        # summation order can disagree in the last ulp, so a projection
        # within FP noise of zero would otherwise flip a band bit and
        # change the output pair set vs the DuckDB oracle (which applies
        # the identical round_even(..., 6) before its > 0)
        bits = np.round(X @ H.T, 6) > 0  # (n, n_bits)
        w = (1 << np.arange(band_bits)).astype(np.int64)
        n = t.num_rows
        rep = t.take(np.tile(np.arange(n), n_bands))
        band_idx = np.repeat(np.arange(n_bands, dtype=np.int64), n)
        bvals = np.concatenate([
            bits[:, b * band_bits:(b + 1) * band_bits] @ w
            for b in range(n_bands)
        ])
        return rep.append_column(
            "band", pa.array(band_idx, pa.int64())
        ).append_column("bval", pa.array(bvals, pa.int64()))

    banded = ds.map_batches(bandify, batch_format="pyarrow")

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        A, B, S = [], [], []
        for _, sub in g.groupby(["band", "bval"]):
            if len(sub) < 2:
                continue
            ids = sub["vec_id"].to_numpy(np.int64)
            mat = _normalize(
                np.array(sub["embedding"].to_list(), np.float64))
            a, b, s = _tiled_pairs(ids, mat, ids, mat, threshold,
                                   within=True)
            A.append(a)
            B.append(b)
            S.append(s)
        if not A:
            return pd.DataFrame(
                {"vec_id_a": pd.array([], dtype="int64"),
                 "vec_id_b": pd.array([], dtype="int64"),
                 "sim": pd.array([], dtype="float64")}
            )
        return pd.DataFrame(
            {"vec_id_a": np.concatenate(A), "vec_id_b": np.concatenate(B),
             "sim": np.concatenate(S)}
        )

    pairs = bucketed_group_apply(
        banded, ["band", "bval"], group_pairs, num_buckets=num_buckets
    )

    def dedup_round(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["vec_id_a", "vec_id_b"])
        return pd.DataFrame(
            {
                "vec_id_a": out["vec_id_a"].to_numpy(np.int64),
                "vec_id_b": out["vec_id_b"].to_numpy(np.int64),
                "sim": np.round(out["sim"].to_numpy(np.float64), 6),
            }
        )

    return bucketed_group_apply(
        pairs, ["vec_id_a", "vec_id_b"], dedup_round,
        num_buckets=num_buckets,
    )


def _grouped_by_key(ds, key: str, fn, *, num_buckets: int = 64):
    """``groupby(key).map_groups(fn)`` for key cardinality that SCALES
    with the corpus (cells × shards): one shuffle on ``key %
    num_buckets``, then ``fn`` applied per key segment inside each
    bucket task — per-bucket instead of per-key Ray overhead (the
    functions/groups.py rationale; a per-key map_groups at ~2 ms/group
    is pathological past ~10⁴ keys), zero-copy pyarrow throughout."""

    def bucket(t: pa.Table) -> pa.Table:
        b = t[key].to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("__b", pa.array(b.astype(np.int64),
                                               pa.int64()))

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def run(g: pa.Table) -> pa.Table:
        g = g.sort_by(key).drop_columns(["__b"])
        keys = g[key].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1], [True]])
        )
        outs = [
            fn(g.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(bounds) - 1)
        ]
        return pa.concat_tables(outs) if outs else fn(g)

    return bucketed.groupby("__b").map_groups(run, batch_format="pyarrow")


def _tiled_pairs(a_ids, a_mat, b_ids, b_mat, threshold, *, within):
    """All (id_a<id_b, sim) pairs with sim≥threshold between two sides,
    computed in row tiles so the similarity matrix allocation is bounded
    by ``_SIM_TILE × |B|`` regardless of block size. ``within=True``
    means A is B (self-pairs excluded by the id_a<id_b keep)."""
    out_a, out_b, out_s = [], [], []
    for lo in range(0, len(a_ids), _SIM_TILE):
        hi = min(lo + _SIM_TILE, len(a_ids))
        sims = a_mat[lo:hi] @ b_mat.T
        ai, bj = np.nonzero(sims >= threshold)
        a, b = a_ids[lo:hi][ai], b_ids[bj]
        s = sims[ai, bj]
        if within:
            keep = a < b
        else:
            keep = a != b
            a, b = np.minimum(a, b), np.maximum(a, b)
        out_a.append(a[keep])
        out_b.append(b[keep])
        out_s.append(s[keep])
    if not out_a:
        z = np.array([], np.int64)
        return z, z, np.array([], np.float64)
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_s))


#: block-key encoding: key = cell·(MAX_SPLIT²) + i·MAX_SPLIT + j, i≤j —
#: the triangle-block self-join. A cell split into s parts runs s(s+1)/2
#: pair tasks of ≤ ~(est/s)² work each; a row in part u is replicated to
#: the s blocks pairing u with every part (factor s, only in split cells).
_KEY_M = IVF_MAX_SPLIT * IVF_MAX_SPLIT


def embedding_near_dups_ivf(sf_dir: str, *,
                            threshold: float = NEAR_DUP_THRESHOLD,
                            n_cells: int | None = None, nassign: int = 2,
                            target_cell_rows: int = TARGET_CELL_ROWS):
    """Near-dup pairs at corpus scale: multi-assign each vector to its
    ``nassign`` nearest cells, find pairs cell-locally, dedupe pairs
    that met in more than one shared cell. Approximate: a pair is found
    iff the two vectors share at least one assigned cell (multi-assign
    covers cell boundaries; raise ``nassign`` for recall).

    Scale shape: ``n_cells`` defaults to ``n / TARGET_CELL_ROWS`` from
    the metadata count (a fixed cell count would make per-cell work grow
    quadratically with the corpus); cells the sample-estimated census
    says exceed ``SPLIT_FACTOR×TARGET_CELL_ROWS`` rows are hash-split
    into triangle blocks so one task never holds a mega-cell even under
    adversarial skew; the pair kernel tiles its matmul as the last line
    of defense."""
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    cents, est, _n = ivf_centroids(sf_dir, n_cells=n_cells)
    nsplit = _split_counts(est, target=target_cell_rows)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def assign(t: pa.Table) -> pa.Table:
        block = _normalize(_emb_matrix(t))
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = block @ cents.T
        cells = np.argsort(-sims, axis=1)[:, :nassign]
        n, d = block.shape
        # flatten (row, assignment) pairs, then expand each by its
        # cell's split count s: part u=hash(id)%s meets every part v
        # in block (min(u,v), max(u,v)) — all vectorized.
        cell_f = cells.ravel().astype(np.int64)          # n·nassign
        row_f = np.repeat(np.arange(n), nassign)
        s = nsplit[cell_f]
        u = (_splitmix64(ids[row_f]) % s.astype(np.uint64)).astype(np.int64)
        tot = int(s.sum())
        idx = np.repeat(np.arange(len(cell_f)), s)       # tot
        offs = np.concatenate([[0], np.cumsum(s)])[:-1]
        v = np.arange(tot) - np.repeat(offs, s)
        uu = u[idx]
        i, j = np.minimum(uu, v), np.maximum(uu, v)
        key = cell_f[idx] * _KEY_M + i * IVF_MAX_SPLIT + j
        rows = row_f[idx]
        flat = pa.array(block[rows].ravel(), pa.float64())
        return pa.table(
            {
                "block": pa.array(key, pa.int64()),
                "sub": pa.array(uu, pa.int64()),
                "vec_id": pa.array(ids[rows], pa.int64()),
                "emb": pa.FixedSizeListArray.from_arrays(flat, d),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def block_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {"vec_id_a": z, "vec_id_b": z,
                 "sim": pa.array([], pa.float64())}
            )
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = g["sub"].to_numpy(zero_copy_only=False)
        key = int(g["block"][0].as_py())
        i, j = (key // IVF_MAX_SPLIT) % IVF_MAX_SPLIT, key % IVF_MAX_SPLIT
        emb = g["emb"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = emb.flatten().to_numpy(zero_copy_only=False).reshape(
            len(g), -1
        )
        if i == j:
            a, b, s = _tiled_pairs(ids, mat, ids, mat, threshold,
                                   within=True)
        else:
            ma, mb = sub == i, sub == j
            a, b, s = _tiled_pairs(ids[ma], mat[ma], ids[mb], mat[mb],
                                   threshold, within=False)
        return pa.table(
            {
                "vec_id_a": pa.array(a, pa.int64()),
                "vec_id_b": pa.array(b, pa.int64()),
                "sim": pa.array(np.round(s, 6), pa.float64()),
            }
        )

    pairs = _grouped_by_key(
        assigned, "block", block_pairs,
        num_buckets=max(64, len(cents) // 4),
    )
    return bucketed_group_apply(
        pairs,
        ["vec_id_a", "vec_id_b"],
        lambda g: g.drop_duplicates(["vec_id_a", "vec_id_b"]),
    )


def _hash_sample(sf_dir: str, sample_max: int):
    """Unbiased bounded sample of the embeddings table.

    A deterministic hash-mod filter (``splitmix64(vec_id) % rate == 0``)
    is pushed into the scan, so the sample is drawn uniformly from the
    WHOLE corpus — ``limit(sample_max)`` would read only the first
    blocks, and a corpus sorted/sharded by anything correlated with the
    vectors (at 100 TB it will be) would then train centroids on one
    region of the distribution and explode cell skew. Expected filtered
    volume is ~2×sample_max rows; if the hash overshoots, rows are
    ranked BY HASH (still unbiased) and truncated. Returns
    ``(matrix, n)`` with n the metadata row count (no scan)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n = ds.count()  # parquet metadata, no scan
    rate = max(1, n // (2 * sample_max))  # ~2×sample_max expected rows

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids)
        keep = (h % np.uint64(rate)) == 0
        return pa.table(
            {
                "h": pa.array(h[keep].astype(np.int64), pa.int64()),
                "embedding": t["embedding"].filter(pa.array(keep)),
            }
        )

    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    if len(sample) > sample_max:  # truncate in hash order: unbiased
        sample = sample.nsmallest(sample_max, "h")
    m = _normalize(np.array(sample["embedding"].to_list(), dtype=np.float64))
    return m, n


def ivf_centroids(sf_dir: str, *, n_cells: int | None = None,
                  sample_max: int = IVF_SAMPLE_MAX, seed: int = 42,
                  iters: int = 10):
    """Spherical k-means centroids + estimated per-cell populations.

    Driven entirely by the bounded unbiased sample: after Lloyd
    converges, the sample's assignment histogram scaled by ``n/|sample|``
    estimates each cell's population — which sizes the per-cell re-split
    WITHOUT an extra counting pass over the corpus (big cells have many
    sample hits, so exactly the cells that need splitting are the ones
    estimated accurately). Returns ``(centroids, est_counts, n)``."""
    m, n = _hash_sample(sf_dir, sample_max)
    if n_cells is None:
        n_cells = _derive_cells(n)
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_cells, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    # census from the FINAL centroids (the ones the data plane assigns
    # against) — the in-loop assignment is one Lloyd step stale and a
    # cell that grew under the last update could dodge the re-split
    assign = np.argmax(m @ cents.T, axis=1)
    hist = np.bincount(assign, minlength=len(cents)).astype(np.float64)
    est = hist * (n / max(1, len(m)))
    return cents, est, n


def sample_centroids(sf_dir: str, *, n_cells: int = IVF_CELLS,
                     sample_max: int = IVF_SAMPLE_MAX,
                     seed: int = 42, iters: int = 10) -> np.ndarray:
    """Back-compat wrapper: centroids only (see ``ivf_centroids``)."""
    cents, _, _ = ivf_centroids(
        sf_dir, n_cells=n_cells, sample_max=sample_max, seed=seed,
        iters=iters,
    )
    return cents


def _split_counts(est: np.ndarray, target: int = TARGET_CELL_ROWS,
                  factor: float = SPLIT_FACTOR) -> np.ndarray:
    """Per-cell sub-split count from estimated populations: cells above
    ``factor×target`` rows split into ``ceil(est/target)`` hash parts,
    capped at IVF_MAX_SPLIT. int64 vector indexed by cell id."""
    s = np.ceil(est / target).astype(np.int64)
    s[est <= factor * target] = 1
    return np.clip(s, 1, IVF_MAX_SPLIT)


def embedding_knn_ivf(sf_dir: str, *, k: int = KNN_K, nprobe: int = 4,
                      n_cells: int | None = None,
                      target_cell_rows: int = TARGET_CELL_ROWS,
                      exclude_same_label: bool = False,
                      with_rank: bool = False):
    """Approximate per-vector k-NN via IVF cells — the ANN scale path,
    fully distributed:

      1. centroids + estimated cell census from a bounded unbiased
         driver sample (``ivf_centroids``); shipped in the closure (KBs).
         ``n_cells`` defaults to ``n / TARGET_CELL_ROWS`` from the
         metadata count so cells stay bounded as the corpus grows.
      2. one map_batches emits, per vector, its MEMBER row (owner =
         nearest centroid, hash-sharded when the cell's estimated census
         exceeds the split threshold) and ``nprobe`` QUERY rows per
         member shard of each probed cell — the shuffle-assign step.
      3. ``groupby(shard)`` co-locates each member shard with the
         queries probing it; the shard-local matmul emits per-query
         local top-k (k rows per probed shard, not the shard).
      4. a bucketed groupby on vec_id merges local top-ks → global top-k.

    Nothing corpus-sized is ever held by one process; per-task memory is
    bounded by ~SPLIT_FACTOR×TARGET_CELL_ROWS member vectors even under
    adversarial skew (the re-split), and query replication only pays the
    shard factor inside oversized cells.
    """
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    cents, est, _n = ivf_centroids(sf_dir, n_cells=n_cells)
    nsplit = _split_counts(est, target=target_cell_rows)
    cols = ["vec_id", "embedding"]
    if exclude_same_label:
        cols.append("label")
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=cols)

    def assign(t: pa.Table) -> pa.Table:
        block = _normalize(_emb_matrix(t))
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = (
            t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            if exclude_same_label else np.zeros(len(ids), np.int64)
        )
        sims = block @ cents.T
        probe = np.argsort(-sims, axis=1)[:, :nprobe]  # col 0 == owner
        n, d = block.shape
        # member rows: one per vector, shard = hash(id) % nsplit[owner]
        owner = probe[:, 0].astype(np.int64)
        m_shard = (_splitmix64(ids)
                   % nsplit[owner].astype(np.uint64)).astype(np.int64)
        m_key = owner * IVF_MAX_SPLIT + m_shard
        # query rows: replicated to EVERY member shard of each probed
        # cell (nsplit[cell] rows per probe; 1 for unsplit cells)
        cell_f = probe.ravel().astype(np.int64)          # n·nprobe
        row_f = np.repeat(np.arange(n), nprobe)
        s = nsplit[cell_f]
        tot = int(s.sum())
        idx = np.repeat(np.arange(len(cell_f)), s)
        offs = np.concatenate([[0], np.cumsum(s)])[:-1]
        shard = np.arange(tot) - np.repeat(offs, s)
        q_key = cell_f[idx] * IVF_MAX_SPLIT + shard
        q_rows = row_f[idx]
        key = np.concatenate([m_key, q_key])
        out_ids = np.concatenate([ids, ids[q_rows]])
        out_labs = np.concatenate([labs, labs[q_rows]])
        role = np.concatenate(
            [np.zeros(n, np.int8), np.ones(len(q_rows), np.int8)]
        )
        emb = np.concatenate([block, block[q_rows]])
        flat = pa.array(emb.ravel(), pa.float64())
        emb_col = pa.FixedSizeListArray.from_arrays(flat, d)
        return pa.table(
            {
                "cell": pa.array(key, pa.int64()),
                "vec_id": pa.array(out_ids, pa.int64()),
                "lab": pa.array(out_labs, pa.int64()),
                "role": pa.array(role, pa.int8()),
                "emb": emb_col,
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def cell_search(g: pa.Table) -> pa.Table:
        role = g["role"].to_numpy(zero_copy_only=False)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        labs = g["lab"].to_numpy(zero_copy_only=False)
        emb = g["emb"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = emb.flatten().to_numpy(zero_copy_only=False).reshape(
            len(g), -1
        )
        mem = role == 0
        m_ids, m_mat, m_labs = ids[mem], mat[mem], labs[mem]
        q_ids, q_mat, q_labs = ids[~mem], mat[~mem], labs[~mem]
        if not len(m_ids) or not len(q_ids):
            z = np.array([], dtype=np.int64)
            return pa.table(
                {"vec_id": pa.array(z), "neighbor_id": pa.array(z),
                 "sim": pa.array(np.array([], dtype=np.float64))}
            )
        # tile over queries: sims allocation bounded by _SIM_TILE × |M|
        # (query rows can be ~nprobe× the member count in a hot shard)
        out_q, out_n, out_s = [], [], []
        topn = min(k, len(m_ids))
        for lo in range(0, len(q_ids), _SIM_TILE):
            hi = min(lo + _SIM_TILE, len(q_ids))
            sims = q_mat[lo:hi] @ m_mat.T
            if exclude_same_label:  # hard-negative mask (covers self)
                sims[m_labs[None, :] == q_labs[lo:hi, None]] = -np.inf
            else:
                sims[m_ids[None, :] == q_ids[lo:hi, None]] = -np.inf
            part = np.argpartition(-sims, topn - 1, axis=1)[:, :topn]
            rows = np.repeat(np.arange(hi - lo), topn)
            cols = part.ravel()
            s = sims[rows, cols]
            keep = s > -np.inf
            out_q.append(q_ids[lo:hi][rows][keep])
            out_n.append(m_ids[cols][keep])
            out_s.append(s[keep])
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "sim": pa.array(np.round(np.concatenate(out_s), 6),
                                pa.float64()),
            }
        )

    local = _grouped_by_key(
        assigned, "cell", cell_search,
        num_buckets=max(64, len(cents) // 4),
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vec_id", "sim", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("vec_id", sort=False).head(k)
        if with_rank:
            g = g.assign(neighbor_rank=(
                g.groupby("vec_id", sort=False).cumcount() + 1
            ).astype(np.int64))
        return g

    return bucketed_group_apply(local, ["vec_id"], merge_topk)


def embedding_norms(sf_dir: str):
    """(vec_id, l2_norm) — vector feature engineering over the
    embedding column: per-batch float64 row norms, no shuffle.
    Oracled against DuckDB's list_transform/list_sum pipeline (6dp
    rounding absorbs the pairwise-vs-sequential summation drift over
    64 dims, ~1e-15)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        return pa.table(
            {
                "vec_id": pa.array(
                    t["vec_id"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "l2_norm": pa.array(
                    np.round(np.sqrt(np.sum(m * m, axis=1)), 6),
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def label_centroids(sf_dir: str):
    """(label, dim, centroid) — per-label mean vector: the standalone
    distributed k-means update step. Per-batch partial (label, dim,
    sum, count) rows — |labels|×64 per batch, bounded — then one final
    groupby; the corpus is scanned exactly once and no vector payload
    crosses the shuffle."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        d = m.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uniq)), pa.int64()),
                "s_part": pa.array(sums.ravel(), pa.float64()),
                "n_part": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(
            Sum("s_part", alias_name="s"), Sum("n_part", alias_name="n")
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(t["label"], pa.int64()),
                "dim": pc.cast(t["dim"], pa.int64()),
                "centroid": pa.array(
                    np.round(t["s"].to_numpy() / t["n"].to_numpy(), 6),
                    pa.float64(),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def centroid_similarity(sf_dir: str):
    """Pairwise cosine similarity between per-label mean vectors —
    the cluster-geometry diagnostic run after a k-means/centroid pass
    (how separable are the label clusters). Builds on
    ``label_centroids`` (corpus scanned once, |labels|×64 partial rows
    through the exchange); the centroid matrix itself is
    labels×dim-sized — driver state by construction — so the k×k cosine
    is one local matmul. Centroids round to 6 BEFORE the cosine on both
    the Ray and SQL sides, so the oracle compares identical inputs."""
    cent = label_centroids(sf_dir).to_pandas()  # |labels|×64 rows
    piv = cent.pivot(index="label", columns="dim", values="centroid")
    labels = piv.index.to_numpy().astype(np.int64)
    m = piv.to_numpy(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ai, bi = np.nonzero(np.triu(np.ones_like(sims, bool), k=1))
    return pa.table(
        {
            "label_a": pa.array(labels[ai], pa.int64()),
            "label_b": pa.array(labels[bi], pa.int64()),
            "cos": pa.array(np.round(sims[ai, bi], 6), pa.float64()),
        }
    )


def embedding_label_medoid(sf_dir: str):
    """(label, medoid_vec_id, score) — the per-label cosine medoid: the
    member vector maximizing its summed cosine similarity to all other
    members of the label. The trick that makes this distributed WITHOUT
    a pairwise pass: Σ_b cos(a,b) = â · Σ_b b̂, so a per-label sum of
    NORMALIZED vectors (one label_centroids-shaped partial+final
    groupby, |labels|×dim rows through the exchange) plus one streaming
    scoring pass replaces the O(n²)-per-label matmul entirely. The sum
    matrix is labels×dim — driver state by construction (the
    centroid_similarity contract) — and per-batch argmax partials keep
    the final merge |labels|×batches-sized. Sums round to 6 BEFORE the
    dot on both the Ray and SQL sides (the centroid_similarity float
    discipline); ties at the rounded score break to the smallest
    vec_id."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])

    def partial_sums(t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t))
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        d = m.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uniq)), pa.int64()),
                "s_part": pa.array(sums.ravel(), pa.float64()),
            }
        )

    svec = (
        ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s_part", alias_name="s"))
        .to_pandas()  # |labels|×dim rows — driver-sized
    )
    piv = svec.pivot(index="label", columns="dim", values="s")
    s_labels = piv.index.to_numpy().astype(np.int64)
    s_matrix = np.round(piv.to_numpy(np.float64), 6)
    label_row = {int(l): i for i, l in enumerate(s_labels)}

    def partial_argmax(t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t))
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.fromiter((label_row[int(l)] for l in labels),
                           np.int64, len(labels))
        scores = np.round(np.einsum("ij,ij->i", m, s_matrix[rows]), 6)
        # per-label best within the batch: sort by (label, -score, vec_id)
        order = np.lexsort((vec_ids, -scores, labels))
        lab_sorted = labels[order]
        first = np.ones(len(order), bool)
        first[1:] = lab_sorted[1:] != lab_sorted[:-1]
        best = order[first]
        return pa.table(
            {
                "label": pa.array(labels[best], pa.int64()),
                "medoid_vec_id": pa.array(vec_ids[best], pa.int64()),
                "score": pa.array(scores[best], pa.float64()),
            }
        )

    parts = ds.map_batches(
        partial_argmax, batch_format="pyarrow"
    ).to_pandas()  # |labels|×batches rows — bounded
    parts = parts.sort_values(
        ["label", "score", "medoid_vec_id"],
        ascending=[True, False, True], kind="mergesort",
    )
    final = parts.groupby("label", as_index=False, sort=True).first()
    return pa.table(
        {
            "label": pa.array(final["label"].to_numpy(np.int64), pa.int64()),
            "medoid_vec_id": pa.array(
                final["medoid_vec_id"].to_numpy(np.int64), pa.int64()
            ),
            "score": pa.array(
                final["score"].to_numpy(np.float64), pa.float64()
            ),
        }
    )


def label_pca_component(sf_dir: str):
    """(label, dim, component, explained_var_ratio) — the top principal
    component of each label's embedding cloud, computed WITHOUT
    materializing any label's vectors: covariance is a mergeable
    statistic (n, Σx, Σxxᵀ per label), so one streaming pass emits a
    fixed-size partial row per (batch, label) — n + a dim sum + a
    dim×dim outer-product sum, ~33 KB at dim 64 — and the driver merge
    is labels×batches-sized (the sketch-op contract). Eigendecomposition
    runs on the labels×dim×dim merged state (driver-sized by
    construction); the component's sign is canonicalized so its
    largest-|coordinate| entry is positive. Rows-only (no SQL
    eigensolver); accuracy vs a direct numpy PCA asserted in
    tests/test_knn.py."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = m.shape[1]
        out_l, out_n, out_s, out_o = [], [], [], []
        for gi, lab in enumerate(uniq):
            block = m[inv == gi]
            out_l.append(int(lab))
            out_n.append(block.shape[0])
            out_s.append(block.sum(axis=0).tolist())
            out_o.append((block.T @ block).ravel().tolist())
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "s": pa.array(out_s, pa.list_(pa.float64(), d)),
                "o": pa.array(out_o, pa.list_(pa.float64(), d * d)),
            }
        )

    import pandas as pd

    from ..functions.groups import bucketed_group_apply

    def merge_label(g: pd.DataFrame) -> pd.DataFrame:
        # pre-merge ON THE RAY SIDE: one fixed-size row per label, so
        # the driver state is labels-sized regardless of block count
        # (labels × batches partials would scale with the corpus)
        rows = []
        for lab, grp in g.groupby("label", sort=False):
            rows.append({
                "label": int(lab),
                "n": int(grp["n"].sum()),
                "s": np.sum(np.stack(grp["s"].to_numpy()),
                            axis=0).tolist(),
                "o": np.sum(np.stack(grp["o"].to_numpy()),
                            axis=0).tolist(),
            })
        return pd.DataFrame(rows)

    parts = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label"], merge_label,
    ).to_pandas()  # one row per label — output-sized

    labels_out, dims_out, comp_out, evr_out = [], [], [], []
    for lab, grp in parts.groupby("label", sort=True):
        n = int(grp["n"].sum())
        s = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        d = s.shape[0]
        o = np.sum(np.stack(grp["o"].to_numpy()), axis=0).reshape(d, d)
        mu = s / n
        cov = o / n - np.outer(mu, mu)
        vals, vecs = np.linalg.eigh(cov)  # ascending
        comp = vecs[:, -1]
        if comp[np.argmax(np.abs(comp))] < 0:
            comp = -comp
        evr = float(vals[-1] / max(vals.sum(), 1e-300))
        labels_out.extend([int(lab)] * d)
        dims_out.extend(range(d))
        comp_out.extend(np.round(comp, 6).tolist())
        evr_out.extend([round(evr, 6)] * d)
    return pa.table(
        {
            "label": pa.array(labels_out, pa.int64()),
            "dim": pa.array(dims_out, pa.int64()),
            "component": pa.array(comp_out, pa.float64()),
            "explained_var_ratio": pa.array(evr_out, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# knn_hard_negatives — per-vector top-k most-similar DIFFERENT-label
# neighbors (hard negative mining for contrastive / retrieval training)
# ---------------------------------------------------------------------------

HARD_NEG_K = 3


class _HardNegatives:
    """Task stage: block × broadcast-corpus cosine; per row emit the
    ``k`` most-similar vectors with a DIFFERENT label (self is excluded
    for free — its label equals its own). Ordering is by the ROUNDED
    similarity (6 dp) with neighbor_id ascending as tiebreak so the
    DuckDB oracle's ``ORDER BY sim DESC, neighbor_id`` agrees exactly
    (raw-float ordering would be BLAS-vs-SQL last-ulp fragile — same
    argument as the LSH band-bit rounding above)."""

    def __init__(self, corpus_ref, k: int):
        import ray

        ids, labels, mat = ray.get(corpus_ref)
        self._ids = ids          # sorted ascending — index order == id order
        self._labels = labels
        self._mat = mat          # normalized, float64
        self._k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        block = _normalize(_emb_matrix(t))
        bids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = block @ self._mat.T
        simint = np.rint(np.round(sims, 6) * 1e6).astype(np.int64)
        mask = blab[:, None] == self._labels[None, :]
        SENTINEL = -(1 << 21)  # below any real rounded sim (≥ -1e6)
        simint[mask] = SENTINEL
        # composite per-row sort key: rounded sim desc, corpus index asc
        # (corpus is id-sorted, so index asc ≡ neighbor_id asc); one
        # vectorized argsort along axis=1 instead of per-row lexsorts
        key = (-simint) * np.int64(1 << 32) + np.arange(
            simint.shape[1], dtype=np.int64
        )
        order = np.argsort(key, axis=1, kind="stable")[:, : self._k]
        rows = np.repeat(np.arange(len(bids)), order.shape[1])
        cols = order.ravel()
        picked = simint[rows, cols]
        keep = picked != SENTINEL  # rows with < k cross-label vectors
        rank = np.tile(
            np.arange(1, order.shape[1] + 1, dtype=np.int64), len(bids)
        )
        return pa.table(
            {
                "vec_id": pa.array(bids[rows][keep], pa.int64()),
                "neighbor_id": pa.array(self._ids[cols][keep], pa.int64()),
                "sim": pa.array(
                    picked[keep].astype(np.float64) / 1e6, pa.float64()
                ),
                "neighbor_rank": pa.array(rank[keep], pa.int64()),
            }
        )


def knn_hard_negatives(sf_dir: str, *, k: int = HARD_NEG_K,
                       exact_max: int = EXACT_NEAR_DUP_MAX):
    """Hard-negative mining: for every vector, its ``k`` nearest
    neighbors among vectors of a DIFFERENT label
    (vec_id, neighbor_id, sim, neighbor_rank).

    The standard contrastive-training data op (pick negatives that are
    maximally confusable — Robinson et al. 2021). Size-routed like
    ``embedding_near_dups``: corpora ≤ ``exact_max`` broadcast the
    normalized (id, label, matrix) triple once via ``ray.put`` and scan
    in one streaming map (the DuckDB-oracled path); larger corpora
    route through the IVF cells with the same-label mask applied
    shard-locally (approximate, nothing broadcast)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    if ds.count() > exact_max:  # metadata count: no scan
        return _hard_negatives_ivf(sf_dir, k=k)
    full = ds.to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy().astype(np.int64)
    labels = full["label"].to_numpy().astype(np.int64)
    mat = _normalize(np.array(full["embedding"].to_list(), np.float64))
    ref = ray.put((ids, labels, mat))
    from .util import stage

    return stage(ds, _HardNegatives, args=(ref, k))


def _hard_negatives_ivf(sf_dir: str, *, k: int = HARD_NEG_K):
    """IVF scale tier for hard negatives: ``embedding_knn_ivf`` with the
    same-label mask pushed into the shard-local search, then a rank
    column appended inside the existing per-vec merge (approximate near
    cell boundaries, like all IVF paths; recall asserted in tests)."""
    return embedding_knn_ivf(sf_dir, k=k, exclude_same_label=True,
                             with_rank=True)


# ---------------------------------------------------------------------------
# sq8_knn — scalar-quantized (8-bit per dimension) approximate kNN
# ---------------------------------------------------------------------------


def _sq8_grid(ds):
    """Per-dimension [min, max] quantization grid over the corpus —
    one streaming pass emitting ONE fixed-size partial row per block,
    so the driver merge is blocks-sized, never corpus-sized."""

    def minmax_partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        d = m.shape[1]
        return pa.table(
            {
                "mn": pa.array([m.min(axis=0).tolist()],
                               pa.list_(pa.float64(), d)),
                "mx": pa.array([m.max(axis=0).tolist()],
                               pa.list_(pa.float64(), d)),
            }
        )

    parts = ds.map_batches(
        minmax_partial, batch_format="pyarrow"
    ).to_pandas()
    mn = np.min(np.stack(parts["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(parts["mx"].to_numpy()), axis=0)
    scale = mx - mn
    degenerate = scale == 0.0
    safe = np.where(degenerate, 1.0, scale)
    return mn, scale, degenerate, safe


def _sq8_dequant(x: np.ndarray, mn, scale, degenerate, safe) -> np.ndarray:
    """floor/clip encode + midpoint decode (the exact operation order
    the DuckDB oracle replicates — keep them in lockstep)."""
    code = np.clip(np.floor((x - mn) / safe * 255.0), 0.0, 255.0)
    deq = mn + (code + 0.5) * scale / 256.0
    deq[:, degenerate] = mn[degenerate]  # constant dims decode to mn
    return deq


def sq8_knn(sf_dir: str, *, query=None, k: int = KNN_K):
    """Top-k cosine neighbors of the fixed query over SQ8-quantized
    vectors → (vec_id, sim_sq).

    Scalar quantization is the standard memory-scale path for vector
    search (Faiss ``SQ8``): per-dimension [min, max] over the corpus,
    each float mapped to ``floor((x-mn)/(mx-mn)·255)`` clipped to
    [0, 255] — 8× fewer vector bytes through the exchange — and scored
    against the dequantized midpoint ``mn + (code+½)(mx-mn)/256``.

    Two streaming passes, both scale-safe: (1) per-dim min/max — one
    fixed-size partial row per block, driver merge is blocks-sized;
    (2) encode + asymmetric-distance scan emitting per-block LOCAL
    top-k, so the global sort sees k × n_blocks rows. Deterministic
    end-to-end (quantization grid is a pure function of the corpus),
    hence DuckDB-oracled: the SQL replica rebuilds the same grid with
    ``unnest``/``generate_subscripts`` and orders by the same rounded
    similarity with vec_id tiebreak."""
    import ray.data as rd

    q = np.asarray(query if query is not None else KNN_QUERY, np.float64)
    qn = q / np.linalg.norm(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mn, scale, degenerate, safe = _sq8_grid(ds)

    def local_topk(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t)
        deq = _sq8_dequant(x, mn, scale, degenerate, safe)
        sim = np.round(
            (deq @ qn) / np.linalg.norm(deq, axis=1), 6
        )
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -sim))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "sim_sq": pa.array(sim[order], pa.float64()),
            }
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return partial.sort(
        ["sim_sq", "vec_id"], descending=[True, False]
    ).limit(k)


#: recall panel: SQ8_RECALL_Q deterministic rational lattice queries —
#: the same ((3i + 5d) % 13 - 6)/6 family as the PQ/k-means init, so
#: the SQL oracle rebuilds them exactly from range()
SQ8_RECALL_Q = 8


def _recall_query_panel(nq: int = SQ8_RECALL_Q, d: int = 64) -> np.ndarray:
    i = np.arange(nq, dtype=np.float64)[:, None]
    dd = np.arange(d, dtype=np.float64)[None, :]
    return ((3.0 * i + 5.0 * dd) % 13.0 - 6.0) / 6.0


def sq8_recall_at_k(sf_dir: str, *, k: int = KNN_K):
    """Index-quality evaluation → (query_id, n_overlap, recall).

    Recall@k of the SQ8-quantized scan against the exact float scan,
    over a fixed ``SQ8_RECALL_Q``-query panel — the acceptance gate a
    real deployment runs before switching its retrieval tier to a
    compressed index (Faiss calls this the SQ sweep). Shape: the grid
    pass of ``sq8_knn`` plus ONE corpus pass that scores every block
    against the whole panel twice (two tiled matmuls) and emits per-
    (tier, query) LOCAL top-k, so the driver merge sees
    2 · nq · k · n_blocks rows — output-sized, never corpus-sized.
    Both tiers rank by the ROUNDED similarity with vec_id tiebreak,
    which is what makes the DuckDB replica (exact + dequantized CTEs,
    row_number ≤ k, overlap count per query) hash-stable."""
    import ray.data as rd

    qn = _normalize(_recall_query_panel())
    nq = qn.shape[0]

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mn, scale, degenerate, safe = _sq8_grid(ds)

    def local_topk(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        deq = _sq8_dequant(x, mn, scale, degenerate, safe)
        sims = (
            np.round((x @ qn.T) / np.linalg.norm(x, axis=1)[:, None], 6),
            np.round((deq @ qn.T) / np.linalg.norm(deq, axis=1)[:, None], 6),
        )
        tier_o, q_o, id_o, s_o = [], [], [], []
        for tier, sm in enumerate(sims):
            for qi in range(nq):
                order = np.lexsort((ids, -sm[:, qi]))[:k]
                tier_o.append(np.full(len(order), tier, np.int64))
                q_o.append(np.full(len(order), qi, np.int64))
                id_o.append(ids[order])
                s_o.append(sm[order, qi])
        return pa.table(
            {
                "tier": pa.array(np.concatenate(tier_o)),
                "query_id": pa.array(np.concatenate(q_o)),
                "vec_id": pa.array(np.concatenate(id_o)),
                "sim": pa.array(np.concatenate(s_o), pa.float64()),
            }
        )

    part = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    # driver-side merge of the 2·nq·k·blocks partials (output-sized)
    part = part.sort_values(
        ["tier", "query_id", "sim", "vec_id"],
        ascending=[True, True, False, True], kind="mergesort",
    )
    top = part.groupby(["tier", "query_id"], sort=False).head(k)
    exact = top[top["tier"] == 0]
    quant = top[top["tier"] == 1]
    n_overlap = np.zeros(nq, np.int64)
    for qi in range(nq):
        a = set(exact.loc[exact["query_id"] == qi, "vec_id"])
        b = set(quant.loc[quant["query_id"] == qi, "vec_id"])
        n_overlap[qi] = len(a & b)
    return pa.table(
        {
            "query_id": pa.array(np.arange(nq, dtype=np.int64)),
            "n_overlap": pa.array(n_overlap),
            "recall": pa.array(
                np.round(n_overlap.astype(np.float64) / k, 4), pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# mmr_diverse_topk — Maximal Marginal Relevance (Carbonell & Goldstein 1998)
# ---------------------------------------------------------------------------

#: MMR geometry: candidate pool size, selections, and the relevance/
#: diversity weights. MMR_MU is spelled as its own literal (NOT 1-λ):
#: Python's 1-0.7 is 0.30000000000000004 while the SQL oracle's 0.3
#: literal is 0.29999999999999998890... — the two sides must multiply
#: by the SAME double for the rounded scores to hash-match.
MMR_POOL = 32
MMR_K = 8
MMR_LAMBDA = 0.7
MMR_MU = 0.3


def mmr_diverse_topk(sf_dir: str, *, k: int = MMR_K, pool: int = MMR_POOL):
    """Diverse top-k selection → (mmr_rank, vec_id, sim).

    Maximal Marginal Relevance greedy selection against the fixed
    ``KNN_QUERY``: first pick = most relevant candidate, each next pick
    maximizes ``λ·sim(q,x) − μ·max_{s∈S} sim(x,s)`` — the standard
    redundancy-pruned retrieval step a curation pipeline runs when
    sampling demonstration/eval sets (pure top-k returns near-clones).
    Shape: the distributed part is exactly ``embedding_knn``'s partial
    top-k (per-block local top-``pool`` → one sort over pool×blocks
    rows); the greedy loop then runs on the POOL ONLY (pool×pool
    similarity matrix, driver-side, output-sized — never the corpus).
    Every comparison happens on 6dp-rounded scores with vec_id
    tiebreaks, so the DuckDB replica (k−1 chained argmax CTEs over the
    same pool) is hash-stable."""
    import ray.data as rd

    q = np.asarray(KNN_QUERY, np.float64)
    qn = q / np.linalg.norm(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def local_pool(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t)
        sim = np.round((x @ qn) / np.linalg.norm(x, axis=1), 6)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -sim))[:pool]
        return t.take(order).append_column(
            "sim", pa.array(sim[order], pa.float64())
        )

    df = (
        ds.map_batches(local_pool, batch_format="pyarrow")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(pool)
        .to_pandas()  # pool rows — output-sized
    )
    n = len(df)
    ids = df["vec_id"].to_numpy().astype(np.int64)
    sims = df["sim"].to_numpy()
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    pair = np.round(_normalize(emb) @ _normalize(emb).T, 6)

    picked = [0]  # row 0 = best (sim desc, vec_id asc) by the sort above
    mask = np.ones(n, bool)
    mask[0] = False
    for _ in range(1, min(k, n)):
        mx = pair[:, picked].max(axis=1)
        mmr = np.round(MMR_LAMBDA * sims - MMR_MU * mx, 6)
        cand = np.where(mask)[0]
        best = cand[np.lexsort((ids[cand], -mmr[cand]))[0]]
        picked.append(int(best))
        mask[best] = False
    sel = np.asarray(picked)
    return pa.table(
        {
            "mmr_rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "vec_id": pa.array(ids[sel], pa.int64()),
            "sim": pa.array(sims[sel], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# pq_knn — product quantization (Jégou et al. 2011) with ADC scan
# ---------------------------------------------------------------------------

#: PQ geometry: 64 dims → PQ_M subspaces × (64/PQ_M) dims, PQ_K codes
#: per subspace (small K keeps the SQL replica tractable; real deploys
#: raise K to 256 — nothing below depends on the value)
PQ_M = 8
PQ_DSUB = 8
PQ_K = 8
#: Lloyd refinement rounds for the per-subspace codebooks (the SQL
#: oracle is written for exactly this many update rounds)
PQ_ITERS = 1


def _pq_cent0(m: int) -> np.ndarray:
    """Deterministic rational init codebook for subspace ``m`` — the
    same ``((3c + 5j) % 13 - 6)/6`` lattice as corpus_ops.
    cluster_centroids, indexed by the GLOBAL dim so every subspace
    differs; rational entries reproduce exactly in SQL."""
    c = np.arange(PQ_K)[:, None]
    j = np.arange(PQ_DSUB)[None, :] + PQ_DSUB * m
    return ((3 * c + 5 * j) % 13 - 6) / 6.0


def _pq_codes(x: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """(n, PQ_M) int codes: per subspace, argmin of the ROUNDED (6 dp)
    squared L2 distance with first-min (lowest code) tie-break — the
    rounding keeps numpy-vs-SQL summation order from flipping a
    near-tie assignment (LSH band-bit precedent)."""
    n = x.shape[0]
    codes = np.empty((n, PQ_M), np.int64)
    for m in range(PQ_M):
        sub = x[:, m * PQ_DSUB:(m + 1) * PQ_DSUB]
        d2 = np.round(
            ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(-1), 6
        )
        codes[:, m] = d2.argmin(axis=1)  # first min = lowest code
    return codes


def pq_knn(sf_dir: str, *, query=None, k: int = KNN_K,
           iters: int = PQ_ITERS):
    """Top-k nearest neighbors of the fixed query under product
    quantization → (vec_id, adc_dist).

    The memory-scale ANN beside IVF and SQ8: vectors compress to
    ``PQ_M`` sub-codes (8 bytes here vs 512 raw), and the query scan is
    an asymmetric-distance lookup — ``dist(x, q) ≈ Σ_m ‖q_m −
    book_m[code_m(x)]‖²`` — one table lookup per subspace instead of a
    dot product. Codebooks are per-subspace Lloyd k-means from the
    deterministic rational lattice, ``iters`` update rounds, each ONE
    streaming pass emitting (subspace, code) partial sums (M·K·dsub
    floats per batch, merged by a tiny groupby; driver state is
    codebook-sized). The final pass encodes + scans in one map with
    per-batch local top-k, so the global sort sees k rows per block.

    Deterministic end-to-end → DuckDB-oracled: the SQL replica rebuilds
    the lattice, both assignment rounds (argmin of the same rounded
    distance), the mean update and the ADC table."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    q = np.asarray(query if query is not None else KNN_QUERY, np.float64)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # consumed iters+1 times; vectors-only, pruned

    books = [_pq_cent0(m) for m in range(PQ_M)]
    partial_schema = pa.schema(
        [("mc", pa.int64()), ("n", pa.int64())]
        + [(f"s{j}", pa.float64()) for j in range(PQ_DSUB)]
    )

    for _ in range(iters):
        cur = [b.copy() for b in books]

        def partials(t: pa.Table) -> pa.Table:
            rows = []
            if t.num_rows:
                x = _emb_matrix(t)
                codes = _pq_codes(x, cur)
                for m in range(PQ_M):
                    sub = x[:, m * PQ_DSUB:(m + 1) * PQ_DSUB]
                    for c in np.unique(codes[:, m]):
                        mem = sub[codes[:, m] == c]
                        rows.append({
                            "mc": int(m * PQ_K + c),
                            "n": int(mem.shape[0]),
                            **{f"s{j}": float(v)
                               for j, v in enumerate(mem.sum(0))},
                        })
            return pa.Table.from_pylist(rows, schema=partial_schema)

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("mc")
            .aggregate(
                Sum("n", alias_name="n"),
                *[Sum(f"s{j}", alias_name=f"s{j}")
                  for j in range(PQ_DSUB)],
            )
        )
        new = [b.copy() for b in books]  # empty codes keep their row
        for r in agg.take_all():  # ≤ M·K rows — codebook-sized
            m, c = divmod(int(r["mc"]), PQ_K)
            new[m][c] = np.array(
                [r[f"s{j}"] for j in range(PQ_DSUB)]
            ) / float(r["n"])
        books = new

    # ADC lookup table: qd2[m, c] = ||q_m - book_m[c]||², M·K floats
    qd2 = np.stack([
        ((q[m * PQ_DSUB:(m + 1) * PQ_DSUB][None, :] - books[m]) ** 2
         ).sum(-1)
        for m in range(PQ_M)
    ])

    def local_topk(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t)
        codes = _pq_codes(x, books)
        adc = np.round(
            qd2[np.arange(PQ_M)[None, :], codes].sum(axis=1), 6
        )
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, adc))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "adc_dist": pa.array(adc[order], pa.float64()),
            }
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return partial.sort(["adc_dist", "vec_id"]).limit(k)


# ---------------------------------------------------------------------------
# rrf_fusion — reciprocal-rank fusion of two retrieval systems
# ---------------------------------------------------------------------------

#: RRF damping constant (Cormack, Clarke & Büttcher 2009 use k=60)
RRF_K0 = 60


def rrf_fusion(sf_dir: str, *, k: int = KNN_K):
    """(fused_rank, vec_id, rank_exact, rank_sq, rrf_score) — the union
    of the exact-cosine top-k and the SQ8-quantized top-k for the fixed
    ``KNN_QUERY``, fused by Reciprocal Rank Fusion:
    ``score(v) = Σ_sys 1/(60 + rank_sys(v))`` over the systems that
    retrieved v. RRF is the standard way production retrieval blends a
    cheap quantized index with an exact reranker — rank-only, so no
    score calibration between systems is needed. A missing rank is
    reported as 0 (never ranked by that system) and contributes no
    score term — the fixed two-term sum keeps the float identical on
    both engines.

    Shape: both constituent rankings are the existing distributed
    queries (per-block partial top-k → one k-sized sort each); the
    fusion itself touches ≤ 2k rows — output-sized by definition. Ranks
    are derived from the ROUNDED sims with vec_id tiebreaks on both
    engines, so ranking is FP-drift-proof."""
    a = embedding_knn(sf_dir, k=k).to_pandas()
    b = sq8_knn(sf_dir, k=k).to_pandas()

    def ranks(df: pd.DataFrame, col: str) -> dict[int, int]:
        order = np.lexsort(
            (df["vec_id"].to_numpy(), -df[col].to_numpy())
        )
        return {
            int(df["vec_id"].iloc[i]): r + 1 for r, i in enumerate(order)
        }

    ra, rb = ranks(a, "sim"), ranks(b, "sim_sq")
    ids = sorted(set(ra) | set(rb))
    score = {
        v: np.round(
            (1.0 / (RRF_K0 + ra[v]) if v in ra else 0.0)
            + (1.0 / (RRF_K0 + rb[v]) if v in rb else 0.0),
            6,
        )
        for v in ids
    }
    fused = sorted(ids, key=lambda v: (-score[v], v))
    return pa.table(
        {
            "fused_rank": pa.array(
                np.arange(1, len(fused) + 1, dtype=np.int64)
            ),
            "vec_id": pa.array(fused, pa.int64()),
            "rank_exact": pa.array(
                [ra.get(v, 0) for v in fused], pa.int64()
            ),
            "rank_sq": pa.array([rb.get(v, 0) for v in fused], pa.int64()),
            "rrf_score": pa.array(
                [float(score[v]) for v in fused], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# embedding_outlier_scores — diagonal-Mahalanobis outlier mining
# ---------------------------------------------------------------------------

#: outliers reported by the embedding QC pass
OUTLIER_TOPK = 32


def embedding_outlier_scores(sf_dir: str, *, k: int = OUTLIER_TOPK):
    """(outlier_rank, vec_id, score) — the ``k`` most anomalous
    embeddings by diagonal Mahalanobis distance (per-dimension
    z-score energy): the embedding-QC sweep that surfaces corrupt or
    out-of-distribution vectors before they poison ANN indexes or
    centroid updates.

    Shape: pass 1 folds per-dim moments (n, Σv, Σv²) — a fixed
    dim-rows partial per batch, merged by one tiny groupby; μ/σ² derive
    driver-side with the moment sums ROUNDED to 6dp on both engines
    (the ``neardup_pagerank`` float-sum discipline), and the identical
    ``sxx/n − μ·μ`` op order. Pass 2 is one scoring map with per-block
    top-k partials → a k-sized global sort; ranking keys on the
    ROUNDED score with a vec_id tiebreak, so last-ulp summation drift
    can't reorder the result. Constant dimensions guard to unit
    variance identically on both sides."""
    import ray.data as rd

    from ..functions.groups import final_groupby_sum

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # two passes: moments + scoring

    def mom_partial(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64
        )
        dim = emb.shape[1]
        return pa.table(
            {
                "d": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(dim, len(emb), np.int64),
                              pa.int64()),
                "sx": pa.array(emb.sum(axis=0), pa.float64()),
                "sxx": pa.array((emb * emb).sum(axis=0), pa.float64()),
            }
        )

    mom = final_groupby_sum(
        ds.map_batches(mom_partial, batch_format="pyarrow"),
        ["d"], ["n", "sx", "sxx"],
    ).take_all()  # dim rows
    dim = len(mom)
    mu = np.empty(dim, np.float64)
    var = np.empty(dim, np.float64)
    for r in mom:
        d = int(r["d"])
        n = float(r["n"])
        sx = float(np.round(r["sx"], 6))
        sxx = float(np.round(r["sxx"], 6))
        mu[d] = sx / n
        var[d] = sxx / n - (sx / n) * (sx / n)
    var = np.where(var <= 0, 1.0, var)

    def score_partial(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64
        )
        score = np.round(((emb - mu) ** 2 / var).sum(axis=1), 6)
        ids = t["vec_id"].to_numpy()
        order = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order].astype(np.int64),
                                   pa.int64()),
                "score": pa.array(score[order], pa.float64()),
            }
        )

    top = (
        ds.map_batches(score_partial, batch_format="pyarrow")
        .sort(["score", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "outlier_rank": pa.array(
                np.arange(1, len(top) + 1, dtype=np.int64), pa.int64()
            ),
            "vec_id": pa.array(top["vec_id"].to_numpy(np.int64),
                               pa.int64()),
            "score": pa.array(top["score"].to_numpy(np.float64),
                              pa.float64()),
        }
    )

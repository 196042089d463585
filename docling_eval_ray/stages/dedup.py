"""Deduplication stages: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference has no document dedup (SURVEY.md §2.7) — its sha256
``doc_hash`` (utils/utils.py:43-52) is the natural exact key. This module
adds the near-dup family a training-data pipeline needs, each expressed
as Ray Data stages:

* exact dedup        — content hash → one shuffle → keep-first
                       (``relational.dedup_exact``)
* n-gram Jaccard     — EXACT similarity via distributed inverted index:
                       explode (shingle, doc) → groupby(shingle) → emit
                       co-occurrence pairs → groupby(pair) count →
                       Jaccard. One shuffle keyed on shingle, one on the
                       pair. Hot shingles are the skew knob: at corpus
                       scale drop shingles with document frequency >
                       ``max_df`` (here exact, for the DuckDB oracle).
* MinHash + LSH      — probabilistic candidates: per-doc k-perm minhash
                       signature → band → groupby(band_id, band_hash) →
                       candidate pairs → exact-Jaccard verification.
* SimHash            — 64-bit near-dup fingerprint per document.

All per-batch kernels operate on numpy arrays of shingle hashes; the
only Python-per-row work is string shingling itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokens import sql_tokens

_MERSENNE = (1 << 61) - 1
_MERSENNE31 = np.uint64((1 << 31) - 1)


def _shingles(text: str, k: int = 3) -> set[str]:
    """k-word shingles over the SQL-replica tokenization
    (functions/tokens.py: trim spaces only, split on RE2 ``\\s+`` with
    the ``['']`` empty convention); an empty/short document yields the
    single shingle of its joined tokens, exactly what the oracle's
    ``array_to_string(a, ' ')`` short branch produces."""
    toks = sql_tokens(text)
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index (oracled)
# ---------------------------------------------------------------------------


def _jaccard_score(c: np.ndarray, na: np.ndarray,
                   nb: np.ndarray) -> np.ndarray:
    return c / (na + nb - c)


def _containment_score(c: np.ndarray, na: np.ndarray,
                       nb: np.ndarray) -> np.ndarray:
    return c / np.minimum(na, nb)


def ngram_jaccard_pairs(sf_dir: str, *, k: int = 3, threshold: float = 0.1,
                        max_df: int | None = None):
    """All document pairs with k-word-shingle Jaccard ≥ threshold.

    Distributed shape: shingle explode (map_batches) → groupby(shingle)
    emits co-occurring pairs → groupby(pair) sums intersections →
    row-local Jaccard from carried set sizes. Exact (no sampling) at the
    default ``max_df=None``, so it hash-matches the SQL oracle.

    ``max_df`` is the hot-shingle skew control for corpus scale: a
    shingle occurring in more than ``max_df`` documents is a
    stop-shingle — it would emit O(df²) pairs from one group — and is
    dropped before pair emission. All of a shingle's postings meet in
    one bucket, so the document frequency is known exactly there: the
    cap costs no extra shuffle. With a cap the result is a lower bound
    on each pair's intersection (standard stop-shingle semantics in
    near-dup mining).
    """
    return _ngram_pair_scores(sf_dir, k=k, threshold=threshold,
                              max_df=max_df, score_fn=_jaccard_score,
                              out_col="jaccard")


def ngram_containment_pairs(sf_dir: str, *, k: int = 3,
                            threshold: float = 0.5,
                            max_df: int | None = None):
    """All document pairs with k-word-shingle max-containment
    ``|A∩B| / min(|A|,|B|)`` ≥ threshold — the subset-duplicate
    detector: a short document embedded verbatim inside a long one has
    LOW Jaccard (the union is dominated by the long doc) but
    containment ≈ 1. Broder's containment measure; same inverted-index
    plan as ``ngram_jaccard_pairs`` (shared machinery, different
    row-local score), same ``max_df`` stop-shingle cap."""
    return _ngram_pair_scores(sf_dir, k=k, threshold=threshold,
                              max_df=max_df, score_fn=_containment_score,
                              out_col="containment")


def _ngram_pair_scores(sf_dir: str, *, k: int, threshold: float,
                       max_df: int | None, score_fn, out_col: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, shingles, sizes = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(text, k)
            for s in sh:
                doc_ids.append(did)
                shingles.append(s)
                sizes.append(len(sh))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "shingle": pa.array(shingles, pa.string()),
                "n_sh": pa.array(sizes, pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # shingle cardinality is high (~#docs × #shingles/doc distinct keys):
    # a per-key map_groups would pay Ray overhead per shingle. Bucket the
    # shingles and emit all of a bucket's co-occurrence pairs in one
    # vectorized pass (functions.groups rationale).
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        # np.unique (comparison-based), NOT pd.factorize: the pandas
        # object hashtable conflates strings at embedded NUL bytes
        _, codes = np.unique(g["shingle"].to_numpy(), return_inverse=True)
        ids = g["doc_id"].to_numpy()
        ns = g["n_sh"].to_numpy()
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)])
        A, B, NA, NB = [], [], [], []
        eligible = np.nonzero(
            (counts >= 2)
            & ((counts <= max_df) if max_df is not None else True)
        )[0]
        for gi in eligible:
            s, e = starts[gi], starts[gi + 1]
            ia, ib = np.triu_indices(e - s, k=1)
            A.append(ids[s:e][ia])
            B.append(ids[s:e][ib])
            NA.append(ns[s:e][ia])
            NB.append(ns[s:e][ib])
        if not A:
            z = np.array([], dtype=np.int64)
            return pd.DataFrame(
                {"doc_id_a": z, "doc_id_b": z, "na": z, "nb": z, "c": z}
            )
        a = np.concatenate(A)
        return pd.DataFrame(
            {
                "doc_id_a": a,
                "doc_id_b": np.concatenate(B),
                "na": np.concatenate(NA),
                "nb": np.concatenate(NB),
                "c": np.ones(len(a), dtype=np.int64),
            }
        )

    from ..functions.groups import bucketed_group_apply

    co = bucketed_group_apply(exploded, ["shingle"], bucket_pairs)

    # second shuffle keyed on the pair: sum intersections + row-local
    # score, vectorized per bucket (Ray's native multi-key aggregate was
    # 15× slower here — one 33 s sort-reduce task for ~12k pairs)
    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["doc_id_a", "doc_id_b"], as_index=False, sort=False
        ).agg(c=("c", "sum"), na=("na", "first"), nb=("nb", "first"))
        j = score_fn(
            out["c"].to_numpy(np.float64),
            out["na"].to_numpy(np.float64),
            out["nb"].to_numpy(np.float64),
        )
        keep = j >= threshold
        return pd.DataFrame(
            {
                "doc_id_a": out["doc_id_a"].to_numpy()[keep],
                "doc_id_b": out["doc_id_b"].to_numpy()[keep],
                out_col: np.round(j[keep], 6),
            }
        )

    return bucketed_group_apply(co, ["doc_id_a", "doc_id_b"], agg_bucket)


# ---------------------------------------------------------------------------
# MinHash + LSH (probabilistic candidates, exact verify)
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: per-document minhash signature + LSH band rows.

    Permutation parameters are derived deterministically from a seed in
    ``__init__`` (once per actor); ``__call__`` emits one row per
    (band_id, band_hash, doc_id).
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, k: int = 3,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        # EXACT universal hashing over GF(2^31−1): a, b, x all < 2^31,
        # so a·x + b < 2^62 — no silent uint64 wrap — while the mod-p
        # reduction still wraps the products many times over (a real
        # permutation-like family). Full-width 61-bit params overflowed
        # uint64 and broke min-wise independence; a too-small `a` with
        # no wrap at all degenerates to a monotone map whose min always
        # picks the same element.
        self._a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
        self._b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
        self._bands = bands
        self._rows = num_perm // bands
        self._k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self._k)
        if not sh:
            return np.zeros(len(self._a), dtype=np.uint64)
        # shingle → point hash is md5-based so the whole signature is
        # SQL-reproducible (the minhash_near_dups DuckDB oracle rebuilds
        # signatures from the same (a, b) literals)
        x = np.array(
            [_md5_hash64(s) % _MERSENNE31 for s in sh], dtype=np.uint64
        )
        # h_i(x) = (a_i·x + b_i) mod p — exact in uint64
        prod = (self._a[:, None] * x[None, :] + self._b[:, None]) % _MERSENNE31
        return prod.min(axis=1)

    #: per-tile budget of gathered shingle columns for the batched min
    #: kernel: 128 perms × 8192 cols × 8 B ≈ 8 MB per temporary. This is
    #: a measured cache cliff, not a guess — the same uint64 modmul runs
    #: >100× slower once the broadcast temporaries outgrow L3 (27 MB
    #: one-shot: 3.9 s; 8-16 MB tiles: 0.03 s, this host)
    _SIG_TILE = 8192

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch twin of ``signature`` — bit-identical rows.

        Corpus shingles repeat heavily across a batch, and the per-
        shingle md5 is the hot cost, so the batch's shingles are
        ``np.unique``'d ONCE and each DISTINCT shingle md5-hashed once;
        per-doc signatures then gather the hashed values and take
        segment-mins via ``np.minimum.reduceat`` (no Python loop over
        docs in the modmul/min path). Tiled so the (num_perm × cols)
        transient stays bounded regardless of batch fatness."""
        n_docs = len(texts)
        sigs = np.zeros((n_docs, len(self._a)), dtype=np.uint64)
        per_doc = [list(_shingles(t, self._k)) for t in texts]
        lens = np.array([len(sh) for sh in per_doc], dtype=np.int64)
        if int(lens.sum()) == 0:
            return sigs
        flat = np.array(
            [s for sh in per_doc for s in sh], dtype=object
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        ux = np.array(
            [_md5_hash64(s) % _MERSENNE31 for s in uniq], dtype=np.uint64
        )
        xvals = ux[inv]
        offsets = np.concatenate(([0], np.cumsum(lens)))
        nonempty = np.flatnonzero(lens > 0)
        lo = 0
        while lo < len(nonempty):
            # grow the doc tile until its column count hits the budget
            # (single over-budget docs still go through whole)
            hi = lo + 1
            cols = lens[nonempty[lo]]
            while (hi < len(nonempty)
                   and cols + lens[nonempty[hi]] <= self._SIG_TILE):
                cols += lens[nonempty[hi]]
                hi += 1
            docs = nonempty[lo:hi]
            # docs are contiguous segments of xvals (zero-length docs
            # contribute no columns), so the tile is one slice — no
            # index gather needed
            x = xvals[offsets[docs[0]]:offsets[docs[-1] + 1]]
            prod = (
                self._a[:, None] * x[None, :] + self._b[:, None]
            ) % _MERSENNE31
            starts = np.concatenate(
                ([0], np.cumsum(lens[docs])[:-1])
            )
            sigs[docs] = np.minimum.reduceat(prod, starts, axis=1).T
            lo = hi
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids_in = batch["doc_id"].to_pylist()
        sigs = self.signatures_batch(texts)
        doc_ids, band_ids, band_hashes = [], [], []
        for did, sig in zip(ids_in, sigs):
            for b in range(self._bands):
                chunk = sig[b * self._rows : (b + 1) * self._rows]
                bh = _hash64(chunk.tobytes().hex())
                doc_ids.append(did)
                band_ids.append(b)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.uint64()),
            }
        )


def minhash_candidates(ds, *, num_perm: int = 128, bands: int = 32,
                       k: int = 3, concurrency=None, distinct: bool = True):
    """documents Dataset → candidate pairs from LSH banding.

    ``concurrency=None`` → stateless-task mode (see stages.util.stage);
    pass a pool size when signatures amortize over many batches.
    ``distinct=False`` skips the cross-band dedup shuffle and returns
    raw pairs (a pair colliding in several bands repeats) — callers that
    collect the bounded candidate set anyway dedup for free.
    """
    from .util import stage

    banded = stage(
        ds, MinHasher,
        kwargs=dict(num_perm=num_perm, bands=bands, k=k),
        concurrency=concurrency,
    )

    from ..functions.groups import bucketed_group_apply

    # one bucket group holds MANY (band_id, band_hash) buckets; emit all
    # of its collision pairs vectorized (per-key map_groups would pay Ray
    # overhead per band bucket ≈ bands × n_docs times)
    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
        key = g["band_id"].to_numpy().astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + g["band_hash"].to_numpy().astype(np.uint64)
        change = np.concatenate([[True], key[1:] != key[:-1]])
        codes = np.cumsum(change) - 1
        ids = g["doc_id"].to_numpy()
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)])
        A, B = [], []
        for gi in np.nonzero(counts >= 2)[0]:
            s, e = starts[gi], starts[gi + 1]
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            ia, ib = np.triu_indices(len(members), k=1)
            A.append(members[ia])
            B.append(members[ib])
        if not A:
            z = np.array([], dtype=np.int64)
            return pd.DataFrame({"doc_id_a": z, "doc_id_b": z})
        return pd.DataFrame(
            {"doc_id_a": np.concatenate(A), "doc_id_b": np.concatenate(B)}
        )

    pairs = bucketed_group_apply(
        banded, ["band_id", "band_hash"], emit_pairs
    )
    if not distinct:
        return pairs
    # distinct pairs (same pair can collide in several bands)
    return bucketed_group_apply(
        pairs,
        ["doc_id_a", "doc_id_b"],
        lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]),
    )


def _shingle_hash_table(ds, *, k: int = 3, doc_filter_ref=None):
    """documents → (doc_id, sh: int64, n_sh) — one row per DISTINCT
    shingle per doc, shingles as 64-bit content hashes (``_hash64``;
    collision probability ~n²/2⁶⁴, negligible). This is the
    distributable form of the per-doc shingle set.

    ``doc_filter_ref``: optional ``ray.put`` ObjectRef to a doc-id set —
    the candidate semi-join pushdown: only listed docs explode, so the
    verification joins see candidate shingles instead of the corpus."""

    def explode(t: pa.Table) -> pa.Table:
        keep = None
        if doc_filter_ref is not None:
            import ray

            keep = ray.get(doc_filter_ref)
        doc_ids, hashes, sizes = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if keep is not None and did not in keep:
                continue
            sh = _shingles(text, k)
            for s in sh:
                doc_ids.append(did)
                hashes.append(_hash64(s))
                sizes.append(len(sh))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sh": pa.array(
                    np.array(hashes, dtype=np.uint64).view(np.int64),
                    pa.int64(),
                ),
                "n_sh": pa.array(sizes, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


#: candidate-count gate for the semi-join pushdown: up to this many
#: candidate pairs, the candidate doc-id SET broadcasts (it is
#: output-sized — the LSH near-dup pairs — not corpus-sized) and the
#: shingle explode prunes to candidate docs before the joins; beyond
#: it, the verification joins run over the full distributed shingle
#: table (slower constant factors, no broadcast of any kind).
CAND_FILTER_MAX = 1_000_000

#: smaller gate for the single-map verification tier: up to this many
#: candidate pairs the candidate docs' shingle-HASH index (≈ 1 KB/doc)
#: is collected from the pruned explode and broadcast once — zero extra
#: shuffles. Above it, verification joins (3 shuffles) take over.
CAND_INDEX_MAX = 100_000


class _CandidateVerifier:
    """Single-map exact verification against a broadcast CANDIDATE-only
    shingle-hash index (tier A — the index is output-sized: only docs
    that appear in some LSH candidate pair, ~1 KB each)."""

    def __init__(self, index_ref, threshold: float):
        import ray

        self._index = ray.get(index_ref)  # doc_id -> sorted uint64 array
        self._t = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_id_a"].to_numpy()
        b = batch["doc_id_b"].to_numpy()
        n = len(a)
        if n == 0:
            return pd.DataFrame(
                {"doc_id_a": a, "doc_id_b": b,
                 "jaccard": np.array([], np.float64)}
            )
        # batched intersections: tag every shingle hash with its pair id
        # and lexsort once — a value appearing twice under one pair id is
        # an intersection hit (each side's set is unique), so intersection
        # sizes fall out of one adjacent-equality bincount instead of a
        # Python-per-pair intersect1d loop.
        a_sets = [self._index[x] for x in a]
        b_sets = [self._index[x] for x in b]
        la = np.fromiter((s.size for s in a_sets), np.int64, n)
        lb = np.fromiter((s.size for s in b_sets), np.int64, n)
        vals = np.concatenate(a_sets + b_sets)
        pid = np.concatenate(
            [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
        )
        order = np.lexsort((vals, pid))
        pv, vv = pid[order], vals[order]
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(pv[1:][dup], minlength=n)
        denom = la + lb - inter
        js = np.where(denom > 0, inter / np.maximum(denom, 1), 0.0)
        js = np.round(js, 6)
        keep = js >= self._t
        return pd.DataFrame(
            {
                "doc_id_a": a[keep],
                "doc_id_b": b[keep],
                "jaccard": js[keep],
            }
        )


def minhash_near_dups(sf_dir: str, *, threshold: float = 0.5, k: int = 3,
                      cand_filter_max: int = CAND_FILTER_MAX,
                      cand_index_max: int = CAND_INDEX_MAX):
    """MinHash-LSH near-dup pairs (candidates) with exact verification.

    Fully distributed — NOTHING corpus-sized touches the driver:

      candidates (LSH banding, `minhash_candidates`, materialized once —
        output-sized, lives in the object store)
        ⋈ shingle-hash table on doc_id_a      (bucketed hash join)
        ⋈ shingle-hash table on (doc_id_b, sh) (bucketed hash join →
                                                intersection rows)
        → groupby(pair): |A∩B| = row count, Jaccard from carried set
          sizes, threshold filter.

    The shingle table is pruned to CANDIDATE docs via a broadcast id-set
    semi-join when the candidate count is bounded (``cand_filter_max`` —
    the standard bloom/IN-filter pushdown; the set is output-sized, not
    corpus-sized), so the joins shuffle candidate shingles only. Above
    the gate the joins run over the full distributed shingle table.
    The old implementation broadcast a doc_id→shingle-set dict built
    from ``ds.to_pandas()`` — a whole-corpus driver materialization.
    Pairs with an empty intersection drop out of the inner join, which
    is correct for any threshold > 0.
    """
    import ray
    import ray.data as rd

    from ..functions.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # materialize: candidates are consumed up to three times below
    # (count + two join sides); they are output-sized, not corpus-sized
    raw = minhash_candidates(ds, distinct=False).materialize()

    n_raw = raw.count()
    doc_filter_ref = None
    if n_raw <= cand_filter_max:
        # bounded (gated on the RAW pair count, which is output-sized):
        # stream the pair batches to the driver, dedup with one
        # np.unique, and skip the cross-band distinct shuffle entirely
        # (~2 s fixed scheduling latency per shuffle stage)
        parts = [
            np.stack(
                [b["doc_id_a"].to_numpy(), b["doc_id_b"].to_numpy()], axis=1
            )
            for b in raw.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        pairs_arr = (
            np.unique(np.concatenate(parts), axis=0)
            if parts
            else np.empty((0, 2), dtype=np.int64)
        )
        pdf = pd.DataFrame(
            {"doc_id_a": pairs_arr[:, 0], "doc_id_b": pairs_arr[:, 1]}
        )
        n_cands = len(pdf)
        cands = rd.from_pandas(pdf)
        ids = set(pdf["doc_id_a"]) | set(pdf["doc_id_b"])
        doc_filter_ref = ray.put(ids)
    else:
        from ..functions.groups import bucketed_group_apply

        cands = bucketed_group_apply(
            raw, ["doc_id_a", "doc_id_b"],
            lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]),
        ).materialize()
        n_cands = cands.count()

    if n_cands <= cand_index_max and doc_filter_ref is not None:
        # tier A: collect the candidate docs' shingle-hash index from
        # the PRUNED explode (bounded: |candidate docs| × ~1 KB) and
        # verify in one map — zero additional shuffles. Guarded on the
        # pushdown being in effect: without the candidate filter this
        # would stream the WHOLE corpus's shingles to the driver
        from collections import defaultdict

        from .util import stage

        acc: dict[int, list[int]] = defaultdict(list)
        for b in _shingle_hash_table(
            ds, k=k, doc_filter_ref=doc_filter_ref
        ).iter_batches(batch_format="pyarrow"):
            for did, s in zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()):
                acc[did].append(s)
        index = {
            d: np.unique(np.array(v, dtype=np.int64))
            for d, v in acc.items()
        }
        ref = ray.put(index)
        # actor pool (not tasks): resolve the broadcast index once per
        # actor instead of once per batch
        return stage(cands, _CandidateVerifier, args=(ref, threshold),
                     batch_format="pandas", concurrency=2)

    sh = _shingle_hash_table(ds, k=k, doc_filter_ref=doc_filter_ref)
    sh_a = sh.map_batches(
        lambda t: t.rename_columns(["doc_id_a", "sh", "na"]),
        batch_format="pyarrow",
    )
    sh_b = sh.map_batches(
        lambda t: t.rename_columns(["doc_id_b", "sh", "nb"]),
        batch_format="pyarrow",
    )

    # pair × shingles-of-a, then inner join on (doc_id_b, sh): one row
    # per common shingle of the pair. Fewer buckets on the pruned path
    # (tiny tables — per-task overhead would dominate 32 buckets).
    nb = 8 if doc_filter_ref is not None else 32
    with_a = hash_join(cands, sh_a, on="doc_id_a", num_buckets=nb)
    inter = hash_join(with_a, sh_b, on=["doc_id_b", "sh"], num_buckets=nb)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["doc_id_a", "doc_id_b"], as_index=False, sort=False
        ).agg(c=("sh", "size"), na=("na", "first"), nb=("nb", "first"))
        j = out["c"].to_numpy(np.float64) / (
            out["na"].to_numpy(np.float64)
            + out["nb"].to_numpy(np.float64)
            - out["c"].to_numpy(np.float64)
        )
        j = np.round(j, 6)
        keep = j >= threshold
        return pd.DataFrame(
            {
                "doc_id_a": out["doc_id_a"].to_numpy()[keep],
                "doc_id_b": out["doc_id_b"].to_numpy()[keep],
                "jaccard": j[keep],
            }
        )

    from ..functions.groups import bucketed_group_apply

    return bucketed_group_apply(inter, ["doc_id_a", "doc_id_b"],
                                verify_bucket, num_buckets=nb)


# ---------------------------------------------------------------------------
# minhash_jaccard_calibration — index acceptance gate (Broder 1997:
# E[sig-agreement fraction] = Jaccard; the census checks the estimator
# is unbiased on THIS corpus before anyone trusts the LSH tiers)
# ---------------------------------------------------------------------------

#: deterministic pair-sample cap for the calibration census: above it,
#: pairs are sampled by md5("{a}-{b}") order (unbiased, replicated
#: verbatim in the SQL oracle's ORDER BY ... LIMIT) so the broadcast
#: candidate index stays bounded at any corpus size.
MHC_PAIR_CAP = 100_000

#: calibration bins: exact-Jaccard deciles (floor(j·10), top-clamped)
MHC_BIN_E6 = 100_000


def _shingle_md5_table(ds, *, k: int, doc_filter_ref):
    """documents → (doc_id, x64) — one row per distinct shingle per
    doc, hashed with the SAME md5-top-8-bytes map the MinHash signature
    uses (``_md5_hash64``), so one broadcast index serves BOTH the
    exact-Jaccard intersections and the signature rebuild. Pruned to
    candidate docs via the broadcast id-set semi-join."""

    def explode(t: pa.Table) -> pa.Table:
        import ray

        keep = ray.get(doc_filter_ref)
        doc_ids, hashes = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did not in keep:
                continue
            for s in _shingles(text, k):
                doc_ids.append(did)
                hashes.append(_md5_hash64(s))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "x64": pa.array(
                    np.array(hashes, dtype=np.uint64), pa.uint64()
                ),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


class _CalibPartials:
    """Per-batch partial calibration rows over a broadcast candidate
    x64 index: (bin, n, sum_matches, sum_e6, sum_err). All per-pair
    quantities are INTEGERS (matches ∈ 0..num_perm, exact Jaccard as a
    round-even 1e6 fixed-point) so the bin sums — and therefore the
    final means — are bit-identical between numpy and DuckDB regardless
    of accumulation order."""

    def __init__(self, index_ref, num_perm: int = 128):
        import ray

        self._idx = ray.get(index_ref)  # doc_id -> sorted unique uint64
        mh = MinHasher(num_perm=num_perm)
        self._a, self._b = mh._a, mh._b
        self._np = num_perm
        self._sig_cache: dict[int, np.ndarray] = {}

    def _sig(self, did: int) -> np.ndarray:
        s = self._sig_cache.get(did)
        if s is None:
            x = self._idx[did] % _MERSENNE31
            s = (
                (self._a[:, None] * x[None, :] + self._b[:, None])
                % _MERSENNE31
            ).min(axis=1)
            self._sig_cache[did] = s
        return s

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_id_a"].to_numpy()
        b = batch["doc_id_b"].to_numpy()
        n = len(a)
        z = np.array([], np.int64)
        if n == 0:
            return pd.DataFrame(
                {"bin": z, "n": z, "sm": z, "se6": z, "serr": z}
            )
        # exact |A∩B| for the whole batch via one lexsort (same kernel
        # as _CandidateVerifier): tag every x64 with its pair id; a
        # value adjacent-equal under one pair id is an intersection hit
        a_sets = [self._idx[x] for x in a]
        b_sets = [self._idx[x] for x in b]
        la = np.fromiter((s.size for s in a_sets), np.int64, n)
        lb = np.fromiter((s.size for s in b_sets), np.int64, n)
        vals = np.concatenate(a_sets + b_sets)
        pid = np.concatenate(
            [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
        )
        order = np.lexsort((vals, pid))
        pv, vv = pid[order], vals[order]
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(pv[1:][dup], minlength=n)
        denom = (la + lb - inter).astype(np.float64)
        e6 = np.round(inter.astype(np.float64) / denom * 1_000_000.0)
        e6 = e6.astype(np.int64)
        matches = np.fromiter(
            (
                int((self._sig(int(x)) == self._sig(int(y))).sum())
                for x, y in zip(a, b)
            ),
            np.int64,
            n,
        )
        err = np.abs(matches * 1_000_000 - e6 * self._np)
        bins = np.minimum(e6 // MHC_BIN_E6, 9)
        g = pd.DataFrame(
            {"bin": bins, "m": matches, "e6": e6, "err": err}
        ).groupby("bin", as_index=False)
        out = g.agg(n=("m", "size"), sm=("m", "sum"), se6=("e6", "sum"),
                    serr=("err", "sum"))
        return out.astype(np.int64)


def minhash_jaccard_calibration(sf_dir: str, *, k: int = 3,
                                num_perm: int = 128,
                                pair_cap: int = MHC_PAIR_CAP):
    """MinHash estimator calibration census → one row per exact-Jaccard
    decile bin: (bin, n_pairs, mean_est, mean_exact, mean_abs_err).

    Over the LSH candidate pairs (the population the index actually
    surfaces — calibrating on it is what validates the dedup tiers),
    compares the signature estimate (agreeing-position fraction of the
    128-perm signatures) with exact distinct-shingle Jaccard. Broder's
    bound says the estimate is unbiased with σ = √(J(1−J)/128) ≈ 0.044
    worst case — a mean_abs_err far above that in any populated bin
    means the hash family or banding is broken for this corpus.

    Shape: candidates from `minhash_candidates` (output-sized), then a
    deterministic md5-ordered sample caps the census at ``pair_cap``
    (the SQL oracle repeats the same ORDER BY md5 LIMIT), so the
    broadcast candidate index (~1 KB/doc, sampled-candidate docs only)
    is bounded at ANY corpus size; per-pair integer partials ride one
    tiny 10-key groupby. Nothing corpus-sized touches the driver."""
    import ray
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply
    from .util import stage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    raw = minhash_candidates(ds, num_perm=num_perm, k=k,
                             distinct=False).materialize()
    n_raw = raw.count()
    if n_raw <= CAND_FILTER_MAX:
        parts = [
            np.stack(
                [c["doc_id_a"].to_numpy(), c["doc_id_b"].to_numpy()], axis=1
            )
            for c in raw.iter_batches(batch_format="pyarrow")
            if c.num_rows
        ]
        pairs_arr = (
            np.unique(np.concatenate(parts), axis=0)
            if parts
            else np.empty((0, 2), dtype=np.int64)
        )
    else:  # pragma: no cover - >1M raw pairs needs a huge corpus
        # distributed distinct, then ONLY the capped sample (bounded)
        # is collected — the md5 sort keeps the sample deterministic
        dist = bucketed_group_apply(
            raw, ["doc_id_a", "doc_id_b"],
            lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]),
        )

        def add_h(t: pa.Table) -> pa.Table:
            h = [
                hashlib.md5(f"{x}-{y}".encode()).hexdigest()
                for x, y in zip(t["doc_id_a"].to_pylist(),
                                t["doc_id_b"].to_pylist())
            ]
            return t.append_column("h", pa.array(h, pa.string()))

        capped = (
            dist.map_batches(add_h, batch_format="pyarrow")
            .sort("h").limit(pair_cap).to_pandas()
        )
        pairs_arr = capped[["doc_id_a", "doc_id_b"]].to_numpy()

    if len(pairs_arr) > pair_cap:
        hs = np.array(
            [
                hashlib.md5(f"{x}-{y}".encode()).hexdigest()
                for x, y in pairs_arr
            ]
        )
        pairs_arr = pairs_arr[np.argsort(hs, kind="stable")][:pair_cap]

    pdf = pd.DataFrame(
        {"doc_id_a": pairs_arr[:, 0], "doc_id_b": pairs_arr[:, 1]}
    )
    if not len(pdf):  # no LSH collisions at all — stable empty schema
        z = pa.array([], pa.int64())
        zf = pa.array([], pa.float64())
        return pa.table({"bin": z, "n_pairs": z, "mean_est": zf,
                         "mean_exact": zf, "mean_abs_err": zf})
    cands = rd.from_pandas(pdf)
    doc_filter_ref = ray.put(
        set(pdf["doc_id_a"]) | set(pdf["doc_id_b"])
    )

    from collections import defaultdict

    acc: dict[int, list[int]] = defaultdict(list)
    for c in _shingle_md5_table(
        ds, k=k, doc_filter_ref=doc_filter_ref
    ).iter_batches(batch_format="pyarrow"):
        for did, x in zip(c["doc_id"].to_pylist(), c["x64"].to_pylist()):
            acc[did].append(x)
    index = {
        d: np.unique(np.array(v, dtype=np.uint64)) for d, v in acc.items()
    }
    ref = ray.put(index)

    partials = stage(cands, _CalibPartials, args=(ref, num_perm),
                     batch_format="pandas", concurrency=2)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby("bin", as_index=False).agg(
            n_pairs=("n", "sum"), sm=("sm", "sum"), se6=("se6", "sum"),
            serr=("serr", "sum"))
        n = o["n_pairs"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "bin": o["bin"].astype(np.int64),
                "n_pairs": o["n_pairs"].astype(np.int64),
                "mean_est": np.round(
                    o["sm"].to_numpy(np.float64) / (num_perm * 1.0 * n), 6
                ),
                "mean_exact": np.round(
                    o["se6"].to_numpy(np.float64) / (n * 1_000_000.0), 6
                ),
                "mean_abs_err": np.round(
                    o["serr"].to_numpy(np.float64)
                    / (n * num_perm * 1_000_000.0),
                    6,
                ),
            }
        )

    return bucketed_group_apply(partials, ["bin"], final,
                                num_buckets=4).sort("bin")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _md5_hash64(s: str) -> int:
    """Top 8 bytes of md5 — bit-reproducible in SQL as
    ``CAST(('0x'||substr(md5(tok),1,16)) AS UBIGINT)``, which is what
    makes ``simhash_fingerprints`` DuckDB-oracle-able."""
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (public Charikar scheme).

    Tokenization is the SQL replica; a space-blank document (the
    oracle's ``trim(text) = ''`` exclusion) fingerprints to 0."""
    if not text.strip(" "):
        return 0
    toks = sql_tokens(text)
    hashes = np.array([_md5_hash64(t) for t in toks], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    counts = bits.sum(axis=0)
    out = (counts * 2 > len(toks)).astype(np.uint64)
    return int((out << np.arange(64, dtype=np.uint64)).sum())


def simhash_fingerprints(sf_dir: str):
    """Per-document 64-bit SimHash (hex string column)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        hs = [f"{simhash64(s):016x}" for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array(hs, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


#: 16-bit popcount lookup (64 KiB, picklable module global)
_POPCNT16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)
#: row tile for the banded Hamming pair search
_HAM_TILE = 2048


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via four 16-bit lookups."""
    m = np.uint64(0xFFFF)
    return (
        _POPCNT16[(x & m).astype(np.uint32)]
        + _POPCNT16[((x >> np.uint64(16)) & m).astype(np.uint32)]
        + _POPCNT16[((x >> np.uint64(32)) & m).astype(np.uint32)]
        + _POPCNT16[(x >> np.uint64(48)).astype(np.uint32)]
    ).astype(np.int64)


def simhash_near_dups(sf_dir: str, *, max_hamming: int = 3):
    """All document pairs whose 64-bit SimHashes differ in at most
    ``max_hamming`` bits — the SimHash near-dup detector (public
    Charikar/Manku scheme: Hamming-ball search via banding).

    Scale shape (EXACT, not approximate): pigeonhole — a pair within
    Hamming distance d must agree exactly on at least one of d+1
    disjoint bands of the fingerprint. One fingerprint pass emits d+1
    (band, band_value) rows per doc; a bucketed groupby co-locates each
    band bucket; within a bucket each collision group runs a TILED
    LUT popcount (per-task memory bounded by ``_HAM_TILE × |group|``
    byte planes, never a |group|² bit expansion); one more bucketed
    exchange dedupes pairs that agreed on several bands.

    Work bound (honest): candidate checks total Σ|group|² ≈
    (d+1)·n²/2^(64/(d+1)) — for d=3 that is n²/2¹⁴ pair probes, the
    inherent cost of the EXACT Hamming join on random fingerprints
    (Manku et al. trade exactness or memory via more/rotated tables).
    Real dedup corpora collide far below random; for a lower bound per
    task the tiling caps memory and a band with a mega-group degrades
    to more tiles, not OOM. Oracled in DuckDB via the shared
    fingerprint CTE + bit_count(xor).
    """
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    n_bands = max_hamming + 1
    assert 64 % n_bands == 0 or n_bands <= 64
    width = 64 // n_bands

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def emit_bands(t: pa.Table) -> pa.Table:
        vals = np.array(
            [simhash64(s) for s in t["text"].to_pylist()], dtype=np.uint64
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        band = np.repeat(np.arange(n_bands, dtype=np.int64), n)
        shifted = np.concatenate(
            [(vals >> np.uint64(width * b)) & np.uint64((1 << width) - 1)
             for b in range(n_bands)]
        )
        return pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "key": pa.array(shifted.astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.tile(ids, n_bands), pa.int64()),
                "sim": pa.array(
                    np.tile(vals, n_bands).astype(np.int64), pa.int64()
                ),
            }
        )

    banded = ds.map_batches(emit_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, sub in g.groupby(["band", "key"], sort=False):
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].to_numpy(np.int64)
            vals = sub["sim"].to_numpy(np.int64).astype(np.uint64)
            n = len(vals)
            # tile rows so per-task memory is bounded by TILE×|group|
            # regardless of how large a band collision group gets; the
            # popcount runs through a 16-bit lookup (4 byte-sized
            # planes), never a 64×-expanded unpackbits
            for lo_r in range(0, n, _HAM_TILE):
                hi_r = min(lo_r + _HAM_TILE, n)
                x = vals[lo_r:hi_r, None] ^ vals[None, :]
                ham = _popcount64(x)
                # global i<j only (each unordered pair once)
                rows = np.arange(lo_r, hi_r)[:, None]
                cols = np.arange(n)[None, :]
                ai, bi = np.nonzero((ham <= max_hamming) & (cols > rows))
                a, b = ids[lo_r:hi_r][ai], ids[bi]
                keep_lo = np.minimum(a, b)
                keep_hi = np.maximum(a, b)
                out_a.append(keep_lo)
                out_b.append(keep_hi)
                out_h.append(ham[ai, bi].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"doc_id_a": np.array([], np.int64),
                 "doc_id_b": np.array([], np.int64),
                 "hamming": np.array([], np.int64)}
            )
        return pd.DataFrame(
            {"doc_id_a": np.concatenate(out_a),
             "doc_id_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_h)}
        )

    pairs = bucketed_group_apply(banded, ["band", "key"], bucket_pairs)
    return bucketed_group_apply(
        pairs,
        ["doc_id_a", "doc_id_b"],
        lambda g: g.drop_duplicates(["doc_id_a", "doc_id_b"]),
    )


# ---------------------------------------------------------------------------
# near-dup clusters: connected components over verified pairs
# ---------------------------------------------------------------------------


def connected_components(pairs_ds, *, max_iters: int = 50,
                         num_buckets: int = 16):
    """Distributed connected components by min-label propagation.

    Input: an edge Dataset with ``doc_id_a``/``doc_id_b`` columns.
    Output: one row per participating doc, ``(doc_id, cluster_id)``
    with ``cluster_id`` = the component's minimum doc id.

    Shape per iteration: symmetrize edges once up front; join current
    labels onto edge targets (bucketed hash join keyed on doc_id), then
    a bucketed min-reduce per node merges neighbor labels with its own.
    Convergence in ≤ diameter iterations; each iteration is two bounded
    shuffles, nothing driver-side except the (tiny) change counter.
    Dedup components are near-cliques, so this converges in 2-3 rounds
    in practice.
    """
    from ..functions.groups import bucketed_group_apply
    from ..functions.joins import hash_join

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["doc_id_a"].to_numpy(zero_copy_only=False)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()  # edge set is output-sized; reused every iteration

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["src"], "label": t["src"]}
        )

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)["label"].min()
        return out.astype({"doc_id": np.int64, "label": np.int64})

    labels = bucketed_group_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        ["doc_id"], min_label, num_buckets=num_buckets,
    ).materialize()
    label_sum = labels.sum("label")

    for _ in range(max_iters):
        # ship each node's label across its edges: edges(dst) ⋈ labels
        lab_for_join = labels.map_batches(
            lambda t: t.rename_columns(["dst", "label"]),
            batch_format="pyarrow",
        )
        neighbor = hash_join(
            edges, lab_for_join, on="dst", num_buckets=num_buckets
        ).map_batches(
            lambda t: pa.table(
                {"doc_id": t["src"], "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        merged = bucketed_group_apply(
            neighbor.union(labels), ["doc_id"], min_label,
            num_buckets=num_buckets,
        ).materialize()
        # convergence: labels are monotone non-increasing under
        # min-propagation, so the label SUM strictly decreases whenever
        # any node changed — one streamed aggregate, no extra join
        new_sum = merged.sum("label")
        labels = merged
        if new_sum == label_sum:
            break
        label_sum = new_sum
    else:
        # a component with diameter > max_iters would exit here with
        # unconverged (wrong) cluster ids — surface it instead of
        # returning silently (near-clique dedup graphs converge in a few
        # iterations; chain-shaped graphs are the hazard)
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iters} "
            "iterations; cluster ids may be incorrect for long-chain "
            "components — raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )


def connected_components_star(pairs_ds, *, max_rounds: int = 30,
                              num_buckets: int = 16,
                              return_rounds: bool = False):
    """Connected components by alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    ACM SoCC 2014, Algorithm 3): each round rewires every node toward
    its neighborhood minimum, halving component height, so convergence
    is O(log² n) ROUNDS regardless of graph diameter — the
    min-label-propagation variant above needs O(diameter) iterations,
    which a chain-shaped component turns into a shuffle storm (its
    ``max_iters`` guard exists precisely for that hazard).

    Large-star (one bucketed exchange): for each node u with
    neighborhood N(u), m = min(N(u) ∪ {u}); emit edge (v, m) for every
    v ∈ N(u) with v > u. Small-star (one exchange): on edges oriented
    (hi, lo) with lo < hi, for each hi m = min(N⁻(hi)); emit (v, m)
    for v ∈ N⁻(hi) ∪ {hi}, v ≠ m. Both phases only ever emit edges
    pointing at a strictly smaller id, so the canonical (hi, lo)
    orientation is an invariant and the edge set converges to direct
    star edges (v, component-min).

    Convergence detection: a streamed multiset fingerprint of the edge
    set — (count, Σhi, Σlo, Σmix31(hi,lo)) — stable across two
    consecutive rounds ⟺ the multiset stopped changing (exact on the
    first three components; the 31-bit mix guards permuted rewrites).
    Nothing corpus-sized reaches the driver.

    Output schema matches ``connected_components``: one row per
    participating doc, ``(doc_id, cluster_id)``, cluster_id = the
    component's minimum doc id. ``return_rounds=True`` additionally
    returns the number of alternating rounds executed (for the
    round-bound tests).
    """
    from ..functions.groups import bucketed_group_apply

    def orient(t: pa.Table) -> pa.Table:
        a = t["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b  # self-loops carry no connectivity
        a, b = a[keep], b[keep]
        return pa.table(
            {"hi": pa.array(np.maximum(a, b), pa.int64()),
             "lo": pa.array(np.minimum(a, b), pa.int64())}
        )

    def symmetrize(t: pa.Table) -> pa.Table:
        hi = t["hi"].to_numpy(zero_copy_only=False)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(np.concatenate([hi, lo]), pa.int64()),
             "dst": pa.array(np.concatenate([lo, hi]), pa.int64())}
        )

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # m(u) = min over N(u) ∪ {u}; emit (v, m) for v ∈ N(u), v > u
        m = np.minimum(
            g.groupby("src")["dst"].transform("min").to_numpy(),
            g["src"].to_numpy(),
        )
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        keep = dst > src
        out = pd.DataFrame({"hi": dst[keep], "lo": m[keep]})
        return out.drop_duplicates(ignore_index=True).astype(np.int64)

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # edges all point hi→lo (lo < hi); m(hi) = min of its targets;
        # emit (v, m) for v ∈ N⁻(hi) ∪ {hi}, v ≠ m
        mins = g.groupby("hi", as_index=False)["lo"].min()
        m = g["hi"].map(
            mins.set_index("hi")["lo"]
        ).to_numpy()
        hi = g["hi"].to_numpy()
        lo = g["lo"].to_numpy()
        out = pd.DataFrame(
            {
                "hi": np.concatenate([lo, mins["hi"].to_numpy()]),
                "lo": np.concatenate([m, mins["lo"].to_numpy()]),
            }
        )
        out = out[out["hi"] != out["lo"]]
        return out.drop_duplicates(ignore_index=True).astype(np.int64)

    def fingerprint(ds):
        def mix(t: pa.Table) -> pa.Table:
            hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
            lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
            z = (hi * np.uint64(0x9E3779B97F4A7C15)) ^ (
                lo + np.uint64(0xBF58476D1CE4E5B9))
            z ^= z >> np.uint64(31)
            return pa.table(
                {"hi": t["hi"], "lo": t["lo"],
                 "mix31": pa.array(
                     (z & _MERSENNE31).astype(np.int64), pa.int64())}
            )

        with_mix = ds.map_batches(mix, batch_format="pyarrow").materialize()
        # count() on a materialized dataset is metadata (no job); the
        # three column sums run as ONE aggregate pass, not three jobs
        sums = with_mix.sum(["hi", "lo", "mix31"])
        sig = (with_mix.count(), sums["sum(hi)"], sums["sum(lo)"],
               sums["sum(mix31)"])
        return with_mix.select_columns(["hi", "lo"]), sig

    edges = pairs_ds.map_batches(orient, batch_format="pyarrow")
    edges, sig = fingerprint(edges)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        ls = bucketed_group_apply(
            edges.map_batches(symmetrize, batch_format="pyarrow"),
            ["src"], large_star, num_buckets=num_buckets,
        )
        ss = bucketed_group_apply(
            ls, ["hi"], small_star, num_buckets=num_buckets,
        )
        edges, new_sig = fingerprint(ss)
        # Termination is equality of a probabilistic multiset
        # fingerprint, so a collision between two DISTINCT consecutive
        # edge multisets would end the loop early with wrong labels and
        # no warning. Bound: mix31 is a splitmix64-mixed sum reduced
        # mod 2^31-1 — under a random-oracle model two distinct
        # multisets agree on it with p ≈ 2^-31, and they must ALSO
        # agree on count and the raw hi/lo sums (structured but
        # independent-ish checks), so a silent early exit across the
        # ≤max_rounds comparisons is ≪ 10^-8 per run. If that is ever
        # not enough, require TWO consecutive stable fingerprints (the
        # star transforms are idempotent at the fixed point, so the
        # confirming round costs exactly one extra pair of exchanges
        # and squares the collision probability).
        if new_sig == sig:
            break
        sig = new_sig
    else:
        import warnings

        warnings.warn(
            f"connected_components_star did not stabilize within "
            f"{max_rounds} rounds; cluster ids may be incorrect",
            RuntimeWarning,
            stacklevel=2,
        )

    # converged edge set is stars (v → component min); labels = each
    # edge target plus the root itself, deduped by per-node min
    def to_labels(t: pa.Table) -> pa.Table:
        hi = t["hi"].to_numpy(zero_copy_only=False)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(np.concatenate([hi, lo]), pa.int64()),
             "cluster_id": pa.array(np.concatenate([lo, lo]), pa.int64())}
        )

    def min_cluster(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)["cluster_id"].min()
        return out.astype({"doc_id": np.int64, "cluster_id": np.int64})

    labels = bucketed_group_apply(
        edges.map_batches(to_labels, batch_format="pyarrow"),
        ["doc_id"], min_cluster, num_buckets=num_buckets,
    )
    if return_rounds:
        return labels, rounds
    return labels


def near_dup_clusters(sf_dir: str, *, threshold: float = 0.1, k: int = 3):
    """Connected components over the EXACT n-gram-Jaccard near-dup
    graph: (doc_id, cluster_id=min doc id of the component) for every
    doc that participates in at least one pair. Oracled in DuckDB with
    a recursive reachability CTE over the same pair SQL."""
    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)
    return connected_components(pairs)


def near_dup_clusters_star(sf_dir: str, *, threshold: float = 0.1,
                           k: int = 3):
    """``near_dup_clusters`` computed by the O(log² n)-round
    large-star/small-star alternation instead of min-label propagation
    — identical output contract ((doc_id, cluster_id=component min)),
    same DuckDB reachability oracle, robust to chain-shaped components
    whose diameter would exhaust label propagation's iteration budget."""
    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)
    return connected_components_star(pairs)


def substring_dup_stats(sf_dir: str, *, window: int = 8,
                        num_buckets: int = 32):
    """Exact substring-duplication census (the window primitive behind
    suffix-array substring dedup, Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document
    with at least one ``window``-token window, count its windows and
    how many of them (by position) recur verbatim in at least one OTHER
    document. The reference has no substring dedup (SURVEY §2.7 —
    dedup is beyond-reference); this is the scalable Ray shape:

    explode (doc, window-text) with a per-batch (doc, window) combiner
    → ONE bucketed exchange keyed on a 32-bit window hash (groups
    compare the full window STRING inside the bucket, so hash collisions
    cannot merge distinct windows) → per-doc partial (positions,
    dup-positions) → ONE final groupby(doc_id) sum. Nothing corpus-sized
    on the driver. At 100-TB scale the window strings dominate shuffle
    bytes; the documented knob is hashing windows to 128-bit digests
    before the exchange (trades the exact-string guarantee for a
    2⁻¹²⁸ collision bound).

    Output: (doc_id, n_windows, n_dup_windows), int64.
    """
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply
    from ..functions.tokens import sql_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, wins = [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            toks = sql_tokens(text)
            for i in range(len(toks) - window + 1):
                doc_ids.append(did)
                wins.append(" ".join(toks[i:i + window]))
        if not doc_ids:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "wtext": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        # combiner: within-batch (doc, window) counts — repeated windows
        # inside a doc cross the exchange once, with a count
        df = pd.DataFrame({"doc_id": doc_ids, "wtext": wins})
        agg = df.groupby(["doc_id", "wtext"], as_index=False).size()
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(), pa.int64()),
                "wtext": pa.array(agg["wtext"].tolist(), pa.string()),
                "cnt": pa.array(agg["size"].to_numpy(), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # exact string grouping inside the hash bucket; after the
        # (wtext, doc_id) pre-sum each key is unique per doc, so
        # transform("size") IS the distinct-doc count (and is far
        # cheaper than transform("nunique"))
        g = g.groupby(["wtext", "doc_id"], as_index=False)["cnt"].sum()
        ndocs = g.groupby("wtext")["doc_id"].transform("size")
        dup = np.where(ndocs.to_numpy() >= 2, g["cnt"].to_numpy(), 0)
        out = pd.DataFrame(
            {"doc_id": g["doc_id"], "n_windows": g["cnt"],
             "n_dup_windows": dup}
        )
        out = out.groupby("doc_id", as_index=False).sum()
        return out.astype(np.int64)

    partials = bucketed_group_apply(
        exploded, ["wtext"], per_bucket, num_buckets=num_buckets
    )

    # doc_id cardinality is corpus-sized — a native groupby would pay
    # per-key overhead (CLAUDE.md pitfall); bucket it instead
    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)[
            ["n_windows", "n_dup_windows"]].sum()
        return out.astype(np.int64)

    return bucketed_group_apply(
        partials, ["doc_id"], per_doc, num_buckets=num_buckets
    )


def dedup_substrings_excise(sf_dir: str, *, window: int = 8,
                            num_buckets: int = 32):
    """Substring-level corpus dedup (Lee et al. 2022 ExactSubstr):
    every ``window``-token run that appears verbatim in ≥2 documents is
    kept only in the window's minimum doc_id (the canonical copy) and
    excised everywhere else; emits the cleaned corpus
    (doc_id, clean_text, n_removed) for EVERY document (short and
    untouched docs pass through with n_removed=0). Deterministic, so
    DuckDB-oracled end-to-end.

    Shape: window explode → ONE bucketed exchange keyed on the window
    hash (exact string grouping inside the bucket) emitting removable
    (doc_id, position) rows → docs ∪ removals bucketed by doc_id → ONE
    exchange → per-doc interval-mask rebuild (difference-array cumsum,
    no per-position Python). Two exchanges total; removal rows are
    duplication-sized, never corpus-sized.
    """
    import ray.data as rd

    from ..functions.groups import BUCKET_COL, add_hash_bucket
    from ..functions.tokens import sql_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, pos, wins = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            toks = sql_tokens(text)
            for i in range(len(toks) - window + 1):
                doc_ids.append(did)
                pos.append(i)
                wins.append(" ".join(toks[i:i + window]))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "wtext": pa.array(wins, pa.string()),
            }
        )

    from ..functions.groups import bucketed_group_apply

    def removable(g: pd.DataFrame) -> pd.DataFrame:
        # windows shared by >=2 distinct docs: the min doc keeps its
        # copy, every other (doc, start-position) occurrence is excised
        stats = g.groupby("wtext")["doc_id"].agg(["min", "nunique"])
        g = g.join(stats, on="wtext")
        out = g[(g["nunique"] >= 2) & (g["doc_id"] != g["min"])]
        return pd.DataFrame(
            {"doc_id": out["doc_id"].to_numpy(np.int64),
             "pos": out["pos"].to_numpy(np.int64)}
        )

    rem = bucketed_group_apply(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["wtext"], removable, num_buckets=num_buckets,
    )

    # docs ∪ removals, one exchange keyed on doc_id. Sentinel pos=-1
    # marks the doc row (NEVER null: one null decays the int column to
    # float64 and hash-misroutes the bucket — see CLAUDE.md).
    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "pos": pa.array(
                    np.full(t.num_rows, -1, np.int64), pa.int64()),
            }
        )

    def rem_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array([""] * t.num_rows, pa.string()),
                "pos": t["pos"],
            }
        )

    both = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        rem.map_batches(rem_rows, batch_format="pyarrow")
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL])
        ids, cleaned, removed = [], [], []
        for did, sub in g.groupby("doc_id"):
            text = sub.loc[sub["pos"] < 0, "text"]
            if text.empty:  # removal rows for a doc outside this read
                continue
            toks = sql_tokens(text.iloc[0])
            starts = sub.loc[sub["pos"] >= 0, "pos"].to_numpy(np.int64)
            delta = np.zeros(len(toks) + window + 1, np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + window, -1)
            mask = np.cumsum(delta[: len(toks)]) > 0
            kept = [t for t, m in zip(toks, mask) if not m]
            ids.append(did)
            cleaned.append(" ".join(kept))
            removed.append(int(mask.sum()))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "clean_text": pd.array(cleaned, dtype="object"),
                "n_removed": pd.array(removed, dtype="int64"),
            }
        )

    bucketed = add_hash_bucket(both, ["doc_id"], num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        rebuild, batch_format="pandas"
    )


def dedup_keep_canonical(sf_dir: str, *, threshold: float = 0.1,
                         k: int = 3):
    """End-to-end corpus dedup: drop every document whose near-dup
    component has a smaller member, keep the component canonicals (the
    min doc id) and all non-participating docs — the "emit the cleaned
    corpus" step that near-dup clustering exists for.

    Shape: the drop set is ``near_dup_clusters`` filtered to
    ``doc_id != cluster_id`` (output-sized), anti-joined against the
    corpus with the distributed ``semi_anti_join`` — no driver-side
    membership set, so the filter scales with the corpus."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.joins import semi_anti_join

    clusters = near_dup_clusters(sf_dir, threshold=threshold, k=k)

    def losers(t: pa.Table) -> pa.Table:
        m = pc.not_equal(t["doc_id"], t["cluster_id"])
        return t.filter(m).select(["doc_id"])

    drop = clusters.map_batches(losers, batch_format="pyarrow")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return semi_anti_join(docs, drop, "doc_id", anti=True)


def neardup_pagerank(sf_dir: str, *, threshold: float = 0.1, k: int = 3,
                     iters: int = 3, damping: float = 0.85):
    """PageRank over the exact n-gram-Jaccard near-dup graph — a fixed
    ``iters``-step power iteration (public Brin/Page formulation) that
    scores how central each document is inside its duplication
    neighborhood (dup-cluster hubs rank high; useful for picking
    canonical representatives by authority instead of min-id).

    Scale shape: edges are output-sized and materialized once;
    out-degrees come from the census partial+final pattern; edge
    weights (1/deg) attach via ONE bucketed hash join; each iteration
    is then one hash join (rank onto edge source) plus one bucketed
    sum by destination — nothing corpus-sized on the driver, per-task
    state bounded by bucket. Every node of the symmetrized graph has
    in-edges, so no dangling-mass term.

    Float discipline: ranks round to 9 digits each iteration on BOTH
    the Ray and SQL sides (sum-order drift ~1e-18 per step cannot
    accumulate past the rounding grid), final output rounds to 6 —
    DuckDB-oracled via chained per-iteration CTEs.
    """
    from ..functions.groups import (
        bucketed_group_apply,
        count_partial,
        final_groupby_sum,
    )
    from ..functions.joins import hash_join

    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["doc_id_a"].to_numpy(zero_copy_only=False)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()  # output-sized; reused every iteration

    deg = final_groupby_sum(
        edges.map_batches(count_partial("src", "deg"),
                          batch_format="pyarrow"),
        ["src"], ["deg"],
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "pagerank": pa.array([], pa.float64())}
        )

    # weighted edges: w = 1/deg(src), attached once
    weighted = hash_join(edges, deg, on="src").map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pa.array(
                    1.0 / t["deg"].to_numpy(zero_copy_only=False),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    base = float(np.round(1.0 / n_nodes, 9))
    state = deg.map_batches(
        lambda t: pa.table(
            {
                "node": t["src"],
                "pr": pa.array(np.full(t.num_rows, base), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )

    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = hash_join(
            weighted,
            state.map_batches(
                lambda t: t.rename_columns(["src", "pr"]),
                batch_format="pyarrow",
            ),
            on="src",
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "c": pa.array(
                        t["pr"].to_numpy(zero_copy_only=False)
                        * t["w"].to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = final_groupby_sum(contrib, ["node"], ["c"])
        state = summed.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "pr": pa.array(
                        np.round(
                            teleport
                            + damping
                            * t["c"].to_numpy(zero_copy_only=False),
                            9,
                        ),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    return state.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["node"],
                "pagerank": pa.array(
                    np.round(t["pr"].to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def neardup_degree_histogram(sf_dir: str, *, threshold: float = 0.1,
                             k: int = 3):
    """Degree distribution of the exact near-dup graph: (degree,
    n_docs) — the dedup-graph health census (a heavy tail means hub
    documents / boilerplate cliques and predicts verification skew).
    Edges symmetrize once; per-node degree via the census
    partial+final pattern; the second groupby runs over the (tiny)
    distinct-degree domain. Oracled on the shared pair SQL."""
    from ..functions.groups import count_partial, final_groupby_sum

    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty filtered blocks can be schema-less
            return pa.table({"src": pa.array([], pa.int64())})
        a = t["doc_id_a"].to_numpy(zero_copy_only=False)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    deg = final_groupby_sum(
        edges.map_batches(count_partial("src", "deg"),
                          batch_format="pyarrow"),
        ["src"], ["deg"],
    )
    hist = final_groupby_sum(
        deg.map_batches(count_partial("deg", "n_docs"),
                        batch_format="pyarrow"),
        ["deg"], ["n_docs"],
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "degree": pc.cast(t["deg"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        )

    return hist.map_batches(finish, batch_format="pyarrow")


def neardup_kcore(sf_dir: str, *, core_k: int = 2, rounds: int = 3,
                  threshold: float = 0.1, k: int = 3):
    """k-core peeling of the near-dup graph, ``rounds`` fixed
    iterations: repeatedly drop nodes with degree < ``core_k`` and the
    edges touching them — the denser-than-pairs duplication structure
    (a 2-core member sits in a duplication CLUSTER, not just one pair;
    boilerplate families survive peeling, incidental pairs don't).
    ``k`` is the shingle size, as in every sibling near-dup entry.
    Output: (doc_id, degree) of the survivors after the last peel.

    Shape per round: per-node degree via the census partial+final
    pattern, survivors filtered by degree, edges semi-joined against
    the survivor set on BOTH endpoints (distributed ``semi_anti_join``
    — no driver membership set; the endpoint swap is NAME-based, not
    positional, so it composes with whatever column order the join
    emits). Edges are output-sized and re-materialized once per round;
    a metadata-count guard exits as soon as the graph peels to empty
    (a materialized empty dataset is schema-less in this Ray version).
    Fixed round count keeps it DuckDB-oracle-able via chained
    per-round CTEs (the neardup_pagerank discipline; full k-core =
    iterate to fixpoint)."""
    import pyarrow.compute as pc

    from ..functions.groups import count_partial, final_groupby_sum
    from ..functions.joins import semi_anti_join

    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty filtered blocks can be schema-less
            return pa.table({"s": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        a = t["doc_id_a"].to_numpy(zero_copy_only=False)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(np.concatenate([a, b]), pa.int64()),
                "t": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    def swap_endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"s": t["t"], "t": t["s"]})

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "degree": pa.array([], pa.int64())}
    )

    edges = pairs.map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()
    if edges.count() == 0:
        return empty

    def degrees(e):
        return final_groupby_sum(
            e.map_batches(count_partial("s", "degree"),
                          batch_format="pyarrow"),
            ["s"], ["degree"],
        )

    for _ in range(rounds):
        keep = degrees(edges).filter(
            expr=f"degree >= {core_k}"
        ).map_batches(
            lambda t: pa.table({"s": pc.cast(t["s"], pa.int64())}),
            batch_format="pyarrow",
        ).materialize()  # survivor set: output-sized, used twice
        if keep.count() == 0:
            return empty
        e1 = semi_anti_join(edges, keep, on="s")
        e2 = semi_anti_join(
            e1.map_batches(swap_endpoints, batch_format="pyarrow"),
            keep, on="s",
        ).map_batches(swap_endpoints, batch_format="pyarrow")
        edges = e2.materialize()
        if edges.count() == 0:
            return empty

    final = degrees(edges)
    return final.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["s"], pa.int64()),
                "degree": pc.cast(t["degree"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def leakage_safe_split(sf_dir: str, *, n_splits: int = 10,
                       threshold: float = 0.1, k: int = 3):
    """(split, n_docs) — train/val/test assignment keyed on the
    near-dup CLUSTER, not the document: every member of a connected
    near-dup component hashes from the component's canonical id, so
    near-duplicates can never straddle a split boundary (the
    benchmark-leakage failure mode of naive per-doc splits; same intent
    as dataset_split_assign but cluster-safe). Non-participating docs
    are their own singleton cluster.

    Shape: the cluster map is OUTPUT-sized (only docs in some pair) →
    broadcast LEFT join onto the doc stream (no shuffle), COALESCE to
    the doc's own id, md5-mod split, census partials → one domain-sized
    groupby. Oracled end-to-end through the recursive-reachability CTE
    + the same md5 arithmetic."""
    import ray.data as rd

    from ..functions.groups import count_partial, final_groupby_sum
    from ..functions.joins import broadcast_join
    from ..functions.tokens import md5_prefix32

    clusters = near_dup_clusters(
        sf_dir, threshold=threshold, k=k
    ).to_pandas()  # output-sized: members of at least one pair
    if list(clusters.columns) != ["doc_id", "cluster_id"]:
        # empty dataset → column-less to_pandas in this Ray version;
        # a pairless corpus must still split (every doc a singleton)
        clusters = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "cluster_id": pd.Series([], dtype=np.int64)}
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    joined = broadcast_join(docs, clusters, on="doc_id", how="left")

    def assign(b: pd.DataFrame) -> pa.Table:
        cid = b["cluster_id"].fillna(b["doc_id"]).astype(np.int64)
        split = np.array(
            [md5_prefix32(str(c)) % n_splits for c in cid], np.int64
        )
        u, n = np.unique(split, return_counts=True)
        return pa.table(
            {
                "split": pa.array(u, pa.int64()),
                "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    partials = joined.map_batches(assign, batch_format="pandas")
    out = final_groupby_sum(partials, ["split"], ["n_docs"])
    import pyarrow.compute as pc

    return out.map_batches(
        lambda t: pa.table(
            {
                "split": pc.cast(t["split"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# forget_propagation — right-to-be-forgotten delete propagation
# ---------------------------------------------------------------------------

#: deterministic synthetic deletion-request set: doc_id % 97 == 0 (the
#: same synthesize-from-doc_id house pattern as the PII injection)
FORGET_MOD = 97


def forget_propagation(sf_dir: str, *, threshold: float = 0.1, k: int = 3):
    """(doc_id, reason ∈ {direct, clone}) — every document that must be
    dropped to honor a deletion-request list.

    The compliance semantics a production corpus needs: deleting a
    document is NOT enough — its near-duplicates still carry the same
    content, so the request propagates through the near-dup graph
    (reason='clone' for cluster-mates of a deleted doc that are not
    themselves on the list). Requests are the deterministic
    ``doc_id % FORGET_MOD == 0`` set so the DuckDB oracle replays them.

    Shape: the cluster pass is ``near_dup_clusters`` (exact n-gram
    Jaccard graph + connected components — all bucketed exchanges);
    propagation is ONE more bucketed group apply keyed on cluster_id
    (a cluster is affected iff any member is a request); direct
    deletions stream from a column-pruned read. Nothing touches the
    driver."""
    import ray.data as rd

    clusters = near_dup_clusters(sf_dir, threshold=threshold, k=k)

    from ..functions.groups import bucketed_group_apply

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        deleted = (g["doc_id"].to_numpy() % FORGET_MOD) == 0
        aff = set(g.loc[deleted, "cluster_id"])
        m = g["cluster_id"].isin(aff).to_numpy() & ~deleted
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy()[m],
                "reason": pd.Series(["clone"] * int(m.sum()), dtype=object),
            }
        )

    clones = bucketed_group_apply(
        clusters, ["cluster_id"], per_cluster
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "reason": pc.cast(t["reason"], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def direct(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = d[d % FORGET_MOD == 0]
        return pa.table(
            {
                "doc_id": pa.array(sel, pa.int64()),
                "reason": pa.array(["direct"] * len(sel), pa.string()),
            }
        )

    return docs.map_batches(direct, batch_format="pyarrow").union(clones)

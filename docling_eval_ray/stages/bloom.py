"""Bloom-filter n-gram decontamination — the at-scale companion to the
exact set-membership check in ``pipelines/corpus_ops.py:
decontaminate_ngrams``.

The exact op broadcasts the benchmark's literal gram SET; at a real
benchmark-suite size (10^8-10^9 grams) that broadcast is tens of GiB.
The standard fix (public Bloom 1970 construction; the same structure
CCNet/Dolma-style pipelines use for URL and n-gram decontamination) is
a fixed-size bit array with k double-hashed probes:

* **sized up front**: ``m = -n ln p / (ln 2)^2`` bits and
  ``k = (m/n) ln 2`` probes for an expected ``n`` items at target
  false-positive rate ``p`` — a 10^9-gram set at 1% FPR is ~1.2 GiB,
  broadcastable via ``ray.put`` where the literal set is not;
* **mergeable**: partial filters OR together bit-for-bit, so the build
  is the HLL pattern (stages/sketches.py:86-101): one serialized
  partial per batch of the PRUNED benchmark read, OR-merged on the
  driver (partials are fixed-size sketches, never corpus-sized);
* **one-sided error**: membership can false-positive (flagging a clean
  doc — measured and bounded in tests) but never false-negative, so
  the guarantee that matters for decontamination — no contaminated
  document survives — is exact. Tests assert the exact-flagged set is
  a subset of the bloom-flagged set.

Hashing is two independent 64-bit lanes of one md5 per gram (the
``_md5_hash64`` convention from stages/dedup.py), combined as
``h1 + i*h2 mod m`` (Kirsch-Mitzenmacher double hashing).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _gram_hashes(grams: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 lanes per gram (md5 top/bottom halves)."""
    h1 = np.empty(len(grams), np.uint64)
    h2 = np.empty(len(grams), np.uint64)
    for i, g in enumerate(grams):
        d = hashlib.md5(g.encode()).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big") | 1  # odd → full-period step
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom filter over strings; OR-mergeable."""

    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        assert m_bits % 64 == 0
        self.m = m_bits
        self.k = k
        self.words = np.zeros(m_bits // 64, np.uint64)

    @classmethod
    def sized_for(cls, n_items: int, fpr: float) -> "BloomFilter":
        """Standard sizing: m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
        n = max(n_items, 1)
        m = int(-n * math.log(fpr) / (math.log(2) ** 2))
        m = max(((m + 63) // 64) * 64, 64)
        k = max(int(round(m / n * math.log(2))), 1)
        return cls(m, k)

    def _positions(self, grams: list[str]) -> np.ndarray:
        """(k, n) probe positions via double hashing."""
        h1, h2 = _gram_hashes(grams)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)

    def add_many(self, grams: list[str]) -> None:
        if not grams:
            return
        pos = self._positions(grams).ravel()
        np.bitwise_or.at(
            self.words, pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, grams: list[str]) -> np.ndarray:
        """Vectorized membership; all-k-bits-set per gram."""
        if not grams:
            return np.zeros(0, bool)
        pos = self._positions(grams)
        bits = (
            self.words[pos >> np.uint64(6)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.k) == (other.m, other.k)
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int) -> "BloomFilter":
        out = cls(len(data) * 8, k)
        out.words = np.frombuffer(data, np.uint64).copy()
        return out

    def theoretical_fpr(self, n_items: int) -> float:
        return (1.0 - math.exp(-self.k * n_items / self.m)) ** self.k


def _or_sketches(*items) -> bytes:
    """OR-merge serialized filter partials: each item is either a bytes
    blob (an inner tree node) or a pyarrow block of sketch rows (a
    leaf). Runs as a ray task — one m_bits buffer per task."""
    words = None
    for item in items:
        if isinstance(item, pa.Table):
            # zero-row upstream blocks (e.g. a filter that drops a whole
            # block) surface as schema-less empty tables — no sketch
            blobs = (
                item["sketch"].to_pylist()
                if "sketch" in item.column_names else []
            )
        else:
            blobs = [item] if item else []
        for blob in blobs:
            arr = np.frombuffer(blob, np.uint64)
            words = arr.copy() if words is None else (words | arr)
    return words.tobytes() if words is not None else b""


def build_bloom_distributed(ds, grams_fn, *, m_bits: int, k: int,
                            fanin: int = 8):
    """Distributed filter build, HLL-pattern with a pairwise OR tree:
    each batch emits one serialized partial filter; the fixed-size
    partials merge through ``fanin``-way ``ray.remote`` OR tasks so the
    driver holds O(1) sketches regardless of batch count (the round-2
    build take_all'd one m_bits partial per batch onto the driver —
    unguarded at 10^9-gram × many-batch scale)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        bf.add_many(grams_fn(t))
        return pa.table({"sketch": pa.array([bf.to_bytes()], pa.binary())})

    level = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    if not level:
        return BloomFilter(m_bits, k)
    or_task = ray.remote(_or_sketches)
    while len(level) > 1:
        level = [
            or_task.remote(*level[i:i + fanin])
            for i in range(0, len(level), fanin)
        ]
    root = ray.get(level[0])
    blob = _or_sketches(root) if isinstance(root, pa.Table) else root
    if not blob:  # every block was empty
        return BloomFilter(m_bits, k)
    return BloomFilter.from_bytes(blob, k)


def _emit_bloom_candidates(blob_ref, k: int, ngram: int):
    """Task-mode probe: per document, emit one ``(doc_id, g)`` row per
    DISTINCT gram that passes the Bloom filter. Misses short-circuit
    here — a doc whose every gram fails the filter contributes zero
    rows to the verify exchange (the one-sided guarantee: a failing
    gram is DEFINITELY not in the benchmark). The filter deserializes
    once per worker process via the module-level ref-keyed cache
    (``functions/joins.py:_bloom_probe_filter``), never per batch.

    The imports live HERE (driver-executed factory body), not inside
    ``fn``: the closure ships the callables by value, while a runtime
    relative import inside the worker-run ``fn`` would go through the
    import system and die on workers that can't import the repo path."""
    from ..functions.joins import _bloom_probe_filter
    from ..functions.tokens import tokens_series
    from ..pipelines.corpus_ops import _doc_ngrams

    def fn(t: pa.Table) -> pa.Table:
        bf = _bloom_probe_filter(blob_ref, k)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_ids: list[int] = []
        out_grams: list[str] = []
        for i, toks in enumerate(tokens_series(t["text"].to_pandas())):
            grams = sorted(_doc_ngrams(toks, ngram))
            if not grams:
                continue
            hit = bf.contains_many(grams)
            for j in np.flatnonzero(hit):
                out_ids.append(int(doc_ids[i]))
                out_grams.append(grams[j])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "g": pa.array(out_grams, pa.string()),
            }
        )

    return fn


def decontaminate_bloom(sf_dir: str, *, fpr: float = 0.01):
    """Exact-result twin of ``decontaminate_ngrams`` with the benchmark
    side held as a Bloom filter plus a distributed verify join instead
    of a broadcast literal set — the runtime-filter pattern of
    ``functions/joins.py:bloom_semi_anti_join``:

    1. the filter (sketch-sized, broadcast once) short-circuits the
       overwhelmingly common miss case per gram — those grams are
       DEFINITELY clean (one-sided error) and never enter the exchange;
    2. grams that PASS are re-verified exactly against the distributed
       benchmark gram table (bucketed semi join keyed on the gram), so
       Bloom false positives are eliminated and the output hash-matches
       the exact op / the DuckDB oracle row-for-row.

    Only ``corpus_grams x fpr + true contamination`` rows cross the
    verify shuffle; the corpus itself is scanned once.
    """
    import ray

    from ..functions.groups import count_partial, final_groupby_sum
    from ..functions.joins import (
        BROADCAST_ROW_LIMIT,
        broadcast_join,
        hash_join,
        semi_anti_join,
    )
    from ..pipelines.corpus_ops import (
        BENCH_MAX_DOC_ID,
        DECON_NGRAM,
        _doc_ngrams,
    )
    from ..pipelines.relational import _read

    bench = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr=f"doc_id < {BENCH_MAX_DOC_ID}"
    )

    from ..functions.tokens import tokens_series as _ts

    def grams_of(t: pa.Table) -> list[str]:
        out: list[str] = []
        for toks in _ts(t["text"].to_pandas()):
            out.extend(_doc_ngrams(toks, DECON_NGRAM))
        return out

    # size m from the ACTUAL gram count via a cheap pruned counting pass
    # (the benchmark side is eval-suite-sized): a fixed per-doc gram
    # allowance silently undersizes m for long benchmark docs, pushing
    # the realized FPR above the requested one
    n_grams = int(
        bench.map_batches(
            lambda t: pa.table(
                {"n": pa.array([len(grams_of(t))], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )
    proto = BloomFilter.sized_for(max(n_grams, 1024), fpr)

    bloom = build_bloom_distributed(
        bench, grams_of, m_bits=proto.m, k=proto.k
    )
    realized = bloom.theoretical_fpr(max(n_grams, 1))
    assert realized <= fpr * 1.05, (
        f"bloom sized for fpr={fpr} but theoretical fpr={realized:.4g}"
    )
    blob_ref = ray.put(bloom.to_bytes())

    # candidate pairs: one (doc_id, g) per distinct bloom-passing gram
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    candidates = ds.map_batches(
        _emit_bloom_candidates(blob_ref, bloom.k, DECON_NGRAM),
        batch_format="pyarrow",
    )

    # exact verify: bucketed semi join against the distributed benchmark
    # gram table (key column only crosses the wire) — kills Bloom FPs
    bench_grams = bench.map_batches(
        lambda t: pa.table({"g": pa.array(grams_of(t), pa.string())}),
        batch_format="pyarrow",
    )
    verified = semi_anti_join(candidates, bench_grams, on="g")

    # per-doc verified-gram count: batch partial + one small groupby
    # (the stream is candidate-pair-sized, not corpus-sized)
    counts = final_groupby_sum(
        verified.map_batches(
            count_partial("doc_id", "n_contaminated"),
            batch_format="pyarrow",
        ),
        ["doc_id"], ["n_contaminated"],
    )

    # left-join counts onto every document, size-routed like dim_join
    # (contaminated-doc count is output-sized; broadcast while provably
    # small, bucketed hash join beyond the limit)
    all_docs = _read(sf_dir, "documents", columns=["doc_id"])
    counts = counts.materialize()
    n_counts = counts.count()
    if n_counts == 0:
        joined = all_docs.map_batches(
            lambda t: t.append_column(
                "n_contaminated",
                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            ),
            batch_format="pyarrow",
        )
    elif n_counts <= BROADCAST_ROW_LIMIT:
        joined = broadcast_join(
            all_docs, counts.to_pandas(), on="doc_id", how="left"
        )
    else:
        joined = hash_join(all_docs, counts, on="doc_id", how="left")

    def finalize(t: pa.Table) -> pa.Table:
        # join misses surface as Arrow nulls (hash_join path) OR as
        # float64 NaN (pandas left-merge decay in the broadcast path) —
        # normalize both to int64 zero
        v = t["n_contaminated"].to_numpy(zero_copy_only=False)
        n = np.nan_to_num(
            np.asarray(v, dtype=np.float64), nan=0.0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)
                    .astype(np.int64), pa.int64()
                ),
                "n_contaminated": pa.array(n, pa.int64()),
                "contaminated": pa.array(
                    (n > 0).astype(np.int64), pa.int64()
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bloom_fp_calibration — measured vs one-sided-error contract
# ---------------------------------------------------------------------------

#: FIXED calibration geometry (data-independent so the SQL replica is a
#: static string): small enough that the fill ratio produces a
#: measurable false-positive population at every test sf
BLOOM_CAL_M = 1 << 12
BLOOM_CAL_K = 7

#: per-worker cache of the broadcast benchmark gram set, keyed by the
#: ObjectRef — the same task-mode broadcast-probe pattern as
#: functions/joins.py:_bloom_probe_filter (actor pools would reserve
#: CPUs; a second pool can deadlock the 4-CPU test fixture)
_CAL_BENCH_CACHE: dict = {}


def _cal_bench_set(bench_ref):
    import ray

    key = bench_ref.hex() if hasattr(bench_ref, "hex") else id(bench_ref)
    s = _CAL_BENCH_CACHE.get(key)
    if s is None:
        s = ray.get(bench_ref)
        _CAL_BENCH_CACHE.clear()
        _CAL_BENCH_CACHE[key] = s
    return s


def bloom_fp_calibration(sf_dir: str):
    """(n_probes, n_true_pos, n_bloom_pos, n_false_pos, fp_rate) — the
    acceptance gate for the decontamination Bloom tier: probe EVERY
    distinct corpus gram against a fixed-geometry filter built over the
    benchmark grams and measure the realized false-positive rate. The
    one-sided contract (``n_bloom_pos ≥ n_true_pos``, never a false
    negative) is what lets ``decontaminate_bloom`` short-circuit misses;
    this census quantifies the other side — how much verify-join
    traffic the false positives cost at the chosen m/k.

    Shape: the benchmark side is eval-suite-sized (built and broadcast
    once, the ``decontaminate_ngrams`` precedent); the probe pass runs
    over the globally-distinct gram table (one exchange) in task mode
    with per-worker ref-keyed caches, emitting 3 integer partial
    counters per batch. Hash-oracle-able because the filter IS md5
    double hashing — DuckDB rebuilds the bit set verbatim (HUGEINT
    arithmetic replicates numpy's mod-2^64 wraparound)."""
    import ray

    from ..functions.groups import final_groupby_sum
    from ..functions.tokens import sql_tokens, tokens_series
    from ..pipelines.corpus_ops import BENCH_MAX_DOC_ID, _doc_ngrams
    from ..pipelines.relational import _read

    bench_t = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr=f"doc_id < {BENCH_MAX_DOC_ID}"
    )
    grams: set[str] = set()
    for row in bench_t.take_all():  # bounded, eval-suite-sized
        grams |= _doc_ngrams(sql_tokens(row["text"]))
    bf = BloomFilter(BLOOM_CAL_M, BLOOM_CAL_K)
    bf.add_many(sorted(grams))
    blob_ref = ray.put(bf.to_bytes())
    bench_ref = ray.put(frozenset(grams))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        gs: set[str] = set()
        for toks in tokens_series(t["text"].to_pandas()):
            gs |= _doc_ngrams(toks)
        return pa.table({"g": pa.array(sorted(gs), pa.string())})

    distinct = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("g").count()  # one exchange → globally-distinct grams
    )

    from ..functions.joins import _bloom_probe_filter

    def probe(t: pa.Table) -> pa.Table:
        f = _bloom_probe_filter(blob_ref, BLOOM_CAL_K)
        bench = _cal_bench_set(bench_ref)
        gs = t["g"].to_pylist() if "g" in t.column_names else []
        if not gs:
            z = pa.array([], pa.int64())
            return pa.table({"k": z, "n_probes": z, "n_true_pos": z,
                             "n_bloom_pos": z})
        hit = f.contains_many(gs)
        true_pos = np.array([g in bench for g in gs], bool)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_probes": pa.array([len(gs)], pa.int64()),
                "n_true_pos": pa.array([int(true_pos.sum())], pa.int64()),
                "n_bloom_pos": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    agg = final_groupby_sum(
        distinct.map_batches(probe, batch_format="pyarrow"),
        ["k"], ["n_probes", "n_true_pos", "n_bloom_pos"],
    ).take_all()  # exactly one row
    n_probes = int(agg[0]["n_probes"])
    n_true = int(agg[0]["n_true_pos"])
    n_bloom = int(agg[0]["n_bloom_pos"])
    n_fp = n_bloom - n_true
    neg = n_probes - n_true
    return pa.table(
        {
            "n_probes": pa.array([n_probes], pa.int64()),
            "n_true_pos": pa.array([n_true], pa.int64()),
            "n_bloom_pos": pa.array([n_bloom], pa.int64()),
            "n_false_pos": pa.array([n_fp], pa.int64()),
            "fp_rate": pa.array(
                [0.0 if neg == 0 else float(np.round(n_fp / neg, 6))],
                pa.float64(),
            ),
        }
    )

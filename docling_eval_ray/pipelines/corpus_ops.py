"""Corpus-hygiene operators for training-data pipelines.

Beyond the reference's per-document metric maps (M20,
``evaluators/*_evaluator.py``), a 100-TB training-data pipeline needs
corpus-level quality and contamination controls. This module adds them
as Ray Data pipelines, every one DuckDB-oracled (pipelines/oracle.py):

- ``quality_repetition``  — Gopher-style repetition signals (duplicate
  token fraction, top-token fraction, top-bigram fraction) per document;
  one vectorized map_batches, no shuffle (each document is one row).
- ``decontaminate_ngrams`` — benchmark 8-gram overlap flagging (the
  standard train/eval decontamination step): benchmark n-gram set is
  bounded and broadcast once via ``ray.put``; the corpus streams.
- ``tfidf_topk``          — per-document top-k TF-IDF terms with a
  size-routed document-frequency side (broadcast dict under
  ``TFIDF_BROADCAST_MAX_VOCAB``, distributed hash-join + bucketed
  group-apply above it).
- ``token_heavy_hitters`` — Misra-Gries sketch per batch (mergeable
  summary, Agarwal et al. 2012) + exact verification pass; reports
  tokens with global count > total/HH_THETA exactly.
- ``stratified_sample``   — per-language deterministic hash sampling
  (md5-based, reproducible across engines).
- ``embedding_cluster_assign`` — nearest-centroid assignment against a
  fixed deterministic centroid matrix (the k-means "assign" half;
  broadcast centroids, per-batch float64 matmul).
- ``events_hopping``      — overlapping (hopping) window aggregate,
  size 1h / hop 30min: each event feeds exactly two windows
  (§2.9 stream-shaped, the hopping sibling of ``events_hourly``).
- ``pack_sequences``      — greedy fixed-capacity training-sequence
  packing, sequential within doc-id buckets, parallel across them.
- ``kmeans_assign``       — distributed Lloyd iterations (per-batch
  partial sum-vectors, driver-side k×d update) + final assignment;
  ``embedding_cluster_assign`` is its zero-iteration case.
- ``fixed_size_sample``   — exact-size per-stratum sample via mergeable
  partial top-n on md5-prefix order.
- ``dataset_split_assign`` / ``lang_mixture_weights`` /
  ``mixture_resample_census`` — deterministic train/val/test hash
  splits, mC4-temperature language mixture weights, and the hash-filter
  resample census at those weights (broadcast thresholds, no shuffle).

Scale notes: the only shuffles are the tiny partial→final groupbys
(token df, heavy-hitter partials, window partials); everything else is
a single streaming map_batches with broadcast small-side state. Token
aggregation is Arrow-native throughout (group_by / value_counts /
is_in) — see ``_token_table`` for why pandas hashtables are banned
here.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokens import md5_prefix32, sql_tokens, tokens_series
from .relational import _final_groupby, _read, _round_cols

# ---------------------------------------------------------------------------
# quality_repetition — Gopher-style repetition signals
# ---------------------------------------------------------------------------


def _token_table(t: pa.Table) -> pa.Table:
    """Exploded (doc_id, tok) Arrow table in document order.

    Tokenization is the Arrow replica of the SQL oracle's
    ``regexp_split_to_array(trim(text), '\\s+')`` (spaces-only trim, RE2
    regex, ``['']`` empty convention — see functions/tokens.py). All
    downstream aggregation stays in Arrow group_by/value_counts: pandas
    object hashtables (factorize/groupby/isin) conflate strings at
    embedded NUL bytes, Arrow does not."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim(t["text"], characters=" "), r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = pc.list_parent_indices(toks)
    doc_ids = t["doc_id"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    return pa.table(
        {"doc_id": doc_ids.take(parent), "tok": toks.flatten()}
    )


def quality_repetition(sf_dir: str):
    """Per-document repetition quality signals (Gopher §A1.1-style):
    ``n_tokens``, ``dup_token_frac`` (1 − distinct/total),
    ``top_token_frac`` (most frequent token's share) and
    ``top_bigram_frac`` (most frequent adjacent bigram's share of the
    n_tokens−1 bigram slots). Entirely per-row → one vectorized
    map_batches, no shuffle at any scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ex = _token_table(t)
        percount = pa.TableGroupBy(ex, ["doc_id", "tok"]).aggregate(
            [([], "count_all")]
        )
        stats = pa.TableGroupBy(
            percount.select(["doc_id", "count_all"]), ["doc_id"]
        ).aggregate(
            [("count_all", "sum"), ("count_all", "count"),
             ("count_all", "max")]
        )
        # adjacent bigrams within each doc (explode preserves order)
        ids = ex["doc_id"].to_numpy()
        same = pa.array(ids[1:] == ids[:-1])
        flat = ex["tok"]
        bg = pa.table(
            {
                "doc_id": pa.array(ids[:-1]).filter(same),
                "bg": pc.binary_join_element_wise(
                    flat.slice(0, max(len(flat) - 1, 0)).filter(same),
                    flat.slice(1).filter(same),
                    " ",
                ),
            }
        )
        bgc = pa.TableGroupBy(bg, ["doc_id", "bg"]).aggregate(
            [([], "count_all")]
        )
        bgm = pa.TableGroupBy(
            bgc.select(["doc_id", "count_all"]), ["doc_id"]
        ).aggregate([("count_all", "max")])
        bgm = bgm.rename_columns(["doc_id", "top_bg"])
        joined = stats.join(bgm, keys="doc_id", join_type="left outer")

        n = joined["count_all_sum"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nd = joined["count_all_count"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        top_c = joined["count_all_max"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        top_bg = np.nan_to_num(
            joined["top_bg"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(joined["doc_id"], pa.int64()),
                "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                "dup_token_frac": pa.array(
                    np.round(1.0 - nd / n, 6), pa.float64()
                ),
                "top_token_frac": pa.array(np.round(top_c / n, 6),
                                           pa.float64()),
                "top_bigram_frac": pa.array(
                    np.round(
                        np.where(n > 1, top_bg / np.maximum(n - 1, 1), 0.0), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decontaminate_ngrams — benchmark n-gram overlap
# ---------------------------------------------------------------------------

#: documents with doc_id below this form the "benchmark" (eval) set
BENCH_MAX_DOC_ID = 20
#: n-gram width for contamination checks (public convention: 8-13 tokens)
DECON_NGRAM = 8


def _doc_ngrams(tokens: list[str], n: int = DECON_NGRAM) -> set[str]:
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


class _ContaminationScorer:
    """Counts each document's distinct ``DECON_NGRAM``-grams that appear
    in the broadcast benchmark gram set (built once per actor from an
    object-store ref — the benchmark side is eval-suite-sized, never
    corpus-sized)."""

    def __init__(self, bench_ref):
        import ray

        self._bench: frozenset[str] = ray.get(bench_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        toks = tokens_series(b["text"])
        hits = np.array(
            [
                sum(g in self._bench for g in _doc_ngrams(t))
                for t in toks
            ],
            dtype=np.int64,
        )
        # int64 flag (0/1), not bool: the oracle dtype contract is
        # int64/float64/string
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_contaminated": hits,
                "contaminated": (hits > 0).astype(np.int64),
            }
        )


def decontaminate_ngrams(sf_dir: str):
    """Flag training documents sharing any 8-token n-gram with the
    benchmark set (doc_id < BENCH_MAX_DOC_ID). The benchmark gram set is
    built from a predicate-pushdown read of just those rows and broadcast
    once (``ray.put``); benchmark docs themselves trivially self-hit and
    stay in the output for determinism."""
    import ray

    bench_t = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr=f"doc_id < {BENCH_MAX_DOC_ID}"
    )
    grams: set[str] = set()
    for row in bench_t.take_all():  # benchmark side: bounded, eval-suite-sized
        grams |= _doc_ngrams(sql_tokens(row["text"]))
    bench_ref = ray.put(frozenset(grams))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.util import stage

    # actor pool: resolve the broadcast gram set once per actor, not per
    # batch (the dedup.py tier-A precedent)
    return stage(ds, _ContaminationScorer, args=(bench_ref,),
                 batch_format="pandas", concurrency=2)


# ---------------------------------------------------------------------------
# tfidf_topk — per-document top-k TF-IDF terms (size-routed df side)
# ---------------------------------------------------------------------------

TFIDF_K = 3
#: vocabulary sizes up to this broadcast the df map; larger vocabularies
#: route through the distributed hash join + bucketed group-apply
TFIDF_BROADCAST_MAX_VOCAB = 1_000_000


def _doc_token_counts(t: pa.Table) -> pd.DataFrame:
    """(doc_id, token, c, n) frame — Arrow group_by (NUL-safe), pandas
    only for the final scoring/sort conveniences."""
    ex = _token_table(t)
    tc = pa.TableGroupBy(ex, ["doc_id", "tok"]).aggregate([([], "count_all")])
    dl = pa.TableGroupBy(
        tc.select(["doc_id", "count_all"]), ["doc_id"]
    ).aggregate([("count_all", "sum")])
    joined = tc.join(dl, keys="doc_id")
    return pd.DataFrame(
        {
            "doc_id": joined["doc_id"].to_numpy(),
            "token": joined["tok"].to_pandas().to_numpy(),
            "c": joined["count_all"].to_numpy(),
            "n": joined["count_all_sum"].to_numpy(),
        }
    )


def _df_partial(t: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial: one row per distinct
    (doc, token), counted per token (Arrow group_by, NUL-safe)."""
    ex = _token_table(t)
    dist = pa.TableGroupBy(ex, ["doc_id", "tok"]).aggregate([])
    d = pa.TableGroupBy(dist.select(["tok"]), ["tok"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {"token": d["tok"], "df_part": pc.cast(d["count_all"], pa.int64())}
    )


def _topk_frame(sc: pd.DataFrame, k: int) -> pd.DataFrame:
    """(doc_id, token, s[, ...]) → top-k by (s desc, token asc) with
    1-based rank. `s` must be bit-identical to the oracle's (same IEEE
    op order), so ordering agrees."""
    sc = sc.sort_values(
        ["doc_id", "s", "token"], ascending=[True, False, True],
        kind="mergesort",
    )
    sc = sc.assign(rank=sc.groupby("doc_id", sort=False).cumcount() + 1)
    sc = sc[sc["rank"] <= k]
    return pd.DataFrame(
        {
            "doc_id": sc["doc_id"].to_numpy(),
            "token": sc["token"].to_numpy(),
            "rank": sc["rank"].to_numpy().astype(np.int64),
            "tfidf": np.round(sc["s"].to_numpy(), 6),
        }
    )


def tfidf_topk(sf_dir: str, *, k: int = TFIDF_K,
               broadcast_max_vocab: int = TFIDF_BROADCAST_MAX_VOCAB):
    """Per-document top-``k`` TF-IDF terms, ties broken by token.

    ``tf = c/len(doc)``; ``idf = N/df`` (rational — no transcendental,
    so the score is bit-identical to the SQL oracle's double arithmetic).
    The document-frequency side is one partial+final groupby (one row
    per token per batch crosses the shuffle); it is then size-routed:
    vocabulary ≤ ``broadcast_max_vocab`` → collected (vocab-sized, the
    documented gate) and broadcast into a single scoring map; larger →
    distributed ``hash_join`` on token + ``bucketed_group_apply`` per
    doc (no driver materialization of anything corpus-sized)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = float(ds.count())

    df_ds = (
        ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
        .materialize()
    )
    vocab = df_ds.count()

    if vocab <= broadcast_max_vocab:
        df_map = {r["token"]: r["df"] for r in df_ds.take_all()}
        df_ref = ray.put(df_map)

        class _Score:
            def __init__(self, ref):
                self._df = ray.get(ref)

            def __call__(self, t: pa.Table) -> pd.DataFrame:
                tc = _doc_token_counts(t)
                dfv = tc["token"].map(self._df).to_numpy().astype(np.float64)
                s = (tc["c"].to_numpy().astype(np.float64)
                     / tc["n"].to_numpy().astype(np.float64)) * (n_docs / dfv)
                return _topk_frame(tc.assign(s=s), k)

        from ..stages.util import stage

        # actor pool: deserialize the vocab→df dict once per actor, not
        # per batch (it is up to broadcast_max_vocab entries)
        return stage(ds, _Score, args=(df_ref,), batch_format="pyarrow",
                     concurrency=2)

    # distributed tier: (doc_id, token, c, n) ⋈ (token, df) then per-doc top-k
    from ..functions.groups import bucketed_group_apply
    from ..functions.joins import hash_join

    counts = ds.map_batches(_doc_token_counts, batch_format="pyarrow")
    joined = hash_join(counts, df_ds, "token")

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        s = (g["c"].to_numpy().astype(np.float64)
             / g["n"].to_numpy().astype(np.float64)) * (
                 n_docs / g["df"].to_numpy().astype(np.float64))
        return _topk_frame(g.assign(s=s), k)

    return bucketed_group_apply(joined, ["doc_id"], per_doc)


# ---------------------------------------------------------------------------
# token_heavy_hitters — Misra-Gries sketch + exact verification
# ---------------------------------------------------------------------------

#: MG capacity per batch summary; any token with global count > N/(HH_K+1)
#: survives the merged summaries, so HH_K ≥ HH_THETA makes the candidate
#: set a guaranteed superset of the exact answer
HH_K = 64
#: report tokens with count * HH_THETA > total token count
HH_THETA = 30


def _mg_prune(keys: np.ndarray, counts: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries prune of a pre-aggregated count vector to ≤ k
    entries: subtract the (k+1)-th largest count, drop non-positives.
    numpy-only (object keys never enter a pandas hashtable)."""
    if len(counts) <= k:
        return keys, counts
    kth = np.sort(counts)[::-1][k]
    keep = counts - kth > 0
    return keys[keep], counts[keep] - kth


def token_heavy_hitters(sf_dir: str, *, k: int = HH_K, theta: int = HH_THETA):
    """Exact frequent tokens (count > total/θ) via a two-pass
    sketch-then-verify plan that never shuffles raw tokens:

    1. per-batch Misra-Gries summaries (≤ k rows each) → groupby-sum
       merge; the merged candidate set is a guaranteed superset of the
       answer for k ≥ θ (mergeable-summaries bound) and is sketch-sized.
    2. exact counting pass restricted to the broadcast candidates plus a
       corpus token total, then the integer threshold filter
       ``c * θ > total`` (no float).
    """
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mg_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(_token_table(t)["tok"])
        toks, counts = _mg_prune(
            vc.field("values").to_numpy(zero_copy_only=False),
            vc.field("counts").to_numpy(zero_copy_only=False),
            k,
        )
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c_lb"))
    )
    cands = frozenset(r["token"] for r in merged.take_all())  # sketch-sized
    cand_ref = ray.put(cands)

    class _ExactCount:
        def __init__(self, ref):
            import ray as _ray

            # Arrow value_set: membership + counting stay in Arrow
            # kernels (pandas isin's object hashtable conflates strings
            # at NUL bytes)
            self._cands = pa.array(sorted(_ray.get(ref)), pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = _token_table(t)["tok"]
            hit = toks.filter(pc.is_in(toks, value_set=self._cands))
            vc = pc.value_counts(hit)
            n_cand = len(vc)
            # the corpus token total rides the same pass OUT-OF-BAND
            # (is_total flag column) — a real token can never collide
            # with it, unlike a sentinel token value
            return pa.table(
                {
                    "token": pa.concat_arrays(
                        [vc.field("values"), pa.array([""], pa.string())]
                    ),
                    "c": pa.array(
                        np.append(
                            vc.field("counts").to_numpy(
                                zero_copy_only=False
                            ),
                            len(toks),
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                    "is_total": pa.array(
                        np.append(np.zeros(n_cand, dtype=np.int64), 1),
                        pa.int64(),
                    ),
                }
            )

    from ..stages.util import stage

    exact = (
        stage(ds, _ExactCount, args=(cand_ref,), batch_format="pyarrow",
              concurrency=2)
        .groupby(["token", "is_total"])
        .aggregate(Sum("c", alias_name="n"))
    )
    tbl = exact.take_all()  # candidate-set-sized (output-sized)
    total = sum(r["n"] for r in tbl if r["is_total"])
    rows = [
        {"token": r["token"], "n": int(r["n"])}
        for r in tbl
        if not r["is_total"] and r["n"] * theta > total
    ]
    return pd.DataFrame(rows, columns=["token", "n"]).astype(
        {"token": str, "n": np.int64}
    )


# ---------------------------------------------------------------------------
# stratified_sample — per-language deterministic hash sampling
# ---------------------------------------------------------------------------

#: per-stratum sampling rates in percent (md5(text) % 100 < rate)
STRATA_RATES = {"en": 5, "zh": 40}
STRATA_DEFAULT_RATE = 20


def stratified_sample(sf_dir: str):
    """Language-stratified deterministic sample: down-weights the
    dominant stratum, up-weights the rare one (corpus mixing /
    rebalancing). Same md5-prefix hash as ``deterministic_sample`` so the
    choice is reproducible on any engine."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def fn(t: pa.Table) -> pa.Table:
        h = np.array(
            [md5_prefix32(s) % 100 for s in t["text"].to_pylist()],
            dtype=np.int64,
        )
        rates = np.array(
            [
                STRATA_RATES.get(lg, STRATA_DEFAULT_RATE)
                for lg in t["lang"].to_pylist()
            ],
            dtype=np.int64,
        )
        return t.select(["doc_id", "lang"]).filter(pa.array(h < rates))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding_cluster_assign — nearest-centroid assignment
# ---------------------------------------------------------------------------

N_CENTROIDS = 4
EMBED_DIM = 64


def cluster_centroids() -> np.ndarray:
    """Fixed deterministic centroid matrix (rational entries so the SQL
    literal reproduces the exact doubles)."""
    c = np.arange(N_CENTROIDS)[:, None]
    j = np.arange(EMBED_DIM)[None, :]
    return ((3 * c + 5 * j) % 13 - 6) / 6.0


def _assign(emb: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """THE cosine assignment kernel: (sims matrix, first-max argmax).
    Every consumer (embedding_cluster_assign, the kmeans partial and
    final passes) must share it — the SQL oracles replicate exactly this
    arithmetic, and a divergent copy would desynchronize silently."""
    sims = (emb @ cents.T) / (
        np.linalg.norm(emb, axis=1)[:, None]
        * np.linalg.norm(cents, axis=1)[None, :]
    )
    return sims, sims.argmax(axis=1)  # first max on ties = lowest cluster


def _assign_map(ds, cents: np.ndarray):
    """embeddings Dataset → (vec_id, cluster, sim) via one float64
    matmul per batch against the closure-captured centroid matrix."""

    def fn(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64
        )
        sims, best = _assign(emb, cents)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                "sim": pa.array(
                    np.round(sims[np.arange(len(best)), best], 6),
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def embedding_cluster_assign(sf_dir: str):
    """Assign every embedding to its max-cosine centroid (the assign
    half of k-means / the IVF cell router, over fixed centroids so the
    result is DuckDB-oracle-able) — ``kmeans_assign`` with zero Lloyd
    iterations, sharing its kernel."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return _assign_map(ds, cluster_centroids())


# ---------------------------------------------------------------------------
# events_hopping — overlapping window aggregate (size 1h, hop 30min)
# ---------------------------------------------------------------------------


def events_hopping(sf_dir: str):
    """Hopping-window aggregate: 1-hour windows every 30 minutes, so
    each event contributes to exactly two windows. Window fan-out +
    partial aggregation inside map_batches (2 rows per (type, window)
    per batch cross the shuffle), then the final groupby-sum."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = b["ts"].dt.floor("30min")
        rows = []
        for kshift in (0, 1):
            w = (f - pd.Timedelta(minutes=30 * kshift)).dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append(
                pd.DataFrame(
                    {
                        "event_type": b["event_type"],
                        "window_start": w,
                        "value": b["value"],
                    }
                )
            )
        both = pd.concat(rows, ignore_index=True)
        return both.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    final = _final_groupby(
        partials, ["event_type", "window_start"], ["n_events", "sum_value"]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_value": 2})
        return t.set_column(
            t.column_names.index("n_events"),
            "n_events",
            pc.cast(t["n_events"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pack_sequences — training-sequence packing (greedy, per-bucket)
# ---------------------------------------------------------------------------

#: token capacity of one packed training sequence
PACK_CAP = 256
#: documents per packing partition (doc_id // PACK_BUCKET); packing is
#: sequential BY DESIGN within a partition and embarrassingly parallel
#: across partitions — exactly how it runs on a cluster
PACK_BUCKET = 100
#: seq_id = bucket * PACK_SEQ_STRIDE + seq-within-bucket
PACK_SEQ_STRIDE = 100_000


def _greedy_pack(nt: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy first-fit-in-order packing: (seq_index, start_offset) per
    doc. Sequential by nature (each decision depends on the running
    fill) — the loop is per-bucket (≤ PACK_BUCKET rows), not per-corpus."""
    seq = np.empty(len(nt), dtype=np.int64)
    start = np.empty(len(nt), dtype=np.int64)
    s, cur = 0, 0
    for i, n in enumerate(nt):
        if cur > 0 and cur + n > cap:
            s += 1
            cur = 0
        seq[i] = s
        start[i] = cur
        cur += int(n)
    return seq, start


def pack_sequences(sf_dir: str, *, cap: int = PACK_CAP):
    """Pack documents (in doc_id order) into fixed-capacity training
    sequences, greedy within hash-bucket partitions: the standard
    sequence-packing step before LLM pre-training. Output one row per
    document: its sequence id and start offset inside the sequence.

    Scale shape: token counting is a streaming map; packing itself is a
    single bucketed group-apply keyed on ``doc_id // PACK_BUCKET`` —
    sequences never span partitions, so the operation stays
    embarrassingly parallel and resumable per partition."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def with_counts(t: pa.Table) -> pa.Table:
        # spaces-only trim: the SQL trim() replica (functions/tokens.py)
        trimmed = pc.utf8_trim(t["text"], characters=" ")
        n_tok = pc.add(pc.count_substring_regex(trimmed, r"\s+"), pa.scalar(1))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "bucket": pc.cast(
                    pc.floor(pc.divide(t["doc_id"], PACK_BUCKET)), pa.int64()
                ),
            }
        )

    counts = ds.map_batches(with_counts, batch_format="pyarrow")

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        seq, start = _greedy_pack(g["n_tokens"].to_numpy(), cap)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(),
                "seq_id": g["bucket"].to_numpy() * PACK_SEQ_STRIDE + seq,
                "seq_offset": start,
            }
        )

    from ..functions.groups import bucketed_group_apply

    return bucketed_group_apply(counts, ["bucket"], pack_bucket)


# ---------------------------------------------------------------------------
# kmeans_assign — 2 Lloyd iterations from the fixed centroids
# ---------------------------------------------------------------------------

KMEANS_ITERS = 2


def kmeans_assign(sf_dir: str, *, iters: int = KMEANS_ITERS):
    """Distributed Lloyd k-means (cosine assignment, mean update) for a
    fixed ``iters`` rounds starting from ``cluster_centroids()``; returns
    the final per-vector assignment + similarity.

    Each round is ONE streaming pass: map_batches emits per-cluster
    partial (sum-vector, count) pairs — k×d floats per batch — which a
    tiny groupby-sum merges; the k×d centroid update happens driver-side
    (output-sized) and re-broadcasts by closure. Nothing corpus-sized
    leaves the object store; the iterative-algorithm class the Dataset
    API lacks natively."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # consumed iters+1 times; vectors-only, column-pruned

    cents = _kmeans_centroids(ds, iters)
    return _assign_map(ds, cents)


def _kmeans_centroids(ds, iters: int) -> np.ndarray:
    """The Lloyd centroid loop shared by ``kmeans_assign`` and
    ``semdedup_prune``: ``iters`` rounds of (streamed partial sums →
    k-row groupby → driver-side k×d update) from ``cluster_centroids()``.
    Returns the final centroid matrix (output-sized driver state)."""
    from ray.data.aggregate import Sum

    cents = cluster_centroids()
    partial_schema = pa.schema(
        [("cluster", pa.int64()), ("n", pa.int64())]
        + [(f"s{j}", pa.float64()) for j in range(EMBED_DIM)]
    )
    for _ in range(iters):
        cur = cents

        def partials(t: pa.Table) -> pa.Table:
            rows = []
            if t.num_rows:
                emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
                    np.float64
                )
                _, best = _assign(emb, cur)
                for c in np.unique(best):
                    m = emb[best == c]
                    rows.append(
                        {
                            "cluster": int(c),
                            "n": int(m.shape[0]),
                            **{f"s{j}": float(v)
                               for j, v in enumerate(m.sum(0))},
                        }
                    )
            # explicit schema: an empty/missing-cluster batch must not
            # split the dataset into incompatible block schemas
            return pa.Table.from_pylist(rows, schema=partial_schema)

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("cluster")
            .aggregate(
                Sum("n", alias_name="n"),
                *[Sum(f"s{j}", alias_name=f"s{j}")
                  for j in range(EMBED_DIM)],
            )
        )
        new = cents.copy()
        for r in agg.take_all():  # k rows — output-sized
            c = int(r["cluster"])
            new[c] = np.array(
                [r[f"s{j}"] for j in range(EMBED_DIM)]
            ) / float(r["n"])
        cents = new

    return cents


# ---------------------------------------------------------------------------
# semdedup_prune — cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------

#: intra-cluster cosine threshold above which the later vector is pruned
SEMDEDUP_TAU = 0.35


def semdedup_prune(
    sf_dir: str, *, tau: float = SEMDEDUP_TAU, iters: int = KMEANS_ITERS
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + intra-cluster cosine pruning —
    pairwise similarity is only ever computed WITHIN a cluster, so the
    all-pairs corpus matmul the naive approach needs never happens.

    Deterministic keep rule (the paper keeps one exemplar per high-sim
    group; exemplar choice is unspecified there): a vector is pruned iff
    some LOWER ``vec_id`` vector in the SAME cluster has
    ``round_even(cosine, 6) > tau`` — the star-graph variant of the
    paper's greedy, re-derivable exactly in SQL (round-to-6 on both
    sides is the house FP convention; see ``embedding_near_dups_lsh``).

    Scale shape: one streamed k-means (shared ``_kmeans_centroids``
    loop), then ONE shuffle co-locating each cluster and a tiled
    lower-triangle matmul per cluster. Cluster size bounds the quadratic
    term: at corpus scale ``k`` grows with ``n`` (the paper uses 50k
    clusters for LAION; the IVF family's TARGET_CELL_ROWS sizing +
    skewed-cell re-split in ``stages/knn.py`` is the house pattern to
    reuse when a cluster outgrows one task).

    Returns (vec_id, cluster, kept 0/1) for every vector.
    """
    import ray.data as rd

    from ..functions.groups import bucketed_group_apply

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # consumed iters+1 times; vectors-only

    cents = _kmeans_centroids(ds, iters)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                }
            )
        emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64
        )
        _, best = _assign(emb, cents)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                "embedding": t["embedding"],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, cdf in g.groupby("cluster", sort=False):
            cdf = cdf.sort_values("vec_id")
            x = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            n = len(cdf)
            dropped = np.zeros(n, bool)
            # tiled lower triangle: row-tile i vs ALL earlier rows;
            # memory bounded by tile × cluster prefix, never n²
            tile = 4096
            for lo in range(0, n, tile):
                hi = min(lo + tile, n)
                sims = np.round(xn[lo:hi] @ xn[:hi].T, 6)
                # strictly-lower mask within the tile block
                cols = np.arange(hi)[None, :]
                rows = np.arange(lo, hi)[:, None]
                dropped[lo:hi] = ((sims > tau) & (cols < rows)).any(1)
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": cdf["vec_id"].to_numpy(),
                        "cluster": cdf["cluster"].to_numpy(),
                        "kept": (~dropped).astype(np.int64),
                    }
                )
            )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "cluster": pd.Series([], dtype=np.int64),
                    "kept": pd.Series([], dtype=np.int64),
                }
            )
        )

    return bucketed_group_apply(
        tagged, ["cluster"], prune, num_buckets=N_CENTROIDS
    )


# ---------------------------------------------------------------------------
# dsir_weights — hashed-bigram importance weights for data selection
# ---------------------------------------------------------------------------

#: hashed-bigram feature buckets (the paper uses 10^4; small here so the
#: SQL replica stays cheap — the shape is bucket-count-independent)
DSIR_BUCKETS = 512
#: the "target domain" distribution is this language stratum
DSIR_TARGET_LANG = "en"


def _bigram_buckets(t: pa.Table):
    """Shared hashed-bigram featurizer: adjacent-token bigrams per doc
    (the token_pmi_bigrams boundary-mask pattern), each hashed to
    ``md5_prefix32(w1 + " " + w2) % DSIR_BUCKETS``. Returns
    (bucket_ids, owning_row_index) flat arrays."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim(t["text"], characters=" "), r"\s+"
    )
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    if len(flat) < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ends = np.cumsum(lens)
    valid = np.ones(len(flat) - 1, dtype=bool)
    valid[ends[ends < len(flat)] - 1] = False
    grams = (
        pd.Series(flat[:-1][valid]).str.cat(
            pd.Series(flat[1:][valid]), sep=" "
        )
    ).to_numpy()
    rowidx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)[:-1][
        valid
    ]
    uniq, inv = np.unique(grams, return_inverse=True)
    # per-UNIQUE-gram md5 (vocab²-bounded, never the token stream)
    ub = np.fromiter(
        (md5_prefix32(s) % DSIR_BUCKETS for s in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return ub[inv], rowidx


def dsir_weights(
    sf_dir: str,
    *,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every document by the log-likelihood ratio of a hashed-bigram
    unigram model fit on the TARGET domain (here the ``target_lang``
    stratum) vs one fit on the RAW corpus — the data-selection op that
    upweights raw documents that look like the target distribution.
    Compose with ``weighted_sample_topk`` for the paper's resample step.

    Two streaming passes, both one scan: (fit) per-batch partial bucket
    counts for target and raw → one tiny groupby over ≤``n_buckets``
    keys → the add-1-smoothed per-bucket log-ratio vector computed
    driver-side (output-sized) and re-broadcast by closure; (score)
    per-doc integer dot product of bucket counts with the ratio vector.

    FP discipline: the per-bucket ratio is quantized ONCE to an int64
    micro-log (``round_even(1e6·Δ_b)`` — O(n_buckets) FIXED constants,
    verified identical in numpy and DuckDB ``ln``), so the per-doc
    score is an INTEGER sum — exact under any summation order on both
    the Ray and SQL sides (no ADVICE-style last-ulp ordering risk).

    Returns (doc_id, score_micro int64, n_bigrams int64) for EVERY doc
    (docs with <2 tokens score 0 over 0 bigrams)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def fit_partial(t: pa.Table) -> pa.Table:
        bk, rowidx = _bigram_buckets(t)
        raw = np.bincount(bk, minlength=n_buckets)
        is_t = (
            pc.equal(t["lang"], target_lang)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        tgt = np.bincount(bk[is_t[rowidx]], minlength=n_buckets)
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "n_t": pa.array(tgt[nz].astype(np.int64), pa.int64()),
                "n_r": pa.array(raw[nz].astype(np.int64), pa.int64()),
            }
        )

    counts = _final_groupby(
        ds.map_batches(fit_partial, batch_format="pyarrow"),
        ["bucket"],
        ["n_t", "n_r"],
    ).to_pandas()  # ≤ n_buckets rows — output-sized driver state
    n_t = np.zeros(n_buckets, np.int64)
    n_r = np.zeros(n_buckets, np.int64)
    if len(counts):
        n_t[counts["bucket"].to_numpy()] = counts["n_t"].to_numpy()
        n_r[counts["bucket"].to_numpy()] = counts["n_r"].to_numpy()
    tot_t, tot_r = float(n_t.sum()), float(n_r.sum())
    s = np.round(
        1e6
        * (
            np.log((n_t + 1.0) / (tot_t + n_buckets))
            - np.log((n_r + 1.0) / (tot_r + n_buckets))
        )
    ).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        bk, rowidx = _bigram_buckets(t)
        # int64 values ≤ ~2e7 summed ≤ ~1e3/doc: exact in float64
        sc = np.bincount(
            rowidx, weights=s[bk].astype(np.float64), minlength=t.num_rows
        ).astype(np.int64)
        nb = np.bincount(rowidx, minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score_micro": pa.array(sc, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fixed_size_sample — exact-size per-stratum deterministic sample
# ---------------------------------------------------------------------------

#: documents kept per language stratum
SAMPLE_PER_STRATUM = 30


def fixed_size_sample(sf_dir: str, *, n: int = SAMPLE_PER_STRATUM):
    """Exactly ``min(n, |stratum|)`` documents per language, chosen as
    the n smallest md5-prefix hashes (deterministic reservoir-style
    sample with an exact size guarantee, unlike the rate-based
    ``stratified_sample``).

    Scale shape: per-batch partial top-n per stratum (top-n is a
    mergeable summary — merging partials and re-taking top-n is exact),
    then one tiny grouped final pass over ≤ n × batches rows. The corpus
    never shuffles; only candidate rows do."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [md5_prefix32(s) for s in b["text"]], dtype=np.int64
        )
        cand = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(), "lang": b["lang"].to_numpy(),
             "h": h}
        )
        return (
            cand.sort_values(["lang", "h", "doc_id"], kind="mergesort")
            .groupby("lang", sort=False)
            .head(n)
        )

    cands = ds.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(["h", "doc_id"], kind="mergesort").head(n)
        return keep[["doc_id", "lang"]]

    from ..functions.groups import bucketed_group_apply

    return bucketed_group_apply(cands, ["lang"], final)


# ---------------------------------------------------------------------------
# source_quota_cap — bounded per-group top-N quota (corpus mixing)
# ---------------------------------------------------------------------------

#: max documents retained per source (each source holds 25×sf×1000 docs,
#: so the cap truncates at every scale)
SOURCE_QUOTA = 10


def source_quota_cap(sf_dir: str, *, quota: int = SOURCE_QUOTA):
    """(doc_id, source) — keep at most ``quota`` documents per source,
    ranked by doc_id ascending: the per-domain quota cap a corpus-mixing
    stage applies before packing. Same reduction shape as
    ``latest_event_per_user`` generalized to top-N: every batch keeps
    only its local per-source head (≤ |sources|×quota rows), one
    bucketed shuffle re-reduces the survivors — the corpus itself never
    crosses the exchange, and group skew is irrelevant because the
    partial output is quota-bounded per group per batch."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def head_q(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["source", "doc_id"], kind="mergesort")
        return b.groupby("source", sort=False).head(quota)

    survivors = ds.map_batches(head_q, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = head_q(g)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype(np.int64),
                "source": g["source"].to_numpy(),
            }
        )

    return bucketed_group_apply(survivors, ["source"], finish)


# ---------------------------------------------------------------------------
# exact_token_vocabulary — exact global count-distinct (HLL companion)
# ---------------------------------------------------------------------------


def exact_token_vocabulary(sf_dir: str):
    """One-row exact distinct-token count: the exact tier next to
    ``approx_token_vocabulary``'s HLL sketch. Per-batch distinct
    partial (explode → ``pc.unique``, so the shuffle moves one row per
    distinct token per batch), one groupby dedup on the token, one
    tiny count — the canonical exact COUNT(DISTINCT) at corpus scale.
    Route to the HLL sketch when the vocabulary itself stops fitting
    the exchange."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return pa.table({"tok": pc.unique(_token_table(t)["tok"])})

    toks = ds.map_batches(distinct_partial, batch_format="pyarrow")
    vocab = toks.groupby("tok").aggregate(Min("tok", alias_name="m"))
    n = vocab.count()
    return pd.DataFrame({"n_tokens_distinct": [np.int64(n)]})


# ---------------------------------------------------------------------------
# bm25_scores — Okapi BM25 retrieval scoring against a fixed query
# ---------------------------------------------------------------------------

#: fixed query terms (deterministic; present in the synthetic vocab)
BM25_QUERY = ("scan", "join", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(sf_dir: str):
    """Per-document Okapi BM25 score against the fixed ``BM25_QUERY``
    (public Robertson/Sparck-Jones formula, the retrieval twin of
    ``tfidf_topk``): ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b +
    b·dl/avgdl))`` with ``idf = ln((N−df+0.5)/(df+0.5) + 1)``. Only
    docs containing ≥1 query term appear (SQL's tf-join semantics).

    Distribution: docs never split across batches, so pass 1 emits
    FINAL per-doc rows (dl + one tf per term) with no shuffle; the
    materialized per-doc table is re-consumed by (a) a batch-partial +
    tiny-Sum global reduce for N/Σdl/df and (b) the broadcast-idf
    scoring map. Nothing corpus-sized reaches the driver — the globals
    are |terms|+2 numbers. Float path mirrors the oracle's expression
    tree exactly (lm_perplexity log precedent)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = list(BM25_QUERY)

    def perdoc(t: pa.Table) -> pa.Table:
        ex = _token_table(t)
        cols = {"doc_id": t["doc_id"],
                "dl": pc.cast(pc.list_value_length(
                    pc.split_pattern_regex(
                        pc.utf8_trim(t["text"], characters=" "), r"\s+"
                    )), pa.float64())}
        # per-term tf via one Arrow group_by over the exploded table
        tfs = pa.TableGroupBy(
            ex.filter(pc.is_in(ex["tok"], value_set=pa.array(terms))),
            ["doc_id", "tok"],
        ).aggregate([([], "count_all")])
        df = tfs.to_pandas().pivot_table(
            index="doc_id", columns="tok", values="count_all",
            aggfunc="sum", fill_value=0,
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for term in terms:
            v = (df[term].reindex(ids).fillna(0).to_numpy(np.float64)
                 if term in df.columns else np.zeros(len(ids)))
            cols[f"tf_{term}"] = pa.array(v, pa.float64())
        return pa.table(cols)

    stats = ds.map_batches(perdoc, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([float(len(t))], pa.float64()),
               "sdl": pa.array([pc.sum(t["dl"]).as_py() or 0.0],
                               pa.float64())}
        for term in terms:
            d = pc.sum(pc.cast(pc.greater(t[f"tf_{term}"], 0.0),
                               pa.int64())).as_py() or 0
            out[f"df_{term}"] = pa.array([float(d)], pa.float64())
        return pa.table(out)

    agg = stats.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c)
          for c in ["n", "sdl"] + [f"df_{t}" for t in terms]]
    )
    n = float(agg["n"] or 0.0)
    if n == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "bm25": pd.Series([], dtype=np.float64)})
    avgdl = agg["sdl"] / n
    idf = {t: float(np.log((n - agg[f"df_{t}"] + 0.5)
                           / (agg[f"df_{t}"] + 0.5) + 1.0))
           for t in terms}

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False)
        norm = BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avgdl)
        s = np.zeros(len(t), np.float64)
        any_tf = np.zeros(len(t), bool)
        for term in terms:  # fixed summation order
            tf = t[f"tf_{term}"].to_numpy(zero_copy_only=False)
            s = s + idf[term] * ((tf * (BM25_K1 + 1.0)) / (tf + norm))
            any_tf |= tf > 0
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()),
             "bm25": pa.array(np.round(s, 6), pa.float64())}
        ).filter(pa.array(any_tf))

    return stats.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token_fuzzy_pairs — blocked edit-distance vocabulary variant pairs
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2


def _lev(a: str, b: str) -> int:
    """Plain Wagner-Fischer; exact match for DuckDB ``levenshtein``."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def token_fuzzy_pairs(sf_dir: str, *, max_dist: int = FUZZY_MAX_DIST):
    """All distinct-vocabulary pairs within edit distance ``max_dist``
    (w1 < w2) — the spelling-variant / fuzzy-join shape of a corpus
    profiler.

    Distribution: the vocabulary is reduced exactly as in
    ``exact_token_vocabulary`` (per-batch distinct partials, one
    groupby dedup — the exchange moves distinct tokens per batch, not
    occurrences); each word then replicates to the LENGTH BANDS
    ``len..len+max_dist`` and pairs are evaluated only in the band
    equal to the longer word's length, so every qualifying pair is
    produced exactly once and every band holds only words within
    ``max_dist`` of its length (the classic band-join bound: edit
    distance ≥ length difference). In-band comparison is all-pairs
    Wagner-Fischer — at open-vocabulary scale, sub-block the bands by
    q-gram prefix before the quadratic step."""
    from ray.data.aggregate import Min

    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return pa.table({"tok": pc.unique(_token_table(t)["tok"])})

    vocab = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Min("tok", alias_name="m"))
        .select_columns(["tok"])
    )

    def to_bands(t: pa.Table) -> pa.Table:
        toks = t["tok"].to_pylist()
        words, bands = [], []
        for w in toks:
            for band in range(len(w), len(w) + max_dist + 1):
                words.append(w)
                bands.append(band)
        return pa.table({"tok": pa.array(words, pa.string()),
                         "band": pa.array(bands, pa.int64())})

    banded = vocab.map_batches(to_bands, batch_format="pyarrow")

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for band, sub in g.groupby("band", sort=False):
            ws = sorted(set(sub["tok"]))
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    a, b = ws[i], ws[j]
                    if max(len(a), len(b)) != band:
                        continue  # counted in its own max-length band
                    d = _lev(a, b)
                    if d <= max_dist:
                        out.append((a, b, d))
        return pd.DataFrame(
            {"w1": [o[0] for o in out], "w2": [o[1] for o in out],
             "d": np.array([o[2] for o in out], np.int64)}
        )

    res = bucketed_group_apply(banded, ["band"], pairs_in_band)
    df = res.to_pandas()  # pair-table-sized (vocab-bounded), not corpus
    if len(df) == 0:
        return pd.DataFrame({"w1": pd.Series([], dtype=str),
                             "w2": pd.Series([], dtype=str),
                             "d": pd.Series([], dtype=np.int64)})
    return df


# ---------------------------------------------------------------------------
# dataset_split_assign — deterministic hash train/val/test split census
# ---------------------------------------------------------------------------

#: md5(doc_id) % 100 thresholds: <80 train, <90 val, else test.
SPLIT_EDGES = (80, 90)


def dataset_split_assign(sf_dir: str):
    """Deterministic train/val/test split census per language: split =
    md5(doc_id) % 100 against ``SPLIT_EDGES`` — reproducible across
    engines and runs, stable under repartitioning, and independent of
    row order (the properties a corpus split must have; same md5-prefix
    device as ``deterministic_sample``). Streaming partial counts per
    batch; the final groupby is |split|×|lang|-sized."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        h = np.array(
            [md5_prefix32(str(i)) % 100 for i in t["doc_id"].to_pylist()],
            dtype=np.int64,
        )
        split = np.where(
            h < SPLIT_EDGES[0], "train",
            np.where(h < SPLIT_EDGES[1], "val", "test"),
        )
        df = pd.DataFrame(
            {"split": split, "lang": t["lang"].to_numpy(zero_copy_only=False)}
        )
        out = df.value_counts().rename("n_docs").reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["split", "lang"], ["n_docs"],
    ).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"split": pd.Series([], dtype=str),
             "lang": pd.Series([], dtype=str),
             "n_docs": pd.Series([], dtype=np.int64)}
        )
    return out


# ---------------------------------------------------------------------------
# lang_mixture_weights — temperature-scaled sampling weights per language
# ---------------------------------------------------------------------------

#: sampling temperature α: weight ∝ p_lang^α (α<1 upsamples the tail —
#: the multilingual mixing rule of mC4 / XLM-R).
MIXTURE_ALPHA = 0.3


def lang_mixture_weights(sf_dir: str):
    """Temperature-based language sampling weights for corpus mixing:
    w_l = p_l^α / Σ p^α with p_l the language's document share and
    α = ``MIXTURE_ALPHA`` (the mC4/XLM-R upsampling rule). One partial+
    final count groupby (language-domain-sized); the power/normalize
    step runs on the driver over the ≤|lang| rows."""
    from ..functions.groups import count_partial

    ds = _read(sf_dir, "documents", columns=["lang"])
    counts = _final_groupby(
        ds.map_batches(count_partial("lang", "n_docs"),
                       batch_format="pyarrow"),
        ["lang"], ["n_docs"],
    ).to_pandas()  # |lang| rows — domain-sized, not corpus-sized
    if len(counts) == 0:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=str),
             "n_docs": pd.Series([], dtype=np.int64),
             "weight": pd.Series([], dtype=np.float64)}
        )
    p = counts["n_docs"].to_numpy(np.float64) / counts["n_docs"].sum()
    pw = p ** MIXTURE_ALPHA
    counts["weight"] = np.round(pw / pw.sum(), 6)
    counts["n_docs"] = counts["n_docs"].astype(np.int64)
    return counts[["lang", "n_docs", "weight"]]


# ---------------------------------------------------------------------------
# mixture_resample_census — deterministic corpus resample at mixture weights
# ---------------------------------------------------------------------------

#: hash-space granularity for per-language keep thresholds.
RESAMPLE_SCALE = 1_000_000
#: salt so the resample hash is independent of dataset_split_assign's.
RESAMPLE_SALT = "#mix"


def mixture_resample_census(sf_dir: str):
    """Deterministic corpus resampling at the mC4 temperature-mixture
    rate: language l keeps each document with probability
    w_l / max(w) (the dominant language keeps everything; tail
    languages keep proportionally to their upsampled weight), decided
    by md5(doc_id + salt) — reproducible, order-independent, and
    shuffle-free on the corpus side. Composition of
    ``lang_mixture_weights`` (domain-sized count groupby → driver
    weight table → broadcast thresholds) with the hash-filter census
    pattern of ``dataset_split_assign``."""
    counts_df = lang_mixture_weights(sf_dir)
    if len(counts_df) == 0:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=str),
             "n_kept": pd.Series([], dtype=np.int64)}
        )
    w = counts_df["weight"].to_numpy(np.float64)
    frac = np.round(w / w.max(), 6)
    thresh = {
        lang: int(np.round(f * RESAMPLE_SCALE, 0))
        for lang, f in zip(counts_df["lang"], frac)
    }

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        h = np.array(
            [md5_prefix32(str(i) + RESAMPLE_SALT) % RESAMPLE_SCALE
             for i in t["doc_id"].to_pylist()],
            dtype=np.int64,
        )
        lim = np.array([thresh.get(la, 0) for la in lang], dtype=np.int64)
        kept = lang[h < lim]
        u, n = np.unique(kept, return_counts=True)
        return pa.table({"lang": pa.array(u),
                         "n_kept": pa.array(n.astype(np.int64), pa.int64())})

    out = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["lang"], ["n_kept"]
    ).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=str),
             "n_kept": pd.Series([], dtype=np.int64)}
        )
    return out


# ---------------------------------------------------------------------------
# weighted_sample_topk — deterministic weighted sampling without
# replacement (Efraimidis–Spirakis exponential race)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def weighted_sample_topk(sf_dir: str, *, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic weighted sample of ``k`` documents with inclusion
    probability ∝ ``n_chars`` — the data-mixing primitive for
    importance-weighted corpus subsetting. Efraimidis–Spirakis
    exponential race with a hash-derived uniform (public algorithm,
    IPL 2006): key = −ln(u)/w with u = (md5_prefix32(doc_id)+1)/2³²,
    take the k SMALLEST keys. Hash-deterministic, so it is exactly
    replicable in SQL (unlike rng-based sampling) and stable under
    re-partitioning.

    Scale shape: per-batch local top-k of the key (top-k is a mergeable
    summary — the ``fixed_size_sample`` discipline), then one
    k×batches-sized final merge; the corpus never shuffles. Keys round
    to 9 on BOTH sides before ranking (ties break by doc_id), the
    neardup_pagerank float discipline. Zero-weight rows are excluded on
    BOTH sides (numpy -ln(u)/0 is inf where SQL yields NULL — the
    filter pins the invariant; weight-0 rows are unsampleable anyway)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_chars"] > 0]
        u = (
            np.array([md5_prefix32(str(i)) for i in b["doc_id"]],
                     dtype=np.float64)
            + 1.0
        ) / 4294967296.0
        key = np.round(-np.log(u) / b["n_chars"].to_numpy(np.float64), 9)
        cand = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(),
             "n_chars": b["n_chars"].to_numpy(),
             "sample_key": key}
        )
        return cand.sort_values(
            ["sample_key", "doc_id"], kind="mergesort"
        ).head(k)

    cands = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = cands.sort_values(
        ["sample_key", "doc_id"], kind="mergesort"
    ).head(k).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
            "n_chars": pa.array(
                out["n_chars"].to_numpy(np.int64), pa.int64()
            ),
            "sample_key": pa.array(
                out["sample_key"].to_numpy(np.float64), pa.float64()
            ),
        }
    )


#: percentile-filter knobs: keep docs at or above this quantile of the
#: integer quality score (FineWeb-style corpus pruning)
QUALITY_FILTER_Q = 0.25
_QSCORE_LO, _QSCORE_HI = 3, 12  # "good token" length band


def _quality_scores(t: pa.Table) -> pa.Table:
    """Per-doc INTEGER quality score: percentage of tokens whose length
    falls in the [3, 12] band, floor-divided (integer score ⇒ the
    percentile threshold and the ≥ comparison are exact in both numpy
    and SQL — no float-tie hazard)."""
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    scores = np.empty(len(doc_ids), np.int64)
    for i, text in enumerate(t["text"].to_pylist()):
        toks = sql_tokens(text)
        good = sum(_QSCORE_LO <= len(tk) <= _QSCORE_HI for tk in toks)
        scores[i] = (100 * good) // len(toks)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.int64())}
    )


def quality_percentile_filter(sf_dir: str, *, q: float = QUALITY_FILTER_Q):
    """Corpus pruning by score percentile (the FineWeb-style "drop the
    worst quartile" step): keep every document whose quality score is ≥
    the corpus ``quantile_disc(q)`` of that score.

    The threshold is EXACT at any corpus size without a sort: the score
    domain is the integers 0..100, so a (score, count) census (streamed
    partials + a ≤101-row groupby) gives the order statistic by
    cumulative count — the shuffle-free histogram-rank plan
    (`lineitem_quantity_ranks` rationale). Scores are computed once and
    materialized (two int64 columns in the object store), then filtered
    with the scalar threshold closure — no second text scan, nothing
    corpus-sized on the driver. quantile_disc convention: value at index
    ceil(q·n)−1 of the sorted column (pinned by the existing quantile
    oracles).
    """
    import math

    import pyarrow.compute as _pc

    from ..functions.groups import count_partial, final_groupby_sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scores = ds.map_batches(
        _quality_scores, batch_format="pyarrow"
    ).materialize()
    census = final_groupby_sum(
        scores.map_batches(count_partial("score", "n"),
                           batch_format="pyarrow"),
        ["score"], ["n"],
    ).to_pandas()  # ≤101 rows
    if census.empty:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.int64())}
        )
    census = census.sort_values("score")
    n = int(census["n"].sum())
    rank = max(0, math.ceil(q * n) - 1)
    cum = census["n"].cumsum().to_numpy()
    thr = int(census["score"].to_numpy()[np.searchsorted(cum, rank + 1)])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(_pc.greater_equal(t["score"], thr))

    return scores.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# zipf_fit — Zipf's-law slope of the corpus token rank-frequency curve
# ---------------------------------------------------------------------------

#: regression points: top-K tokens by frequency (the head of the curve
#: is where Zipf holds; the tail is census noise at any corpus size)
ZIPF_TOPK = 256


def zipf_fit(sf_dir: str):
    """documents → one row (n_types, zipf_slope, zipf_intercept).

    Least-squares fit of ln(count) against ln(rank) over the top
    ``ZIPF_TOPK`` tokens — the corpus-statistics sanity check every
    pretraining-data report carries (natural text ⇒ slope ≈ −1;
    boilerplate-heavy or synthetic corpora bend it). One token census
    (the lm_perplexity exchange), a k×blocks partial top-k, then an
    output-sized (K points) closed-form regression on the driver with
    the SAME formula the SQL oracle evaluates."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        ex = _token_table(t)
        g = pa.TableGroupBy(ex.select(["tok"]), ["tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["tok"], "c_part": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="c"))
        .materialize()  # consumed twice: n_types count + top-k scan
    )
    n_types = int(counts.count())

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["c", "token"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(ZIPF_TOPK),
                                    preserve_index=False)

    top = (
        counts.map_batches(local_topk, batch_format="pyarrow")
        .sort(["c", "token"], descending=[True, False])
        .limit(ZIPF_TOPK)
        .to_pandas()  # K rows — output-sized
    )
    c = top["c"].to_numpy(np.float64)
    x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
    y = np.log(c)
    n = float(len(c))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            "n_types": pa.array([n_types], pa.int64()),
            "zipf_slope": pa.array([round(slope, 6)], pa.float64()),
            "zipf_intercept": pa.array([round(intercept, 6)],
                                       pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# ngram_novelty — per-document share of corpus-first shingles
# ---------------------------------------------------------------------------

NOVELTY_N = 5


def ngram_novelty(sf_dir: str, *, n: int = NOVELTY_N):
    """documents → (doc_id, n_shingles, n_novel, novelty).

    For every document: how many of its DISTINCT ``n``-token shingles
    appear in no lower-doc_id document (`novelty` = that share) — the
    content-freshness signal sitting between exact-substring dedup and
    MinHash (a doc whose shingles are all owned elsewhere is pure
    recombination). Shape: one exploded-shingle pass (Arrow-kernel
    window build, materialized once) feeds the (shingle → min doc_id)
    owner groupby — the only shingle-keyed exchange; because an owner
    always CONTAINS its shingle, per-doc novel counts come from a
    doc-keyed count over the owner table and total counts from a
    doc-keyed count over the pairs, merged by one small left join — no
    string-keyed join back to the corpus. Nothing corpus-sized on the
    driver; shingle strings cross the exchange once (the documented
    128-bit-digest knob from substring_dup_stats applies if shingle
    bytes ever dominate)."""
    from ray.data.aggregate import Min, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_pairs(t: pa.Table) -> pa.Table:
        """DISTINCT (doc_id, shingle) pairs for whole docs in this
        batch (docs never straddle batches — one row per doc). All
        string work stays in Arrow kernels: ``binary_join_element_wise``
        builds every window in one C++ pass (a Python object-array
        concat here was 10×+ the whole operator's budget at sf0.1)."""
        ex = _token_table(t)
        d = ex["doc_id"].to_numpy(zero_copy_only=False)
        if len(d) < n:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string())})
        toks = ex["tok"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        w = len(d) - n + 1
        keep = d[:w] == d[n - 1:]  # window stays in-doc
        sh = pc.binary_join_element_wise(
            *[toks.slice(i, w) for i in range(n)], " "
        )
        out = pa.table(
            {"doc_id": pa.array(d[:w], pa.int64()), "s": sh}
        ).filter(pa.array(keep))
        # DISTINCT within doc via Arrow group_by (no pandas hashtables)
        g = pa.TableGroupBy(out, ["doc_id", "s"]).aggregate([])
        return g

    pairs = ds.map_batches(
        shingle_pairs, batch_format="pyarrow"
    ).materialize()  # consumed twice: owner build + ownership join

    def min_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["s"]).aggregate([("doc_id", "min")])
        return pa.table({"s": g["s"], "own_part": g["doc_id_min"]})

    owners = (
        pairs.map_batches(min_partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Min("own_part", alias_name="owner"))
    )

    # No ownership JOIN back to the corpus-sized pairs table: a
    # shingle's min-doc_id owner necessarily CONTAINS the shingle, so
    # n_novel(d) = |{s : owner(s) = d}| — countable from the owner
    # table alone. Both per-doc counts ride ONE doc-keyed groupby (the
    # total partials and the novel partials are unioned with a 0 in the
    # other column) — one exchange instead of two groupbys + a join
    # (each extra Ray stage costs ~1.5-2 s fixed at sf0.1).
    def total_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["doc_id"]), ["doc_id"]).aggregate(
            [([], "count_all")]
        )
        c = pc.cast(g["count_all"], pa.int64())
        return pa.table({
            "doc_id": g["doc_id"], "tot": c,
            "nov": pa.array(np.zeros(len(c), np.int64)),
        })

    def owned_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["owner"]), ["owner"]
        ).aggregate([([], "count_all")])
        c = pc.cast(g["count_all"], pa.int64())
        return pa.table({
            "doc_id": g["owner"],
            "tot": pa.array(np.zeros(len(c), np.int64)),
            "nov": c,
        })

    both = pairs.map_batches(total_partial, batch_format="pyarrow").union(
        owners.map_batches(owned_partial, batch_format="pyarrow")
    )
    agg = both.groupby("doc_id").aggregate(
        Sum("tot", alias_name="n_shingles"),
        Sum("nov", alias_name="n_novel"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ns = t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = t["n_novel"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": pa.array(ns, pa.int64()),
                "n_novel": pa.array(nv, pa.int64()),
                "novelty": pa.array(
                    np.round(nv.astype(np.float64) / ns, 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# char_entropy_quality — compression-proxy quality banding
# ---------------------------------------------------------------------------

#: Shannon-entropy band edges (bits/char, on per-doc entropy rounded to
#: 6dp). Low-entropy text is repetitive/boilerplate, high-entropy text
#: is dense natural prose — the cheap stand-in for the zlib
#: compression-ratio quality signal every pretraining report carries
#: (CCNet §4.2 uses the LM-perplexity sibling; entropy needs no model).
ENTROPY_LOW = 4.05
ENTROPY_HIGH = 4.13


def char_entropy_quality(sf_dir: str):
    """documents → (lang, band, n_docs, mean_entropy).

    Per-document byte-level Shannon entropy (== character entropy on
    this ASCII corpus; the divergence on multi-byte text is documented
    here and in the oracle), banded low/mid/high at the fixed
    ``ENTROPY_LOW``/``ENTROPY_HIGH`` edges, then a (lang, band) census
    with the mean per-doc entropy. One streaming pass: the per-batch
    kernel is a single ``bincount`` over ``row_id*256 + byte`` straight
    off the Arrow utf8 buffers (zero Python per-row work), emitting one
    partial row per (lang, band) per batch, so the only exchange moves
    a ≤ 3·n_langs-row partial census. Banding compares the ROUNDED
    entropy on both sides so a last-ulp log2 summation difference
    cannot flip a band."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs_out, bands_out, n_out, s_out = [], [], [], []
        lang_all = t["lang"].to_numpy(zero_copy_only=False)
        row0 = 0
        col = t["text"]
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        for chunk in chunks:
            n = len(chunk)
            if n == 0:
                continue
            off = np.frombuffer(chunk.buffers()[1], np.int32)[
                chunk.offset : chunk.offset + n + 1
            ].astype(np.int64)
            data = np.frombuffer(chunk.buffers()[2], np.uint8)
            flat = data[off[0] : off[-1]].astype(np.int64)
            lens = np.diff(off)
            row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
            counts = np.bincount(
                row_id * 256 + flat, minlength=n * 256
            ).reshape(n, 256)
            p = counts / np.maximum(lens, 1)[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                term = np.where(p > 0.0, p * np.log2(p), 0.0)
            ent = np.round(-term.sum(axis=1), 6)
            band = np.where(
                ent < ENTROPY_LOW, "low",
                np.where(ent < ENTROPY_HIGH, "mid", "high"),
            )
            lang = lang_all[row0 : row0 + n]
            row0 += n
            key = pd.MultiIndex.from_arrays([lang, band])
            g = pd.Series(ent, index=key).groupby(level=[0, 1])
            s = g.sum()
            c = g.size()
            langs_out.extend(s.index.get_level_values(0))
            bands_out.extend(s.index.get_level_values(1))
            n_out.extend(c.to_numpy())
            s_out.extend(s.to_numpy())
        return pa.table(
            {
                "lang": pa.array(langs_out, pa.string()),
                "band": pa.array(bands_out, pa.string()),
                "n_docs": pa.array(np.asarray(n_out, np.int64)),
                "ent_sum": pa.array(np.asarray(s_out, np.float64)),
            }
        )

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "band"],
        ["n_docs", "ent_sum"],
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        es = t["ent_sum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": t["lang"],
                "band": t["band"],
                "n_docs": pa.array(nd, pa.int64()),
                "mean_entropy": pa.array(np.round(es / nd, 4), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# truncation_loss — context-length planning census
# ---------------------------------------------------------------------------

#: candidate context lengths (tokens) for the packing/truncation sweep
TRUNC_CTX_LENS = (64, 128, 256, 512)


def truncation_loss(sf_dir: str):
    """documents → (lang, ctx_len, n_docs, n_truncated, tokens_lost,
    tokens_total, loss_frac).

    The context-length planning sweep run before choosing a packing
    length: for each candidate ``ctx_len``, every document truncates at
    that many whitespace tokens and the census reports how many
    documents lose text and what fraction of the corpus' tokens fall
    off, per language. All counters are integers (token counts), so the
    only float — ``loss_frac = tokens_lost / tokens_total`` — divides
    two exact int64s identically on both engines. One streaming pass;
    the exchange moves |langs|·|ctx_lens| partial rows per batch."""
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(t["text"], characters=" ")
        n_tok = (
            pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lang = t["lang"].to_numpy(zero_copy_only=False)
        frames = []
        for ctx in TRUNC_CTX_LENS:
            lost = np.maximum(n_tok - ctx, 0)
            frames.append(
                pd.DataFrame(
                    {
                        "lang": lang,
                        "ctx_len": np.int64(ctx),
                        "n_docs": np.int64(1),
                        "n_truncated": (n_tok > ctx).astype(np.int64),
                        "tokens_lost": lost,
                        "tokens_total": n_tok,
                    }
                )
            )
        g = pd.concat(frames).groupby(
            ["lang", "ctx_len"], as_index=False, sort=False
        ).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "ctx_len"],
        ["n_docs", "n_truncated", "tokens_lost", "tokens_total"],
    )

    def finish(t: pa.Table) -> pa.Table:
        lost = t["tokens_lost"].to_numpy(zero_copy_only=False)
        tot = t["tokens_total"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "loss_frac",
            pa.array(np.round(lost / tot, 6), pa.float64()),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# source_drift_ks — two-sample Kolmogorov–Smirnov drift monitor
# ---------------------------------------------------------------------------


def source_drift_ks(sf_dir: str):
    """documents → (source, n_source, n_rest, ks_stat) — one row per
    source.

    The data-drift monitor a production ingest pipeline runs per feed:
    the two-sample Kolmogorov–Smirnov statistic between each source's
    ``n_chars`` distribution and the rest of the corpus,
    ``KS = max_x |F_src(x) − F_rest(x)|``. EXACT, no float CDFs until
    the final division: with integer cumulative counts the supremum is
    ``max |cum_src·n_rest − cum_rest·n_src|`` over the observed
    support, an int64 quantity both engines compute identically, and
    ``ks_stat`` divides it by ``n_src·n_rest`` once at the end
    (round 6).

    Shape: ONE partial+final groupby builds the (source, n_chars)
    census — the only exchange; the census is SUPPORT-sized (distinct
    values × sources, bounded by the value domain, not the corpus), so
    the driver-side ECDF sweep is output-sized state behind the same
    gate convention as the char-entropy bands."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["source", "n_chars"]), ["source", "n_chars"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "n_chars": g["n_chars"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    census = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "n_chars"],
        ["c"],
    ).to_pandas()  # support-sized (|values|×|sources|), never corpus-sized

    piv = (
        census.pivot_table(index="n_chars", columns="source", values="c",
                           aggfunc="sum", fill_value=0)
        .sort_index()
    )
    counts = piv.to_numpy(np.int64)          # |support| × |sources|
    cums = counts.cumsum(axis=0)
    n_src = counts.sum(axis=0)
    n_all = int(n_src.sum())
    cum_all = cums.sum(axis=1)
    sources = list(piv.columns)
    rows = []
    for j, s in enumerate(sources):
        ns = int(n_src[j])
        nr = n_all - ns
        cr = cum_all - cums[:, j]
        num = np.abs(cums[:, j] * nr - cr * ns)
        rows.append(
            (s, ns, nr, float(np.round(int(num.max()) / (ns * nr), 6)))
        )
    rows.sort()
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_source": pa.array([r[1] for r in rows], pa.int64()),
            "n_rest": pa.array([r[2] for r in rows], pa.int64()),
            "ks_stat": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# subsample_ci_mean — deterministic subsampling confidence interval
# ---------------------------------------------------------------------------

#: replicate count for the subsampling CI (Politis–Romano m-out-of-n
#: with m ≈ n/2 via a deterministic md5 coin — no RNG state to ship)
CI_REPS = 64


def subsample_ci_mean(sf_dir: str):
    """One row: (n_docs, mean_full, n_reps, ci_lo, ci_hi) — an
    uncertainty band for the corpus mean ``n_chars``.

    Every data-quality dashboard wants an error bar, not a point:
    ``CI_REPS`` half-subsample replicates (doc d belongs to replicate b
    iff ``md5("{d}-{b}")`` is even — deterministic, so the SQL oracle
    rebuilds the EXACT same membership, and reruns are reproducible at
    any cluster size with no RNG state), each replicate's mean is one
    int/int division, and the band is the 2nd-smallest / 2nd-largest
    replicate mean (≈ 3%–97% at 64 reps). Shape: one streaming pass
    emits ≤ ``CI_REPS+1`` integer partial rows per batch (sum, count
    per replicate + the full-corpus row), one tiny groupby, and a
    replicate-count-sized driver finish."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        member = np.zeros((len(dids), CI_REPS), dtype=bool)
        for i, d in enumerate(dids):
            for b in range(CI_REPS):
                member[i, b] = md5_prefix32(f"{d}-{b}") % 2 == 0
        bs = list(range(CI_REPS)) + [-1]
        s = list((member * nch[:, None]).sum(axis=0)) + [int(nch.sum())]
        c = list(member.sum(axis=0)) + [len(dids)]
        return pa.table(
            {
                "b": pa.array(bs, pa.int64()),
                "s": pa.array(np.asarray(s, np.int64), pa.int64()),
                "c": pa.array(np.asarray(c, np.int64), pa.int64()),
            }
        )

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["b"], ["s", "c"]
    ).to_pandas()  # ≤ CI_REPS+1 rows

    full = agg[agg["b"] == -1].iloc[0]
    reps = agg[(agg["b"] >= 0) & (agg["c"] > 0)]
    mus = np.sort(reps["s"].to_numpy(np.float64)
                  / reps["c"].to_numpy(np.float64))
    return pa.table(
        {
            "n_docs": pa.array([int(full["c"])], pa.int64()),
            "mean_full": pa.array(
                [float(np.round(full["s"] / full["c"], 6))], pa.float64()
            ),
            "n_reps": pa.array([len(mus)], pa.int64()),
            "ci_lo": pa.array([float(np.round(mus[1], 6))], pa.float64()),
            "ci_hi": pa.array([float(np.round(mus[-2], 6))], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# split_contamination_audit — cross-split n-gram leakage census
# ---------------------------------------------------------------------------


def split_contamination_audit(sf_dir: str):
    """(split, n_docs, n_contaminated, shingle_hits,
    contamination_rate) — the leakage audit run AFTER a split is
    assigned: for each held-out split (val/test under
    ``dataset_split_assign``'s md5 rule), how many docs share at least
    one verbatim ``DECON_NGRAM``-gram with ANY train doc, and how many
    distinct-per-doc shingles hit. This is the measurement that
    motivates ``leakage_safe_split``: a naive per-doc split leaves
    near-identical text straddling the boundary and this census makes
    that visible.

    Shape: the train side is corpus-sized, so NO broadcast — the
    shingle stream (one row per distinct (doc, gram)) takes ONE
    exchange bucketed on the gram (``bucketed_group_apply``); each
    bucket marks grams train-present vectorized and emits per-doc hit
    partials, so nothing corpus-sized is ever collected. Per-doc hits
    fold through a doc-keyed groupby into ≤ |splits| rows; all counts
    are integers and the one ratio divides at the end."""
    from ..functions.groups import bucketed_group_apply, final_groupby_sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split_of(doc_id: int) -> str:
        b = md5_prefix32(str(doc_id)) % 100
        if b < SPLIT_EDGES[0]:
            return "train"
        return "val" if b < SPLIT_EDGES[1] else "test"

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = tokens_series(b["text"])
        ids, splits, grams = [], [], []
        for i, lst in zip(b["doc_id"].to_numpy(), toks):
            sp = split_of(int(i))
            for g in _doc_ngrams(lst):
                ids.append(int(i))
                splits.append(sp)
                grams.append(g)
        return pd.DataFrame(
            {
                "g": pd.Series(grams, dtype=object),
                "doc_id": pd.Series(ids, dtype=np.int64),
                "split": pd.Series(splits, dtype=object),
            }
        )

    ex = ds.map_batches(explode, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_train = (df["split"] == "train").to_numpy()
        has_train = (
            pd.Series(is_train.astype(np.int64))
            .groupby(df["g"].to_numpy()).transform("max").to_numpy()
        )
        held = df[(~is_train) & (has_train == 1)]
        out = (
            held.groupby(["doc_id", "split"], as_index=False)
            .size().rename(columns={"size": "n_hit"})
        )
        # typed Arrow out: an empty pandas object column trips Ray's
        # block-size estimator (np.vectorize on size-0 input)
        return pa.table(
            {
                "doc_id": pa.array(
                    out["doc_id"].to_numpy(np.int64), pa.int64()
                ),
                "split": pa.array(out["split"].astype(object),
                                  pa.string()),
                "n_hit": pa.array(
                    out["n_hit"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    per_doc = final_groupby_sum(
        bucketed_group_apply(ex, ["g"], bucket),
        ["doc_id", "split"], ["n_hit"],
    )

    def split_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "split" not in t.column_names:
            return pa.table(
                {"split": pa.array([], pa.string()),
                 "n_contaminated": pa.array([], pa.int64()),
                 "shingle_hits": pa.array([], pa.int64())}
            )
        df = (
            t.to_pandas().groupby("split", as_index=False)
            .agg(n_contaminated=("doc_id", "size"),
                 shingle_hits=("n_hit", "sum"))
        )
        for c in ("n_contaminated", "shingle_hits"):
            df[c] = df[c].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    cont = {
        r["split"]: r
        for r in final_groupby_sum(
            per_doc.map_batches(split_partial, batch_format="pyarrow"),
            ["split"], ["n_contaminated", "shingle_hits"],
        ).take_all()  # ≤ 2 rows
    }

    def census_partial(t: pa.Table) -> pa.Table:
        sp = [split_of(int(i)) for i in t["doc_id"].to_pylist()]
        df = pd.DataFrame({"split": pd.Series(sp, dtype=object)})
        df = df[df["split"] != "train"]
        out = df.value_counts().rename("n_docs").reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    census = final_groupby_sum(
        _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
            census_partial, batch_format="pyarrow"
        ),
        ["split"], ["n_docs"],
    ).take_all()  # ≤ 2 rows

    splits, nd, nc, sh, rate = [], [], [], [], []
    for row in sorted(census, key=lambda r: r["split"]):
        c = cont.get(row["split"], {})
        n = int(row["n_docs"])
        k = int(c.get("n_contaminated", 0))
        splits.append(row["split"])
        nd.append(n)
        nc.append(k)
        sh.append(int(c.get("shingle_hits", 0)))
        rate.append(float(np.round(k / n, 6)))
    return pa.table(
        {
            "split": pa.array(splits, pa.string()),
            "n_docs": pa.array(nd, pa.int64()),
            "n_contaminated": pa.array(nc, pa.int64()),
            "shingle_hits": pa.array(sh, pa.int64()),
            "contamination_rate": pa.array(rate, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# quality_perplexity_corr — do the two quality signals agree?
# ---------------------------------------------------------------------------


def quality_perplexity_corr(sf_dir: str):
    """(n_docs, n_cells, r_pearson) — Pearson correlation between the
    two quality signals the pipeline computes independently: unigram-LM
    cross-entropy (``lm_perplexity``, CCNet-style) and the integer
    token-length-band score (``quality_percentile_filter``'s
    ``_quality_scores``). Production corpora check this before stacking
    filters — two highly-correlated signals prune the same docs twice.

    Float-parity shape: per-doc ce is quantized to integer CENTS
    (``round_even(ce6 · 100)`` on both engines from the identical
    6dp-rounded double), the score is already an integer, and the
    corpus collapses to a (cents, score, n) CENSUS — the only
    corpus-sized arithmetic is integer counting, so the Pearson moments
    are exact Python bigints on the driver and the single
    float division + sqrt happens once, identically ordered on both
    engines. Shape: the text rides ``lm_perplexity``'s scoring pass via
    ``extra_doc_cols`` (no second corpus scan, no doc-keyed join); the
    census groupby moves one row per occupied grid cell per batch."""
    import math

    from ..functions.groups import final_groupby_sum
    from .cleaning import lm_perplexity  # driver-side factory import

    scored = lm_perplexity(sf_dir, extra_doc_cols=("text",))

    def census_partial(df: pd.DataFrame) -> pa.Table:
        cents = np.round(
            df["cross_entropy"].to_numpy() * 100.0
        ).astype(np.int64)
        scores = np.empty(len(df), np.int64)
        for i, text in enumerate(df["text"]):
            toks = sql_tokens(text)
            good = sum(_QSCORE_LO <= len(tk) <= _QSCORE_HI for tk in toks)
            scores[i] = (100 * good) // len(toks)
        out = (
            pd.DataFrame({"cents": cents, "score": scores})
            .groupby(["cents", "score"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "cents": pa.array(out["cents"].to_numpy(np.int64),
                                  pa.int64()),
                "score": pa.array(out["score"].to_numpy(np.int64),
                                  pa.int64()),
                "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    census = final_groupby_sum(
        scored.map_batches(census_partial, batch_format="pandas"),
        ["cents", "score"], ["n"],
    ).take_all()  # grid-domain-sized (ce cents × 101 scores), gated

    n = sx = sy = sxy = sxx = syy = 0
    for r in census:
        x, y, w = int(r["cents"]), int(r["score"]), int(r["n"])
        n += w
        sx += w * x
        sy += w * y
        sxy += w * x * y
        sxx += w * x * x
        syy += w * y * y
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 == 0 or d2 == 0:
        r_p = 0.0
    else:
        r_p = float(np.round(
            float(n * sxy - sx * sy) / math.sqrt(float(d1 * d2)), 6
        ))
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(census)], pa.int64()),
            "r_pearson": pa.array([r_p], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# vocab_coverage_curve — token-stream coverage of a top-N vocabulary
# ---------------------------------------------------------------------------

#: candidate vocabulary sizes for the coverage curve (the small Ns
#: resolve real structure on the driver corpus's compact vocabulary;
#: the large one exercises the N > |vocab| clamp)
COVERAGE_NS = (4, 8, 16, 4096)


def vocab_coverage_curve(sf_dir: str):
    """(top_n, vocab_size, covered, total, coverage) — what fraction of
    the token stream a top-N frequency vocabulary captures, for each
    candidate N. The sizing question every tokenizer/vocab design asks
    before committing: the curve's knee is where bigger vocabularies
    stop paying. Ranking ties break by token text, so the curve is
    deterministic on both engines.

    Shape: ONE vocabulary census (one row per distinct token per batch
    crosses the groupby); the ranked head is ``max(COVERAGE_NS)`` rows
    (output-sized driver state via sort+limit — never the full
    vocabulary), the stream total is a scalar aggregate, and coverage
    is integer counts with one division per N."""
    from ..functions.groups import final_groupby_sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def census_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_trim(t["text"], characters=" "), r"\s+"
            )
        )
        vc = pc.value_counts(toks)
        return pa.table(
            {"token": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    census = final_groupby_sum(
        ds.map_batches(census_partial, batch_format="pyarrow"),
        ["token"], ["n"],
    ).materialize()  # consumed 3× (total, vocab size, ranked head)

    total = int(census.sum("n"))
    vocab = int(census.count())
    head = (
        census.sort(["n", "token"], descending=[True, False])
        .limit(max(COVERAGE_NS))
        .to_pandas()["n"].to_numpy(np.int64)
    )
    cum = np.concatenate([[0], np.cumsum(head)])

    tops, sizes, covs, tots, fracs = [], [], [], [], []
    for top_n in COVERAGE_NS:
        k = min(top_n, len(head))
        tops.append(top_n)
        sizes.append(min(top_n, vocab))
        covs.append(int(cum[k]))
        tots.append(total)
        fracs.append(float(np.round(cum[k] / total, 6)))
    return pa.table(
        {
            "top_n": pa.array(tops, pa.int64()),
            "vocab_size": pa.array(sizes, pa.int64()),
            "covered": pa.array(covs, pa.int64()),
            "total": pa.array(tots, pa.int64()),
            "coverage": pa.array(fracs, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# cluster_label_purity — external clustering evaluation
# ---------------------------------------------------------------------------


def _kmeans_label_census(sf_dir: str) -> list[dict]:
    """(cluster, label, n) census rows over the Lloyd assignment — the
    shared contingency table behind ``cluster_label_purity`` and
    ``clustering_ari``. Labels ride the assignment pass (no vec_id
    join); driver state is ≤ k·|labels| rows."""
    import ray.data as rd

    from ..functions.groups import final_groupby_sum

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    ).materialize()  # consumed iters+1 times (Lloyd) + once (assign)

    cents = _kmeans_centroids(ds, KMEANS_ITERS)

    def assign_census(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64
        )
        _, best = _assign(emb, cents)
        df = (
            pd.DataFrame(
                {
                    "cluster": best.astype(np.int64),
                    "label": t["label"].to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64),
                }
            )
            .groupby(["cluster", "label"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return final_groupby_sum(
        ds.map_batches(assign_census, batch_format="pyarrow"),
        ["cluster", "label"], ["n"],
    ).take_all()  # ≤ k·|labels| rows


def cluster_label_purity(sf_dir: str):
    """(cluster, n_vecs, n_labels, top_label, n_top, purity) — the
    external evaluation every clustering step gets before it's trusted
    for SemDeDup-style pruning or IVF routing: per k-means cluster, how
    concentrated are the ground-truth labels (majority-label share;
    ties break to the smaller label deterministically).

    Shape: the Lloyd loop is the existing ``_kmeans_centroids``
    (streamed partial sums, k-row groupbys, driver-side k×d update);
    the labels ride the SAME assignment pass (no vec_id join), which
    emits per-batch (cluster, label) count partials straight into a
    ≤ k·|labels| census — driver state is census-sized."""
    census = _kmeans_label_census(sf_dir)

    by_cluster: dict[int, list[tuple[int, int]]] = {}
    for r in census:
        by_cluster.setdefault(int(r["cluster"]), []).append(
            (int(r["label"]), int(r["n"]))
        )
    cl, nv, nl, tl, nt, pu = [], [], [], [], [], []
    for c in sorted(by_cluster):
        pairs = by_cluster[c]
        tot = sum(n for _, n in pairs)
        top_label, top_n = min(pairs, key=lambda p: (-p[1], p[0]))
        cl.append(c)
        nv.append(tot)
        nl.append(len(pairs))
        tl.append(top_label)
        nt.append(top_n)
        pu.append(float(np.round(top_n / tot, 6)))
    return pa.table(
        {
            "cluster": pa.array(cl, pa.int64()),
            "n_vecs": pa.array(nv, pa.int64()),
            "n_labels": pa.array(nl, pa.int64()),
            "top_label": pa.array(tl, pa.int64()),
            "n_top": pa.array(nt, pa.int64()),
            "purity": pa.array(pu, pa.float64()),
        }
    )


def clustering_ari(sf_dir: str):
    """(n_vecs, sum_pairs_cells, sum_pairs_rows, sum_pairs_cols, ari) —
    the Adjusted Rand Index between the Lloyd clustering and the
    ground-truth labels: chance-corrected pair agreement, the standard
    external clustering score alongside ``cluster_label_purity``.

    Float-parity shape: everything is pair-counting combinatorics over
    the SAME (cluster, label) contingency census
    (``_kmeans_label_census``), so the ARI reduces to the cleared
    integer-rational form
    ``(N2·Sij − Sa·Sb) / (N2·(Sa+Sb)/2 − Sa·Sb)`` with
    ``S = Σ k(k−1)`` (always even) and ``N2 = n(n−1)`` — exact bigint
    arithmetic on both engines, ONE double division at the end (the
    filter_agreement_kappa recipe)."""
    census = _kmeans_label_census(sf_dir)

    n = sum(int(r["n"]) for r in census)
    sij = sum(int(r["n"]) * (int(r["n"]) - 1) for r in census)
    rows: dict[int, int] = {}
    cols: dict[int, int] = {}
    for r in census:
        rows[int(r["cluster"])] = rows.get(int(r["cluster"]), 0) + int(r["n"])
        cols[int(r["label"])] = cols.get(int(r["label"]), 0) + int(r["n"])
    sa = sum(a * (a - 1) for a in rows.values())
    sb = sum(b * (b - 1) for b in cols.values())
    n2 = n * (n - 1)
    num = n2 * sij - sa * sb
    den = n2 * (sa + sb) // 2 - sa * sb
    # float() each operand FIRST (mirrors SQL's CAST-then-divide; a raw
    # bigint / would be correctly-rounded and could differ past 2^53)
    ari = 0.0 if den == 0 else float(np.round(float(num) / float(den), 6))
    return pa.table(
        {
            "n_vecs": pa.array([n], pa.int64()),
            "sum_pairs_cells": pa.array([sij // 2], pa.int64()),
            "sum_pairs_rows": pa.array([sa // 2], pa.int64()),
            "sum_pairs_cols": pa.array([sb // 2], pa.int64()),
            "ari": pa.array([ari], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# curriculum_stage_assign — easy→hard training-order assignment
# ---------------------------------------------------------------------------

#: number of curriculum stages
CURRICULUM_STAGES = 4


def curriculum_stage_assign(sf_dir: str):
    """(doc_id, score, stage) — curriculum-learning order: docs ranked
    easy→hard by the integer quality score (high score = easy, doc_id
    tiebreak), then cut into ``CURRICULUM_STAGES`` equal global stages
    with the exact NTILE-free formula ``((rn−1)·S) // n``. Stage 0 is
    the warm-up slice a curriculum schedule feeds first.

    Shape: ranking rides ONE composite-key ``global_row_number``
    (key = (100−score)·2⁴⁰ + doc_id — the ``perplexity_buckets``
    device; ascending key == score desc, doc_id asc; doc_id < 2⁴⁰
    assumed, as there) — a range-partitioned rank, one exchange, no
    full sort. The stage cut is integer arithmetic on the rank."""
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scores = ds.map_batches(_quality_scores, batch_format="pyarrow")

    def with_key(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy()
        d = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score": t["score"],
                "k": pa.array(
                    (100 - s) * (np.int64(1) << 40) + d, pa.int64()
                ),
            }
        )

    keyed = scores.map_batches(with_key, batch_format="pyarrow")
    ranked = global_row_number(keyed, "k")
    n = ranked.count()

    def finish(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy()
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "score": pc.cast(t["score"], pa.int64()),
                "stage": pa.array(
                    ((rn - 1) * CURRICULUM_STAGES) // n, pa.int64()
                ),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def token_ttr_by_source(sf_dir: str):
    """(source, n_tokens, n_types, ttr) — per-source type-token ratio,
    the lexical-diversity census a corpus card reports per slice: low
    TTR flags template-generated or boilerplate-heavy sources before
    they flood the training mix.

    Shape: per-batch distinct (source, token) count partials → ONE
    vocabulary-keyed groupby (one row per distinct pair per batch
    crosses the wire) → a second |sources|-sized groupby folds the
    token-level census into type/token counts. Integer counts, one
    division per source at the end."""
    from ..functions.groups import final_groupby_sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim(t["text"], characters=" "), r"\s+"
        )
        parent = pc.list_parent_indices(toks)
        src = t["source"].combine_chunks() if isinstance(
            t["source"], pa.ChunkedArray) else t["source"]
        df = (
            pd.DataFrame(
                {
                    "source": src.take(parent).to_numpy(
                        zero_copy_only=False
                    ),
                    "token": pc.list_flatten(toks).to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby(["source", "token"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    census = final_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "token"], ["n"],
    )

    def fold(t: pa.Table) -> pa.Table:
        df = (
            t.select(["source", "n"]).to_pandas()
            .groupby("source", as_index=False)
            .agg(n_tokens=("n", "sum"), n_types=("n", "size"))
        )
        for c in ("n_tokens", "n_types"):
            df[c] = df[c].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = final_groupby_sum(
        census.map_batches(fold, batch_format="pyarrow"),
        ["source"], ["n_tokens", "n_types"],
    )

    def finish(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy()
        ty = t["n_types"].to_numpy()
        return pa.table(
            {
                "source": pc.cast(t["source"], pa.string()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "n_types": pc.cast(t["n_types"], pa.int64()),
                "ttr": pa.array(np.round(ty / nt, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pack_efficiency_report(sf_dir: str):
    """(n_docs, n_seqs, tokens_total, capacity_total, n_oversized,
    fill_rate) — the packing-efficiency summary a pre-training run
    reports after ``pack_sequences``: how much of the fixed
    ``PACK_CAP``-token sequence budget is real tokens vs padding, and
    how many oversized docs occupy a sequence alone (they inflate
    ``fill_rate`` past their cap slot, documented). Low fill means the
    packer wastes accelerator steps on padding.

    Shape: consumes the packing pipeline's output stream; every
    aggregate is an integer partial per batch (a sequence is counted by
    its UNIQUE offset-0 member, so no distinct-count exchange), folded
    by a 1-row groupby. One division at the end."""
    from ..functions.groups import final_groupby_sum

    packed = pack_sequences(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy()
        st = t["seq_offset"].to_numpy()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_docs": pa.array([len(nt)], pa.int64()),
                "n_seqs": pa.array([int((st == 0).sum())], pa.int64()),
                "tokens_total": pa.array([int(nt.sum())], pa.int64()),
                "n_oversized": pa.array(
                    [int((nt > PACK_CAP).sum())], pa.int64()
                ),
            }
        )

    agg = final_groupby_sum(
        packed.map_batches(partial, batch_format="pyarrow"),
        ["k"], ["n_docs", "n_seqs", "tokens_total", "n_oversized"],
    ).take_all()[0]
    n_seqs = int(agg["n_seqs"])
    tokens = int(agg["tokens_total"])
    cap = n_seqs * PACK_CAP
    return pa.table(
        {
            "n_docs": pa.array([int(agg["n_docs"])], pa.int64()),
            "n_seqs": pa.array([n_seqs], pa.int64()),
            "tokens_total": pa.array([tokens], pa.int64()),
            "capacity_total": pa.array([cap], pa.int64()),
            "n_oversized": pa.array([int(agg["n_oversized"])],
                                    pa.int64()),
            "fill_rate": pa.array(
                [0.0 if cap == 0 else float(np.round(tokens / cap, 6))],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# epoch_shuffle_order — deterministic per-epoch training order
# ---------------------------------------------------------------------------

#: epochs planned by the shuffle-order op
SHUFFLE_EPOCHS = 2


def epoch_shuffle_order(sf_dir: str):
    """(doc_id, epoch, position) — the multi-epoch data-ordering plan a
    pre-training loader needs: each epoch visits every doc exactly once
    in an order keyed by ``md5("e{epoch}-{doc_id}")``, so epochs are
    decorrelated, reproducible across runs/engines, and stable under
    repartitioning (a ``random_shuffle`` would be none of these).

    Shape: a 2× flat explode rides the scan; ordering is ONE
    composite-key ``global_row_number`` (key = epoch·2⁴⁰ + hash32,
    doc_id tiebreak — the ``perplexity_buckets`` device), a
    range-partitioned rank with no full sort; the within-epoch
    position is ``rn − epoch·n_docs`` (each epoch owns a contiguous
    key range by construction)."""
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_ids = np.tile(ids, SHUFFLE_EPOCHS)
        epochs = np.repeat(
            np.arange(SHUFFLE_EPOCHS, dtype=np.int64), len(ids)
        )
        h = np.array(
            [
                md5_prefix32(f"e{e}-{d}")
                for e, d in zip(epochs, out_ids)
            ],
            np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids.astype(np.int64), pa.int64()),
                "epoch": pa.array(epochs, pa.int64()),
                "k": pa.array(
                    epochs * (np.int64(1) << 40) + h, pa.int64()
                ),
            }
        )

    keyed = ds.map_batches(explode, batch_format="pyarrow")
    ranked = global_row_number(keyed, "k", tiebreak=["doc_id"])

    def finish(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy()
        e = t["epoch"].to_numpy()
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "epoch": pc.cast(t["epoch"], pa.int64()),
                "position": pa.array(rn - e * n_docs, pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")

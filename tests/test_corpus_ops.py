"""Corpus-hygiene ops: scale-path routing + kernel properties.

(Exact oracle equality for every op is covered by the auto-parametrized
test_relational_oracle.py::test_query_matches_oracle.)
"""

import numpy as np
import pandas as pd

from docling_eval_ray.pipelines import corpus_ops as co

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_tfidf_distributed_tier_matches_broadcast(ray_session):
    """Forcing the vocab gate to 0 routes through hash_join +
    bucketed_group_apply; results must be identical to the broadcast
    tier."""
    fast = _canon(co.tfidf_topk(SF).to_pandas())
    dist = _canon(co.tfidf_topk(SF, broadcast_max_vocab=0).to_pandas())
    pd.testing.assert_frame_equal(fast, dist, check_dtype=True)


def test_mg_prune_superset_guarantee():
    """Any item with count > total/(k+1) survives a Misra-Gries prune —
    the bound that makes the merged candidate set a superset of the
    heavy hitters."""
    rng = np.random.default_rng(7)
    items = np.concatenate(
        [np.repeat("hot", 500), rng.integers(0, 2000, 5000).astype(str)]
    )
    uniq, counts = np.unique(items, return_counts=True)
    k = 10
    kept_keys, kept_counts = co._mg_prune(uniq, counts, k)
    assert len(kept_keys) <= k
    assert (kept_counts > 0).all()
    total = counts.sum()
    kept = set(kept_keys)
    for tok, c in zip(uniq, counts):
        if c > total / (k + 1):
            assert tok in kept


def test_doc_ngrams_window():
    toks = ["a", "b", "c", "d"]
    assert co._doc_ngrams(toks, n=3) == {"a b c", "b c d"}
    assert co._doc_ngrams(["a", "b"], n=3) == set()


def test_events_hopping_double_counts(ray_session):
    """Every event lands in exactly two hopping windows → summed
    n_events is exactly 2× the event count."""
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
    df = co.events_hopping(SF).to_pandas()
    assert df["n_events"].sum() == 2 * n_events


def test_cluster_assign_properties(ray_session):
    df = co.embedding_cluster_assign(SF).to_pandas()
    assert df["cluster"].between(0, co.N_CENTROIDS - 1).all()
    assert df["sim"].between(-1.0, 1.0).all()
    assert df["cluster"].nunique() > 1  # not degenerate


def test_stratified_sample_respects_rates(ray_session):
    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    samp = co.stratified_sample(SF).to_pandas()
    frac = samp["lang"].value_counts() / full["lang"].value_counts()
    # en downsampled at 5%, zh upsampled at 40% (±1.5σ slop at n≈200)
    assert frac["en"] < 0.12
    assert frac["zh"] > 0.25


def test_quality_repetition_known_answer(ray_session):
    """dup/top fractions recomputed independently for one doc."""
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).head(3)
    got = co.quality_repetition(SF).to_pandas().set_index("doc_id")
    for _, row in docs.iterrows():
        toks = row["text"].split()
        n = len(toks)
        from collections import Counter

        c = Counter(toks)
        bgs = Counter(zip(toks, toks[1:]))
        r = got.loc[row["doc_id"]]
        assert r["n_tokens"] == n
        assert r["dup_token_frac"] == np.round(1.0 - len(c) / n, 6)
        assert r["top_token_frac"] == np.round(max(c.values()) / n, 6)
        assert r["top_bigram_frac"] == np.round(
            max(bgs.values()) / (n - 1), 6
        )


def test_greedy_pack_invariants():
    nt = np.array([100, 100, 100, 300, 10, 250, 10])
    seq, start = co._greedy_pack(nt, 256)
    # fills never exceed cap except a single oversized doc alone
    df = pd.DataFrame({"seq": seq, "start": start, "nt": nt})
    for s, g in df.groupby("seq"):
        total = g["nt"].sum()
        assert total <= 256 or len(g) == 1
        # offsets are the running fill
        assert (g["start"].to_numpy()
                == np.concatenate([[0], g["nt"].to_numpy()[:-1].cumsum()])).all()
    assert (np.diff(seq) >= 0).all()


def test_pack_sequences_bucket_isolation(ray_session):
    df = co.pack_sequences(SF).to_pandas()
    # a sequence never spans packing buckets
    assert (df["seq_id"] // co.PACK_SEQ_STRIDE
            == df["doc_id"] // co.PACK_BUCKET).all()
    fills = df.groupby("seq_id")["n_tokens"].sum()
    singletons = df.groupby("seq_id").size() == 1
    assert ((fills <= co.PACK_CAP) | singletons).all()


def test_kmeans_improves_over_initial(ray_session):
    base = co.embedding_cluster_assign(SF).to_pandas()
    fitted = co.kmeans_assign(SF).to_pandas()
    # two Lloyd rounds must not reduce mean assigned cosine similarity
    assert fitted["sim"].mean() >= base["sim"].mean() - 1e-9
    assert fitted["cluster"].nunique() > 1


def test_fixed_size_sample_exact_sizes(ray_session):
    df = co.fixed_size_sample(SF).to_pandas()
    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    want = full["lang"].value_counts().clip(upper=co.SAMPLE_PER_STRATUM)
    got = df["lang"].value_counts()
    assert got.sort_index().equals(want.sort_index())
    assert not df["doc_id"].duplicated().any()


def test_quality_percentile_filter_threshold_semantics(ray_session,
                                                       tmp_path):
    """quantile_disc(0.25) pruning: with scores {0,0,50,100} over four
    docs, the threshold is the ceil(.25*4)-1 = 0th order statistic = 0,
    so ALL docs survive; with q raised to 0.75 the threshold is 50 and
    only the two high-quality docs survive."""
    import pandas as pd

    from docling_eval_ray.pipelines.corpus_ops import (
        quality_percentile_filter,
    )

    texts = {
        1: "a b c d",                      # 0% tokens in [3,12]
        2: "xx yy zz qq",                  # 0%
        3: "abc defg hi j",                # 2/4 = 50%
        4: "alpha beta gamma delta",       # 100%
    }
    pd.DataFrame(
        {"doc_id": pd.array(sorted(texts), dtype="int64"),
         "text": [texts[i] for i in sorted(texts)]}
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r["doc_id"]: r["score"]
           for r in quality_percentile_filter(str(tmp_path)).take_all()}
    assert got == {1: 0, 2: 0, 3: 50, 4: 100}
    got75 = {r["doc_id"]: r["score"]
             for r in quality_percentile_filter(
                 str(tmp_path), q=0.75).take_all()}
    assert got75 == {3: 50, 4: 100}


def test_part_cooccurrence_lift_known_answer(ray_session, tmp_path):
    """lift = n_ab*N/(n_a*n_b) over distinct orders: parts 1,2 always
    co-occur (perfectly correlated, lift = N/(n1*n2)=4/(2*2)=1? no —
    they appear together in both their orders: n_ab=2, N=4, n=2 each ->
    lift 2.0); the popular-but-independent pair scores 1.0."""
    import pandas as pd

    rows = [
        # orders 10, 11: parts 1+2 together (and 3 rides along in both)
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2), (11, 3),
        # orders 12, 13: part 3 with part 4 / alone
        (12, 3), (12, 4),
        (13, 3), (13, 4),
    ]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
        "int64").to_parquet(tmp_path / "lineitem.parquet")
    from docling_eval_ray.pipelines.relational import (
        part_cooccurrence_lift,
    )

    got = {(r["part_a"], r["part_b"]): (r["n_orders"], r["lift"])
           for r in part_cooccurrence_lift(str(tmp_path)).take_all()}
    # N=4; n1=n2=2, n3=4, n4=2
    assert got[(1, 2)] == (2, 2.0)       # perfectly correlated
    assert got[(1, 3)] == (2, 1.0)       # 2*4/(2*4)
    assert got[(3, 4)] == (2, 1.0)       # 2*4/(4*2)


def test_semdedup_prune_matches_bruteforce(ray_session):
    """The star-graph keep rule, brute-forced: within each cluster a
    vector is pruned iff ANY lower-vec_id member (pruned or not) has
    round(cosine, 6) > tau. Cluster assignment itself is oracled by
    test_relational_oracle; this pins the prune kernel (tiling, masks,
    rounding) against a dense whole-cluster matmul."""
    out = (
        co.semdedup_prune(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = (
        pd.read_parquet(f"{SF}/embeddings.parquet")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (out["vec_id"].to_numpy() == emb["vec_id"].to_numpy()).all()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    expect = np.ones(len(out), np.int64)
    for _, g in out.groupby("cluster"):
        idx = g.index.to_numpy()  # already vec_id-sorted
        sims = np.round(xn[idx] @ xn[idx].T, 6)
        lower = np.tril(sims > co.SEMDEDUP_TAU, k=-1)
        expect[idx] = (~lower.any(axis=1)).astype(np.int64)
    assert (out["kept"].to_numpy() == expect).all()
    # the threshold does real work on this data: some pruned, most kept
    kept = int(out["kept"].sum())
    assert 0 < kept < len(out)


def test_dsir_weights_known_answer(ray_session, tmp_path):
    """Hand-checkable corpus: target docs are pure 'a b' repetitions,
    raw noise docs are pure 'x y'. The 'a b' bucket is target-heavy
    (positive micro-log ratio), 'x y' appears only outside the target
    (negative), so target-looking docs must outscore noise docs; the
    score itself is re-derived exactly from the published formula."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import md5_prefix32

    docs = [
        (1, "a b a b a b", "en"),   # 5 bigrams, target
        (2, "a b a b", "en"),       # 3 bigrams, target
        (3, "x y x y x y", "de"),   # 5 bigrams, raw-only
        (4, "solo", "de"),          # 0 bigrams
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "lang": pa.array([d[2] for d in docs], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = (
        co.dsir_weights(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_bigrams"].tolist() == [5, 3, 5, 0]

    # exact replica of the published estimator over the tiny corpus
    B = co.DSIR_BUCKETS
    grams = {"a b": 0, "b a": 0, "x y": 0, "y x": 0}
    buckets = {g: md5_prefix32(g) % B for g in grams}
    n_t = {buckets["a b"]: 3 + 2, buckets["b a"]: 2 + 1}
    n_r = {
        buckets["a b"]: 5,
        buckets["b a"]: 3,
        buckets["x y"]: 3,
        buckets["y x"]: 2,
    }
    tot_t, tot_r = 8, 13

    def s(b):
        return int(
            np.round(
                1e6
                * (
                    np.log((n_t.get(b, 0) + 1.0) / (tot_t + B))
                    - np.log((n_r.get(b, 0) + 1.0) / (tot_r + B))
                )
            )
        )

    exp1 = 3 * s(buckets["a b"]) + 2 * s(buckets["b a"])
    exp3 = 3 * s(buckets["x y"]) + 2 * s(buckets["y x"])
    assert out.loc[1, "score_micro"] == exp1
    assert out.loc[3, "score_micro"] == exp3
    assert out.loc[4, "score_micro"] == 0
    # target-looking docs outscore raw-only docs
    assert out.loc[1, "score_micro"] > 0 > out.loc[3, "score_micro"]


def test_zipf_fit_shape_and_sign(ray_session):
    """One-row output; the head of a natural-ish rank-frequency curve
    fits with a negative slope."""
    from docling_eval_ray.pipelines.corpus_ops import zipf_fit

    df = zipf_fit("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 1 and df["n_types"][0] > 0
    assert df["zipf_slope"][0] < 0


def test_ngram_novelty_bounds_and_first_doc(ray_session):
    """novelty ∈ [0, 1]; the lowest doc_id owns every one of its
    shingles by construction (no lower doc exists)."""
    from docling_eval_ray.pipelines.corpus_ops import ngram_novelty

    df = ngram_novelty("/root/testdata/sf0.001").to_pandas()
    assert ((df["novelty"] >= 0) & (df["novelty"] <= 1)).all()
    assert (df["n_novel"] <= df["n_shingles"]).all()
    first = df.loc[df["doc_id"].idxmin()]
    assert first["novelty"] == 1.0


def test_char_entropy_quality_census(ray_session):
    """(lang, band) census totals the corpus; per-doc entropy kernel
    matches a pure-Python Counter recompute on the same docs."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from docling_eval_ray.pipelines.corpus_ops import (
        ENTROPY_HIGH,
        ENTROPY_LOW,
        char_entropy_quality,
    )

    sf = "/root/testdata/sf0.001"
    df = char_entropy_quality(sf).to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["text", "lang"])
    assert df["n_docs"].sum() == t.num_rows
    assert set(df["band"]) <= {"low", "mid", "high"}

    # recompute one (lang, band) cell exactly
    def ent(s: str) -> float:
        c = collections.Counter(s.encode())
        n = len(s)
        return round(-sum(v / n * np.log2(v / n) for v in c.values()), 6)

    want: dict[tuple[str, str], list[float]] = {}
    for s, lang in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        e = ent(s)
        band = "low" if e < ENTROPY_LOW else ("mid" if e < ENTROPY_HIGH
                                              else "high")
        want.setdefault((lang, band), []).append(e)
    got = {(r.lang, r.band): (r.n_docs, r.mean_entropy)
           for r in df.itertuples()}
    assert set(got) == set(want)
    for k, es in want.items():
        assert got[k][0] == len(es)
        assert got[k][1] == round(float(np.sum(es)) / len(es), 4)


def test_truncation_loss_census(ray_session):
    """Counters are internally consistent: per (lang, ctx) loss_frac =
    lost/total, monotone non-increasing in ctx_len, tokens_total is
    ctx-invariant per lang, and n_truncated ≤ n_docs."""
    import numpy as np

    from docling_eval_ray.pipelines.corpus_ops import (
        TRUNC_CTX_LENS,
        truncation_loss,
    )

    df = truncation_loss("/root/testdata/sf0.001").to_pandas()
    assert set(df["ctx_len"]) == set(TRUNC_CTX_LENS)
    assert (df["n_truncated"] <= df["n_docs"]).all()
    assert np.allclose(
        df["loss_frac"],
        np.round(df["tokens_lost"] / df["tokens_total"], 6),
    )
    for lang, g in df.groupby("lang"):
        assert g["tokens_total"].nunique() == 1
        assert g["n_docs"].nunique() == 1
        s = g.sort_values("ctx_len")
        assert (np.diff(s["tokens_lost"]) <= 0).all()


def test_source_drift_ks_matches_scipy_style_direct(ray_session):
    """KS stats replicate a direct per-source two-sample ECDF sweep and
    sit in [0, 1]; a planted shifted source would dominate — here the
    uniform synthetic feeds all stay small."""
    import numpy as np
    import pyarrow.parquet as pq

    from docling_eval_ray.pipelines.corpus_ops import source_drift_ks

    df = source_drift_ks("/root/testdata/sf0.001").to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["source", "n_chars"])
    src = np.array(t["source"].to_pylist())
    nc = np.array(t["n_chars"].to_pylist(), np.int64)
    support = np.unique(nc)
    assert df["ks_stat"].between(0, 1).all()
    for row in df.itertuples():
        a = nc[src == row.source]
        b = nc[src != row.source]
        fa = np.searchsorted(np.sort(a), support, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), support, side="right") / len(b)
        want = round(float(np.abs(fa - fb).max()), 6)
        assert abs(row.ks_stat - want) < 2e-6, (row.source, row.ks_stat,
                                                want)
        assert row.n_source == len(a) and row.n_rest == len(b)


def test_subsample_ci_mean_brackets_truth(ray_session):
    """The CI band brackets the full-corpus mean, replicate membership
    is the md5 coin (spot-rebuilt), and all 64 replicates are
    populated on this corpus."""
    import numpy as np
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import md5_prefix32
    from docling_eval_ray.pipelines.corpus_ops import (
        CI_REPS,
        subsample_ci_mean,
    )

    row = subsample_ci_mean("/root/testdata/sf0.001").to_pandas().iloc[0]
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "n_chars"])
    dids = t["doc_id"].to_numpy(zero_copy_only=False)
    nch = t["n_chars"].to_numpy(zero_copy_only=False)
    assert row["n_docs"] == len(dids)
    assert row["mean_full"] == round(float(nch.sum()) / len(nch), 6)
    assert row["n_reps"] == CI_REPS
    assert row["ci_lo"] <= row["mean_full"] <= row["ci_hi"]
    # spot-rebuild replicate 0's mean and check it lies inside [min,max]
    m0 = np.array([md5_prefix32(f"{d}-0") % 2 == 0 for d in dids])
    mu0 = float(nch[m0].sum()) / int(m0.sum())
    assert row["ci_lo"] - 1e-9 <= mu0 or mu0 <= row["ci_hi"] + 1e-9


def test_split_contamination_audit_planted(ray_session, tmp_path):
    """A val doc sharing a verbatim 8-gram with a train doc is flagged;
    an overlap-free test doc is not; rates divide exactly."""
    from docling_eval_ray.functions.tokens import md5_prefix32

    def split_of(i: int) -> str:
        b = md5_prefix32(str(i)) % 100
        if b < co.SPLIT_EDGES[0]:
            return "train"
        return "val" if b < co.SPLIT_EDGES[1] else "test"

    by_split = {}
    for i in range(400):
        by_split.setdefault(split_of(i), []).append(i)
    tr, va, te = (by_split[s][0] for s in ("train", "val", "test"))
    va2 = by_split["val"][1]

    shared = " ".join(f"s{i}" for i in range(co.DECON_NGRAM))
    pd.DataFrame(
        {
            "doc_id": pd.array([tr, va, va2, te], dtype="int64"),
            "text": [
                "lead in " + shared + " tail",
                shared + " entirely different ending",
                " ".join(f"u{i}" for i in range(12)),     # clean val doc
                " ".join(f"w{i}" for i in range(12)),     # clean test doc
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        r["split"]: r
        for r in co.split_contamination_audit(str(tmp_path)).to_pylist()
    }
    assert got["val"]["n_docs"] == 2
    assert got["val"]["n_contaminated"] == 1
    assert got["val"]["shingle_hits"] == 1
    assert got["val"]["contamination_rate"] == 0.5
    assert got["test"]["n_docs"] == 1
    assert got["test"]["n_contaminated"] == 0
    assert got["test"]["contamination_rate"] == 0.0


def test_quality_perplexity_corr_direct(ray_session):
    """r matches a direct per-doc recompute (quantized cents × integer
    score) and lies in [-1, 1]; census cells cover every doc."""
    import math

    from docling_eval_ray.functions.tokens import sql_tokens
    from docling_eval_ray.pipelines.cleaning import lm_perplexity

    got = co.quality_perplexity_corr(SF).to_pylist()[0]
    per = lm_perplexity(SF, extra_doc_cols=("text",)).to_pandas()
    assert got["n_docs"] == len(per)
    x = np.round(per["cross_entropy"].to_numpy() * 100.0).astype(np.int64)
    y = np.array(
        [
            (100 * sum(3 <= len(tk) <= 12 for tk in sql_tokens(s)))
            // len(sql_tokens(s))
            for s in per["text"]
        ],
        np.int64,
    )
    n = len(x)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    d1 = n * int((x * x).sum()) - int(x.sum()) ** 2
    d2 = n * int((y * y).sum()) - int(y.sum()) ** 2
    want = (0.0 if d1 == 0 or d2 == 0
            else float(np.round(float(num) / math.sqrt(float(d1 * d2)), 6)))
    assert got["r_pearson"] == want
    assert -1.0 <= got["r_pearson"] <= 1.0


def test_vocab_coverage_curve_monotone(ray_session):
    """Coverage is non-decreasing in top_n, covered counts equal a
    direct census recompute, and N > |vocab| clamps to full coverage."""
    import duckdb

    df = co.vocab_coverage_curve(SF).to_pandas().sort_values("top_n")
    cov = df["coverage"].to_numpy()
    assert (np.diff(cov) >= 0).all()
    assert cov[-1] == 1.0
    cnt = duckdb.sql(
        f"""SELECT count(*) AS n
            FROM '{SF}/documents.parquet',
                 UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
            GROUP BY tok ORDER BY n DESC, tok"""
    ).df()["n"].to_numpy()
    total = int(cnt.sum())
    assert (df["total"] == total).all()
    for row in df.itertuples():
        k = min(row.top_n, len(cnt))
        assert row.covered == int(cnt[:k].sum())
        assert row.vocab_size == min(row.top_n, len(cnt))


def test_cluster_label_purity_consistency(ray_session):
    """Purity rows agree with a direct recompute from kmeans_assign +
    the label column; totals partition the embedding table."""
    import pyarrow.parquet as pq

    df = co.cluster_label_purity(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    assign = co.kmeans_assign(SF).to_pandas()
    j = assign.merge(emb, on="vec_id")
    assert df["n_vecs"].sum() == len(emb)
    for row in df.itertuples():
        grp = j.loc[j["cluster"] == row.cluster, "label"]
        vc = grp.value_counts()
        top_n = int(vc.max())
        top_label = int(min(l for l, n in vc.items() if n == top_n))
        assert row.n_vecs == len(grp)
        assert row.n_labels == grp.nunique()
        assert (row.top_label, row.n_top) == (top_label, top_n)
        assert row.purity == float(np.round(top_n / len(grp), 6))


def test_clustering_ari_matches_reference_formula(ray_session):
    """ARI equals the textbook contingency-table formula computed from
    kmeans_assign × labels; perfect agreement would give 1.0 (checked
    on a synthetic census)."""
    import pyarrow.parquet as pq

    got = co.clustering_ari(SF).to_pylist()[0]
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    assign = co.kmeans_assign(SF).to_pandas()
    j = assign.merge(emb, on="vec_id")
    ct = j.groupby(["cluster", "label"]).size()
    n = len(j)

    def pairs(s):
        return int(sum(int(k) * (int(k) - 1) for k in s)) // 2

    sij = pairs(ct.to_numpy())
    sa = pairs(ct.groupby("cluster").sum().to_numpy())
    sb = pairs(ct.groupby("label").sum().to_numpy())
    assert (got["sum_pairs_cells"], got["sum_pairs_rows"],
            got["sum_pairs_cols"]) == (sij, sa, sb)
    exp = sa * sb / (n * (n - 1) // 2)
    want = (sij - exp) / ((sa + sb) / 2 - exp)
    assert abs(got["ari"] - want) < 1e-6
    assert -1.0 <= got["ari"] <= 1.0


def test_curriculum_stage_assign_invariants(ray_session):
    """Stages are balanced quarters of the global easy→hard order:
    every doc in a lower stage has (score, -doc_id) ≥ any doc in a
    higher stage under the (score desc, doc_id asc) order."""
    df = co.curriculum_stage_assign(SF).to_pandas()
    n = len(df)
    sizes = df["stage"].value_counts().sort_index()
    assert set(sizes.index) == set(range(co.CURRICULUM_STAGES))
    assert sizes.max() - sizes.min() <= 1
    assert sizes.sum() == n
    # order key: easy-first rank must be monotone in stage
    key = df.sort_values(["score", "doc_id"],
                         ascending=[False, True]).reset_index(drop=True)
    key["expect"] = (np.arange(n) * co.CURRICULUM_STAGES) // n
    merged = key.merge(df, on="doc_id", suffixes=("", "_got"))
    assert (merged["expect"] == merged["stage_got"]).all()


def test_token_ttr_by_source_direct(ray_session):
    """Type and token counts per source equal a direct pandas census."""
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import sql_tokens

    df = co.token_ttr_by_source(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    for src, g in docs.groupby("source"):
        toks = [tk for s in g["text"] for tk in sql_tokens(s)]
        assert df.loc[src, "n_tokens"] == len(toks)
        assert df.loc[src, "n_types"] == len(set(toks))
        assert df.loc[src, "ttr"] == float(
            np.round(len(set(toks)) / len(toks), 6)
        )


def test_pack_efficiency_report_consistency(ray_session):
    """The report's aggregates equal a direct recompute over the
    pack_sequences output; fill never exceeds 1.0 without oversized
    docs present."""
    rep = co.pack_efficiency_report(SF).to_pylist()[0]
    packed = co.pack_sequences(SF).to_pandas()
    assert rep["n_docs"] == len(packed)
    assert rep["n_seqs"] == packed["seq_id"].nunique()
    assert rep["n_seqs"] == int((packed["seq_offset"] == 0).sum())
    assert rep["tokens_total"] == int(packed["n_tokens"].sum())
    assert rep["capacity_total"] == rep["n_seqs"] * co.PACK_CAP
    assert rep["n_oversized"] == int(
        (packed["n_tokens"] > co.PACK_CAP).sum()
    )
    if rep["n_oversized"] == 0:
        assert rep["fill_rate"] <= 1.0


def test_epoch_shuffle_order_permutations(ray_session):
    """Each epoch is a full 1..n permutation; epochs are decorrelated
    (rank correlation well below 1); the order is reproducible."""
    df = co.epoch_shuffle_order(SF).to_pandas()
    n = df["doc_id"].nunique()
    for e, g in df.groupby("epoch"):
        assert sorted(g["position"]) == list(range(1, n + 1))
        assert g["doc_id"].is_unique
    wide = df.pivot(index="doc_id", columns="epoch", values="position")
    rho = np.corrcoef(wide[0], wide[1])[0, 1]
    assert abs(rho) < 0.2
    again = co.epoch_shuffle_order(SF).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values(["epoch", "doc_id"]).reset_index(drop=True),
        again.sort_values(["epoch", "doc_id"]).reset_index(drop=True),
    )

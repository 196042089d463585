"""Content-cleaning ops: tier routing + kernel semantics.

(Exact oracle equality is covered by the auto-parametrized
test_relational_oracle.py::test_query_matches_oracle.)
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from docling_eval_ray.pipelines import cleaning as cl

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_lm_perplexity_distributed_tier_matches_broadcast(ray_session):
    """Forcing the vocab gate to 0 routes through hash_join +
    bucketed_group_apply; results must be identical."""
    fast = _canon(cl.lm_perplexity(SF).to_pandas())
    dist = _canon(cl.lm_perplexity(SF, broadcast_max_vocab=0).to_pandas())
    pd.testing.assert_frame_equal(fast, dist, check_dtype=True)


def test_lm_perplexity_uniform_corpus_entropy(ray_session, tmp_path):
    """On a corpus where every token is equally frequent, per-doc
    cross-entropy is exactly log2(vocab) and perplexity = vocab."""
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d", "c d a b"], pa.string()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = _canon(cl.lm_perplexity(str(tmp_path)).to_pandas())
    assert (out["cross_entropy"] == 2.0).all()  # log2(4 equally-likely)
    assert (out["perplexity"] == 4.0).all()


def test_dedup_paragraphs_first_occurrence_wins(ray_session, tmp_path):
    """A chunk duplicated across documents survives only in the lowest
    (doc_id, cidx); unique chunks all survive."""
    import pyarrow.parquet as pq

    chunk = " ".join(f"w{i}" for i in range(8))  # one full-width chunk
    uniq = " ".join(f"u{i}" for i in range(8))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # doc0: chunk + unique tail; doc1: the same chunk only;
            # doc2: unique text only
            "text": pa.array(
                [chunk + " " + uniq, chunk, "x y z"], pa.string()
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (
        cl.dedup_paragraphs(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_chunks"] == 2 and out.loc[0, "n_kept"] == 2
    assert out.loc[0, "kept_text"] == chunk + " " + uniq
    # doc1's only chunk is doc0's first chunk → fully deduped away
    assert out.loc[1, "n_chunks"] == 1 and out.loc[1, "n_kept"] == 0
    assert out.loc[1, "kept_text"] == ""
    assert out.loc[2, "n_kept"] == 1 and out.loc[2, "kept_text"] == "x y z"


def test_dedup_paragraphs_total_kept_equals_distinct_chunks(ray_session):
    """Σ n_kept == number of distinct chunk texts in the corpus (each
    distinct chunk survives exactly once)."""
    out = cl.dedup_paragraphs(SF).to_pandas()
    import duckdb

    distinct = duckdb.sql(
        rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
                   generate_subscripts(
                       regexp_split_to_array(trim(text), '\s+'), 1) AS ord
            FROM '{SF}/documents.parquet'
        ),
        chunks AS (
            SELECT doc_id, (ord - 1) // 8 AS cidx,
                   string_agg(tok, ' ' ORDER BY ord) AS ctext
            FROM toks GROUP BY 1, 2
        )
        SELECT count(DISTINCT ctext) AS n FROM chunks
        """
    ).df()["n"][0]
    assert out["n_kept"].sum() == distinct


def test_pii_redact_removes_all_patterns(ray_session):
    """After redaction no raw email/IP/phone remains, and every doc
    that got a synthesized PII substring counts it."""
    out = cl.pii_redact(SF).to_pandas()
    import re

    assert not out["redacted"].str.contains(cl.PII_EMAIL, regex=True).any()
    assert not out["redacted"].str.contains(cl.PII_PHONE, regex=True).any()
    did = out["doc_id"].to_numpy()
    assert ((out["n_emails"].to_numpy() >= 1) == (did % 3 != 0)).all()
    assert ((out["n_phones"].to_numpy() >= 1) == (did % 5 != 0)).all()
    # replacement tokens present exactly where counts are nonzero
    assert (
        out["redacted"].str.contains(re.escape("[EMAIL]")).to_numpy()
        == (out["n_emails"].to_numpy() > 0)
    ).all()


def test_running_total_last_row_is_user_total(ray_session):
    """The max-row_num running_sum per user equals the user's total
    event value (cumulative frame covers the whole partition)."""
    out = cl._read(SF, "events", columns=["user_id", "value"]).to_pandas()
    totals = out.groupby("user_id")["value"].sum().round(2)
    from docling_eval_ray.pipelines.relational import events_running_total

    rt = events_running_total(SF).to_pandas()
    last = rt.loc[rt.groupby("user_id")["row_num"].idxmax()].set_index(
        "user_id"
    )["running_sum"]
    pd.testing.assert_series_equal(
        last.sort_index(), totals.sort_index(), check_names=False,
        rtol=0, atol=0.011,
    )


def test_perplexity_buckets_are_lang_terciles(ray_session):
    """Within each language the three buckets are equal thirds (±1 row)
    and cross-entropy ordering is monotone head ≤ middle ≤ tail."""
    import numpy as np

    from docling_eval_ray.pipelines.cleaning import perplexity_buckets

    df = perplexity_buckets("/root/testdata/sf0.001").to_pandas()
    assert set(df["ppl_bucket"]) <= {"head", "middle", "tail"}
    for lang, g in df.groupby("lang"):
        sizes = g["ppl_bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1, (lang, dict(sizes))
        h = g.loc[g["ppl_bucket"] == "head", "perplexity"]
        m = g.loc[g["ppl_bucket"] == "middle", "perplexity"]
        t = g.loc[g["ppl_bucket"] == "tail", "perplexity"]
        assert h.max() <= m.min() + 1e-9 and m.max() <= t.min() + 1e-9


def test_quality_classifier_score_matches_direct(ray_session):
    """Per-doc hashed-linear scores replicate a direct per-row numpy
    rebuild (unigrams + bigrams, md5 buckets, md5 weight lattice), and
    keep ⇔ w_sum ≥ 0 ⇔ logit ≥ 0."""
    import numpy as np
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import md5_prefix32, sql_tokens
    from docling_eval_ray.pipelines.cleaning import (
        _QC_W,
        QC_HASH_DIM,
        quality_classifier_score,
    )

    df = (
        quality_classifier_score("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    for did, text in list(zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist()))[:50]:
        toks = sql_tokens(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        s = sum(int(_QC_W[md5_prefix32(f) % QC_HASH_DIM]) for f in feats)
        row = df.loc[did]
        assert row["n_feats"] == len(feats)
        assert row["w_sum"] == s
        assert row["logit"] == round(s / (1000.0 * len(feats)), 6)
        assert row["keep"] == (1 if s >= 0 else 0)
    assert ((df["keep"] == 1) == (df["w_sum"] >= 0)).all()


def test_lm_perplexity_bigram_matches_direct(ray_session):
    """Broadcast tier replicates a direct in-memory stupid-backoff
    rebuild (train = even doc_ids), the distributed join tier agrees
    bit-for-bit, and backoff genuinely fires on the held-out half."""
    import numpy as np
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import sql_tokens
    from docling_eval_ray.pipelines.cleaning import (
        LM_BACKOFF,
        lm_perplexity_bigram,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        lm_perplexity_bigram(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        lm_perplexity_bigram(sf, broadcast_max_vocab=0).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(dist)

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for did, text in docs.items():
        if did % 2 != 0:
            continue
        toks = sql_tokens(text)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for p, w in zip(toks, toks[1:]):
            big[(p, w)] = big.get((p, w), 0) + 1
    T = float(sum(uni.values()))

    n_backoff = 0
    by_id = got.set_index("doc_id")
    for did in docs:  # all 500 — backoff fires only ~7×/corpus
        toks = sql_tokens(docs[did])
        nll = []
        for i, w in enumerate(toks):
            pu = uni.get(w, 0) / T if w in uni else 1.0 / T
            if i == 0:
                nll.append(-np.log2(pu))
            elif (toks[i - 1], w) in big:
                nll.append(-np.log2(big[(toks[i - 1], w)]
                                    / uni[toks[i - 1]]))
            else:
                n_backoff += 1
                nll.append(-np.log2(LM_BACKOFF * pu))
        h = float(np.sum(nll)) / len(nll)
        row = by_id.loc[did]
        assert row["n_tokens"] == len(toks)
        assert row["cross_entropy"] == round(h, 6)
        assert row["perplexity"] == round(2.0 ** h, 6)
    assert n_backoff > 0, "backoff never fired — held-out split broken?"


def test_filter_agreement_kappa(ray_session):
    """Contingency reconciles with the standalone raters; po/pe/kappa
    satisfy their defining identities; both raters are non-constant on
    this corpus (else kappa is degenerate)."""
    import numpy as np

    from docling_eval_ray.pipelines.cleaning import (
        filter_agreement_kappa,
        gopher_quality_filter,
        quality_classifier_score,
    )

    sf = "/root/testdata/sf0.001"
    row = filter_agreement_kappa(sf).to_pandas().iloc[0]
    g = gopher_quality_filter(sf).to_pandas().set_index("doc_id")["keep"]
    c = (quality_classifier_score(sf).to_pandas()
         .set_index("doc_id")["keep"])
    g, c = g.sort_index(), c.sort_index()
    assert row["n11"] == int(((g == 1) & (c == 1)).sum())
    assert row["n10"] == int(((g == 1) & (c == 0)).sum())
    assert row["n01"] == int(((g == 0) & (c == 1)).sum())
    assert row["n00"] == int(((g == 0) & (c == 0)).sum())
    n = row[["n11", "n10", "n01", "n00"]].sum()
    assert row["po"] == round((row["n11"] + row["n00"]) / n, 6)
    assert 0 < g.mean() < 1 and 0 < c.mean() < 1
    assert -1.0 <= row["kappa"] <= 1.0


def test_feature_information_gain_bounds(ray_session):
    """IG obeys 0 ≤ IG(F) ≤ H(keep), H(keep) agrees with a direct
    rebuild from the gopher keeps, and both features are present."""
    import numpy as np

    from docling_eval_ray.pipelines.cleaning import (
        feature_information_gain,
        gopher_quality_filter,
    )

    sf = "/root/testdata/sf0.001"
    df = feature_information_gain(sf).to_pandas().set_index("feature")
    assert set(df.index) == {"lang", "source"}
    k = gopher_quality_filter(sf).to_pandas()["keep"].to_numpy()
    p = np.array([(k == 0).mean(), (k == 1).mean()])
    p = p[p > 0]
    hk = round(float(-(p * np.log2(p)).sum()), 6)
    assert (df["h_label"] == hk).all()
    assert ((df["info_gain"] >= -1e-9)
            & (df["info_gain"] <= df["h_label"] + 1e-9)).all()


def test_classifier_reliability_bins_semantics(ray_session):
    """Bins partition the corpus; the keep decision is EXACTLY the
    bin-5 boundary (w_sum >= 0 ⇔ logit >= 0 ⇔ bin >= 5); pos counts
    agree with a direct fused recompute of both kernels."""
    import pyarrow.parquet as pq

    df = cl.classifier_reliability_bins(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    assert df["n_docs"].sum() == t.num_rows
    assert df["bin"].between(0, 9).all()
    low = df[df["bin"] < 5]
    high = df[df["bin"] >= 5]
    assert (low["n_pred_keep"] == 0).all()
    assert (high["n_pred_keep"] == high["n_docs"]).all()

    qc = cl._qc_frame(t.to_pandas())
    kg = cl._gopher_table(t)["keep"].to_numpy(zero_copy_only=False)
    s, n = qc["w_sum"].to_numpy(), qc["n_feats"].to_numpy()
    bins = np.minimum((5 * s + 5000 * n) // (1000 * n), 9)
    want_pos = pd.Series(kg).groupby(bins).sum()
    got_pos = df.set_index("bin")["n_pos"]
    assert got_pos.sort_index().to_dict() == {
        int(k): int(v) for k, v in want_pos.sort_index().items()
    }


def test_k_anonymity_census_partition(ray_session):
    """Sizes × class counts partition the corpus; the histogram equals
    a direct pandas recompute of the QI census."""
    import pyarrow.parquet as pq

    df = cl.k_anonymity_census(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["lang", "source", "n_chars"]).to_pandas()
    assert df["n_docs"].sum() == len(t)
    assert (df["n_docs"] == df["class_size"] * df["n_classes"]).all()
    t["band"] = t["n_chars"] // cl.K_ANON_BAND
    want = (
        t.groupby(["lang", "source", "band"]).size()
        .value_counts().sort_index()
    )
    got = df.set_index("class_size")["n_classes"].sort_index()
    assert {int(k): int(v) for k, v in got.items()} == {
        int(k): int(v) for k, v in want.items()
    }

"""Dedup family: MinHash-LSH recall on synthetic near-dups, SimHash
properties, winnowing fingerprints."""

import numpy as np
import pandas as pd
import pytest

from docling_eval_ray.stages.dedup import (
    MinHasher,
    _shingles,
    hamming64,
    minhash_candidates,
    simhash64,
)
from docling_eval_ray.stages.textstats import winnow_fingerprints


BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall green tree near the old stone wall "
        "under a bright blue summer sky full of small white clouds")


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher()
    near = BASE.replace("lazy", "sleepy")
    sig_a, sig_b = mh.signature(BASE), mh.signature(near)
    est = float((sig_a == sig_b).mean())
    true = _jaccard(BASE, near)
    assert abs(est - true) < 0.15


def test_minhash_signatures_batch_bit_identical():
    """The vectorized batch kernel must reproduce the per-row
    ``signature`` bit-for-bit (same md5 base hash, same modmul) —
    including empty docs, sub-shingle-length docs, and repeated
    shingles across the batch (the np.unique dedup path)."""
    mh = MinHasher()
    texts = [
        BASE,
        BASE.replace("lazy", "sleepy"),
        "",                                # zero shingles
        "too short",                       # below shingle width
        BASE,                              # exact repeat (shared shingles)
        " ".join(f"tok{i}" for i in range(2000)),  # forces tiling
    ]
    batch = mh.signatures_batch(texts)
    for i, t in enumerate(texts):
        assert (batch[i] == mh.signature(t)).all(), f"row {i} differs"


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = [
        " ".join(rng.choice(vocab, size=60).tolist()) for _ in range(60)
    ]
    # plant: one exact dup and one near-dup of doc 0
    docs.append(docs[0])
    docs.append(docs[0].replace("w", "x", 1))  # single-token edit
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
    ds = rd.from_pandas(df)
    pairs = minhash_candidates(ds).to_pandas()
    found = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (0, 60) in found           # exact dup always collides
    assert (0, 61) in found           # j≈0.95 near-dup: miss prob ~1e-7


def test_simhash_properties():
    a = simhash64(BASE)
    assert a == simhash64(BASE)                     # deterministic
    near = simhash64(BASE.replace("lazy", "sleepy"))
    far = simhash64(" ".join(f"z{i}" for i in range(40)))
    assert hamming64(a, near) < hamming64(a, far)
    assert hamming64(a, near) <= 16


def test_winnow_fingerprints():
    fps = winnow_fingerprints(BASE)
    assert len(fps) > 0
    assert np.array_equal(fps, winnow_fingerprints(BASE))  # deterministic
    # shared content → shared fingerprints
    shifted = "completely different prefix text here " + BASE
    common = np.intersect1d(fps, winnow_fingerprints(shifted))
    assert len(common) >= 0.5 * len(fps)
    # edge cases
    assert len(winnow_fingerprints("")) == 0
    assert len(winnow_fingerprints("short")) == 1


def test_minhash_near_dups_distributed_and_exact(ray_session, monkeypatch):
    """Verification must be fully distributed (no driver-side corpus
    materialization) and exact: every emitted pair carries its true
    shingle Jaccard and every true near-dup pair the LSH surfaced is
    kept."""
    import pyarrow.parquet as pq
    import ray.data

    from docling_eval_ray.stages.dedup import minhash_near_dups

    def boom(self, *a, **k):
        raise AssertionError(
            "minhash_near_dups must not materialize a Dataset on the driver"
        )

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    rows = minhash_near_dups("/root/testdata/sf0.001").take_all()
    assert rows, "expected planted near-dups in the synthetic corpus"

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    shs = {
        int(d): _shingles(x.strip())
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    for r in rows:
        sa, sb = shs[r["doc_id_a"]], shs[r["doc_id_b"]]
        true_j = len(sa & sb) / len(sa | sb)
        assert r["jaccard"] == pytest.approx(round(true_j, 6))
        assert true_j >= 0.5


def test_ngram_jaccard_max_df_caps_hot_shingles(ray_session, tmp_path):
    """A stop-shingle shared by every doc must not emit O(n^2) pairs when
    max_df is set; pairs sharing rare shingles survive."""
    import pandas as pd

    from docling_eval_ray.stages.dedup import ngram_jaccard_pairs

    stop = "the common boilerplate footer"
    docs = [f"unique{i} token{i} word{i} {stop}" for i in range(20)]
    # two genuinely near-dup docs sharing rare shingles
    docs.append("alpha beta gamma delta epsilon zeta")
    docs.append("alpha beta gamma delta epsilon eta")
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs,
                       "n_chars": [len(d) for d in docs]})
    df.to_parquet(tmp_path / "documents.parquet")

    uncapped = ngram_jaccard_pairs(str(tmp_path), threshold=0.05).to_pandas()
    capped = ngram_jaccard_pairs(
        str(tmp_path), threshold=0.05, max_df=5
    ).to_pandas()
    # the stop-shingle links all 20 boilerplate docs pairwise; the cap
    # removes those pairs but keeps the rare-shingle near-dup pair
    assert len(uncapped) >= 190
    got = set(map(tuple, capped[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (20, 21) in got
    assert len(capped) < 20


def test_minhash_verification_tiers_agree(ray_session):
    """Tier A (broadcast candidate index, zero extra shuffles), tier B
    (id-set pushdown + distributed joins) and tier C (full-corpus
    distributed joins) must produce identical verified pairs."""
    from docling_eval_ray.stages.dedup import minhash_near_dups

    def rows(**kw):
        return sorted(
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in minhash_near_dups("/root/testdata/sf0.001", **kw)
            .take_all()
        )

    a = rows()                                    # tier A
    b = rows(cand_index_max=0)                    # tier B (joins, pruned)
    c = rows(cand_index_max=0, cand_filter_max=0) # tier C (full corpus)
    assert a == b == c and len(a) > 0


def test_connected_components_known_graph(ray_session):
    """Min-label propagation on a chain (needs >1 iteration), a clique
    and an isolated pair."""
    import ray.data as rd

    from docling_eval_ray.stages.dedup import connected_components

    edges = [
        # chain 10-11-12-13 (diameter 3)
        (11, 10), (12, 11), (13, 12),
        # clique 20,21,22
        (20, 21), (20, 22), (21, 22),
        # pair
        (30, 31),
    ]
    ds = rd.from_items(
        [{"doc_id_a": a, "doc_id_b": b} for a, b in edges]
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(ds).take_all()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def _phrase(tag: str) -> str:
    return " ".join(f"{tag}{c}" for c in "abcdef")


def _write_docs(path, texts: dict[int, str]) -> None:
    pd.DataFrame(
        {"doc_id": pd.array(sorted(texts), dtype="int64"),
         "text": [texts[i] for i in sorted(texts)]}
    ).to_parquet(path / "documents.parquet")


def test_neardup_kcore_multi_round_peel(ray_session, tmp_path):
    """Regression: rounds 2+ must keep filtering BOTH edge endpoints.

    Path graph 0-1-2-3-4 (adjacent docs share one 6-word phrase = four
    interior 3-shingles, Jaccard >= 0.1; nothing else shared). The
    2-core peel needs two rounds to reach the empty fixpoint: round 1
    drops the path ends, round 2 drops the remaining 3-path. A
    positional endpoint swap (the original bug) leaves dangling edges
    after round 2 and returns a nonempty result here."""
    from docling_eval_ray.stages.dedup import neardup_kcore, ngram_jaccard_pairs

    p = [_phrase(f"p{i}") for i in range(4)]
    u = [" ".join(f"u{i}{j}" for j in range(8)) for i in range(5)]
    _write_docs(tmp_path, {
        0: f"{u[0]} {p[0]}",
        1: f"{p[0]} {u[1]} {p[1]}",
        2: f"{p[1]} {u[2]} {p[2]}",
        3: f"{p[2]} {u[3]} {p[3]}",
        4: f"{p[3]} {u[4]}",
    })

    pairs = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in ngram_jaccard_pairs(str(tmp_path)).take_all()
    )
    assert pairs == [(0, 1), (1, 2), (2, 3), (3, 4)]  # the path, exactly

    got = neardup_kcore(str(tmp_path))
    got_df = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    assert len(got_df) == 0
    assert sorted(got_df.columns) == ["degree", "doc_id"]

    # the chained-CTE oracle agrees (empty) on the same input
    import duckdb

    from docling_eval_ray.pipelines.oracle import ORACLE_SQL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    assert len(con.sql(ORACLE_SQL["neardup_kcore"]).df()) == 0
    con.close()


def test_neardup_kcore_triangle_survives(ray_session, tmp_path):
    """Triangle {1,2,3} + pendant chain 1-4-5: the chain peels away in
    two rounds, the triangle survives with degree 2 everywhere —
    matches the DuckDB oracle row-for-row."""
    from docling_eval_ray.stages.dedup import neardup_kcore

    e12, e13, e23 = _phrase("q12"), _phrase("q13"), _phrase("q23")
    e14, e45 = _phrase("q14"), _phrase("q45")
    _write_docs(tmp_path, {
        1: f"{e12} {e13} {e14}",
        2: f"{e12} {e23}",
        3: f"{e13} {e23}",
        4: f"{e14} {e45}",
        5: f"{e45} v50 v51 v52 v53",
    })

    got = neardup_kcore(str(tmp_path))
    got_df = (got if isinstance(got, pd.DataFrame) else got.to_pandas())
    got_rows = sorted(map(tuple, got_df[["doc_id", "degree"]].values))
    assert got_rows == [(1, 2), (2, 2), (3, 2)]

    import duckdb

    from docling_eval_ray.pipelines.oracle import ORACLE_SQL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = sorted(map(tuple,
                      con.sql(ORACLE_SQL["neardup_kcore"]).df().values))
    con.close()
    assert got_rows == want


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    """The defining property: every member of a near-dup component gets
    the SAME split (hashing the canonical id), and the census covers
    every document exactly once."""
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.tokens import md5_prefix32
    from docling_eval_ray.stages.dedup import (
        leakage_safe_split,
        near_dup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    census = leakage_safe_split(sf).to_pandas()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert census["n_docs"].sum() == n_docs
    assert census["split"].between(0, 9).all()

    clusters = near_dup_clusters(sf).to_pandas()
    assert len(clusters) > 0
    splits = clusters.assign(
        split=[md5_prefix32(str(c)) % 10 for c in clusters["cluster_id"]]
    )
    # all members of a cluster share one split
    assert (splits.groupby("cluster_id")["split"].nunique() == 1).all()


def test_connected_components_star_known_graph(ray_session):
    """Star CC (large-star/small-star alternation) produces the same
    clusters as label propagation on the mixed fixture graph."""
    import ray.data as rd

    from docling_eval_ray.stages.dedup import connected_components_star

    edges = [
        (11, 10), (12, 11), (13, 12),          # chain, diameter 3
        (20, 21), (20, 22), (21, 22),          # clique
        (30, 31),                              # pair
    ]
    ds = rd.from_items(
        [{"doc_id_a": a, "doc_id_b": b} for a, b in edges]
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components_star(ds).take_all()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_connected_components_star_chain_logarithmic_rounds(ray_session):
    """A 64-node chain has diameter 63 — min-label propagation needs 63
    iterations (its max_iters=50 guard would fire and return WRONG
    labels); the star alternation must solve it in O(log n) rounds."""
    import ray.data as rd

    from docling_eval_ray.stages.dedup import connected_components_star

    n = 64
    ds = rd.from_items(
        [{"doc_id_a": i, "doc_id_b": i + 1} for i in range(n - 1)]
    )
    labels, rounds = connected_components_star(
        ds, return_rounds=True, num_buckets=4
    )
    got = {r["doc_id"]: r["cluster_id"] for r in labels.take_all()}
    assert got == {i: 0 for i in range(n)}
    # Kiveris et al. bound: O(log^2 n) rounds; in practice a 64-chain
    # collapses in ~5-7 alternations (+1 to observe the fixed point)
    assert rounds <= 10, rounds


def test_connected_components_star_empty_and_selfloop(ray_session):
    import ray.data as rd

    from docling_eval_ray.stages.dedup import connected_components_star

    # self-loops carry no connectivity: only the real pair survives
    ds = rd.from_items(
        [{"doc_id_a": 5, "doc_id_b": 5}, {"doc_id_a": 7, "doc_id_b": 6}]
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components_star(ds).take_all()}
    assert got == {6: 6, 7: 6}


def test_substring_dup_stats_planted_windows(ray_session, tmp_path):
    """Two docs sharing a verbatim 8-token run are counted window-by-
    window; the within-doc-only repeat does NOT count as duplicated."""
    shared = " ".join(f"s{i}" for i in range(10))   # 10 tokens → 3 windows
    texts = {
        1: shared + " alpha beta",
        2: "prefix one two " + shared,
        # doc 3 repeats ITS OWN window twice but shares nothing
        3: " ".join(f"u{i}" for i in range(8)) + " "
           + " ".join(f"u{i}" for i in range(8)),
    }
    _write_docs(tmp_path, texts)
    from docling_eval_ray.stages.dedup import substring_dup_stats

    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
           for r in substring_dup_stats(str(tmp_path)).take_all()}
    # doc1: 12 tokens → 5 windows; the 3 windows fully inside `shared`
    # recur in doc2
    assert got[1] == (5, 3)
    # doc2: 13 tokens → 6 windows; same 3 shared windows
    assert got[2] == (6, 3)
    # doc3: 16 tokens → 9 windows; self-repeat only → zero duplicated
    assert got[3] == (9, 0)


def test_dedup_substrings_excise_keeps_canonical_copy(ray_session,
                                                      tmp_path):
    """ExactSubstr semantics: the duplicated run survives only in the
    minimum doc_id; other docs lose exactly the covered tokens; docs
    shorter than the window pass through untouched."""
    shared = " ".join(f"s{i}" for i in range(10))   # 10 shared tokens
    texts = {
        1: shared + " alpha beta",
        2: "prefix one two " + shared,
        3: "tiny doc",                               # < window: untouched
    }
    _write_docs(tmp_path, texts)
    from docling_eval_ray.stages.dedup import dedup_substrings_excise

    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup_substrings_excise(str(tmp_path)).take_all()}
    # doc1 is the canonical copy: full text kept
    assert got[1] == (texts[1], 0)
    # doc2 loses the 10 shared tokens (windows at starts 3..5 cover
    # positions 3..12), keeping its 3-token prefix
    assert got[2] == ("prefix one two", 10)
    assert got[3] == ("tiny doc", 0)


def test_connected_components_star_random_graphs_match_union_find(
        ray_session):
    """Property: on seeded random graphs (mixed chains, cliques, stars,
    sparse noise) the star alternation produces exactly the union-find
    ground truth."""
    import numpy as np
    import ray.data as rd

    from docling_eval_ray.stages.dedup import connected_components_star

    def uf_clusters(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min per component
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        return {n: min(m) for ms in comp.values() for n in ms
                for m in [ms]}

    rng = np.random.default_rng(42)
    for trial in range(2):
        n = 120
        edges = set()
        # sparse random edges
        for _ in range(100):
            a, b = rng.integers(0, n, 2)
            if a != b:
                edges.add((int(a), int(b)))
        # a long chain (the diameter hazard)
        base = n + 100 * trial
        edges |= {(base + i, base + i + 1) for i in range(40)}
        edges = sorted(edges)
        nodes = sorted({x for e in edges for x in e})
        expected = uf_clusters(edges, nodes)
        ds = rd.from_items(
            [{"doc_id_a": a, "doc_id_b": b} for a, b in edges]
        )
        got = {r["doc_id"]: r["cluster_id"]
               for r in connected_components_star(
                   ds, num_buckets=4).take_all()}
        assert got == expected, trial


def test_minhash_jaccard_calibration_census(ray_session):
    """Calibration invariants on the real corpus: bins are valid
    deciles, every populated bin's mean_abs_err sits inside 3× Broder's
    worst-case σ (√(J(1−J)/128) ≤ 0.0442), estimates live in [0, 1],
    and the census is deterministic."""
    from docling_eval_ray.stages.dedup import minhash_jaccard_calibration

    df = minhash_jaccard_calibration("/root/testdata/sf0.001").to_pandas()
    assert len(df) >= 1
    assert df["bin"].between(0, 9).all()
    assert (df["n_pairs"] > 0).all()
    assert df["mean_est"].between(0, 1).all()
    assert df["mean_exact"].between(0, 1).all()
    assert (df["mean_abs_err"] <= 3 * 0.0442).all()
    again = minhash_jaccard_calibration("/root/testdata/sf0.001").to_pandas()
    assert df.equals(again)


def test_minhash_jaccard_calibration_pair_cap(ray_session):
    """The md5-ordered sample is deterministic and caps the census:
    with a tiny cap, total pairs == cap and two runs agree exactly."""
    from docling_eval_ray.stages.dedup import minhash_jaccard_calibration

    a = minhash_jaccard_calibration(
        "/root/testdata/sf0.001", pair_cap=5).to_pandas()
    b = minhash_jaccard_calibration(
        "/root/testdata/sf0.001", pair_cap=5).to_pandas()
    assert a.equals(b)
    assert a["n_pairs"].sum() == 5


def test_forget_propagation_semantics(ray_session):
    """Direct rows are exactly the request set; every clone shares a
    cluster with a deleted doc and is not itself a request; no doc is
    reported twice."""
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.dedup import (
        FORGET_MOD,
        forget_propagation,
        near_dup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    df = forget_propagation(sf).to_pandas()
    assert df["doc_id"].is_unique
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    want_direct = {d for d in t["doc_id"].to_pylist()
                   if d % FORGET_MOD == 0}
    got_direct = set(df.loc[df["reason"] == "direct", "doc_id"])
    assert got_direct == want_direct
    clus = near_dup_clusters(sf).to_pandas()
    by_doc = dict(zip(clus["doc_id"], clus["cluster_id"]))
    affected = {c for d, c in by_doc.items() if d % FORGET_MOD == 0}
    want_clones = {d for d, c in by_doc.items()
                   if c in affected and d % FORGET_MOD != 0}
    assert set(df.loc[df["reason"] == "clone", "doc_id"]) == want_clones


def test_dedup_inflation_by_source_planted_clones(ray_session, tmp_path):
    """Clones drop everywhere except the min-doc_id winner's slice;
    docs and chars are attributed to the slice the DROPPED copy lives
    in (cross-source clones debit the non-canonical source)."""
    from docling_eval_ray.pipelines.relational import (
        dedup_inflation_by_source,
    )

    rows = [
        # (doc_id, text, lang, source): doc 1 is canonical for "same";
        # docs 2 (same slice) and 3 (other source) are its clones.
        (1, "same text body", "en", "srcA"),
        (2, "same text body", "en", "srcA"),
        (3, "same text body", "en", "srcB"),
        (4, "unique one", "en", "srcA"),
        (5, "unique two", "de", "srcB"),
    ]
    pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pd.array([len(r[1]) for r in rows], dtype="int64"),
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        (r["source"], r["lang"]): r
        for r in dedup_inflation_by_source(str(tmp_path)).take_all()
    }
    a = got[("srcA", "en")]
    assert (a["n_docs"], a["n_kept"], a["n_dropped"]) == (3, 2, 1)
    assert a["chars_dropped"] == len("same text body")
    assert a["dup_ratio"] == round(1 / 3, 6)
    b = got[("srcB", "en")]
    assert (b["n_docs"], b["n_kept"], b["n_dropped"]) == (1, 0, 1)
    assert b["chars_dropped"] == len("same text body")
    c = got[("srcB", "de")]
    assert (c["n_docs"], c["n_dropped"], c["chars_dropped"]) == (1, 0, 0)


def test_incremental_dedup_ingest_verdicts(ray_session, tmp_path):
    """dup_old beats everything; within-shard clones keep exactly one
    canonical 'ingest'; old docs never appear in the output."""
    from docling_eval_ray.pipelines.relational import (
        incremental_dedup_ingest,
    )

    # is_new ⇔ doc_id % 10 == 9
    rows = [
        (1, "stored body"),        # old
        (9, "stored body"),        # new clone of old → dup_old
        (19, "fresh body"),        # new, canonical of in-shard pair
        (29, "fresh body"),        # new clone within shard → dup_new
        (39, "unique body"),       # new, unique → ingest
        (2, "other old"),          # old, unrelated
    ]
    pd.DataFrame(
        {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
         "text": [r[1] for r in rows]}
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r["doc_id"]: r["verdict"]
           for r in incremental_dedup_ingest(str(tmp_path)).take_all()}
    assert got == {9: "dup_old", 19: "ingest", 29: "dup_new",
                   39: "ingest"}

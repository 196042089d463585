"""Mergeable sketches: HLL accuracy + merge semantics, histogram
quantiles."""

import numpy as np
import pytest

from docling_eval_ray.stages.sketches import (
    HyperLogLog,
    approx_distinct,
    quantile_from_histogram,
)


def test_hll_accuracy():
    for n in (100, 5000, 50000):
        hll = HyperLogLog()
        hll.add_many([f"item-{i}" for i in range(n)])
        est = hll.estimate()
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    a, b = HyperLogLog(), HyperLogLog()
    a.add_many([f"x{i}" for i in range(3000)])
    b.add_many([f"x{i}" for i in range(1500, 4500)])  # overlapping
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - 4500) / 4500 < 0.05
    # merge is idempotent and commutative
    assert np.array_equal(merged.registers, b.merge(a).registers)
    assert np.array_equal(
        merged.merge(merged).registers, merged.registers
    )


def test_hll_serialization_roundtrip():
    h = HyperLogLog()
    h.add_many(["a", "b", "c"])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_approx_distinct_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"v": f"k{i % 700}"} for i in range(10000)])
    est = approx_distinct(ds, "v")
    assert abs(est - 700) / 700 < 0.05


def test_quantile_from_histogram():
    vals = np.random.default_rng(3).uniform(0, 1, 20000)
    hist, bins = np.histogram(vals, bins=100, range=(0, 1))
    for q in (0.1, 0.5, 0.9):
        est = quantile_from_histogram(bins.tolist(), hist.tolist(), q)
        true = float(np.quantile(vals, q))
        assert abs(est - true) <= 0.02  # ~2 bin widths
    assert np.isnan(quantile_from_histogram([0, 1], [0], 0.5))


def test_approx_token_vocabulary(ray_session):
    import duckdb

    from docling_eval_ray.stages.sketches import approx_token_vocabulary

    est = approx_token_vocabulary("/root/testdata/sf0.001").to_pandas()
    est_v = float(est["approx_distinct_tokens"].iloc[0])
    exact = duckdb.sql(
        "SELECT count(DISTINCT t) FROM (SELECT unnest(regexp_split_to_array("
        "trim(text), '\\s+')) t FROM "
        "'/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert abs(est_v - exact) / max(1, exact) < 0.1


def test_grouped_hll_accuracy_vs_exact(ray_session):
    import duckdb

    from docling_eval_ray.stages.sketches import daily_active_users_hll

    approx = daily_active_users_hll("/root/testdata/sf0.001").to_pandas()
    exact = duckdb.sql(
        "SELECT strftime(ts, '%Y-%m-%d') AS day, "
        "count(DISTINCT user_id) AS dau "
        "FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1"
    ).df()
    j = approx.merge(exact, on="day")
    assert len(j) == len(exact) > 0
    rel = (j["dau_approx"] - j["dau"]).abs() / j["dau"]
    # p=12 -> ~1.6% standard error; allow 3 sigma headroom per group
    assert rel.max() < 0.05, j[rel >= 0.05]


def test_tdigest_accuracy_rank_error():
    """Rank error |F(est) - q| stays within 0.01 at delta=200 on a
    skewed deterministic sample (tail-accurate where the histogram
    sketch is weakest)."""
    from docling_eval_ray.stages.sketches import TDigest

    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(0.0, 1.5, 50_000))  # lognormal, heavy tail
    td = TDigest(200)
    for chunk in np.array_split(vals, 25):
        td.add_many(chunk)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        est = td.quantile(q)
        rank = float(np.mean(vals <= est))
        assert abs(rank - q) < 0.01, (q, est, rank)


def test_tdigest_merge_matches_single_digest():
    """Merging per-shard digests estimates like one digest over all
    data (rank error bound holds through the merge)."""
    from docling_eval_ray.stages.sketches import TDigest

    rng = np.random.default_rng(11)
    vals = rng.gamma(2.0, 3.0, 40_000)
    parts = []
    for chunk in np.array_split(vals, 16):
        td = TDigest(200)
        td.add_many(chunk)
        parts.append(td)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.weights.sum() == len(vals)
    assert merged.means.size <= 2 * 200  # scale bound holds post-merge
    for q in [0.05, 0.5, 0.95]:
        rank = float(np.mean(vals <= merged.quantile(q)))
        assert abs(rank - q) < 0.01


def test_tdigest_serialization_roundtrip():
    from docling_eval_ray.stages.sketches import TDigest

    td = TDigest(100)
    td.add_many(np.arange(1000, dtype=np.float64))
    rt = TDigest.from_bytes(td.to_bytes(), 100)
    assert rt.min == td.min and rt.max == td.max
    assert np.array_equal(rt.means, td.means)
    assert np.array_equal(rt.weights, td.weights)
    assert rt.quantile(0.5) == td.quantile(0.5)


def test_events_value_tdigest_vs_exact(ray_session):
    """Pipeline accuracy: the sketch quantiles of events.value land
    within 0.01 rank error of the exact distribution at sf0.001."""
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.sketches import (
        events_type_p99_tdigest,
        events_value_tdigest,
    )

    vals = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["value"]
    )["value"].to_numpy()
    out = events_value_tdigest("/root/testdata/sf0.001").to_pandas()
    for q, est in zip(out["q"], out["value_approx"]):
        rank = float(np.mean(vals <= est))
        assert abs(rank - q) < 0.01, (q, est, rank)

    # grouped p99: rank error per event_type
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_type", "value"]).to_pandas()
    got = events_type_p99_tdigest("/root/testdata/sf0.001").to_pandas()
    assert set(got["event_type"]) == set(t["event_type"].unique())
    for _, row in got.iterrows():
        grp = t.loc[t["event_type"] == row["event_type"], "value"].to_numpy()
        rank = float(np.mean(grp <= row["p99_approx"]))
        assert abs(rank - 0.99) < 0.02, (row["event_type"], rank)


def test_token_count_min_calibration(ray_session):
    """CM never underestimates; the estimate equals the min over rows
    of a hand-rebuilt lattice; the top-k tokens equal the exact census."""
    import hashlib

    import duckdb

    from docling_eval_ray.stages.sketches import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
        token_count_min,
    )

    sf = "/root/testdata/sf0.001"
    got = token_count_min(sf).to_pandas()
    assert len(got) == CMS_TOPK
    assert (got["overcount"] >= 0).all()
    assert (got["n_cms"] == got["n_exact"] + got["overcount"]).all()

    # exact counts + hand-built lattice, straight from the parquet
    con = duckdb.connect()
    cnt = con.sql(
        f"""SELECT tok, count(*) AS n
            FROM '{sf}/documents.parquet',
                 UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
            GROUP BY tok"""
    ).df()
    lattice = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    buckets = {}
    for tok, n in zip(cnt["tok"], cnt["n"]):
        h = hashlib.md5(str(tok).encode()).hexdigest()
        bs = [int(h[8 * d:8 * d + 8], 16) % CMS_W for d in range(CMS_D)]
        buckets[str(tok)] = bs
        for d, b in enumerate(bs):
            lattice[d, b] += int(n)
    exact = dict(zip(cnt["tok"].astype(str), cnt["n"].astype(int)))
    for row in got.itertuples():
        assert row.n_exact == exact[row.token]
        want = min(lattice[d, b] for d, b in enumerate(buckets[row.token]))
        assert row.n_cms == want, row.token

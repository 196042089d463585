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

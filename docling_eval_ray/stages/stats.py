"""Distributed ``compute_stats`` — the reference's per-metric statistics
kernel (evaluators/stats.py:77-97): count/mean/median/std + fixed-range
histogram.

Decomposition: count/sum/sumsq/min/max and the fixed-bin histogram are
partial+final mergeable (one row of partials per batch crosses the
wire). Median is exact here via a distributed sort + index probe —
acceptable for evaluation-sized outputs; at 10^12 rows swap in a
quantile sketch (t-digest / KLL) merged the same way, with documented
error bounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def compute_stats(ds, col: str, *, max_value_is_one: bool = True,
                  nr_bins: int = 20, approx_median: bool = False) -> dict:
    """Returns the reference's DatasetStatistics dict:
    {total, mean, median, std, bins, hist}. ``std`` is the sample
    stdev (statistics.stdev), histogram range is [0, 1] or [0, max].
    Null/NaN rows are dropped first (evaluators emit None for
    not-applicable docs).

    ``approx_median=True`` is the corpus-scale path: the median is
    interpolated from the mergeable fixed-bin histogram (error ≤ one
    bin width — 0.05 at the default 20 bins over [0,1]; raise
    ``nr_bins`` to tighten) and the global sort is skipped entirely."""
    import pyarrow.compute as pc

    def dropnull(t: pa.Table) -> pa.Table:
        col_arr = t[col]
        mask = pc.is_valid(col_arr)
        if pa.types.is_floating(col_arr.type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(col_arr)))
        return t.filter(mask)

    ds = ds.map_batches(dropnull, batch_format="pyarrow")
    if max_value_is_one:
        max_value = 1.0
    else:
        m = ds.max(col)
        max_value = float(m) if m is not None else 1.0

    edges = np.histogram_bin_edges([], bins=nr_bins, range=(0.0, max_value))

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        hist, _ = np.histogram(v, bins=nr_bins, range=(0.0, max_value))
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "s": pa.array([float(v.sum())], pa.float64()),
                "ss": pa.array([float((v * v).sum())], pa.float64()),
                "hist": pa.array([hist.astype(np.int64)],
                                 pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = int(sum(p["n"] for p in parts))
    if total == 0:
        return {
            "total": 0, "mean": -1.0, "median": -1.0, "std": 0.0,
            "bins": edges.tolist(), "hist": [0] * nr_bins,
        }
    s = float(sum(p["s"] for p in parts))
    ss = float(sum(p["ss"] for p in parts))
    hist = np.sum([np.asarray(p["hist"]) for p in parts], axis=0)
    mean = s / total
    var = (ss - total * mean * mean) / (total - 1) if total > 1 else 0.0
    std = float(np.sqrt(max(var, 0.0)))

    mid_lo = (total - 1) // 2
    mid_hi = total // 2  # == mid_lo when total is odd
    if approx_median:
        from .sketches import quantile_from_histogram

        median = float(
            quantile_from_histogram(edges.tolist(), hist.tolist(), 0.5)
        )
    else:
        # exact median: distributed sort, then a STREAMING rank scan
        # with early stop — the driver holds one batch at a time, never
        # a materialized prefix (the previous limit().take_all() pulled
        # n/2 rows into a driver list)
        seen = 0
        grabbed: dict[int, float] = {}
        for b in ds.sort(col).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            v = b[col].to_numpy(zero_copy_only=False)
            for rank in (mid_lo, mid_hi):
                if rank not in grabbed and seen <= rank < seen + len(v):
                    grabbed[rank] = float(v[rank - seen])
            seen += len(v)
            if mid_hi in grabbed:
                break
        median = (grabbed[mid_lo] + grabbed[mid_hi]) / 2.0

    return {
        "total": total,
        "mean": mean,
        "median": median,
        "std": std,
        "bins": edges.tolist(),
        "hist": hist.astype(int).tolist(),
    }

"""Distributed global row numbering — the ``ROW_NUMBER() OVER (ORDER BY
key)`` primitive Ray Data lacks.

A global rank over a total order normally implies a full sort plus a
sequential scan.  Here it is two cheap exchanges, the range-partitioned
rank construction used by every MPP engine:

1. **Boundary sampling** (streaming, no shuffle): each batch contributes
   a handful of evenly-spaced key values; the driver takes quantiles of
   that bounded sample as ``num_ranges - 1`` range boundaries.  The
   boundaries only affect load balance, never the result.
2. **Range counting** (tiny shuffle): one partial bincount per batch,
   one ≤``num_ranges``-row final aggregate → the exclusive prefix sum
   gives every range its global rank offset, broadcast via ``ray.put``.
3. **In-range ranking** (one shuffle on the range id): all rows of a
   range meet in one task, sort locally by ``(key, *tiebreak)``, and get
   ``offset + 1 .. offset + n`` as their 1-based row number.

Equal keys are routed to one range by value (``searchsorted`` is a pure
function of the key), so ties never straddle a boundary; pass
``tiebreak`` columns to make the numbering among ties deterministic.
At 100 TB this scales by raising ``num_ranges`` so a range fits a task
(the per-range frames are the only materialized unit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

RANGE_COL = "__range"

#: evenly-spaced key samples contributed per batch for boundary picking;
#: the driver-side sample is ≤ SAMPLES_PER_BATCH × num_blocks values.
SAMPLES_PER_BATCH = 8


def global_row_number(ds, key: str, *, tiebreak: list[str] | None = None,
                      num_ranges: int = 64, out_col: str = "rn"):
    """Append a 1-based global ``out_col`` ordered by ``(key, *tiebreak)``.

    ``key`` must be a numeric column; ``tiebreak`` orders rows that share
    a key value (without it, their relative numbering is unspecified —
    same contract as SQL ``ROW_NUMBER`` without a full ORDER BY key).
    """
    import ray

    tiebreak = tiebreak or []

    # a global rank is an inherent pipeline breaker (the boundary sample
    # and the range counts must both see every row before any row can be
    # numbered), so materialize the input ONCE: sample, count, and rank
    # then consume the same computed blocks instead of re-executing the
    # upstream pipeline three times. The object store spills if needed —
    # this is the exchange an MPP engine would stage to disk anyway.
    ds = ds.materialize()

    def sample(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"k": pa.array([], pa.float64())})
        idx = np.linspace(0, len(k) - 1, min(SAMPLES_PER_BATCH, len(k)))
        return pa.table(
            {"k": pa.array(k[idx.astype(np.int64)].astype(np.float64))}
        )

    sampled = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    # an empty dataset yields zero batches and loses the sample schema
    picks = (
        np.sort(sampled["k"].to_numpy())
        if "k" in sampled.columns
        else np.array([], dtype=np.float64)
    )
    if len(picks) == 0:
        boundaries = np.array([], dtype=np.float64)
    else:
        qs = np.linspace(0, 1, num_ranges + 1)[1:-1]
        boundaries = np.unique(np.quantile(picks, qs))

    def assign(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(boundaries, k, side="left")
        return t.append_column(
            RANGE_COL, pa.array(rid.astype(np.int64), pa.int64())
        )

    ranged = ds.map_batches(assign, batch_format="pyarrow")

    # tiny exchange: one ≤num_ranges-row partial per batch
    def count_partial(t: pa.Table) -> pa.Table:
        rid, n = np.unique(
            t[RANGE_COL].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({RANGE_COL: pa.array(rid, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    counts = (
        ranged.map_batches(count_partial, batch_format="pyarrow")
        .groupby(RANGE_COL)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if RANGE_COL not in counts.columns:  # zero-row input: empty aggregate
        def empty_rn(t: pa.Table) -> pa.Table:
            return t.drop_columns([RANGE_COL]).append_column(
                out_col, pa.array([], pa.int64())
            )

        return ranged.map_batches(empty_rn, batch_format="pyarrow")
    counts = counts.sort_values(RANGE_COL)
    offsets = dict(zip(
        counts[RANGE_COL].to_numpy(),
        np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]]),
    ))
    off_ref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=[RANGE_COL]).assign(
                **{out_col: pd.Series([], dtype=np.int64)}
            )
        rid = int(g[RANGE_COL].iloc[0])
        base = int(ray.get(off_ref)[rid])
        g = g.sort_values([key, *tiebreak], kind="mergesort")
        g[out_col] = base + np.arange(1, len(g) + 1, dtype=np.int64)
        return g.drop(columns=[RANGE_COL])

    return ranged.groupby(RANGE_COL).map_groups(rank, batch_format="pandas")

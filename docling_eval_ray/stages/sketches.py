"""Mergeable sketches — the at-scale replacements for exact G1 stats.

The reference computes medians and distincts exactly in memory
(evaluators/stats.py; SURVEY.md §2.5 notes no sketches exist). At 10^12
rows those become sketches merged with the same partial+final pattern as
the sums:

* ``HyperLogLog`` — approximate distinct count (public Flajolet et al.
  2007 algorithm, with the standard small-range linear-counting
  correction). One register array per batch, elementwise-max merge.
* ``quantile_from_histogram`` — ε-bounded quantiles from the mergeable
  fixed-bin histogram the stats kernel already produces (error ≤ one
  bin width; tighten by raising ``nr_bins``).

Both are exercised end-to-end as Ray pipelines with accuracy asserted
against the exact answers in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HyperLogLog:
    """Dense HLL with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash(values: list[str]) -> np.ndarray:
        from .dedup import _hash64  # the project's canonical 64-bit hash

        return np.array([_hash64(v) for v in values], dtype=np.uint64)

    def add_many(self, values: list[str]) -> None:
        if not values:
            return
        h = self._hash(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of the remaining bits + 1 (capped)
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        for r in range(64 - self.p + 1):
            undecided = lz == r
            if not undecided.any():
                break
            zero_top = (cur & mask) == 0
            lz[undecided & zero_top] += 1
            cur = cur << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:  # small-range correction: linear counting
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        out = cls(p)
        out.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return out


def approx_distinct(ds, col: str, *, p: int = 12) -> float:
    """Distributed approximate distinct: one serialized HLL per batch →
    elementwise-max merge on the driver (sketches are tiny: 4 KiB)."""

    def partial(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        # nulls are dropped, matching COUNT(DISTINCT) and the exact
        # stats kernel's dropnull semantics (str(None) would conflate
        # NULL with the literal string "None")
        hll.add_many([str(v) for v in t[col].to_pylist() if v is not None])
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = HyperLogLog(p)
    for row in parts:
        merged = merged.merge(HyperLogLog.from_bytes(row["sketch"], p))
    return merged.estimate()


def quantile_from_histogram(bins: list[float], hist: list[int],
                            q: float) -> float:
    """Linear-interpolated quantile from a fixed-bin histogram; error is
    bounded by one bin width. A target rank landing exactly on a bin
    boundary followed by empty bins interpolates to the midpoint of the
    gap (mirroring np.quantile's behavior between order statistics —
    returning the lower edge alone would be off by the whole empty run).
    """
    total = sum(hist)
    if total == 0:
        return float("nan")
    target = q * total
    cum = 0.0
    for i, h in enumerate(hist):
        if cum + h >= target and h > 0:
            frac = (target - cum) / h
            if frac >= 1.0:
                # boundary rank: bridge to the next non-empty bin
                for j in range(i + 1, len(hist)):
                    if hist[j] > 0:
                        return (bins[i + 1] + bins[j]) / 2.0
                return bins[i + 1]
            return bins[i] + frac * (bins[i + 1] - bins[i])
        cum += h
    return bins[-1]


def approx_token_vocabulary(sf_dir: str):
    """Rows-only query: approximate distinct-token count over the whole
    corpus via per-batch HLL merge, next to the exact count for the
    driver's rows check (exactness asserted in tests at small scale)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(s.split())
        return pa.table({"token": pa.array(toks, pa.string())})

    tokens = ds.map_batches(explode, batch_format="pyarrow")
    est = approx_distinct(tokens, "token")
    return pa.table(
        {
            "approx_distinct_tokens": pa.array([round(est, 1)], pa.float64()),
        }
    )


def grouped_approx_distinct(ds, key: str, col: str, *, p: int = 12,
                            out_col: str = "approx_distinct"):
    """Per-group approximate COUNT(DISTINCT col): one serialized HLL
    per (batch, group) partial → ONE bucketed shuffle on the group key →
    register-wise max merge + estimate inside the bucket task. The
    grouped proof of the sketch claim: the partial+final merge slots
    that carry sums carry 4 KiB mergeable sketches unchanged, so the
    exchange stays (groups × batches) sketch rows even when a group has
    billions of members (contrast ``daily_active_users``, whose exact
    pair-dedup exchange grows with the distinct count itself)."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.groups import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        vals = t[col].to_pylist()
        rows_k, rows_s = [], []
        import numpy as _np

        order = _np.argsort(keys, kind="stable")
        sk, sv = keys[order], [vals[i] for i in order]
        start = 0
        for i in range(1, len(sk) + 1):
            if i == len(sk) or sk[i] != sk[start]:
                hll = HyperLogLog(p)
                hll.add_many(
                    [str(v) for v in sv[start:i] if v is not None]
                )
                rows_k.append(sk[start])
                rows_s.append(hll.to_bytes())
                start = i
        # type the key column from the INPUT schema: pa.array([]) on an
        # empty batch would infer null type and split block schemas
        return pa.table({
            key: pa.array(rows_k, t.schema.field(key).type),
            "sketch": pa.array(rows_s, pa.binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_v = [], []
        for k, grp in g.groupby(key, sort=True):
            merged = HyperLogLog(p)
            for s in grp["sketch"]:
                merged = merged.merge(HyperLogLog.from_bytes(bytes(s), p))
            out_k.append(k)
            out_v.append(round(merged.estimate(), 1))
        import numpy as _np

        return pd.DataFrame({key: out_k,
                             out_col: _np.asarray(out_v, _np.float64)})

    return bucketed_group_apply(parts, [key], merge_bucket)


def daily_active_users_hll(sf_dir: str):
    """Approximate DAU via the grouped HLL (rows-only; accuracy vs the
    exact ``daily_active_users`` asserted in tests/test_sketches.py)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day_key(t):
        import pandas as pd
        import pyarrow as pa

        day = pd.to_datetime(t["ts"].to_pandas()).dt.strftime("%Y-%m-%d")
        return pa.table({"day": pa.array(day.to_numpy(), pa.string()),
                         "user_id": t["user_id"]})

    keyed = ds.map_batches(day_key, batch_format="pyarrow")
    return grouped_approx_distinct(keyed, "day", "user_id",
                                   out_col="dau_approx")

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

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.groups import final_groupby_sum

# (the HLL hash was blake2b via dedup._hash64 through round 5; it is
# md5 now so DuckDB can rebuild the registers — see HyperLogLog._hash)


class HyperLogLog:
    """Dense HLL with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash(values: list[str]) -> np.ndarray:
        # md5 top half (the _md5_hash64 convention), NOT blake2b: the
        # register build is then bit-reproducible in DuckDB
        # (substr(md5(v),1,16) → UBIGINT; rest = (h·2^p) mod 2^64 in
        # HUGEINT; leading zeros via length(bin(rest))), which is what
        # makes daily_active_users_hll / approx_token_vocabulary
        # hash-oracle-able instead of rows-only.
        return np.array(
            [int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
             for v in values],
            dtype=np.uint64,
        )

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
    """Approximate distinct-token count over the whole corpus via
    per-batch HLL merge — hash-oracled: DuckDB rebuilds the md5
    registers and replays the estimator arithmetic (accuracy vs the
    exact count additionally asserted in tests at small scale)."""
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
    """Approximate DAU via the grouped HLL — hash-oracled (the SQL
    replica rebuilds each day's registers from md5 and replays the
    estimator); accuracy vs the exact ``daily_active_users``
    additionally asserted in tests/test_sketches.py."""
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


# ---------------------------------------------------------------------------
# t-digest: mergeable quantile sketch (Dunning & Ertl's merging digest,
# k1 scale function) — the at-scale replacement for exact percentiles
# the way HyperLogLog replaces exact distincts. Deterministic: centroids
# are built by one stable sort + greedy scale-bounded merge, no
# randomness, so partial→merge→quantile reproduces bit-for-bit across
# runs and block orders of the SAME partials.
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function.

    ``delta`` bounds the centroid count (~delta centroids, ~16·delta
    bytes serialized), and quantile error is O(q(1-q)/delta) — tightest
    in the tails, which is exactly where fixed-bin histograms
    (``quantile_from_histogram``) are weakest. Public algorithm:
    Dunning & Ertl, "Computing extremely accurate quantiles using
    t-digests" (arXiv:1902.04023).
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self.min = float("inf")
        self.max = float("-inf")

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2.0 * np.pi) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0)
        )

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        if total == 0:
            self.means, self.weights = m[:0], w[:0]
            return
        out_m: list[float] = []
        out_w: list[float] = []
        w_left = 0.0  # total weight strictly left of the open centroid
        k_lo = float(self._k(np.array([0.0]))[0])
        cm, cw = float(m[0]), float(w[0])
        for i in range(1, len(m)):
            q_hi = (w_left + cw + w[i]) / total
            if float(self._k(np.array([q_hi]))[0]) - k_lo <= 1.0:
                cm += (m[i] - cm) * (w[i] / (cw + w[i]))
                cw += float(w[i])
            else:
                out_m.append(cm)
                out_w.append(cw)
                w_left += cw
                k_lo = float(self._k(np.array([w_left / total]))[0])
                cm, cw = float(m[i]), float(w[i])
        out_m.append(cm)
        out_w.append(cw)
        self.means = np.asarray(out_m, np.float64)
        self.weights = np.asarray(out_w, np.float64)

    def add_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(v.size, np.float64)]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta
        out = TDigest(self.delta)
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return out

    def quantile(self, q: float) -> float:
        """Interpolated quantile: each centroid contributes half its
        weight on either side of its mean; tails clamp to the tracked
        exact min/max."""
        if self.weights.size == 0:
            return float("nan")
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            lo_w = cum[0]
            if lo_w <= 0:
                return float(self.means[0])
            frac = max(target, 0.0) / lo_w
            return self.min + frac * (float(self.means[0]) - self.min)
        if target >= cum[-1]:
            hi_w = total - cum[-1]
            if hi_w <= 0:
                return float(self.means[-1])
            frac = min(target - cum[-1], hi_w) / hi_w
            return float(self.means[-1]) + frac * (
                self.max - float(self.means[-1])
            )
        i = int(np.searchsorted(cum, target, side="right"))
        span = cum[i] - cum[i - 1]
        frac = (target - cum[i - 1]) / span if span > 0 else 0.0
        return float(self.means[i - 1]
                     + frac * (self.means[i] - self.means[i - 1]))

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<qdd", self.means.size, self.min, self.max)
        return (head + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes, delta: int = 200) -> "TDigest":
        import struct

        n, mn, mx = struct.unpack_from("<qdd", data, 0)
        off = struct.calcsize("<qdd")
        td = cls(delta)
        td.min, td.max = mn, mx
        td.means = np.frombuffer(data, np.float64, n, off).copy()
        td.weights = np.frombuffer(
            data, np.float64, n, off + 8 * n
        ).copy()
        return td


def approx_quantiles(ds, col: str, qs: list[float], *,
                     delta: int = 200) -> dict[float, float]:
    """Distributed approximate quantiles: one serialized t-digest per
    batch → driver merge (sketches are ~16·delta bytes — the same
    sketch-sized take_all contract as ``approx_distinct``; tree-reduce
    via the bloom fan-in pattern if batches ever number 10^6)."""

    def partial(t: pa.Table) -> pa.Table:
        td = TDigest(delta)
        td.add_many(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([td.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = TDigest(delta)
    for row in parts:
        merged = merged.merge(TDigest.from_bytes(row["sketch"], delta))
    return {q: merged.quantile(q) for q in qs}


def events_value_tdigest(sf_dir: str):
    """Rows-only query: approximate value quantiles (p01/p25/p50/p75/
    p99) over events via per-batch t-digest merge — the sketch-path
    counterpart of the exact sort-based quantiles; accuracy vs
    np.quantile asserted in tests/test_sketches.py."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    qs = [0.01, 0.25, 0.50, 0.75, 0.99]
    est = approx_quantiles(ds, "value", qs)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value_approx": pa.array(
                [round(est[q], 6) for q in qs], pa.float64()
            ),
        }
    )


def grouped_approx_quantile(ds, key: str, col: str, q: float, *,
                            delta: int = 200,
                            out_col: str = "quantile_approx"):
    """Per-group approximate quantile: (batch, group) t-digest partials
    → ONE bucketed shuffle on the group key → digest merge + quantile
    inside the bucket task. Same exchange bound as
    ``grouped_approx_distinct``: (groups × batches) sketch rows, flat in
    the group sizes — a per-group p99 at 10^9 rows/group moves KiB, not
    rows."""
    import pandas as pd

    from ..functions.groups import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        vals = t[col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sk, sv = keys[order], vals[order]
        rows_k, rows_s = [], []
        start = 0
        for i in range(1, len(sk) + 1):
            if i == len(sk) or sk[i] != sk[start]:
                td = TDigest(delta)
                td.add_many(sv[start:i])
                rows_k.append(sk[start])
                rows_s.append(td.to_bytes())
                start = i
        return pa.table({
            key: pa.array(rows_k, t.schema.field(key).type),
            "sketch": pa.array(rows_s, pa.binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_v = [], []
        for k, grp in g.groupby(key, sort=True):
            merged = TDigest(delta)
            for s in grp["sketch"]:
                merged = merged.merge(TDigest.from_bytes(bytes(s), delta))
            out_k.append(k)
            out_v.append(round(merged.quantile(q), 6))
        return pd.DataFrame({key: out_k,
                             out_col: np.asarray(out_v, np.float64)})

    return bucketed_group_apply(parts, [key], merge_bucket)


def events_type_p99_tdigest(sf_dir: str):
    """Rows-only query: per-event-type approximate p99 of ``value`` via
    the grouped t-digest (accuracy vs the exact per-group percentile
    asserted in tests/test_sketches.py)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_approx_quantile(ds, "event_type", "value", 0.99,
                                   out_col="p99_approx")


# ---------------------------------------------------------------------------
# Count-Min sketch — heavy-hitter estimates, hash-oracled
# ---------------------------------------------------------------------------

#: Count-Min geometry (Cormode & Muthukrishnan 2005): CMS_D independent
#: rows × CMS_W counters. Each row's hash is a disjoint 8-hex-digit
#: slice of ONE md5 per token — bit-reproducible in SQL as
#: ``CAST(('0x'||substr(md5(tok), 1+8*d, 8)) AS UBIGINT) % CMS_W``, the
#: same recipe that makes simhash/minhash oracle-able. Expected
#: overcount per row ≈ N/CMS_W, min over rows tightens it.
CMS_D = 4
CMS_W = 1024
CMS_TOPK = 25


def _cms_buckets(tokens: list[str]) -> np.ndarray:
    """(len(tokens), CMS_D) bucket ids from md5 hex slices."""
    out = np.empty((len(tokens), CMS_D), dtype=np.int64)
    for i, tok in enumerate(tokens):
        h = hashlib.md5(tok.encode()).hexdigest()
        for d in range(CMS_D):
            out[i, d] = int(h[8 * d:8 * d + 8], 16) % CMS_W
    return out


def token_count_min(sf_dir: str):
    """(token, n_exact, n_cms, overcount) for the exact top-25 tokens —
    the Count-Min calibration census: how far the mergeable sketch
    overestimates the heavy hitters it exists to find (CM never
    underestimates, so ``overcount >= 0`` always).

    Scale shape: ONE corpus scan produces per-batch unique token counts
    (one row per distinct token per batch, as in
    ``token_frequency_topk``); the lattice is LINEAR in those partials,
    so each batch folds its counts into a local D×W array and the
    shuffle moves ≤ D·W pre-aggregated cells per batch. The merged
    lattice is 4096 int64 cells — sketch-sized driver state by
    construction. The exact top-k reuses the partial counts (one
    vocabulary-sized groupby, same cost as the census it calibrates)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_trim(t["text"], characters=" "), r"\s+"
            )
        )
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    # consumed twice (lattice + exact top-k) — materialize or the whole
    # corpus scan re-executes per consumer (CLAUDE.md r5 lesson)
    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def cm_partial(t: pa.Table) -> pa.Table:
        lattice = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        b = _cms_buckets(t["token"].to_pylist())
        ns = t["n"].to_numpy()
        for d in range(CMS_D):
            np.add.at(lattice[d], b[:, d], ns)
        d_idx, b_idx = np.nonzero(lattice)
        return pa.table(
            {
                "d": pa.array(d_idx, pa.int64()),
                "b": pa.array(b_idx, pa.int64()),
                "c": pa.array(lattice[d_idx, b_idx], pa.int64()),
            }
        )

    lat_rows = final_groupby_sum(
        parts.map_batches(cm_partial, batch_format="pyarrow"),
        ["d", "b"], ["c"],
    ).take_all()  # ≤ CMS_D*CMS_W = 4096 rows: sketch-sized, gated
    lattice = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in lat_rows:
        lattice[r["d"], r["b"]] = r["c"]

    top = (
        final_groupby_sum(parts, ["token"], ["n"])
        .sort(["n", "token"], descending=[True, False])
        .limit(CMS_TOPK)
        .to_pandas()
    )
    toks = [str(s) for s in top["token"]]
    n_exact = top["n"].to_numpy(dtype=np.int64)
    est = lattice[
        np.arange(CMS_D)[None, :], _cms_buckets(toks)
    ].min(axis=1)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "n_exact": pa.array(n_exact, pa.int64()),
            "n_cms": pa.array(est, pa.int64()),
            "overcount": pa.array(est - n_exact, pa.int64()),
        }
    )

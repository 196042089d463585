"""Distributed join strategies for Ray Data.

The reference has no distributed joins — every join there is row-local or
a small-dict probe (SURVEY.md §2.4). At scale two strategies cover the
rebuild:

* **broadcast join** — the small side (dimension table, blocklist, doc_id
  → path map; reference J2/J3 analogues) is ``ray.put`` once and probed
  inside ``map_batches``. No shuffle; the side ships to each actor once,
  not per batch.
* **bucketed hash join** — both sides large: add ``bucket =
  hash(key) % B`` to each side, align schemas, union, group by bucket,
  and merge the two sides pairwise inside ``map_groups``. One explicit
  all-to-all keyed by the bucket; skewed keys can be diluted by raising
  ``num_buckets``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Module-scope, not lazy: _bloom_probe_filter runs INSIDE worker probe
# tasks; a runtime relative import there raises ModuleNotFoundError on
# workers that can't import the repo path. stages.bloom has no
# module-scope import back into this module, so this is cycle-safe.
from ..stages.bloom import BloomFilter

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


class BroadcastJoin:
    """Actor-pool stage: enrich each batch with the broadcast small side.

    Constructed with a ``ray.ObjectRef`` to a pandas DataFrame put once on
    the driver; Ray resolves the ref in the actor constructor, so each
    actor holds exactly one copy (never re-shipped per batch).
    """

    def __init__(self, small_df, on: str, how: str = "inner"):
        import ray

        if isinstance(small_df, ray.ObjectRef):
            # resolved once per actor from the local object store — the
            # broadcast: one copy per node, never re-shipped per batch
            small_df = ray.get(small_df)
        self._small = small_df.set_index(on)
        self._on = on
        self._how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            self._small, left_on=self._on, right_index=True, how=self._how
        )


def broadcast_join(ds, small_df: pd.DataFrame, on: str, *, how: str = "inner",
                   concurrency=None, batch_size: int = 65536):
    """Join ``ds`` against a small in-memory side without a shuffle.

    Task mode by default (the ``ray.get`` per task hits the local object
    store); pass ``concurrency`` for an actor pool when the probe-side
    index is expensive to build.
    """
    import ray

    from ..stages.util import stage

    ref = ray.put(small_df)
    return stage(ds, BroadcastJoin, args=(ref, on, how),
                 batch_format="pandas", batch_size=batch_size,
                 concurrency=concurrency)


#: dimension-side size gate for ``dim_join``: up to this many rows the
#: side is genuinely "small" (≈ tens of MB broadcast once per node);
#: beyond it a broadcast stops being a broadcast and the join must
#: shuffle. Customer-scale tables cross this line long before 100 TB.
BROADCAST_ROW_LIMIT = 1_000_000


def dim_join(large_ds, small_ds, on: str, *,
             broadcast_limit: int = BROADCAST_ROW_LIMIT,
             num_buckets: int = 32):
    """Fact ⋈ dimension with an explicit size threshold: dimensions at
    or under ``broadcast_limit`` rows broadcast (``ray.put`` once, probe
    per batch — no shuffle); larger ones route through the bucketed
    ``hash_join``. The dimension pipeline is materialized once
    (dimension-sized by definition) so the count probe and the join
    consume the same computed blocks instead of re-running the
    dimension scan. This is the size-policy answer to "customer scales
    with sf": the pattern stays a broadcast only while the side is
    provably small."""
    # metadata-only schema probe BEFORE materialize: materializing an
    # empty dataset drops the schema entirely in this Ray version, so a
    # zero-row dimension (e.g. empty parquet input) would otherwise be
    # unjoinable even though the read knows its columns
    pre_schema = small_ds.schema(fetch_if_missing=False)
    small_ds = small_ds.materialize()
    n = small_ds.count()
    if n <= broadcast_limit:
        if n == 0:
            # typed empty frame: to_pandas() of an empty Dataset can
            # lose the column structure the probe-side merge needs
            sch = small_ds.schema() or pre_schema
            if sch is None:
                raise ValueError(
                    "dim_join dimension side has no derivable schema "
                    "(empty dataset with unknown columns) — materialize "
                    "or supply a typed empty side"
                )
            small_df = pd.DataFrame(
                {
                    name: pd.Series(
                        dtype=t.to_pandas_dtype()
                        if isinstance(t, pa.DataType) else object
                    )
                    for name, t in zip(sch.names, sch.types)
                }
            )
        else:
            small_df = small_ds.to_pandas()
        return broadcast_join(large_ds, small_df, on=on)
    return hash_join(large_ds, small_ds, on=on, num_buckets=num_buckets)


_KEY_PRIME = np.uint64(1000003)


def _pad_tag_bucket(side: str, on: list[str], out_schema: pa.Schema,
                    num_buckets: int):
    """Project a batch onto the aligned union schema (typed nulls for the
    other side's columns), tag the side, and add the hash bucket."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for field in out_schema:
            if field.name == _SIDE_COL:
                cols.append(pa.array([side] * n, pa.string()))
            elif field.name == _BUCKET_COL:
                h = np.zeros(n, np.uint64)
                for k in on:
                    # cast BEFORE hashing: pd.util.hash_array views ints
                    # at native width, so an int32 -1 and an int64 -1
                    # would otherwise bucket-misroute across sides
                    arr = batch[k].cast(out_schema.field(k).type)
                    if pa.types.is_integer(arr.type):
                        # ONE null in an integer batch decays the whole
                        # to_numpy to float64 (NaN), silently hashing
                        # every row of the batch differently from the
                        # null-free other side — fill nulls first (null
                        # keys never match a join anyway; they only need
                        # a deterministic bucket)
                        if isinstance(arr, pa.ChunkedArray):
                            arr = arr.combine_chunks()
                        key = arr.fill_null(0).to_numpy(
                            zero_copy_only=False
                        ).astype(np.int64)
                    else:
                        key = arr.to_numpy(zero_copy_only=False)
                    h = h * _KEY_PRIME + pd.util.hash_array(
                        np.ascontiguousarray(key)
                    )
                cols.append(
                    pa.array((h % num_buckets).astype(np.int64), pa.int64())
                )
            elif field.name in batch.column_names:
                cols.append(batch[field.name].cast(field.type))
            else:
                cols.append(pa.nulls(n, field.type))
        return pa.Table.from_arrays(cols, schema=out_schema)

    return fn


def hash_join(left_ds, right_ds, on: str | list[str], *,
              num_buckets: int = 32, how: str = "inner"):
    """Explicit partitioned hash join of two Datasets on one or more keys.

    Both sides are bucketed by ``hash(keys) % num_buckets`` and merged
    per-bucket inside ``map_groups`` — the portable Ray Data hash-join
    pattern (exactly one shuffle, keyed on the bucket). ``num_buckets``
    bounds per-group memory: size it so the larger side's
    rows/num_buckets fits a worker heap; raise it to dilute hot keys.

    ``how`` is ``"inner"`` (default), ``"left"`` or ``"full"`` — outer
    variants emit unmatched rows with nulls on the absent side (key
    columns are coalesced from whichever side is present, so they are
    never null; non-key columns of an outer side become nullable, with
    integer dtypes preserved via Arrow take-with-null-index rather than
    pandas NaN decay).

    Non-key column names must be disjoint between the two sides (rename
    before joining); output dtypes are restored from the input schemas
    (the union's typed nulls would otherwise decay int→float in pandas).
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be inner|left|full, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_ds, left_schema = _ensure_arrow_pair(left_ds)
    right_ds, right_schema = _ensure_arrow_pair(right_ds)
    left_cols = left_schema.names
    right_cols = right_schema.names
    overlap = (set(left_cols) & set(right_cols)) - set(keys)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")

    union_fields = [left_schema.field(c) for c in left_cols]
    union_fields += [right_schema.field(c) for c in right_cols
                     if c not in keys]
    union_fields += [
        pa.field(_SIDE_COL, pa.string()),
        pa.field(_BUCKET_COL, pa.int64()),
    ]
    union_schema = pa.schema(union_fields)

    out_fields = [left_schema.field(c) for c in left_cols]
    out_fields += [right_schema.field(c) for c in right_cols
                   if c not in keys]
    out_schema = pa.schema(out_fields)

    tagged = left_ds.map_batches(
        _pad_tag_bucket("l", keys, union_schema, num_buckets),
        batch_format="pyarrow",
    ).union(
        right_ds.map_batches(
            _pad_tag_bucket("r", keys, union_schema, num_buckets),
            batch_format="pyarrow",
        )
    )

    right_only = [c for c in right_cols if c not in keys]

    def merge_bucket(g: pa.Table) -> pa.Table:
        # join INDICES via pandas on the key columns only; payload
        # columns are taken from the Arrow table directly, so non-key
        # values never round-trip through pandas (the typed-null padding
        # would decay int64 → float64 and silently corrupt ids > 2^53)
        import pyarrow.compute as pc

        lmask = pc.equal(g[_SIDE_COL], "l")
        left = g.filter(lmask)
        right = g.filter(pc.invert(lmask))
        # row indices as pandas NULLABLE Int64 so outer-join misses stay
        # pd.NA instead of round-tripping through float64 (which would
        # silently corrupt take indices above 2^53 rows per bucket side)
        li = pd.DataFrame(
            {**{k: left[k].to_numpy(zero_copy_only=False) for k in keys},
             "__li": pd.array(np.arange(left.num_rows), dtype="Int64")}
        )
        ri = pd.DataFrame(
            {**{k: right[k].to_numpy(zero_copy_only=False) for k in keys},
             "__ri": pd.array(np.arange(right.num_rows), dtype="Int64")}
        )
        pairs = li.merge(
            ri, on=keys, how={"full": "outer"}.get(how, how)
        )

        def _take_idx(col: str) -> pa.Array:
            v = pairs[col]
            miss = v.isna().to_numpy()
            idx = v.to_numpy(dtype=np.int64, na_value=0)
            # null take-index → null output value (Arrow semantics);
            # this is how outer-side columns stay typed (no NaN decay)
            return pa.array(idx, mask=miss)

        ltake, rtake = _take_idx("__li"), _take_idx("__ri")
        cols = []
        for c in left_cols:
            arr = left[c].take(ltake)
            if how == "full" and c in keys:
                arr = pc.coalesce(arr, right[c].take(rtake))
            cols.append(arr)
        cols += [right[c].take(rtake) for c in right_only]
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols],
            schema=out_schema,
        )

    return tagged.groupby(_BUCKET_COL).map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def semi_anti_join(left_ds, right_ds, on: str, *, anti: bool = False,
                   num_buckets: int = 32):
    """Bucketed semi/anti join: emit left rows whose key IS (semi) or
    IS NOT (anti) present in the right side. Same single-shuffle shape
    as ``hash_join`` but the right side contributes only its KEY column
    (projected before the exchange — no payload crosses the wire), and
    output is exactly the left schema. The distributed form of the
    reference's blacklist anti-membership at blacklist sizes where a
    broadcast set stops being small (M13, doclaynet_v1_builder.py:42-68).

    Null-key convention: SQL SEMI/ANTI JOIN semantics (a NULL key never
    matches anything — semi drops it, anti keeps it), NOT three-valued
    NOT IN (where one right-side NULL empties the result). Right-side
    null keys are dropped before the probe; pc.is_in would otherwise
    match null-to-null.
    """
    left_ds, left_schema = _ensure_arrow_pair(left_ds)
    keys_only = right_ds.select_columns([on])

    union_fields = [left_schema.field(c) for c in left_schema.names]
    union_fields += [
        pa.field(_SIDE_COL, pa.string()),
        pa.field(_BUCKET_COL, pa.int64()),
    ]
    union_schema = pa.schema(union_fields)

    tagged = left_ds.map_batches(
        _pad_tag_bucket("l", [on], union_schema, num_buckets),
        batch_format="pyarrow",
    ).union(
        keys_only.map_batches(
            _pad_tag_bucket("r", [on], union_schema, num_buckets),
            batch_format="pyarrow",
        )
    )

    out_schema = pa.schema(
        [left_schema.field(c) for c in left_schema.names]
    )

    def filter_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(g[_SIDE_COL], "l")
        left = g.filter(lmask)
        right_keys = g.filter(pc.invert(lmask))[on].combine_chunks()
        right_keys = right_keys.drop_null()
        present = pc.is_in(left[on], value_set=right_keys)
        # a NULL left key "is_in" nothing → present null → fill false
        present = pc.fill_null(present, False)
        keep = pc.invert(present) if anti else present
        kept = left.filter(keep)
        return pa.Table.from_arrays(
            [kept[c].combine_chunks()
             if isinstance(kept[c], pa.ChunkedArray) else kept[c]
             for c in out_schema.names],
            schema=out_schema,
        )

    return tagged.groupby(_BUCKET_COL).map_groups(
        filter_bucket, batch_format="pyarrow"
    )


def _ensure_arrow_pair(ds):
    """Shared schema normalization (see hash_join's inline variant)."""
    sch = ds.schema(fetch_if_missing=True)
    sch = sch.base_schema if sch is not None else None
    if not isinstance(sch, pa.Schema):
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        sch = ds.schema(fetch_if_missing=True)
        sch = sch.base_schema if sch is not None else None
    if sch is None:
        raise ValueError(
            "join side has no derivable schema (empty dataset with "
            "unknown columns) — materialize or supply a typed empty side"
        )
    return ds, sch


def bloom_semi_anti_join(left_ds, right_ds, on: str, *, anti: bool = False,
                         fpr: float = 0.001, num_buckets: int = 32):
    """Bloom-prefiltered semi/anti join — EXACT results (identical rows
    to ``semi_anti_join``), but only left rows that PASS a Bloom filter
    of the right keys enter the exchange. At 100-TB scale this is the
    standard runtime-filter join optimization: a selective semi join
    (most left keys absent from the right) moves only candidates —
    corpus × selectivity + the fpr tail — through the shuffle instead
    of the whole left side, at the cost of one sketch-sized broadcast.

    Exactness by construction (one-sided Bloom error):
    * semi: the filter can only over-admit (false positive), and every
      admitted candidate is re-checked by the exact join — no misses.
    * anti: a key FAILING the filter is DEFINITELY absent (no false
      negatives) → emit directly, zero shuffle for those rows; keys
      passing go through the exact anti join and the two streams union.

    The filter is built with the fan-in OR tree
    (``stages/bloom.py:build_bloom_distributed``), sized from the right
    side's count, and broadcast once via ``ray.put``. Probe stages run
    in TASK mode — an actor pool here would reserve CPUs for up to two
    concurrent probe stages and can deadlock a small cluster (the
    actor-reservation pitfall) — with the deserialized bit array cached
    per WORKER PROCESS (module-level cache keyed by the object ref), so
    the array still deserializes once per worker, never per batch. The
    right side is materialized once (key column only) and reused by the
    count, the filter build, and the exact join."""
    import ray

    from ..stages.bloom import build_bloom_distributed

    left_ds, left_schema = _ensure_arrow_pair(left_ds)
    keys_only = right_ds.select_columns([on]).materialize()
    n_right = keys_only.count()

    sized = BloomFilter.sized_for(max(n_right, 1), fpr)

    def key_grams(t: pa.Table) -> list:
        if on not in t.column_names:  # schema-less empty block
            return []
        col = t[on].drop_null()
        return [str(v) for v in col.to_pylist()]

    bf = build_bloom_distributed(keys_only, key_grams,
                                 m_bits=sized.m, k=sized.k)
    blob_ref = ray.put(bf.to_bytes())
    k_probes = bf.k

    def probe(t: pa.Table, *, want_pass: bool) -> pa.Table:
        f = _bloom_probe_filter(blob_ref, k_probes)
        vals = t[on].to_pylist()
        hit = np.zeros(len(vals), bool)
        nn = [i for i, v in enumerate(vals) if v is not None]
        if nn:
            hit[nn] = f.contains_many([str(vals[i]) for i in nn])
        # NULL keys never hit the filter, so they ride the miss stream —
        # semi drops them downstream, anti emits them directly (SQL)
        mask = hit if want_pass else ~hit
        return t.filter(pa.array(mask))

    candidates = left_ds.map_batches(
        lambda t: probe(t, want_pass=True), batch_format="pyarrow"
    )
    exact = semi_anti_join(candidates, keys_only, on=on, anti=anti,
                           num_buckets=num_buckets)
    if not anti:
        return exact
    definite = left_ds.map_batches(
        lambda t: probe(t, want_pass=False), batch_format="pyarrow"
    )
    return exact.union(definite)


#: per-worker-process cache of deserialized Bloom probe filters, keyed
#: by object-ref hex (empty at pickle time — the module ships by-value;
#: each worker process fills its own copy on the first probe task)
_BLOOM_PROBE_CACHE: dict = {}


def _bloom_probe_filter(blob_ref, k: int):
    import ray

    key = (blob_ref.hex() if hasattr(blob_ref, "hex") else id(blob_ref), k)
    f = _BLOOM_PROBE_CACHE.get(key)
    if f is None:
        f = BloomFilter.from_bytes(ray.get(blob_ref), k)
        _BLOOM_PROBE_CACHE.clear()  # hold at most one filter per worker
        _BLOOM_PROBE_CACHE[key] = f
    return f

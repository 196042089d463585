"""Oracled relational pipelines over the driver testdata tables.

Each function here is a Ray-Data-first implementation of an operator
family from SURVEY.md §2 (filters M12/M13, projections M14, aggregates
G1-G11, sorts/limits O2-O4, joins J1-J3, dedup §2.7, windowing §2.9),
expressed over the deterministic TPC-H-ish tables so DuckDB can run an
equivalent ANSI-SQL oracle (``docling_eval_ray.pipelines.oracle``).

Conventions shared with the oracles (the driver hash-compares values):
  * every computed/aggregate column has the same name on both sides;
  * float aggregates are rounded (ROUND(x, k)) on BOTH sides so
    summation-order differences between Ray's distributed partial
    aggregation and DuckDB's sequential scan cannot flip the hash;
  * output dtypes are kept at int64/float64/string/timestamp to match
    DuckDB's result types.

Scale notes (the patterns, not the constants, are what matters at
100 TB): aggregations pre-combine inside ``map_batches`` before the
``groupby`` shuffle (one partial row per key per batch crosses the
wire); dimension tables broadcast via ``ray.put``; the one genuinely
large⋈large join uses the explicit bucketed hash join; reads are
column-pruned and, where selective, row-filtered at the parquet scan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokens import md5_prefix32  # noqa: F401 (worker-pickled)
from ..functions.joins import broadcast_join, dim_join, hash_join

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns=None, **kw):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


def _round_cols(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    # np.round (== C nearbyint scaling) bit-matches DuckDB's ROUND on
    # doubles; pyarrow's pc.round does NOT (different scaling order), which
    # breaks hash-equality with the SQL oracle — measured 11/868 mismatches.
    for c, nd in cols.items():
        vals = pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
        t = t.set_column(
            t.column_names.index(c), c, pa.array(np.round(vals, nd), pa.float64())
        )
    return t


def _partial_groupby(keys: list[str], sums: dict[str, str],
                     count_as: str | None = None):
    """Per-batch combiner: emits one row per key per batch (sum/count
    partials), so only partials cross the groupby shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        aggs = [(src, "sum") for src in sums]
        gb = pa.TableGroupBy(batch.select(keys + list(sums)), keys)
        out = gb.aggregate(aggs)
        renames = {f"{src}_sum": dst for src, dst in sums.items()}
        if count_as is not None:
            cnt = pa.TableGroupBy(batch.select(keys), keys).aggregate(
                [([], "count_all")]
            )
            out = out.join(cnt, keys=keys)
            renames["count_all"] = count_as
        return out.rename_columns(
            [renames.get(c, c) for c in out.column_names]
        )

    return fn


def _final_groupby(ds, keys: list[str], cols: list[str]):
    # canonical implementation lives in functions/groups.py (beside
    # bucketed_group_apply); this alias keeps the module-local name the
    # whole pipeline layer already uses
    from ..functions.groups import final_groupby_sum

    return final_groupby_sum(ds, keys, cols)


# ---------------------------------------------------------------------------
# G1/G5-style grouped aggregate with partial combine (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Grouped sums/averages over lineitem (reference stats kernel G1 +
    grouped counters G9, at TPC-H Q1 shape). Partial-aggregates inside
    map_batches; the shuffle moves one row per (flag,status) per batch."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["l_quantity"],
                "sum_base_price": t["l_extendedprice"],
                "sum_disc": t["l_discount"],
                "sum_disc_price": disc_price,
                "sum_charge": charge,
            }
        )

    keys = ["l_returnflag", "l_linestatus"]
    sums = {c: c for c in
            ["sum_qty", "sum_base_price", "sum_disc", "sum_disc_price",
             "sum_charge"]}
    partials = ds.map_batches(derive, batch_format="pyarrow").map_batches(
        _partial_groupby(keys, sums, count_as="count_order"),
        batch_format="pyarrow",
    )
    final = _final_groupby(partials, keys, list(sums) + ["count_order"])

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["count_order"], pa.float64())
        t = t.append_column("avg_qty", pc.divide(t["sum_qty"], n))
        t = t.append_column("avg_price", pc.divide(t["sum_base_price"], n))
        t = t.append_column("avg_disc", pc.divide(t["sum_disc"], n))
        t = t.drop_columns(["sum_disc"])
        t = _round_cols(
            t,
            {
                "sum_qty": 2,
                "sum_base_price": 2,
                "sum_disc_price": 2,
                "sum_charge": 2,
                "avg_qty": 4,
                "avg_price": 4,
                "avg_disc": 4,
            },
        )
        return t.set_column(
            t.column_names.index("count_order"),
            "count_order",
            pc.cast(t["count_order"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sorts / top-k (O3/O4)
# ---------------------------------------------------------------------------


def top_revenue_orders(sf_dir: str):
    """Top-10 orders by lineitem revenue: partial per-batch combine →
    groupby sum → global sort → limit (O4 ranking analogue)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    partials = ds.map_batches(derive, batch_format="pyarrow").map_batches(
        _partial_groupby(["l_orderkey"], {"revenue": "revenue"}),
        batch_format="pyarrow",
    )
    final = _final_groupby(partials, ["l_orderkey"], ["revenue"])
    top = final.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: _round_cols(t, {"revenue": 2}), batch_format="pyarrow"
    )


def documents_slice(sf_dir: str):
    """Index-range slice (reference begin/end_index O2,
    dataset_builder.py:197-223) as a predicate pushed to the parquet scan."""
    ds = _read(
        sf_dir,
        "documents",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pc.field("doc_id") >= 100) & (pc.field("doc_id") < 200),
    )
    return ds


# ---------------------------------------------------------------------------
# joins (J1-J3 analogues)
# ---------------------------------------------------------------------------


def orders_by_segment(sf_dir: str):
    """orders ⋈ customer (J2/J3 pattern) → grouped rollup. Customer
    scales with sf, so the join is size-routed: broadcast while the
    dimension is provably small, bucketed hash join beyond
    BROADCAST_ROW_LIMIT (functions.joins.dim_join)."""
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = dim_join(orders, cust, on="o_custkey")
    partials = joined.map_batches(
        _partial_groupby(
            ["c_mktsegment"], {"o_totalprice": "sum_totalprice"},
            count_as="n_orders"
        ),
        batch_format="pyarrow",
    )
    final = _final_groupby(
        partials, ["c_mktsegment"], ["sum_totalprice", "n_orders"]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_totalprice": 2})
        return t.set_column(
            t.column_names.index("n_orders"),
            "n_orders",
            pc.cast(t["n_orders"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(sf_dir: str):
    """lineitem ⋈ orders (bucketed hash join — the one large⋈large
    exchange) → broadcast customer + nation → grouped revenue.

    Mirrors the rebuild's only true shuffle join (GT⋈pred on doc_id,
    SURVEY.md §2.4 J1) at relational shape.
    """
    line = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"o_orderkey": t["l_orderkey"], "revenue": rev})

    line_rev = line.map_batches(derive, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = hash_join(line_rev, orders, on="o_orderkey", num_buckets=16)

    # nation is genuinely tiny (25 rows) → driver pandas broadcast;
    # customer scales with sf → enrich it distributed (broadcast nation
    # INTO the customer scan) and size-route the customer-keyed join
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"])
    cust_enriched = broadcast_join(
        cust,
        nation.rename(columns={"n_nationkey": "c_nationkey"}),
        on="c_nationkey",
    ).map_batches(
        lambda b: b[["c_custkey", "n_name"]].rename(
            columns={"c_custkey": "o_custkey"}
        ),
        batch_format="pandas",
    )
    enriched = dim_join(joined, cust_enriched, on="o_custkey")
    partials = enriched.map_batches(
        _partial_groupby(["n_name"], {"revenue": "revenue"}),
        batch_format="pyarrow",
    )
    final = _final_groupby(partials, ["n_name"], ["revenue"])
    return final.map_batches(
        lambda t: _round_cols(t, {"revenue": 2}), batch_format="pyarrow"
    )


def top2_orders_per_customer(sf_dir: str):
    """Per-group top-k (G11 grouping shape). High key cardinality →
    bucketed grouped-apply (one shuffle on the key hash, vectorized
    per-bucket pandas) instead of per-key map_groups."""
    from ..functions.groups import bucketed_group_apply

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("o_custkey", sort=False).head(2)

    return bucketed_group_apply(orders, ["o_custkey"], topk_bucket)


# ---------------------------------------------------------------------------
# filters / set ops (M12/M13, §2.7)
# ---------------------------------------------------------------------------

BLACKLISTED_DOC_IDS = (7, 11, 42, 137, 256)


#: blacklist-size gate: a literal/broadcast value-set probe while the
#: blacklist fits a task closure; beyond it the filter is a distributed
#: anti-join (M13 scale note, doclaynet_v1_builder.py:42-68)
BLACKLIST_BROADCAST_MAX = 1_000_000


def blacklist_filter(ds, blacklist, *, key: str = "doc_id",
                     broadcast_max: int = BLACKLIST_BROADCAST_MAX):
    """Anti-membership filter, size-routed: a sequence/set blacklist (or
    a Dataset at or under ``broadcast_max`` rows) probes as a vectorized
    ``is_in`` value set inside map_batches; a larger blacklist Dataset
    routes through the bucketed anti-join (one shuffle, only the
    blacklist KEYS cross the wire)."""
    from ..functions.joins import semi_anti_join

    if not isinstance(blacklist, (list, tuple, set, frozenset)):
        if blacklist.count() > broadcast_max:
            return semi_anti_join(ds, blacklist, on=key, anti=True)
        blacklist = blacklist.to_pandas()[key].tolist()
    bl = pa.array(sorted(blacklist), pa.int64())

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[key], value_set=bl)))

    return ds.map_batches(fn, batch_format="pyarrow")


def documents_blacklist_filter(sf_dir: str):
    """Anti-membership filter (reference doc-id blacklist M13,
    doclaynet_v1_builder.py:42-68) over the literal blacklist — the
    broadcast tier of ``blacklist_filter``."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return blacklist_filter(ds, BLACKLISTED_DOC_IDS)


def distinct_segments(sf_dir: str):
    """Distinct values of one column (§2.7 label-set analogue)."""
    vals = _read(sf_dir, "customer", columns=["c_mktsegment"]).unique(
        "c_mktsegment"
    )
    return pa.table({"c_mktsegment": pa.array(sorted(vals), pa.string())})


# ---------------------------------------------------------------------------
# stats kernel (G1) + histogram
# ---------------------------------------------------------------------------


def documents_stats(sf_dir: str):
    """count/mean/std/min/max over a numeric column — the reference
    ``compute_stats`` kernel (evaluators/stats.py:77-97) as Ray
    aggregates. (Median/histogram: see ``n_chars_histogram`` and
    stages.stats for the distributable forms.)"""
    from ray.data.aggregate import Count, Max, Mean, Min, Std

    ds = _read(sf_dir, "documents", columns=["n_chars"])
    res = ds.aggregate(
        Count(alias_name="n_docs"),
        Mean("n_chars", alias_name="mean_chars"),
        Std("n_chars", ddof=1, alias_name="std_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )
    return pa.table(
        {
            "n_docs": pa.array([int(res["n_docs"])], pa.int64()),
            "mean_chars": pa.array(
                [float(np.round(res["mean_chars"], 4))], pa.float64()
            ),
            "std_chars": pa.array(
                [float(np.round(res["std_chars"], 4))], pa.float64()
            ),
            "min_chars": pa.array([int(res["min_chars"])], pa.int64()),
            "max_chars": pa.array([int(res["max_chars"])], pa.int64()),
        }
    )


def n_chars_histogram(sf_dir: str):
    """Fixed-bin histogram (G1's ``bins``/``hist``) as partial per-batch
    bincount → groupby sum — the partial+final merge form that scales."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        bins = pc.cast(
            pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), 50.0)),
            pa.int64(),
        )
        vc = pc.value_counts(bins)
        return pa.table(
            {"bin": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _final_groupby(partials, ["bin"], ["n"])


def lang_source_census(sf_dir: str):
    """Grouped counts over two keys (label census G4 shape)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, ["lang", "source"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "source", "n"])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _final_groupby(partials, ["lang", "source"], ["n"])


def supplier_balance_by_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region (all-broadcast dimension chain) →
    per-region account-balance rollup with min/max (G7-ish conditional
    shapes exercised via the split column)."""
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey",
                                             "s_acctbal"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region",
                   columns=["r_regionkey", "r_name"]).to_pandas()
    small = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "s_nationkey"})
    joined = broadcast_join(sup, small, on="s_nationkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"),
            sum_bal=("s_acctbal", "sum"),
            min_bal=("s_acctbal", "min"),
            max_bal=("s_acctbal", "max"),
        )

    partials = joined.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Max, Min, Sum

    final = partials.groupby("r_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers"),
        Sum("sum_bal", alias_name="sum_bal"),
        Min("min_bal", alias_name="min_bal"),
        Max("max_bal", alias_name="max_bal"),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_bal": 2, "min_bal": 2, "max_bal": 2})
        return t.set_column(
            t.column_names.index("n_suppliers"),
            "n_suppliers",
            pc.cast(t["n_suppliers"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


def part_size_stats(sf_dir: str):
    """Per-brand part statistics with a conditional split (large vs
    small parts — the reference's TEDS complexity-split shape G7)."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_size", "p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(is_large=(b["p_size"] >= 25))
        return b.groupby(["p_brand", "is_large"], as_index=False).agg(
            n_parts=("p_size", "size"),
            sum_price=("p_retailprice", "sum"),
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    final = partials.groupby(["p_brand", "is_large"]).aggregate(
        Sum("n_parts", alias_name="n_parts"),
        Sum("sum_price", alias_name="sum_price"),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_price": 2})
        return t.set_column(
            t.column_names.index("n_parts"),
            "n_parts",
            pc.cast(t["n_parts"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


def shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with date + segment
    predicates, revenue per order, top-10 by (revenue, orderdate)."""
    cutoff = pd.Timestamp("1998-06-15")
    # customer scales with sf: filter to the BUILDING segment inside the
    # scan, then size-route the semi-join (dim_join)
    building = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"])
        .rename_columns(["o_custkey"]),
        batch_format="pyarrow",
    )

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["o_orderdate"] < cutoff]

    orders_f = orders.map_batches(filter_orders, batch_format="pandas")
    orders_b = dim_join(orders_f, building, on="o_custkey")

    line = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_extendedprice", "l_discount",
                          "l_shipdate"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cutoff]
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"],
                "revenue": b["l_extendedprice"] * (1 - b["l_discount"]),
            }
        )

    line_rev = line.map_batches(derive, batch_format="pandas")
    joined = hash_join(
        line_rev,
        orders_b.select_columns(["o_orderkey", "o_orderdate"]),
        on="o_orderkey",
        num_buckets=16,
    )
    partials = joined.map_batches(
        _partial_groupby(["o_orderkey", "o_orderdate"],
                         {"revenue": "revenue"}),
        batch_format="pyarrow",
    )
    final = _final_groupby(partials, ["o_orderkey", "o_orderdate"],
                           ["revenue"])
    top = final.sort(["revenue", "o_orderkey"],
                     descending=[True, False]).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"revenue": 2})
        # hash-stable window key (timestamp-unit drift, see events_hourly)
        dates = [
            str(pd.Timestamp(x).date())
            for x in t["o_orderdate"].to_pylist()
        ]
        return t.set_column(
            t.column_names.index("o_orderdate"),
            "o_orderdate",
            pa.array(dates, pa.string()),
        )

    return top.map_batches(finish, batch_format="pyarrow")


def events_error_rate(sf_dir: str):
    """Per-user conditional aggregate over the event stream: error count
    and rate (CASE-style counters, G9 flavor on the stream table)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(is_err=(b["event_type"] == "error").astype("int64"))
        return b.groupby("user_id", as_index=False).agg(
            n_events=("is_err", "size"), n_errors=("is_err", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    final = partials.groupby("user_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_errors", alias_name="n_errors"),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_events"], pa.float64())
        e = pc.cast(t["n_errors"], pa.float64())
        out = pa.table(
            {
                "user_id": t["user_id"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "n_errors": pc.cast(t["n_errors"], pa.int64()),
                "error_rate": pc.divide(e, n),
            }
        )
        return _round_cols(out, {"error_rate": 6})

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text functions over documents (fingerprint / tokens / quality)
# ---------------------------------------------------------------------------


def document_fingerprints(sf_dir: str):
    """Deterministic per-doc fingerprint (md5 of text) — dedup key
    analogue of the reference's sha256 doc hash (utils/utils.py:43-52)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "fingerprint": pa.array(fps, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_exact(sf_dir: str):
    """Exact dedup: fingerprint → hash-partitioned groupby → keep the
    smallest doc_id per content group (§2.7; at corpus scale this is a
    single shuffle keyed on the content hash)."""
    from ray.data.aggregate import Min

    with_fp = document_fingerprints(sf_dir)
    kept = with_fp.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="doc_id")
    )
    return kept.select_columns(["doc_id"])


def dedup_inflation_by_source(sf_dir: str):
    """(source, lang, n_docs, n_kept, n_dropped, chars_total,
    chars_dropped, dup_ratio) — the dedup-savings report every corpus
    card carries: how much of each (source, lang) slice exact dedup
    removes, in docs and in characters. A doc is dropped iff it is not
    the min-doc_id canonical winner of its global content group
    (md5(text)), matching ``dedup_exact``'s keep rule.

    Scale shape: ONE exchange bucketed on the content hash
    (``bucketed_group_apply`` — never per-key map_groups); each bucket
    marks winners vectorized (per-fingerprint min via pandas
    transform) and pre-aggregates to (source, lang) partials, so the
    final groupby moves ≤ |sources|·|langs| rows per bucket. All
    cross-doc aggregates are integers; the single ratio divides once
    at the end (house float-parity recipe)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table(
            {
                "fingerprint": pa.array(fps, pa.string()),
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": t["n_chars"],
            }
        )

    with_fp = ds.map_batches(fp, batch_format="pyarrow")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        winner = g.groupby("fingerprint")["doc_id"].transform("min")
        dropped = g["doc_id"].to_numpy() != winner.to_numpy()
        out = (
            g.assign(dropped=dropped,
                     chars_dropped=g["n_chars"].where(dropped, 0))
            .groupby(["source", "lang"], as_index=False)
            .agg(n_docs=("doc_id", "size"),
                 n_dropped=("dropped", "sum"),
                 chars_total=("n_chars", "sum"),
                 chars_dropped=("chars_dropped", "sum"))
        )
        for c in ("n_docs", "n_dropped", "chars_total", "chars_dropped"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = bucketed_group_apply(with_fp, ["fingerprint"], bucket)
    final = _final_groupby(
        parts, ["source", "lang"],
        ["n_docs", "n_dropped", "chars_total", "chars_dropped"],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy()
        nd = t["n_dropped"].to_numpy()
        return pa.table(
            {
                "source": pc.cast(t["source"], pa.string()),
                "lang": pc.cast(t["lang"], pa.string()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_kept": pa.array((n - nd).astype(np.int64), pa.int64()),
                "n_dropped": pc.cast(t["n_dropped"], pa.int64()),
                "chars_total": pc.cast(t["chars_total"], pa.int64()),
                "chars_dropped": pc.cast(t["chars_dropped"], pa.int64()),
                "dup_ratio": pa.array(np.round(nd / n, 6), pa.float64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def token_counts(sf_dir: str):
    """Whitespace tokenization count (text-analysis op; vectorized
    regex count, no Python loop)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        # trim SPACES only (SQL trim semantics); Arrow's regex is RE2,
        # so \s is ASCII like the oracle's — see functions/tokens.py
        trimmed = pc.utf8_trim(t["text"], characters=" ")
        n_tok = pc.add(
            pc.count_substring_regex(trimmed, r"\s+"), pa.scalar(1)
        )
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_tokens": pc.cast(n_tok, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def text_edit_distance(sf_dir: str):
    """Char-level Levenshtein kernel (§2.8 distance functions), oracled
    against DuckDB's levenshtein(): distance between each text and a
    SQL-expressible mutation of it."""
    from ..functions.textmetrics import edit_distance

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        muts = [s.replace("data", "info") for s in texts]
        d = [edit_distance(list(a), list(b)) for a, b in zip(texts, muts)]
        return pa.table(
            {"doc_id": t["doc_id"], "edit_dist": pa.array(d, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """Length/alpha-ratio quality scoring (text-quality op; vectorized)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        n_alpha = pc.count_substring_regex(t["text"], "[a-z]")
        ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(t["n_chars"], pa.float64()),
        )
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "alpha_ratio": ratio,
            }
        )
        return _round_cols(out, {"alpha_ratio": 6})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# events: windowed aggregate + sessionization (§2.9 streaming-shaped)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: event-time floor inside
    map_batches, then partial+final grouped aggregate."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # window key as ISO string: hash-stable across Arrow/pandas/DuckDB
        # timestamp unit differences (ns vs us)
        b = b.assign(hour=b["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S"))
        g = (
            b.groupby(["event_type", "hour"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    final = _final_groupby(
        partials, ["event_type", "hour"], ["n_events", "sum_value"]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_value": 2})
        return t.set_column(
            t.column_names.index("n_events"),
            "n_events",
            pc.cast(t["n_events"], pa.int64()),
        )

    return final.map_batches(finish, batch_format="pyarrow")


SESSION_GAP_S = 1800


def user_sessions(sf_dir: str):
    """Gap-based sessionization per user: partition by key, order by
    event time inside the group (the ordered-log pattern for
    stream-shaped data — ordering lives inside the group, never across
    blocks)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sess_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        # integer timedelta comparison: exact, matches the SQL oracle's
        # date_diff('microsecond', ...) with no float truncation ambiguity
        gap_break = (
            g["ts"].diff() > pd.Timedelta(seconds=SESSION_GAP_S)
        ).to_numpy()
        new_s = (new_user | gap_break).astype(np.int64)
        out = (
            pd.DataFrame({"user_id": uid, "s": new_s})
            .groupby("user_id", as_index=False, sort=False)
            .agg(n_sessions=("s", "sum"), n_events=("s", "size"))
        )
        return out.astype(
            {"user_id": np.int64, "n_sessions": np.int64, "n_events": np.int64}
        )

    return bucketed_group_apply(ds, ["user_id"], sess_bucket)


def events_running_total(sf_dir: str):
    """Cumulative window aggregate per user: running event count and
    running sum of ``value`` ordered by (ts, event_id) — the
    ROWS-UNBOUNDED-PRECEDING window-function shape (§2.9). Same
    distribution as sessionization: one bucketed shuffle on the
    partition key, ordering strictly inside the group (pandas cumsum is
    sequential in sort order, matching the oracle's window frame)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "row_num": (grp.cumcount() + 1).to_numpy().astype(np.int64),
                "running_sum": np.round(
                    grp["value"].cumsum().to_numpy(), 2
                ),
            }
        )

    return bucketed_group_apply(ds, ["user_id"], run)


#: fixed event-type domain for the pivot (bounded, part of the schema)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str):
    """Wide conditional aggregation: one row per user with one count
    column per event type (the PIVOT shape). Per-batch partial pivot
    (vectorized boolean sums) + one final groupby — the shuffle carries
    user-cardinality rows with 5 int columns, never raw events."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = {"user_id": b["user_id"]}
        for t, c in zip(EVENT_TYPES, cols):
            out[c] = (b["event_type"] == t).astype(np.int64)
        return (
            pd.DataFrame(out)
            .groupby("user_id", as_index=False)
            .sum()
        )

    final = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], cols
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": pc.cast(t["user_id"], pa.int64())}
            | {c: pc.cast(t[c], pa.int64()) for c in cols}
        )

    return final.map_batches(finish, batch_format="pyarrow")


#: |z| threshold for the outlier filter (applied to the ROUNDED z on
#: both sides, so engine float drift cannot flip a row's membership)
ZSCORE_CUT = 2.0


def zscore_outliers(sf_dir: str):
    """Per-language z-score normalization of ``n_chars`` with an
    outlier filter |z| > 2. Per-lang moments (count, sum, sum-of-
    squares) via partial+final groupby — domain-sized — then collected
    (bounded by the language domain) and broadcast into one streaming
    filter map. The filter compares the 4dp-ROUNDED z on both engines,
    so the set membership is drift-proof."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].astype(np.float64)
        return (
            pd.DataFrame(
                {"lang": b["lang"], "n": 1, "s1": x, "s2": x * x}
            )
            .groupby("lang", as_index=False)
            .sum()
        )

    stats = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], ["n", "s1", "s2"],
    )
    moments = {}
    for b in stats.iter_batches(batch_format="pyarrow"):
        for lang, n, s1, s2 in zip(
            b["lang"].to_pylist(), b["n"].to_numpy(),
            b["s1"].to_numpy(), b["s2"].to_numpy(),
        ):
            mu = s1 / n
            moments[lang] = (mu, np.sqrt(s2 / n - mu * mu))
    mom_ref = ray.put(moments)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        mom = ray.get(mom_ref)
        mu = b["lang"].map(lambda l: mom[l][0]).to_numpy()
        sd = b["lang"].map(lambda l: mom[l][1]).to_numpy()
        z = np.round((b["n_chars"].to_numpy() - mu) / sd, 4)
        keep = np.abs(z) > ZSCORE_CUT
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy()[keep],
                "lang": b["lang"].to_numpy()[keep],
                "z": z[keep],
            }
        )

    return ds.map_batches(flag, batch_format="pandas")


def customer_order_counts(sf_dir: str):
    """TPC-H Q13 flavor: orders-per-customer histogram INCLUDING
    zero-order customers — exercises the LEFT tier of
    ``functions.joins.hash_join``. The orders side is pre-aggregated to
    one row per customer before the join (partial+final groupby), so
    the exchange carries customer-cardinality rows, never raw orders."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).size()
        return g.rename(
            columns={"o_custkey": "c_custkey", "size": "cnt_part"}
        )

    counts = _final_groupby(
        orders.map_batches(partial, batch_format="pandas"),
        ["c_custkey"], ["cnt_part"],
    )
    joined = hash_join(cust, counts, "c_custkey", how="left")

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        c = t["cnt_part"].to_pandas().fillna(0).astype(np.int64)
        g = (
            pd.DataFrame({"c_count": c})
            .groupby("c_count", as_index=False)
            .size()
        )
        return g.rename(columns={"size": "custdist_part"})

    final = _final_groupby(
        joined.map_batches(hist_partial, batch_format="pyarrow"),
        ["c_count"], ["custdist_part"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.cast(t["c_count"], pa.int64()),
                "custdist": pc.cast(t["custdist_part"], pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def user_hour_activity(sf_dir: str):
    """Per-(user, hour) click vs error counts via a FULL OUTER
    ``hash_join`` on the composite key — one-sided hours survive with
    the absent side coalesced to 0. Both sides are pre-aggregated
    partial+final, so the outer exchange is window-cardinality."""
    from ..functions.joins import hash_join

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def side(ev: str, out: str):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_type"] == ev]
            b = b.assign(
                hour=b["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
            )
            g = b.groupby(["user_id", "hour"], as_index=False).size()
            return g.rename(columns={"size": out})

        return _final_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["user_id", "hour"], [out],
        )

    j = hash_join(
        side("click", "n_clicks"), side("error", "n_errors"),
        ["user_id", "hour"], how="full",
    )

    def finish(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "hour": t["hour"],
                "n_clicks": pc.coalesce(
                    pc.cast(t["n_clicks"], pa.int64()), zero
                ),
                "n_errors": pc.coalesce(
                    pc.cast(t["n_errors"], pa.int64()), zero
                ),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def events_rolling_mean(sf_dir: str):
    """Sliding window aggregate per user: mean of ``value`` over the
    current + 2 preceding events ordered by (ts, event_id) — the
    ROWS-2-PRECEDING frame. Summation is explicit shift-adds in frame
    order ((v[i-2]+v[i-1])+v[i]), the same association as a sequential
    frame scan."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        v = g["value"]
        s1 = grp["value"].shift(1)
        s2 = grp["value"].shift(2)
        n = 1 + s1.notna().to_numpy() + s2.notna().to_numpy()
        s = (s2.fillna(0.0) + s1.fillna(0.0)).to_numpy() + v.to_numpy()
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "rolling_mean": np.round(s / n, 4),
            }
        )

    return bucketed_group_apply(ds, ["user_id"], run)


def ntile_quartiles(sf_dir: str):
    """NTILE(4) per language over (n_chars, doc_id) order — the
    partitioned ranking window. Exact NTILE semantics: the first
    ``n % 4`` tiles get ``ceil(n/4)`` rows. One bucketed shuffle on the
    partition key; the tile assignment is pure index arithmetic after
    an in-group sort."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n_chars", "doc_id"], kind="mergesort")
        grp = g.groupby("lang", sort=False)
        idx = grp.cumcount().to_numpy()
        n = grp["doc_id"].transform("size").to_numpy()
        base, rem = n // 4, n % 4
        cut = rem * (base + 1)  # rows before this index sit in big tiles
        tile = np.where(
            idx < cut,
            idx // np.maximum(base + 1, 1),
            np.where(base > 0, rem + (idx - cut) // np.maximum(base, 1),
                     rem),
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "lang": g["lang"].to_numpy(),
                "quartile": (tile + 1).astype(np.int64),
            }
        )

    return bucketed_group_apply(ds, ["lang"], run)


def lang_census_rollup(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) census: leaf counts plus per-lang
    subtotals plus the grand total, with 'ALL' as the rollup sentinel
    (COALESCE in the oracle — avoids null-vs-null hash ambiguity).
    The two upper levels re-aggregate the LEAF aggregate (domain-sized,
    not corpus-sized), so the corpus is scanned exactly once."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["lang", "source"], as_index=False)
            .size()
            .rename(columns={"size": "n_docs"})
        )

    leaf = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n_docs"],
    ).materialize()  # domain-sized (|lang|×|source|); reused 3×

    lang_level = leaf.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs")
    ).map_batches(
        lambda t: t.append_column(
            "source", pa.array(["ALL"] * t.num_rows, pa.string())
        ),
        batch_format="pyarrow",
    )
    total = leaf.sum("n_docs")

    import ray.data as rd

    grand = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["ALL"], pa.string()),
                "source": pa.array(["ALL"], pa.string()),
                "n_docs": pa.array([int(total)], pa.int64()),
            }
        )
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": pc.cast(t["lang"], pa.string()),
                "source": pc.cast(t["source"], pa.string()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        )

    return (
        leaf.map_batches(norm, batch_format="pyarrow")
        .union(lang_level.map_batches(norm, batch_format="pyarrow"))
        .union(grand.map_batches(norm, batch_format="pyarrow"))
    )


def token_frequency_topk(sf_dir: str, *, k: int = 25):
    """Global token frequency top-k over the corpus — the vocabulary
    census every training-data pipeline needs. Partial per-batch counts
    (explode → value_counts) mean the groupby shuffle moves one row per
    distinct token per batch, not one per occurrence; the global sort
    sees only the aggregated vocabulary."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_trim(t["text"], characters=" "),
                                   r"\s+")
        )
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = _final_groupby(partials, ["token"], ["n"])
    return final.sort(["n", "token"], descending=[True, False]).limit(k)


def deterministic_sample(sf_dir: str, *, percent: int = 10):
    """Deterministic content-hash sampling (data-mixing op): keep a doc
    iff the first 8 hex digits of md5(text) mod 100 < percent. Unlike
    random_shuffle/sample this is reproducible across runs and engines
    (the DuckDB oracle applies the identical rule), stable under
    repartitioning, and consistent for duplicate texts — the properties
    corpus mixing needs."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        keep = [
            md5_prefix32(s) % 100 < percent
            for s in t["text"].to_pylist()
        ]
        return t.filter(pa.array(keep)).select(["doc_id", "lang"])

    return ds.map_batches(fn, batch_format="pyarrow")


QUANTILE_QS = (0.25, 0.5, 0.75)


#: above this row count the exact rank scan (which streams up to the
#: highest requested rank through the driver) hands off to the
#: mergeable-histogram approximation (stages/sketches.py) — the same
#: size-gate pattern as the dedup/knn tiers
QUANTILE_EXACT_MAX = 50_000_000


def n_chars_quantiles(sf_dir: str, *, exact_max: int = QUANTILE_EXACT_MAX):
    """Exact distributed quantiles of a numeric column — the sort-based
    wide op under the hash gate. Rank convention matches DuckDB's
    ``quantile_disc``: value at index ceil(q·n)−1 of the sorted column
    (derived empirically and pinned by the oracle). The sorted column is
    consumed by a STREAMING rank scan with early stop — one batch at a
    time on the driver, same pattern as stages/stats.py's median; above
    ``exact_max`` rows the scan's driver bandwidth stops being free and
    the query routes to the fixed-bin histogram approximation
    (one-bin-width error, no sort at all)."""
    import math

    ds = _read(sf_dir, "documents", columns=["n_chars"])
    n = ds.count()  # parquet metadata count
    if n > exact_max:
        return _approx_quantiles(ds)
    ranks = sorted(max(0, math.ceil(q * n) - 1) for q in QUANTILE_QS)
    want = dict.fromkeys(ranks)
    seen = 0
    for b in ds.sort("n_chars").iter_batches(batch_size=8192,
                                             batch_format="pyarrow"):
        v = b["n_chars"].to_numpy(zero_copy_only=False)
        for rk in ranks:
            if want[rk] is None and seen <= rk < seen + len(v):
                want[rk] = int(v[rk - seen])
        seen += len(v)
        if all(x is not None for x in want.values()):
            break
    import math as _m

    return pa.table(
        {
            "q": pa.array(list(QUANTILE_QS), pa.float64()),
            "value": pa.array(
                [want[max(0, _m.ceil(q * n) - 1)] for q in QUANTILE_QS],
                pa.int64(),
            ),
        }
    )


def _approx_quantiles(ds, nr_bins: int = 4096):
    """Scale path: per-batch fixed-bin histogram partials (one small
    row each) summed on the driver, quantiles interpolated from the
    merged bins (mergeable-sketch slot;
    stages/sketches.py:quantile_from_histogram). Bin range spans the
    column's actual [min, max] so signed data bins correctly."""
    from ..stages.sketches import quantile_from_histogram

    mn, mx = ds.min("n_chars"), ds.max("n_chars")
    lo_v = float(mn) if mn is not None else 0.0
    max_v = float(mx) if mx is not None else 1.0
    if max_v <= lo_v:
        max_v = lo_v + 1.0
    edges = np.histogram_bin_edges([], bins=nr_bins, range=(lo_v, max_v))

    def partial(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        hist, _ = np.histogram(v, bins=nr_bins, range=(lo_v, max_v))
        return pa.table(
            {"hist": pa.array([hist.astype(np.int64)],
                              pa.list_(pa.int64()))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    hist = np.sum([np.asarray(p["hist"]) for p in parts], axis=0)
    return pa.table(
        {
            "q": pa.array(list(QUANTILE_QS), pa.float64()),
            "value": pa.array(
                [int(round(quantile_from_histogram(
                    edges.tolist(), hist.tolist(), q)))
                 for q in QUANTILE_QS],
                pa.int64(),
            ),
        }
    )


def lang_chars_quantiles(sf_dir: str):
    """Per-group exact quantiles (grouped wide op): all of a language's
    rows meet in one bucketed task, which sorts locally and probes the
    quantile_disc ranks — per-group state is bounded by the largest
    group, never the corpus."""
    import math

    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def quantile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, sub in g.groupby("lang", sort=False):
            v = np.sort(sub["n_chars"].to_numpy())
            n = len(v)
            for q in QUANTILE_QS:
                out.append(
                    {"lang": lang, "q": q,
                     "value": int(v[max(0, math.ceil(q * n) - 1)])}
                )
        return pd.DataFrame(out, columns=["lang", "q", "value"]).astype(
            {"q": np.float64, "value": np.int64}
        )

    return bucketed_group_apply(ds, ["lang"], quantile_bucket)


def orders_without_lineitems(sf_dir: str):
    """Distributed anti-join (TPC-H Q21/Q22 flavor): orders with no
    lineitems. One bucketed shuffle; only the lineitem KEYS cross the
    wire (the key column is projected before the exchange)."""
    from ..functions.joins import semi_anti_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    line = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey"]), batch_format="pyarrow"
    )
    return semi_anti_join(orders, line, on="o_orderkey", anti=True)


def orders_without_lineitems_bloom(sf_dir: str):
    """The same anti-join through the Bloom-prefiltered plan
    (``functions/joins.py:bloom_semi_anti_join``): orders whose key
    FAILS the Bloom filter of lineitem keys are emitted without ever
    entering the exchange (one-sided error: a Bloom miss is a definite
    absence), and only the pass-stream goes through the exact
    distributed anti-join. Identical rows to ``orders_without_lineitems``
    — same oracle — by construction; at 100 TB the exchange carries
    corpus × match-rate + fpr instead of the whole left side."""
    from ..functions.joins import bloom_semi_anti_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    line = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey"]), batch_format="pyarrow"
    )
    return bloom_semi_anti_join(orders, line, on="o_orderkey", anti=True)


def events_asof_last_error(sf_dir: str):
    """Distributed AS-OF join (the custom temporal operator Ray Data
    lacks natively): for every click event, the most recent error event
    at-or-before it for the same user. Shape: one bucketed shuffle on
    the join key (user_id) — all of a user's rows meet in one task —
    then a single vectorized ``pd.merge_asof`` per bucket (sorted on
    the time axis, ``by=user_id``). Oracled against DuckDB's native
    ASOF LEFT JOIN. Timestamps leave as microsecond ISO strings (the
    hash-stable window-key convention, see events_hourly)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    # row-filter BEFORE the bucket exchange: only click/error rows
    # participate, the other ~60% of the stream never crosses the wire
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["click", "error"]))
        ),
        batch_format="pyarrow",
    )

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("ts",
                                                           kind="mergesort")
        errors = g[g["event_type"] == "error"].sort_values("ts",
                                                           kind="mergesort")
        merged = pd.merge_asof(
            clicks[["event_id", "ts", "user_id"]],
            errors[["ts", "user_id"]].rename(columns={"ts": "err_ts"}),
            left_on="ts", right_on="err_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        out = pd.DataFrame(
            {
                "event_id": merged["event_id"].astype(np.int64),
                "ts": merged["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
                "last_error_ts": merged["err_ts"]
                .dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                .fillna(""),
            }
        )
        return out

    return bucketed_group_apply(ds, ["user_id"], asof_bucket)


#: literal size bands (lo inclusive, hi exclusive) — the range-join
#: small side, shared with the oracle
SIZE_BANDS = ((0, 100, "xs"), (100, 250, "s"), (250, 400, "m"),
              (400, 1 << 40, "l"))


def documents_size_bands(sf_dir: str):
    """Range join (interval lookup): each document joined to the band
    whose [lo, hi) interval contains n_chars. The bands ride in the
    task closure (KBs) and the probe is one vectorized searchsorted per
    batch — the scalable form of a range join against a small interval
    side (contiguous non-overlapping bands; overlapping intervals
    generalize to an interval-tree broadcast)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    los = np.array([b[0] for b in SIZE_BANDS], dtype=np.int64)
    his = np.array([b[1] for b in SIZE_BANDS], dtype=np.int64)
    names = np.array([b[2] for b in SIZE_BANDS])

    def fn(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, side="right") - 1
        # inner-join parity: values below every lo or at/above their
        # band's hi fall in NO band and are dropped, not mislabeled
        ok = (idx >= 0) & (v < his[np.clip(idx, 0, len(his) - 1)])
        kept = t.filter(pa.array(ok))
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "n_chars": kept["n_chars"],
                "band": pa.array(names[idx[ok]], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# events_interarrival — LAG window (time since previous event per user)
# ---------------------------------------------------------------------------


def events_interarrival(sf_dir: str):
    """(user_id, event_id, gap_us) — per-user interarrival time: the
    LAG-window shape (§2.9). Same distribution as sessionization: one
    bucketed shuffle on the partition key, ordering strictly inside the
    group; the gap is an exact integer-microsecond difference on both
    engines (``datetime64[us]`` int math here, ``date_diff
    ('microsecond', ...)`` in SQL), so no float ambiguity. The first
    event of each user has no predecessor and is dropped (QUALIFY NOT
    NULL on the oracle side)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def lagdiff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), np.int64)
        if len(g):
            gap[0] = 0
            gap[1:] = ts[1:] - ts[:-1]
        same_user = np.concatenate([[False], uid[1:] == uid[:-1]])
        out = pd.DataFrame(
            {
                "user_id": uid.astype(np.int64),
                "event_id": g["event_id"].to_numpy().astype(np.int64),
                "gap_us": gap,
            }
        )
        return out[same_user].reset_index(drop=True)

    return bucketed_group_apply(ds, ["user_id"], lagdiff)


# ---------------------------------------------------------------------------
# events_cube — CUBE grouping sets over (event_type, hour-of-day)
# ---------------------------------------------------------------------------


def events_cube(sf_dir: str):
    """Counts for every grouping set of (event_type, hour-of-day):
    (type, hr), (type), (hr), and the grand total — the GROUP BY CUBE
    shape, with 'ALL' / -1 as the roll-up markers (same convention as
    ``lang_census_rollup``). One partial+final groupby computes the
    finest (type, hr) cell — |types|×24 rows, domain-bounded — and the
    three margins are derived from that base on the driver (output-
    sized state, the house gate), never from a second corpus scan."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(hr=b["ts"].dt.hour.astype(np.int64))
        return (
            b.groupby(["event_type", "hr"], as_index=False)
            .agg(n=("hr", "size"))
        )

    base = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hr"], ["n"],
    )
    bdf = base.to_pandas()  # |event types| × 24 rows — domain-bounded
    if len(bdf) == 0 or "hr" not in bdf.columns:
        # SQL CUBE over empty input still emits the () grouping set
        return pd.DataFrame(
            {"event_type": ["ALL"], "hr": [np.int64(-1)],
             "n": [np.int64(0)]}
        )
    bdf = bdf.astype({"hr": np.int64, "n": np.int64})

    by_type = bdf.groupby("event_type", as_index=False)["n"].sum()
    by_type["hr"] = np.int64(-1)
    by_hr = bdf.groupby("hr", as_index=False)["n"].sum()
    by_hr["event_type"] = "ALL"
    total = pd.DataFrame(
        {"event_type": ["ALL"], "hr": [np.int64(-1)],
         "n": [bdf["n"].sum()]}
    )
    out = pd.concat(
        [bdf, by_type, by_hr, total], ignore_index=True
    )[["event_type", "hr", "n"]]
    return out.astype({"hr": np.int64, "n": np.int64})


# ---------------------------------------------------------------------------
# latest_event_per_user — greatest-per-group via partial argmax
# ---------------------------------------------------------------------------


def latest_event_per_user(sf_dir: str):
    """(user_id, event_id, ts_us, event_type) — each user's most recent
    event: the greatest-per-group shape done as a PARTIAL ARGMAX, not a
    global sort. Each batch keeps only its per-user winner (user-
    cardinality rows), then one bucketed shuffle re-reduces the
    winners — the corpus never moves, and skew is bounded by the bucket
    count. Ties break on event_id; the timestamp is emitted as exact
    epoch microseconds (``epoch_us`` in the oracle) so no format or
    unit ambiguity enters the hash."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "event_type"])

    def keep_latest(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return b.groupby("user_id", as_index=False, sort=False).tail(1)

    winners = ds.map_batches(keep_latest, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = keep_latest(g)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy().astype(np.int64),
                "event_id": g["event_id"].to_numpy().astype(np.int64),
                "ts_us": g["ts"].to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
                "event_type": g["event_type"].to_numpy(),
            }
        )

    return bucketed_group_apply(winners, ["user_id"], finish)


# ---------------------------------------------------------------------------
# events_in_windows — broadcast interval (range) join
# ---------------------------------------------------------------------------

#: deterministic overlapping report windows over the corpus's fixed
#: January-2024 event-time domain: window i covers [Jan 1 + 3i days,
#: +5 days) — overlaps exercise the one-row-many-windows semantics
RANGE_WINDOWS = [
    (i, np.datetime64("2024-01-01", "us") + np.timedelta64(3 * i, "D"),
     np.datetime64("2024-01-01", "us") + np.timedelta64(3 * i + 5, "D"))
    for i in range(10)
]


def events_in_windows(sf_dir: str):
    """(window_id, n_events, sum_value) — aggregate over an interval
    join of events against a small window table: the RANGE-JOIN shape
    Ray Data lacks natively, done the scale-safe way — the interval
    side is tiny and broadcast (a closure constant here; ``ray.put``
    for a computed one), each batch evaluates the band predicates
    vectorized and emits per-window partials, and one final groupby
    over |windows| rows finishes. No all-to-all exchange of the big
    side, overlapping windows multiply rows exactly as the SQL
    non-equi join does."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].to_numpy(dtype="datetime64[us]")
        val = b["value"].to_numpy()
        rows = []
        for wid, ws, we in RANGE_WINDOWS:
            m = (ts >= ws) & (ts < we)
            if m.any():
                rows.append((wid, int(m.sum()), float(val[m].sum())))
        out = pd.DataFrame(
            rows, columns=["window_id", "n_events", "sum_value"]
        )
        # explicit dtypes: an all-filtered batch must not emit an
        # object-typed empty block (schema split hazard)
        return out.astype(
            {"window_id": np.int64, "n_events": np.int64,
             "sum_value": np.float64}
        )

    final = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["window_id"], ["n_events", "sum_value"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_id": pc.cast(t["window_id"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pa.array(
                    np.round(t["sum_value"].to_numpy(), 2), pa.float64()
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# order_priority_counts — semi join (EXISTS) + grouped count
# ---------------------------------------------------------------------------

#: discount floor for the qualifying-lineitem EXISTS predicate
DEEP_DISCOUNT = 0.08


def order_priority_counts(sf_dir: str):
    """(o_orderpriority, n_orders) — orders having at least one
    deep-discount lineitem, counted by priority: the SEMI-JOIN shape
    (TPC-H Q4 adapted to this schema's columns). The probe side is
    reduced FIRST — filter + per-batch distinct partial + one groupby
    dedup — so the join carries each qualifying orderkey exactly once
    (semi semantics via inner join against a deduplicated key set);
    then one bucketed ``hash_join`` and a domain-sized grouped count.
    The lineitem corpus itself never crosses an exchange, only its
    distinct qualifying keys."""
    from ray.data.aggregate import Count

    from ..functions.joins import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    def qualifying(t: pa.Table) -> pa.Table:
        keys = pc.unique(
            pc.filter(
                t["l_orderkey"].combine_chunks(),
                pc.greater(t["l_discount"].combine_chunks(),
                           pa.scalar(DEEP_DISCOUNT)),
            )
        )
        return pa.table({"o_orderkey": keys})

    from ray.data.aggregate import Min

    keys = (
        li.map_batches(qualifying, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Min("o_orderkey", alias_name="k"))
        .select_columns(["o_orderkey"])
    )
    # cheap emptiness probe (limit pushdown early-stops the scan): an
    # empty key set gives the join side no derivable schema, and SQL
    # returns zero groups anyway
    if keys.limit(1).count() == 0:
        return pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_orders": pa.array([], pa.int64())}
        )
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    semi = hash_join(orders, keys, "o_orderkey")

    out = semi.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# suppliers_per_part — grouped exact count-distinct
# ---------------------------------------------------------------------------


def suppliers_per_part(sf_dir: str):
    """(partkey, n_suppliers) — exact COUNT(DISTINCT l_suppkey) per
    part: the grouped count-distinct shape. Per-batch distinct
    (partkey, suppkey) pairs first (a combiner that collapses
    within-batch repeats), then ONE bucketed shuffle on partkey with
    cross-batch dedup + count inside the bucket — pair-distinct rows
    are all that move, and part-key skew is diluted across hash
    buckets."""
    from ..functions.groups import bucketed_group_apply

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["l_partkey", "l_suppkey"])

    pairs = li.map_batches(pair_distinct, batch_format="pandas")

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        out = (
            g.groupby("l_partkey", as_index=False, sort=False)
            .agg(n_suppliers=("l_suppkey", "size"))
        )
        return pd.DataFrame(
            {
                "partkey": out["l_partkey"].to_numpy().astype(np.int64),
                "n_suppliers": out["n_suppliers"].to_numpy()
                .astype(np.int64),
            }
        )

    return bucketed_group_apply(pairs, ["l_partkey"], count_unique)


# ---------------------------------------------------------------------------
# lineitem_discount_corr — distributed Pearson correlation (moments)
# ---------------------------------------------------------------------------


def lineitem_discount_corr(sf_dir: str):
    """One-row Pearson correlation between l_discount and
    l_extendedprice via distributed raw moments: each batch emits one
    (n, Σx, Σy, Σxy, Σx², Σy²) partial, one tiny final sum reduces
    them, and the driver finishes the scalar — the single-pass
    statistics kernel every profiler stage needs. 6dp rounding absorbs
    the naive-moments vs streaming-covariance drift (~1e-10 relative
    at this scale)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_discount", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_discount"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy",
                                         "sxx", "syy")]
    )
    n = float(agg["n"] or 0)
    if n < 2:
        # SQL corr over empty/one-row input is NULL
        return pd.DataFrame({"corr_disc_price": [np.nan]})
    num = n * agg["sxy"] - agg["sx"] * agg["sy"]
    den = np.sqrt(
        (n * agg["sxx"] - agg["sx"] ** 2)
        * (n * agg["syy"] - agg["sy"] ** 2)
    )
    if den == 0:
        return pd.DataFrame({"corr_disc_price": [np.nan]})
    return pd.DataFrame(
        {"corr_disc_price": [float(np.round(num / den, 6))]}
    )


# ---------------------------------------------------------------------------
# events_props_stats — JSON payload extraction + grouped stats
# ---------------------------------------------------------------------------


def events_props_stats(sf_dir: str):
    """(event_type, n, mean_k) — extract the integer ``k`` field from
    the ``props`` JSON payload column and aggregate it per event type:
    the semi-structured-payload shape (§2.8 json functions). The
    payload schema here is fixed (``{"k": N}``), so extraction runs as
    one vectorized RE2 capture per batch — exact for this schema, with
    per-row ``json.loads`` as the general-schema fallback — followed by
    the usual partial+final grouped aggregate (the corpus never
    shuffles, only |event types| partial rows per batch)."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        b = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "k": k.to_numpy(zero_copy_only=False),
            }
        )
        return b.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sk=("k", "sum")
        )

    final = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "sk"],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "mean_k": pa.array(
                    np.round(t["sk"].to_numpy() / n, 4), pa.float64()
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# funnel / cohort / collocation family: ordered-sequence analytics the
# reference's corpus-stats layer (docling_eval/evaluators + dataset
# stats, SURVEY §2.9 stream shapes) implies but never needed — here as
# first-class scale ops over the events/documents tables.
# ---------------------------------------------------------------------------


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(sf_dir: str, *, steps=FUNNEL_STEPS):
    """Ordered-funnel user counts: how many users performed step 1,
    then step 2 STRICTLY AFTER their first step-1 event, then step 3
    strictly after that — the classic product-analytics funnel, which
    is also the "ordered n-event sequence per key" shape (§2.9).

    Distribution: one bucketed shuffle on ``user_id`` (each user's
    events must be co-located; nothing else needs order), per-bucket
    vectorized min/join/filter chain, then ONE partial row per bucket
    (len(steps) counters) through a tiny final sum. The corpus crosses
    the exchange once; the driver sees len(steps) numbers. Timestamps
    compare as exact integer microseconds on both engines."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def keep(t: pa.Table) -> pa.Table:  # prune non-funnel events pre-shuffle
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array(list(steps))))

    ds = ds.map_batches(keep, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "et": g["event_type"].to_numpy(), "ts": ts})
        counts = []
        # frontier: user -> completion time of the previous step
        prev = None  # pd.Series indexed by user
        for i, step in enumerate(steps):
            sub = df[df["et"] == step]
            if prev is not None:
                lim = sub["u"].map(prev)
                sub = sub[lim.notna() & (sub["ts"] > lim)]
            prev = sub.groupby("u")["ts"].min()
            counts.append(len(prev))
        return pd.DataFrame({f"s{i}": [np.int64(c)]
                             for i, c in enumerate(counts)})

    parts = bucketed_group_apply(ds, ["user_id"], per_bucket)
    from ray.data.aggregate import Sum

    agg = parts.aggregate(*[Sum(f"s{i}", alias_name=f"s{i}")
                            for i in range(len(steps))])
    return pd.DataFrame(
        {
            "step": [f"{i + 1}_{s}" for i, s in enumerate(steps)],
            "n_users": [np.int64(agg[f"s{i}"] or 0)
                        for i in range(len(steps))],
        }
    )


def cohort_retention(sf_dir: str):
    """Cohort-retention matrix: users grouped by the calendar day of
    their FIRST event (cohort), counted once per (cohort, day-offset)
    they were active on — the self-join-on-first-touch shape.

    Distribution: one bucketed shuffle on ``user_id`` co-locates each
    user's history; inside a bucket the first-touch min and the
    distinct activity offsets are vectorized pandas; each bucket emits
    per-(cohort_day, day_offset) partial counts (bounded by days x
    offsets, not by users), merged by one tiny final groupby. Cohort
    day travels as an ISO string (the house timestamp convention)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].to_numpy(dtype="datetime64[us]").astype("datetime64[D]")
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64), "day": day})
        d0 = df.groupby("u")["day"].transform("min")
        off = (df["day"] - d0).dt.days.astype(np.int64)
        act = pd.DataFrame(
            {"u": df["u"], "cohort_day": d0.astype(str), "day_offset": off}
        ).drop_duplicates()
        out = act.groupby(["cohort_day", "day_offset"], as_index=False).agg(
            n_users=("u", "size")
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = bucketed_group_apply(ds, ["user_id"], per_bucket)
    out = _final_groupby(parts, ["cohort_day", "day_offset"], ["n_users"])
    df = out.to_pandas()  # days x offsets rows — domain-bounded
    if len(df) == 0:  # schema-less empty blocks: SQL returns zero rows
        return pd.DataFrame(
            {"cohort_day": pd.Series([], dtype=str),
             "day_offset": pd.Series([], dtype=np.int64),
             "n_users": pd.Series([], dtype=np.int64)}
        )
    return df


def token_pmi_bigrams(sf_dir: str, *, k: int = 50):
    """Top-k adjacent-token bigrams by count, with pointwise mutual
    information ``ln((c_xy/M) / ((c_x/N) * (c_y/N)))`` — the
    collocation-mining op of a text corpus profiler (pairs naturally
    with ``token_frequency_topk`` / ``tfidf_topk``).

    Distribution: bigram and unigram counts are per-batch partials
    (value_counts inside map_batches — one row per DISTINCT gram per
    batch crosses the shuffle, never the token stream), merged by small
    final groupbys. The PMI join runs driver-side over the two
    vocabulary-sized tables (output-sized state, the house gate); at
    open-vocabulary scale the same join is one ``hash_join`` on w1/w2
    plus a broadcast of the total counters, and a ``max_df``-style
    heavy-hitter cap bounds the partial rows (same control documented
    in stages/dedup.py). Ordering is deterministic: n DESC, w1, w2."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def grams(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim(t["text"], characters=" "), r"\s+"
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # boundary mask: pair (i, i+1) valid iff both in the same doc
        ends = np.cumsum(lens)  # exclusive end of each doc's token run
        valid = np.ones(max(len(flat) - 1, 0), dtype=bool)
        valid[ends[ends < len(flat)] - 1] = False
        w1, w2 = flat[:-1][valid], flat[1:][valid]
        bdf = pd.DataFrame({"w1": w1, "w2": w2})
        bg = bdf.groupby(["w1", "w2"], as_index=False).agg(n=("w1", "size"))
        uv = pd.Series(flat).value_counts()
        return pa.table(
            {
                "w1": pa.array(
                    np.concatenate([bg["w1"].to_numpy(),
                                    uv.index.to_numpy()]), pa.string()),
                "w2": pa.array(
                    np.concatenate([bg["w2"].to_numpy(),
                                    np.full(len(uv), "", dtype=object)]),
                    pa.string()),
                "n": pa.array(
                    np.concatenate([bg["n"].to_numpy(np.int64),
                                    uv.to_numpy(np.int64)]), pa.int64()),
            }
        )

    # one scan emits both gram kinds (w2 == "" marks a unigram row);
    # a single final groupby merges partials for both tables at once
    counts = _final_groupby(
        ds.map_batches(grams, batch_format="pyarrow"), ["w1", "w2"], ["n"]
    ).to_pandas()  # vocab + vocab^2-bounded, NOT corpus-sized
    if len(counts) == 0:
        return pd.DataFrame(
            {"w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64),
             "pmi": pd.Series([], dtype=np.float64)}
        )
    uni = counts[counts["w2"] == ""].set_index("w1")["n"]
    big = counts[counts["w2"] != ""].copy()
    n_tok = float(uni.sum())
    n_big = float(big["n"].sum())
    cx = big["w1"].map(uni).to_numpy(np.float64)
    cy = big["w2"].map(uni).to_numpy(np.float64)
    cxy = big["n"].to_numpy(np.float64)
    big["pmi"] = np.round(
        np.log((cxy / n_big) / ((cx / n_tok) * (cy / n_tok))), 6
    )
    big["n"] = big["n"].astype(np.int64)
    big = big.sort_values(["n", "w1", "w2"],
                          ascending=[False, True, True], kind="mergesort")
    return big.head(k).reset_index(drop=True)


def top_event_type_per_user(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (ties broken
    by event_type ascending — deterministic on both engines). Distinct
    from ``latest_event_per_user`` (argmax by timestamp): this is
    argmax over a grouped COUNT.

    Distribution: per-batch (user, type) partial counts → one
    partial+final groupby (the exchange moves user x |types| partial
    rows, never events) → a second cheap bucketed pass over the
    user x |types|-sized aggregate picks each user's winner."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        gb = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return gb.rename_columns(["user_id", "event_type", "n"])

    counts = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], ["n"],
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        w = g.drop_duplicates("user_id")
        return pd.DataFrame(
            {"user_id": w["user_id"].to_numpy(np.int64),
             "top_event_type": w["event_type"].to_numpy(),
             "n": w["n"].to_numpy(np.int64)}
        )

    out = bucketed_group_apply(counts, ["user_id"], argmax).materialize()
    if out.count() == 0:  # to_pandas() of an empty Dataset loses schema
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype=np.int64),
             "top_event_type": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64)}
        )
    return out


def viewers_never_purchased(sf_dir: str):
    """Distinct view-users EXCEPT distinct purchase-users — the set-
    difference shape (anti-semi over derived distinct sets), computed
    in ONE scan: per-batch (user, saw_view, saw_purchase) bool
    partials, one Max-merge groupby on user_id, then a vectorized
    filter. The exchange moves one row per user per batch; no second
    scan, no join."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False),
             "v": pc.equal(t["event_type"], "view").to_numpy(
                 zero_copy_only=False).astype(np.int64),
             "p": pc.equal(t["event_type"], "purchase").to_numpy(
                 zero_copy_only=False).astype(np.int64)}
        )
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).agg(
                v=("v", "max"), p=("p", "max")
            ), preserve_index=False,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("v", alias_name="v"), Max("p", alias_name="p"))
    )

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["v"], 1), pc.equal(t["p"], 0))
        return pa.table(
            {"user_id": pc.cast(t.filter(keep)["user_id"], pa.int64())}
        )

    out = agg.map_batches(pick, batch_format="pyarrow").materialize()
    if out.count() == 0:  # to_pandas() of an empty Dataset loses schema
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64)})
    return out


def user_event_sequences(sf_dir: str):
    """Per-user ordered event-type sequence string (``a>b>c`` in
    (ts, event_id) order) — the ORDERED string_agg shape, the standard
    prep step for session-path mining. One bucketed shuffle on
    ``user_id``; ordering happens strictly inside the group (mergesort
    for stability), and the output is one row per user."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = g.groupby("user_id", sort=False).agg(
            seq=("event_type", ">".join), n_events=("event_type", "size")
        ).reset_index()
        out["user_id"] = out["user_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    out = bucketed_group_apply(ds, ["user_id"], concat).materialize()
    if out.count() == 0:  # to_pandas() of an empty Dataset loses schema
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype=np.int64),
             "seq": pd.Series([], dtype=str),
             "n_events": pd.Series([], dtype=np.int64)}
        )
    return out


def event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event streams:
    (prev_type, next_type, n) for consecutive events in (ts, event_id)
    order — the LAG-bigram shape behind session-path mining and funnel
    discovery. One bucketed shuffle on ``user_id``; the per-bucket apply
    emits (prev, next) partial counts (≤ |event_type|² rows per bucket),
    so the final groupby is domain-sized, not corpus-sized."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def bigrams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        out = pd.DataFrame(
            {"prev_type": np.concatenate([[""], et[:-1]])[same],
             "next_type": et[same]}
        )
        if len(out) == 0:
            # typed empty: a bucket of single-event users must not emit
            # a zero-column frame and split the block schemas
            return pd.DataFrame(
                {"prev_type": pd.Series([], dtype=str),
                 "next_type": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype=np.int64)}
            )
        part = out.value_counts().rename("n").reset_index()
        part["n"] = part["n"].astype(np.int64)
        return part

    partials = bucketed_group_apply(ds, ["user_id"], bigrams)
    out = _final_groupby(
        partials, ["prev_type", "next_type"], ["n"]
    ).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"prev_type": pd.Series([], dtype=str),
             "next_type": pd.Series([], dtype=str),
             "n": pd.Series([], dtype=np.int64)}
        )
    return out


def orderkey_islands(sf_dir: str):
    """Gaps-and-islands over the filtered order-key space: maximal runs
    of consecutive ``o_orderkey`` whose status is 'F' → (start_key,
    end_key, n_orders). The classic ``key − ROW_NUMBER()`` trick, made
    distributed by ``functions/ranks.py:global_row_number`` (range-
    partitioned rank: boundary sample → tiny offset aggregate → one
    shuffle). Island merge is a partial min/max/count per batch plus one
    bucketed final merge, so only island-sized rows cross the wire."""
    from ..functions.groups import bucketed_group_apply
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F"))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    ranked = global_row_number(ds, "o_orderkey")

    def grp(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        rn = t["rn"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": pa.array(k, pa.int64()),
            "g": pa.array((k - rn).astype(np.int64), pa.int64()),
        })

    def island_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("g", as_index=False).agg(
            start_key=("o_orderkey", "min"),
            end_key=("o_orderkey", "max"),
            n_orders=("o_orderkey", "size"),
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out

    def island_final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("g", as_index=False).agg(
            start_key=("start_key", "min"),
            end_key=("end_key", "max"),
            n_orders=("n_orders", "sum"),
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out[["start_key", "end_key", "n_orders"]]

    partials = ranked.map_batches(
        grp, batch_format="pyarrow"
    ).map_batches(island_partial, batch_format="pandas")
    out = bucketed_group_apply(partials, ["g"], island_final).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"start_key": pd.Series([], dtype=np.int64),
             "end_key": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64)}
        )
    return out


def order_percent_rank(sf_dir: str):
    """ROW_NUMBER + PERCENT_RANK over the whole orders table by
    (o_totalprice, o_orderkey) — the direct SQL-window oracle for the
    range-partitioned rank primitive (``functions/ranks.py``): boundary
    sample → tiny offset aggregate → ONE shuffle, never a global sort
    plus sequential scan. The tiebreak makes the total order unique, so
    SQL RANK == ROW_NUMBER and percent_rank is (rn−1)/(n−1) exactly."""
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()  # parquet metadata count — no scan
    ranked = global_row_number(ds, "o_totalprice", tiebreak=["o_orderkey"])

    def finish(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = (
            np.round((rn - 1) / (n - 1), 6)
            if n > 1 else np.zeros(len(rn), np.float64)
        )
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "rn": pa.array(rn, pa.int64()),
            "pr": pa.array(pr, pa.float64()),
        })

    out = ranked.map_batches(finish, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"o_orderkey": pd.Series([], dtype=np.int64),
             "rn": pd.Series([], dtype=np.int64),
             "pr": pd.Series([], dtype=np.float64)}
        )
    return out


def promo_revenue_share(sf_dir: str):
    """TPC-H Q14-shaped ratio-of-conditional-sums: per ship month, the
    share of discounted revenue coming from PROMO-type parts. The part
    dimension routes through ``dim_join`` (broadcast under the size
    threshold, bucketed hash join above it); revenue partials combine
    per batch so the final shuffle moves one row per month per batch."""
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": b["l_partkey"].to_numpy(),
            "revenue": (b["l_extendedprice"]
                        * (1.0 - b["l_discount"])).to_numpy(),
            "ship_month": b["l_shipdate"].dt.strftime("%Y-%m"),
        })

    joined = dim_join(
        li.map_batches(derive, batch_format="pandas"), part, on="p_partkey"
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        promo = np.where(b["p_type"].to_numpy() == "PROMO",
                         b["revenue"].to_numpy(), 0.0)
        out = (
            b.assign(promo_revenue=promo)
            .groupby("ship_month", as_index=False)
            .agg(promo_revenue=("promo_revenue", "sum"),
                 total_revenue=("revenue", "sum"))
        )
        return out

    partials = joined.map_batches(partial, batch_format="pandas")
    final = _final_groupby(partials, ["ship_month"],
                           ["promo_revenue", "total_revenue"])

    def ratio(t: pa.Table) -> pa.Table:
        pr = t["promo_revenue"].to_numpy(zero_copy_only=False)
        tr = t["total_revenue"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ship_month": t["ship_month"],
            "promo_pct": pa.array(np.round(100.0 * pr / tr, 4),
                                  pa.float64()),
        })

    out = final.map_batches(ratio, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"ship_month": pd.Series([], dtype=str),
             "promo_pct": pd.Series([], dtype=np.float64)}
        )
    return out


def priority_line_counts(sf_dir: str):
    """TPC-H Q12-shaped conditional counting over a large⋈large join:
    lineitem ⋈ orders on the order key (ONE bucketed hash-join
    shuffle), then per line status the count of lines whose order is
    urgent/high priority vs the rest — SUM(CASE WHEN …) re-expressed as
    a vectorized mask partial so only (status, 2×count) rows cross the
    final exchange."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    # inner join with an empty side is empty; the metadata-only count
    # guard avoids hash-joining a schema-less empty map_batches output
    if li.count() == 0 or orders.count() == 0:
        return pd.DataFrame(
            {"l_linestatus": pd.Series([], dtype=str),
             "high_line_count": pd.Series([], dtype=np.int64),
             "low_line_count": pd.Series([], dtype=np.int64)}
        )
    li = li.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_linestatus"]),
        batch_format="pyarrow",
    )
    joined = hash_join(li, orders, on="o_orderkey", num_buckets=16)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hi = np.isin(b["o_orderpriority"].to_numpy(),
                     ("1-URGENT", "2-HIGH")).astype(np.int64)
        out = (
            b.assign(high_line_count=hi, low_line_count=1 - hi)
            .groupby("l_linestatus", as_index=False)
            .agg(high_line_count=("high_line_count", "sum"),
                 low_line_count=("low_line_count", "sum"))
        )
        out["high_line_count"] = out["high_line_count"].astype(np.int64)
        out["low_line_count"] = out["low_line_count"].astype(np.int64)
        return out

    partials = joined.map_batches(partial, batch_format="pandas")
    out = _final_groupby(
        partials, ["l_linestatus"], ["high_line_count", "low_line_count"]
    ).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"l_linestatus": pd.Series([], dtype=str),
             "high_line_count": pd.Series([], dtype=np.int64),
             "low_line_count": pd.Series([], dtype=np.int64)}
        )
    return out


def top_suppliers_by_revenue(sf_dir: str):
    """TPC-H Q15-shaped argmax-over-aggregate: supplier(s) whose summed
    discounted revenue equals the global maximum — the correlated
    ``HAVING agg = (SELECT max(agg))`` shape. Partial revenue sums per
    batch → one domain-sized groupby → the max is a distributed scalar
    aggregate over that SAME result (no driver table pull) → broadcast-
    scalar filter. Ties all survive, as in SQL."""
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"l_suppkey": t["l_suppkey"], "total_revenue": rev})

    partials = li.map_batches(derive, batch_format="pyarrow").map_batches(
        _partial_groupby(["l_suppkey"], {"total_revenue": "total_revenue"}),
        batch_format="pyarrow",
    )
    agg = _final_groupby(partials, ["l_suppkey"], ["total_revenue"]).map_batches(
        lambda t: _round_cols(t, {"total_revenue": 2}), batch_format="pyarrow"
    ).materialize()
    if agg.count() == 0:
        return pd.DataFrame(
            {"l_suppkey": pd.Series([], dtype=np.int64),
             "total_revenue": pd.Series([], dtype=np.float64)}
        )
    mx = agg.max("total_revenue")
    out = agg.map_batches(
        lambda t: t.filter(pc.equal(t["total_revenue"], mx)),
        batch_format="pyarrow",
    ).materialize()
    return out


#: HAVING threshold: a part is "important" above this fraction of the
#: corpus-wide quantity (TPC-H Q11's FRACTION, sized to the test sf).
IMPORTANT_STOCK_FRACTION = 0.0008


def important_parts_stock(sf_dir: str):
    """TPC-H Q11-shaped fraction-of-total HAVING: parts whose summed
    lineitem quantity exceeds ``IMPORTANT_STOCK_FRACTION`` of the global
    quantity. Same two-aggregate composition as
    ``top_suppliers_by_revenue`` — the scalar side (global sum) is a
    distributed aggregate over the grouped result, broadcast into a
    streaming filter. Quantities are integral doubles, so the sums are
    order-independent-exact and the threshold compare cannot flip."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    partials = li.map_batches(
        _partial_groupby(["l_partkey"], {"l_quantity": "total_qty"}),
        batch_format="pyarrow",
    )
    agg = _final_groupby(partials, ["l_partkey"], ["total_qty"]).materialize()
    if agg.count() == 0:
        return pd.DataFrame(
            {"l_partkey": pd.Series([], dtype=np.int64),
             "total_qty": pd.Series([], dtype=np.float64)}
        )
    threshold = agg.sum("total_qty") * IMPORTANT_STOCK_FRACTION
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], threshold)),
        batch_format="pyarrow",
    ).materialize()


def lineitem_quantity_ranks(sf_dir: str):
    """RANK + DENSE_RANK over a heavily-tied key (l_quantity), computed
    WITHOUT any shuffle: the key domain is bounded, so a per-batch
    value-count partial plus one domain-sized final aggregate gives the
    full histogram, and rank(v) = 1 + Σ count(u<v) (dense_rank = index
    in the sorted distinct values) falls out of a driver-side prefix
    sum over ≤|domain| rows. The histogram-rank pattern — the right
    plan whenever ties dominate (status codes, scores, star ratings);
    contrast ``order_percent_rank`` where keys are near-unique and the
    range-partitioned plan wins."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        v, n = np.unique(
            t["l_quantity"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"l_quantity": pa.array(v, pa.float64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    counts = _final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["l_quantity"], ["n"]
    ).to_pandas()  # ≤|distinct quantity| rows — domain-sized
    if len(counts) == 0:
        return pd.DataFrame(
            {"l_quantity": pd.Series([], dtype=np.float64),
             "rnk": pd.Series([], dtype=np.int64),
             "drnk": pd.Series([], dtype=np.int64)}
        )
    counts = counts.sort_values("l_quantity").reset_index(drop=True)
    n = counts["n"].to_numpy()
    rnk = 1 + np.concatenate([[0], np.cumsum(n)[:-1]])
    return pd.DataFrame(
        {"l_quantity": counts["l_quantity"].to_numpy(np.float64),
         "rnk": rnk.astype(np.int64),
         "drnk": np.arange(1, len(counts) + 1, dtype=np.int64)}
    )


#: (output measure label, lineitem column) pairs for the unpivot.
UNPIVOT_MEASURES = (
    ("quantity", "l_quantity"),
    ("extendedprice", "l_extendedprice"),
    ("discount", "l_discount"),
)


def lineitem_measures_unpivot(sf_dir: str):
    """UNPIVOT/melt: per return flag, the mean of each of three measure
    columns as (flag, measure, avg_value) long-form rows. ONE scan
    computes all three partial (sum, count) pairs; the melt runs on the
    domain-sized aggregate — where SQL's UNION-ALL unpivot would scan
    the fact table once per measure."""
    cols = [c for _, c in UNPIVOT_MEASURES]
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag"] + cols)
    partials = ds.map_batches(
        _partial_groupby(["l_returnflag"], {c: f"sum_{c}" for c in cols},
                         count_as="n_rows"),
        batch_format="pyarrow",
    )
    agg = _final_groupby(
        partials, ["l_returnflag"], [f"sum_{c}" for c in cols] + ["n_rows"]
    ).to_pandas()  # |flags| rows
    if len(agg) == 0:
        return pd.DataFrame(
            {"l_returnflag": pd.Series([], dtype=str),
             "measure": pd.Series([], dtype=str),
             "avg_value": pd.Series([], dtype=np.float64)}
        )
    rows = []
    for label, c in UNPIVOT_MEASURES:
        rows.append(pd.DataFrame({
            "l_returnflag": agg["l_returnflag"],
            "measure": label,
            "avg_value": np.round(
                agg[f"sum_{c}"].to_numpy(np.float64)
                / agg["n_rows"].to_numpy(np.float64), 4),
        }))
    return pd.concat(rows, ignore_index=True)


#: percentiles reported by orders_price_percentiles.
PRICE_PERCENTILES = (0.25, 0.5, 0.75, 0.9)


def orders_price_percentiles(sf_dir: str):
    """Exact interpolated global percentiles (SQL PERCENTILE_CONT) of
    o_totalprice via distributed order statistics: rank every row with
    the range-partitioned ROW_NUMBER (one shuffle), broadcast the ≤2·|p|
    target ranks {⌊(n−1)p⌋+1, ⌈(n−1)p⌉+1}, filter to just those rows
    (a handful cross to the driver), and interpolate
    lower + frac·(upper−lower) — never a full gather or a single-task
    global sort."""
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()
    if n == 0:
        # SQL-on-empty: a scalar aggregate still yields its row, with
        # NULL — one (p, NULL) row per requested percentile
        return pd.DataFrame(
            {"p": np.array(PRICE_PERCENTILES, np.float64),
             "value": np.full(len(PRICE_PERCENTILES), np.nan)}
        )
    targets = {}
    for p in PRICE_PERCENTILES:
        idx = (n - 1) * p  # 0-based fractional order statistic
        targets.setdefault(int(np.floor(idx)) + 1, None)
        targets.setdefault(int(np.ceil(idx)) + 1, None)
    wanted = np.array(sorted(targets), dtype=np.int64)

    ranked = global_row_number(ds, "o_totalprice", tiebreak=["o_orderkey"])
    hits = ranked.map_batches(
        lambda t: t.filter(
            pc.is_in(t["rn"], value_set=pa.array(wanted, pa.int64()))
        ).select(["rn", "o_totalprice"]),
        batch_format="pyarrow",
    ).to_pandas()  # ≤ 2·|percentiles| rows
    by_rank = dict(zip(hits["rn"], hits["o_totalprice"]))
    out = []
    for p in PRICE_PERCENTILES:
        idx = (n - 1) * p
        lo, hi = int(np.floor(idx)) + 1, int(np.ceil(idx)) + 1
        frac = idx - np.floor(idx)
        v = by_rank[lo] + frac * (by_rank[hi] - by_rank[lo])
        out.append((p, np.round(v, 4)))
    return pd.DataFrame(
        {"p": np.array([p for p, _ in out], np.float64),
         "value": np.array([v for _, v in out], np.float64)}
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: the pure filter-aggregate — three predicates pushed
    into the parquet scan (row groups outside the shipdate year or the
    discount band never leave storage), one global sum. The minimal
    proof that selective reads prune at the source instead of
    filtering post-read."""
    import datetime

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi)
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24)
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({"revenue": pa.array(
            [rev.as_py() if rev.is_valid else 0.0], pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("revenue")
    # SQL-on-empty: SUM over nothing is NULL, still one row
    val = np.nan if total is None else np.round(total, 2)
    return pd.DataFrame({"revenue": np.array([val], np.float64)})


def customer_order_flags(sf_dir: str):
    """Grouped boolean aggregates (BOOL_OR / BOOL_AND as max/min over
    0-1 partials): per customer, whether ANY order is urgent and
    whether ALL orders are finished, plus the order count. Mergeable
    per-batch partials (max, min, sum) → one domain-sized groupby."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderpriority", "o_orderstatus"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        urgent = (b["o_orderpriority"].to_numpy() == "1-URGENT").astype(
            np.int64)
        finished = (b["o_orderstatus"].to_numpy() == "F").astype(np.int64)
        out = (
            b.assign(has_urgent=urgent, all_finished=finished, n_orders=1)
            .groupby("o_custkey", as_index=False)
            .agg(has_urgent=("has_urgent", "max"),
                 all_finished=("all_finished", "min"),
                 n_orders=("n_orders", "sum"))
        )
        for c in ("has_urgent", "all_finished", "n_orders"):
            out[c] = out[c].astype(np.int64)
        return out

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(
            Max("has_urgent", alias_name="has_urgent"),
            Min("all_finished", alias_name="all_finished"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .materialize()
    )
    if out.count() == 0:
        return pd.DataFrame(
            {"o_custkey": pd.Series([], dtype=np.int64),
             "has_urgent": pd.Series([], dtype=np.int64),
             "all_finished": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64)}
        )
    return out


def price_quantity_regression(sf_dir: str):
    """Per-group simple linear regression (price ~ quantity) from the
    five mergeable moments (n, Σx, Σy, Σxy, Σx²) — the REGR_SLOPE /
    REGR_INTERCEPT pair without ever co-locating a group's rows: each
    batch emits one moment row per group, the final groupby is
    |flags|-sized, and the closed form runs on the driver over those
    few rows. The same partial+final slots accept any moment-expressible
    statistic (corr and zscore already use them)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(np.float64)
        y = b["l_extendedprice"].to_numpy(np.float64)
        out = (
            b.assign(n=1, sx=x, sy=y, sxy=x * y, sxx=x * x)
            .groupby("l_returnflag", as_index=False)
            .agg(n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
                 sxy=("sxy", "sum"), sxx=("sxx", "sum"))
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"], ["n", "sx", "sy", "sxy", "sxx"],
    ).to_pandas()  # |returnflag| rows
    if len(agg) == 0:
        return pd.DataFrame(
            {"l_returnflag": pd.Series([], dtype=str),
             "slope": pd.Series([], dtype=np.float64),
             "intercept": pd.Series([], dtype=np.float64)}
        )
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxy, sxx = agg["sxy"].to_numpy(), agg["sxx"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {"l_returnflag": agg["l_returnflag"],
         "slope": np.round(slope, 4),
         "intercept": np.round(intercept, 4)}
    )


def cheapest_parts_per_brand(sf_dir: str):
    """Per-group argmin WITH ties: every part whose retail price equals
    its brand's minimum. Two-aggregate composition — a domain-sized
    grouped MIN (partial per batch, tiny final groupby) broadcast as a
    dict into a second streaming scan's filter — so ties survive (the
    LIMIT-k shape drops them) and no group's rows ever co-locate."""
    import ray

    from ray.data.aggregate import Min

    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_retailprice"])

    def partial_min(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("p_brand", as_index=False).agg(
            min_price=("p_retailprice", "min")
        )

    mins = (
        ds.map_batches(partial_min, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(Min("min_price", alias_name="min_price"))
        .to_pandas()  # |brands| rows — domain-sized
    )
    if len(mins) == 0:
        return pd.DataFrame(
            {"p_partkey": pd.Series([], dtype=np.int64),
             "p_brand": pd.Series([], dtype=str),
             "p_retailprice": pd.Series([], dtype=np.float64)}
        )
    lut = ray.put(dict(zip(mins["p_brand"], mins["min_price"])))

    def keep_min(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        m = _ray.get(lut)
        lim = b["p_brand"].map(m).to_numpy(np.float64)
        out = b[b["p_retailprice"].to_numpy() == lim]
        return out[["p_partkey", "p_brand", "p_retailprice"]]

    return ds.map_batches(keep_min, batch_format="pandas")


def flag_price_median(sf_dir: str):
    """Per-group INTERPOLATED median (SQL PERCENTILE_CONT 0.5 per
    l_returnflag): one bucketed shuffle on the group key, np.quantile
    (linear interpolation — the percentile_cont formula) inside the
    group task. The grouped sibling of ``orders_price_percentiles``;
    per-group state is bounded by the largest group."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_returnflag", as_index=False).agg(
            median_price=("l_extendedprice",
                          lambda s: np.quantile(s.to_numpy(np.float64),
                                                0.5))
        )
        out["median_price"] = np.round(
            out["median_price"].to_numpy(np.float64), 4)
        return out

    out = bucketed_group_apply(ds, ["l_returnflag"], med).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"l_returnflag": pd.Series([], dtype=str),
             "median_price": pd.Series([], dtype=np.float64)}
        )
    return out


def daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per day — the two-level distinct
    aggregate: batch-local (day, user) dedup partials → one bucketed
    shuffle on the pair collapses cross-batch duplicates → a per-day
    count partial+final. Only (day × active-user) pairs ever cross the
    wire, never events."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": b["ts"].dt.strftime("%Y-%m-%d"),
            "user_id": b["user_id"].to_numpy(),
        }).drop_duplicates()
        return out

    from ..functions.groups import bucketed_group_apply

    pairs = ds.map_batches(pair_partial, batch_format="pandas")
    # same pair → same hash bucket, so per-bucket drop_duplicates is a
    # global distinct (the house bucketed pattern — never a native
    # multi-key groupby, which single-tasks the sort-reduce)
    distinct_pairs = bucketed_group_apply(
        pairs, ["day", "user_id"], lambda g: g.drop_duplicates()
    )

    from ..functions.groups import count_partial

    out = (
        distinct_pairs.map_batches(count_partial("day", "dau"),
                                   batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"))
        .materialize()
    )
    if out.count() == 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype=str),
             "dau": pd.Series([], dtype=np.int64)}
        )
    return out


def orders_weekday_census(sf_dir: str):
    """Per ISO weekday (Mon=1..Sun=7): order count + mean total price.
    Calendar-part extraction inside the batch (pandas dayofweek+1 ==
    SQL ISODOW), then the standard partial+final pair."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.assign(isodow=(b["o_orderdate"].dt.dayofweek + 1).astype(
                np.int64), n_orders=1)
            .groupby("isodow", as_index=False)
            .agg(n_orders=("n_orders", "sum"),
                 sum_price=("o_totalprice", "sum"))
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out

    final = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["isodow"], ["n_orders", "sum_price"],
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = np.round(
            t["sum_price"].to_numpy(zero_copy_only=False)
            / t["n_orders"].to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "isodow": pc.cast(t["isodow"], pa.int64()),
            "n_orders": t["n_orders"],
            "avg_price": pa.array(avg, pa.float64()),
        })

    out = final.map_batches(finish, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"isodow": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64),
             "avg_price": pd.Series([], dtype=np.float64)}
        )
    return out


def customer_segment_share(sf_dir: str):
    """Share-of-total per market segment (the COUNT(*) OVER () window
    ratio): one domain-sized count groupby; the grand total is the sum
    of those few rows on the driver — no second scan, no window
    shuffle."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])

    from ..functions.groups import count_partial

    counts = _final_groupby(
        ds.map_batches(count_partial("c_mktsegment", "n_customers"),
                       batch_format="pyarrow"),
        ["c_mktsegment"], ["n_customers"],
    ).to_pandas()  # |segments| rows
    if len(counts) == 0:
        return pd.DataFrame(
            {"c_mktsegment": pd.Series([], dtype=str),
             "n_customers": pd.Series([], dtype=np.int64),
             "share": pd.Series([], dtype=np.float64)}
        )
    total = counts["n_customers"].sum()
    counts["share"] = np.round(
        counts["n_customers"].to_numpy(np.float64) / float(total), 6)
    counts["n_customers"] = counts["n_customers"].astype(np.int64)
    return counts[["c_mktsegment", "n_customers", "share"]]


#: rolling-median window length (rows, per user, event-time order).
ROLLING_MEDIAN_WINDOW = 5


def events_rolling_median(sf_dir: str):
    """Per-user rolling MEDIAN of event value over the last
    ``ROLLING_MEDIAN_WINDOW`` events in (ts, event_id) order — the
    ordered sliding window with a NON-decomposable aggregate (a rolling
    sum splits into partials; an order statistic needs the window's
    rows, so the group must co-locate: one bucketed shuffle on user_id,
    vectorized pandas rolling(min_periods=1) inside the bucket,
    matching SQL's ROWS BETWEEN k PRECEDING AND CURRENT ROW frame)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        med = (
            g.groupby("user_id", sort=False)["value"]
            .rolling(ROLLING_MEDIAN_WINDOW, min_periods=1)
            .median()
            .to_numpy()
        )
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "rolling_median": np.round(med, 4),
        })

    out = bucketed_group_apply(ds, ["user_id"], roll).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "rolling_median": pd.Series([], dtype=np.float64)}
        )
    return out


#: co-occurrence support threshold: pairs appearing in ≥ this many orders.
COOCCURRENCE_MIN_SUPPORT = 2


def part_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: unordered part pairs bought in the
    same order, counted across orders, support ≥
    ``COOCCURRENCE_MIN_SUPPORT``. Within-group pair EXPANSION (each
    order emits C(k,2) pairs, k bounded by lines-per-order) via the
    np.triu index trick per bucketed order group — the self-join shape
    without a self-join: the only exchanges are the order-key bucket
    shuffle and the pair-count partial+final groupby."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop_duplicates()  # a part twice in one order counts once
            .sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        )
        key = g["l_orderkey"].to_numpy()
        part = g["l_partkey"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(key)]])
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, k=1)
            a_out.append(part[s:e][ii])
            b_out.append(part[s:e][jj])
        if not a_out:
            return pd.DataFrame(
                {"part_a": pd.Series([], dtype=np.int64),
                 "part_b": pd.Series([], dtype=np.int64),
                 "n_orders": pd.Series([], dtype=np.int64)}
            )
        out = pd.DataFrame({
            "part_a": np.concatenate(a_out),
            "part_b": np.concatenate(b_out),
        })
        part_counts = out.value_counts().rename("n_orders").reset_index()
        part_counts["n_orders"] = part_counts["n_orders"].astype(np.int64)
        return part_counts

    partials = bucketed_group_apply(ds, ["l_orderkey"], pairs)

    # pair cardinality is the highest key cardinality in the repo —
    # merge counts through the bucketed pattern (one hash shuffle on
    # the pair), never the native multi-key aggregate's single
    # sort-reduce; stream straight into the support filter and
    # materialize ONCE (the unfiltered pair table is the largest
    # intermediate and mostly discarded)
    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["part_a", "part_b"], as_index=False).agg(
            n_orders=("n_orders", "sum")
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out[out["n_orders"] >= COOCCURRENCE_MIN_SUPPORT]

    flt = bucketed_group_apply(
        partials, ["part_a", "part_b"], merge_counts
    ).materialize()
    if flt.count() == 0:
        return pd.DataFrame(
            {"part_a": pd.Series([], dtype=np.int64),
             "part_b": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64)}
        )
    return flt


def part_cooccurrence_lift(sf_dir: str):
    """Association LIFT over the market-basket pairs:
    ``lift(a,b) = n_ab·N / (n_a·n_b)`` with N = distinct orders and
    n_x = distinct orders containing part x — the
    "is this pair correlated or just popular" score on top of
    ``part_cooccurrence``. Extra cost over the pair census: one
    part-bucketed exchange for per-part order counts (part domain is
    dimension-sized → collected to a broadcast lookup) and one
    distinct-orderkey pass for N; lift is mapped onto the pair table
    with the scalar/lookup closure — no pair-side join exchange."""
    import ray

    from ..functions.groups import (
        bucketed_group_apply,
        count_partial,
        final_groupby_sum,
    )

    pairs = part_cooccurrence(sf_dir)
    empty = pd.DataFrame(
        {"part_a": pd.Series([], dtype=np.int64),
         "part_b": pd.Series([], dtype=np.int64),
         "n_orders": pd.Series([], dtype=np.int64),
         "lift": pd.Series([], dtype=np.float64)}
    )
    if isinstance(pairs, pd.DataFrame):  # empty-input fast path
        return empty

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    # n_x: all rows of one part meet in its bucket → exact per-part
    # distinct-order count with one exchange
    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = d.groupby("l_partkey", as_index=False).agg(
            n=("l_orderkey", "size")
        )
        return out.astype(np.int64)

    pc_df = bucketed_group_apply(
        ds, ["l_partkey"], part_counts
    ).to_pandas()  # part domain: dimension-sized
    lookup_ref = ray.put(
        dict(zip(pc_df["l_partkey"].tolist(), pc_df["n"].tolist()))
    )

    # N: count(DISTINCT l_orderkey) — distinct rows via the census
    # partial+final, cardinality read from the result's row count
    n_total = final_groupby_sum(
        ds.map_batches(count_partial("l_orderkey", "n"),
                       batch_format="pyarrow"),
        ["l_orderkey"], ["n"],
    ).count()

    def with_lift(t: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        n_ab = t["n_orders"].to_numpy(zero_copy_only=False)
        na = np.array([lut[x] for x in a], np.float64)
        nb = np.array([lut[x] for x in b], np.float64)
        lift = np.round(n_ab * float(n_total) / (na * nb), 6)
        return t.append_column("lift", pa.array(lift, pa.float64()))

    return pairs.map_batches(with_lift, batch_format="pyarrow")


def orderkey_set_compare(sf_dir: str):
    """Full-outer SET reconciliation: how many order keys exist only in
    orders, only in lineitem, or in both — the integrity census behind
    every ingest/backfill check. Per-side batch-local distinct partials
    → one bucketed shuffle where both sides' keys of a bucket meet →
    per-bucket set algebra → 3-row class count. Keys cross the wire at
    most once per side per batch."""
    from ..functions.groups import bucketed_group_apply

    def tag(col: str, side: str):
        def fn(t: pa.Table) -> pa.Table:
            u = pc.unique(t[col])
            return pa.table({
                "k": u,
                "side": pa.array([side] * len(u), pa.string()),
            })

        return fn

    orders = _read(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        tag("o_orderkey", "o"), batch_format="pyarrow"
    )
    line = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        tag("l_orderkey", "l"), batch_format="pyarrow"
    )
    both = orders.union(line)

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        has = g.groupby("k")["side"].agg(frozenset)
        klass = has.map(
            lambda s: "both" if len(s) == 2
            else ("orders_only" if "o" in s else "lineitem_only")
        )
        out = klass.value_counts().rename("n_keys").reset_index()
        out.columns = ["presence", "n_keys"]
        out["n_keys"] = out["n_keys"].astype(np.int64)
        return out

    partials = bucketed_group_apply(both, ["k"], classify)
    out = _final_groupby(partials, ["presence"], ["n_keys"]).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"presence": pd.Series([], dtype=str),
             "n_keys": pd.Series([], dtype=np.int64)}
        )
    return out


def daily_revenue_change(sf_dir: str):
    """Day-over-day percent change of event revenue — LAG over an
    AGGREGATE: the corpus collapses to one row per day (partial+final
    sums), and the window runs over those few rows on the driver; the
    shuffle never sees the window."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.assign(day=b["ts"].dt.strftime("%Y-%m-%d"))
            .groupby("day", as_index=False)
            .agg(revenue=("value", "sum"))
        )
        return out

    daily = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["revenue"],
    ).to_pandas()  # |days| rows
    if len(daily) == 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype=str),
             "revenue": pd.Series([], dtype=np.float64),
             "pct_change": pd.Series([], dtype=np.float64)}
        )
    daily = daily.sort_values("day").reset_index(drop=True)
    rev = daily["revenue"].to_numpy(np.float64)
    prev = np.concatenate([[np.nan], rev[:-1]])
    daily["pct_change"] = np.round(100.0 * (rev - prev) / prev, 4)
    daily["revenue"] = np.round(rev, 2)
    return daily[["day", "revenue", "pct_change"]]


def customer_spend_quartiles(sf_dir: str):
    """NTILE(4) OVER the result of an aggregate — window-over-aggregate
    composition: per-customer total spend (partial+final groupby), then
    the range-partitioned global ROW_NUMBER assigns exact NTILE tiles
    ((rn−1)·4 // n + 1) over the aggregate WITHOUT gathering it (the
    customer domain scales with the corpus, so the rank stays
    distributed where a driver-side qcut would not)."""
    from ..functions.ranks import global_row_number

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = orders.map_batches(
        _partial_groupby(["o_custkey"], {"o_totalprice": "total_spend"}),
        batch_format="pyarrow",
    )
    agg = _final_groupby(partials, ["o_custkey"], ["total_spend"]).map_batches(
        lambda t: _round_cols(t, {"total_spend": 2}), batch_format="pyarrow"
    ).materialize()
    n = agg.count()
    if n == 0:
        return pd.DataFrame(
            {"o_custkey": pd.Series([], dtype=np.int64),
             "total_spend": pd.Series([], dtype=np.float64),
             "quartile": pd.Series([], dtype=np.int64)}
        )
    ranked = global_row_number(agg, "total_spend", tiebreak=["o_custkey"])

    def tile(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact SQL NTILE: the first n%4 tiles get the extra row —
        # ((rn-1)*4//n would split 38,37,38,37 where NTILE gives
        # 38,38,37,37)
        base, rem = divmod(n, 4)
        cut = rem * (base + 1)
        idx = rn - 1
        quart = np.where(
            idx < cut,
            idx // (base + 1),
            rem + (idx - cut) // max(base, 1),
        ) + 1
        return pa.table({
            "o_custkey": t["o_custkey"],
            "total_spend": t["total_spend"],
            "quartile": pa.array(quart.astype(np.int64), pa.int64()),
        })

    return ranked.map_batches(tile, batch_format="pyarrow")


def events_zscore_by_type(sf_dir: str):
    """Per-group standardization: z = (value − μ_type) / σ_type with
    population moments per event type — the grouped two-pass pattern:
    a domain-sized moment aggregate (n, Σv, Σv²) broadcast into a
    second streaming scan; rows never shuffle."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def mom(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        out = (
            b.assign(n=1, sv=v, svv=v * v)
            .groupby("event_type", as_index=False)
            .agg(n=("n", "sum"), sv=("sv", "sum"), svv=("svv", "sum"))
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = _final_groupby(
        ds.map_batches(mom, batch_format="pandas"),
        ["event_type"], ["n", "sv", "svv"],
    ).to_pandas()  # |event_type| rows
    if len(agg) == 0:
        return pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "event_type": pd.Series([], dtype=str),
             "z": pd.Series([], dtype=np.float64)}
        )
    n = agg["n"].to_numpy(np.float64)
    mu = agg["sv"].to_numpy() / n
    # round the variance on BOTH sides (round_even in SQL) so a
    # constant-valued group's ±ulp residue becomes exactly 0 in both
    # engines, then DROP such degenerate groups in both (SQL WHERE
    # var > 0) — clamping on one side only would hash-mismatch
    var = np.round(agg["svv"].to_numpy() / n - mu * mu, 6)
    keepm = var > 0
    sd = np.sqrt(var[keepm])
    types = agg["event_type"].to_numpy()[keepm]
    mu_map = dict(zip(types, mu[keepm]))
    sd_map = dict(zip(types, sd))
    lut = ray.put((mu_map, sd_map))

    def z(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        mus_d, sds_d = _ray.get(lut)  # one fetch per batch
        mus = b["event_type"].map(mus_d)  # pandas dict-map, no lambda
        ok = mus.notna().to_numpy()
        b = b[ok]
        mus = mus.to_numpy(np.float64)[ok]
        sds = b["event_type"].map(sds_d).to_numpy(np.float64)
        zv = np.round((b["value"].to_numpy(np.float64) - mus) / sds, 4)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "event_type": b["event_type"].to_numpy(),
            "z": zv,
        })

    return ds.map_batches(z, batch_format="pandas")


def suppliers_above_region_avg(sf_dir: str):
    """Per-group aggregate-threshold filter: suppliers whose account
    balance beats their REGION's average — the correlated-subquery
    shape. Nation→region is a tiny broadcast; the per-region (sum,
    count) moments aggregate to |regions| rows; a second streaming scan
    filters against the broadcast thresholds. Supplier rows never
    shuffle."""
    import ray

    empty = pd.DataFrame(
        {"s_suppkey": pd.Series([], dtype=np.int64),
         "region": pd.Series([], dtype=np.int64),
         "s_acctbal": pd.Series([], dtype=np.float64)}
    )
    nation_ds = _read(sf_dir, "nation",
                      columns=["n_nationkey", "n_regionkey"])
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    # an empty dimension's to_pandas() loses its columns entirely; the
    # join result is empty anyway (metadata-only count)
    if nation_ds.count() == 0 or sup.count() == 0:
        return empty
    nation = nation_ds.to_pandas()
    nat2reg = dict(zip(nation["n_nationkey"].astype(np.int64),
                       nation["n_regionkey"].astype(np.int64)))
    reg_ref = ray.put(nat2reg)

    def mom(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        reg = b["s_nationkey"].astype(np.int64).map(_ray.get(reg_ref))
        # inner-join semantics: a nationkey absent from nation DROPS the
        # row (as the oracle's JOIN does) instead of crashing the int
        # cast on NaN
        ok = reg.notna().to_numpy()
        b, reg = b[ok], reg[ok]
        out = (
            b.assign(region=reg.to_numpy(np.int64), n=1)
            .groupby("region", as_index=False)
            .agg(n=("n", "sum"), s=("s_acctbal", "sum"))
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = _final_groupby(
        sup.map_batches(mom, batch_format="pandas"), ["region"], ["n", "s"]
    ).to_pandas()  # |regions| rows
    if len(agg) == 0:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype=np.int64),
             "region": pd.Series([], dtype=np.int64),
             "s_acctbal": pd.Series([], dtype=np.float64)}
        )
    # round the threshold on BOTH sides (round_even in SQL): the raw
    # sum/n differs between engines in last-ulp with different
    # summation order, and a balance sitting between the two averages
    # would flip the filter
    avg_ref = ray.put(dict(zip(
        agg["region"].astype(np.int64),
        np.round(agg["s"].to_numpy(np.float64)
                 / agg["n"].to_numpy(np.float64), 6),
    )))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        nat2reg_l = _ray.get(reg_ref)   # one fetch per batch, not per
        avgs = _ray.get(avg_ref)        # row (get deserializes the dict)
        reg = b["s_nationkey"].astype(np.int64).map(nat2reg_l)
        ok = reg.notna().to_numpy()     # inner-join semantics (see mom)
        b, reg = b[ok], reg[ok].to_numpy(np.int64)
        lim = pd.Series(reg).map(avgs).to_numpy(np.float64)
        mask = b["s_acctbal"].to_numpy(np.float64) > lim
        return pd.DataFrame({
            "s_suppkey": b["s_suppkey"].to_numpy()[mask],
            "region": reg[mask],
            "s_acctbal": b["s_acctbal"].to_numpy()[mask],
        })

    return sup.map_batches(keep, batch_format="pandas")


def events_value_mad(sf_dir: str):
    """Median absolute deviation of event value per event type — NESTED
    order statistics (median of |v − median|), which no partial sum can
    carry: one bucketed shuffle co-locates each type's rows, and both
    medians run vectorized inside the bucket task (np.quantile linear ==
    SQL percentile_cont)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, grp in g.groupby("event_type", sort=True):
            v = grp["value"].to_numpy(np.float64)
            med = np.quantile(v, 0.5)
            rows.append((t, np.round(np.quantile(np.abs(v - med), 0.5), 4)))
        return pd.DataFrame({
            "event_type": [t for t, _ in rows],
            "mad": np.array([m for _, m in rows], np.float64),
        })

    out = bucketed_group_apply(ds, ["event_type"], mad).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=str),
             "mad": pd.Series([], dtype=np.float64)}
        )
    return out


def cooccurrence_triangles(sf_dir: str):
    """Distributed triangle count over the part co-occurrence graph —
    graph pattern matching as two bucketed hash joins: wedge generation
    (edges ⋈ edges on the shared middle vertex; a<b<c orientation comes
    free from the pairs' canonical ordering) then closure (wedge
    endpoints semi-joined back against the edge set). The edge set is
    the already-materialized ``part_cooccurrence`` output, consumed
    three times without re-execution; only wedges — bounded by
    Σ deg(v)² — cross the wire."""
    ed = part_cooccurrence(sf_dir)
    if isinstance(ed, pd.DataFrame):  # empty-input typed frame
        return pd.DataFrame({"n_triangles": pd.Series([0], dtype=np.int64)})

    left = ed.map_batches(
        lambda t: pa.table({"k": t["part_b"], "wa": t["part_a"]}),
        batch_format="pyarrow",
    )
    right = ed.map_batches(
        lambda t: pa.table({"k": t["part_a"], "wc": t["part_b"]}),
        batch_format="pyarrow",
    )
    wedges = hash_join(left, right, on="k", num_buckets=16).map_batches(
        lambda t: pa.table({"part_a": t["wa"], "part_b": t["wc"]}),
        batch_format="pyarrow",
    )
    closed = hash_join(
        wedges,
        ed.map_batches(
            lambda t: t.select(["part_a", "part_b"]), batch_format="pyarrow"
        ),
        on=["part_a", "part_b"],
        num_buckets=16,
    )
    return pd.DataFrame(
        {"n_triangles": pd.Series([closed.count()], dtype=np.int64)}
    )


def trailing2d_active_users(sf_dir: str):
    """Distinct users over a TRAILING window (2-day active users per
    day) — the sliding-window distinct, which no running sum can carry:
    each distinct (day, user) pair is re-emitted into every window it
    feeds (here: its own day and the next), clipped against the
    broadcast day domain, re-deduplicated, and counted. Exchanges stay
    (windows × active users)-sized, never event-sized."""
    import datetime

    import ray

    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": b["ts"].dt.strftime("%Y-%m-%d"),
            "user_id": b["user_id"].to_numpy(),
        }).drop_duplicates()

    pairs = bucketed_group_apply(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["day", "user_id"], lambda g: g.drop_duplicates(),
    ).materialize()

    # day domain: tiny by construction (calendar-sized) → driver + put
    days_df = pairs.map_batches(
        lambda b: b[["day"]].drop_duplicates(), batch_format="pandas"
    ).to_pandas().drop_duplicates()
    if len(days_df) == 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype=str),
             "wau": pd.Series([], dtype=np.int64)}
        )
    day_set = ray.put(frozenset(days_df["day"]))

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        valid = _ray.get(day_set)
        nxt = (
            pd.to_datetime(b["day"]) + datetime.timedelta(days=1)
        ).dt.strftime("%Y-%m-%d")
        out = pd.concat([
            b[["day", "user_id"]],
            pd.DataFrame({"day": nxt.to_numpy(),
                          "user_id": b["user_id"].to_numpy()}),
        ], ignore_index=True)
        return out[out["day"].isin(valid)]

    expanded = pairs.map_batches(expand, batch_format="pandas")
    deduped = bucketed_group_apply(
        expanded, ["day", "user_id"], lambda g: g.drop_duplicates()
    )

    from ..functions.groups import count_partial, final_groupby_sum

    out = final_groupby_sum(
        deduped.map_batches(count_partial("day", "wau"),
                            batch_format="pyarrow"),
        ["day"], ["wau"],
    ).materialize()
    return out


def lang_token_entropy(sf_dir: str):
    """Shannon entropy (bits) of each language's token distribution —
    the corpus-diversity signal of a training mixture. One scan emits
    (lang, token) count partials; a bucketed merge collapses them to
    the per-language vocabulary; the entropy Σ −p·log2 p reduces each
    language inside its bucket task, so only (lang, H) rows reach the
    driver. Token probabilities divide by the language's OWN total
    (computed in-bucket — all of a language's vocabulary co-locates)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(
            pc.utf8_trim(t["text"], characters=" "), r"\s+"
        )
        toks = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": np.repeat(langs, lens), "token": flat})
        out = df.value_counts().rename("n").reset_index()
        if len(out) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "lang": pa.array(out["lang"].to_numpy()),
            "token": pa.array(out["token"].to_numpy()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow")

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        merged = g.groupby(["lang", "token"], as_index=False).agg(
            n=("n", "sum")
        )
        rows = []
        for lang, grp in merged.groupby("lang", sort=True):
            n = grp["n"].to_numpy(np.float64)
            p = n / n.sum()
            rows.append((lang, np.round(-(p * np.log2(p)).sum(), 4)))
        return pd.DataFrame({
            "lang": [la for la, _ in rows],
            "entropy_bits": np.array([h for _, h in rows], np.float64),
        })

    # bucket on lang ONLY: a language's whole vocabulary must co-locate
    # for both the count merge and the probability normalization
    out = bucketed_group_apply(counts, ["lang"], entropy).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=str),
             "entropy_bits": pd.Series([], dtype=np.float64)}
        )
    return out


def doc_length_gini(sf_dir: str):
    """Gini coefficient of document lengths — the length-inequality
    scalar of a corpus (skew planning input): with lengths sorted
    ascending and ranked 1..n by the range-partitioned ROW_NUMBER,
    G = 2·Σ(rn·x) / (n·Σx) − (n+1)/n. The two Σ are plain distributed
    sums over the ranked stream; nothing but the scalar reaches the
    driver."""
    from ..functions.ranks import global_row_number

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"gini": pd.Series([np.nan], dtype=np.float64)})
    ranked = global_row_number(ds, "n_chars", tiebreak=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "sx": pa.array([float(x.sum())], pa.float64()),
            "srx": pa.array([float((rn * x).sum())], pa.float64()),
        })

    sums = ranked.map_batches(partial, batch_format="pyarrow")
    sx = sums.sum("sx")
    srx = sums.sum("srx")
    gini = 2.0 * srx / (n * sx) - (n + 1) / n
    return pd.DataFrame({"gini": pd.Series([np.round(gini, 6)],
                                           dtype=np.float64)})


def longest_order_streak(sf_dir: str):
    """Grouped gaps-and-islands: each customer's longest run of
    CONSECUTIVE order days — the per-entity streak metric (the grouped
    sibling of ``orderkey_islands``). One bucketed shuffle on the
    customer key; inside the bucket the classic date − rank trick runs
    vectorized over distinct (customer, day) pairs, emitting one
    (customer, max streak) row."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def streak(g: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "c": g["o_custkey"].to_numpy(),
            "day": g["o_orderdate"].dt.floor("D"),
        }).drop_duplicates().sort_values(["c", "day"], kind="mergesort")
        c = d["c"].to_numpy()
        day = d["day"].to_numpy("datetime64[D]").astype(np.int64)
        rn = np.arange(len(d), dtype=np.int64)
        # new (customer, island) whenever customer changes or a gap > 1
        grp_break = np.concatenate(
            [[True], (c[1:] != c[:-1]) | (day[1:] - day[:-1] != 1)]
        )
        island = np.cumsum(grp_break) - 1
        lengths = np.bincount(island)
        # island -> customer: customer of each island's first row
        island_cust = c[grp_break]
        out = (
            pd.DataFrame({"o_custkey": island_cust, "len": lengths})
            .groupby("o_custkey", as_index=False)
            .agg(longest_streak=("len", "max"))
        )
        out["longest_streak"] = out["longest_streak"].astype(np.int64)
        return out

    out = bucketed_group_apply(ds, ["o_custkey"], streak).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"o_custkey": pd.Series([], dtype=np.int64),
             "longest_streak": pd.Series([], dtype=np.int64)}
        )
    return out


#: column pairs reported by lineitem_corr_matrix.
CORR_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
)


def lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlations of three measures in ONE scan —
    the multi-statistic moment pattern: a single map_batches emits all
    nine moment partials (n, Σx per column, Σxy per pair, Σx² per
    column), one scalar-sized final merge, and the closed forms run on
    the driver. Three corr() calls in SQL scan the table three times;
    here the corpus is read once."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", columns=cols)

    def mom(b: pd.DataFrame) -> pd.DataFrame:
        out = {"n": np.int64(len(b))}
        arrs = {c: b[c].to_numpy(np.float64) for c in cols}
        for c in cols:
            out[f"s_{c}"] = arrs[c].sum()
            out[f"ss_{c}"] = (arrs[c] * arrs[c]).sum()
        for a, c2 in CORR_PAIRS:
            out[f"sxy_{a}_{c2}"] = (arrs[a] * arrs[c2]).sum()
        return pd.DataFrame([out])

    parts = ds.map_batches(mom, batch_format="pandas").to_pandas()
    if len(parts) == 0 or parts["n"].sum() == 0:
        return pd.DataFrame(
            {"col_a": pd.Series([], dtype=str),
             "col_b": pd.Series([], dtype=str),
             "corr": pd.Series([], dtype=np.float64)}
        )
    tot = parts.sum()
    n = float(tot["n"])
    rows = []
    for a, c2 in CORR_PAIRS:
        sx, sy = tot[f"s_{a}"], tot[f"s_{c2}"]
        sxx, syy = tot[f"ss_{a}"], tot[f"ss_{c2}"]
        sxy = tot[f"sxy_{a}_{c2}"]
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        rows.append((a, c2, np.round(num / den, 6)))
    return pd.DataFrame({
        "col_a": [r[0] for r in rows],
        "col_b": [r[1] for r in rows],
        "corr": np.array([r[2] for r in rows], np.float64),
    })


#: "big purchase" threshold for the gap-filled daily series.
BIG_PURCHASE_MIN = 95.0


def daily_big_purchases_spine(sf_dir: str):
    """Gap-filled daily time series: big-purchase count/revenue per
    calendar day with MISSING DAYS ZERO-FILLED against a generated date
    spine — the generate_series + LEFT JOIN + COALESCE shape that turns
    a sparse event aggregate into a dense series. The spine bounds come
    from distributed min/max over ALL events; the filtered aggregate is
    day-domain-sized, so the spine join is a driver-side merge of two
    calendar-sized frames."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    # both bounds in ONE pass — separate .min()/.max() calls each
    # re-execute the scan
    bounds = ds.aggregate(Min("ts"), Max("ts")) or {}
    lo, hi = bounds.get("min(ts)"), bounds.get("max(ts)")
    if lo is None:
        return pd.DataFrame(
            {"day": pd.Series([], dtype=str),
             "n_big": pd.Series([], dtype=np.int64),
             "revenue": pd.Series([], dtype=np.float64)}
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = b[(b["event_type"] == "purchase")
              & (b["value"] >= BIG_PURCHASE_MIN)]
        out = (
            f.assign(day=f["ts"].dt.strftime("%Y-%m-%d"), n_big=1)
            .groupby("day", as_index=False)
            .agg(n_big=("n_big", "sum"), revenue=("value", "sum"))
        )
        out["n_big"] = out["n_big"].astype(np.int64)
        return out

    agg = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n_big", "revenue"],
    ).to_pandas()  # ≤ |days| rows
    spine = pd.DataFrame({
        "day": pd.date_range(
            pd.Timestamp(lo).floor("D"), pd.Timestamp(hi).floor("D"),
            freq="D",
        ).strftime("%Y-%m-%d")
    })
    if len(agg) == 0:
        agg = pd.DataFrame(
            {"day": pd.Series([], dtype=str),
             "n_big": pd.Series([], dtype=np.int64),
             "revenue": pd.Series([], dtype=np.float64)}
        )
    out = spine.merge(agg, on="day", how="left")
    out["n_big"] = out["n_big"].fillna(0).astype(np.int64)
    out["revenue"] = np.round(
        out["revenue"].fillna(0.0).to_numpy(np.float64), 2)
    return out


def top_decile_revenue_share(sf_dir: str):
    """Revenue concentration: the share of total customer spend held by
    the top NTILE(10) of customers — the Pareto/concentration scalar
    (the Gini's tail-focused sibling). Per-customer spend aggregate →
    distributed rank → exact NTILE(10) tile mask → two conditional
    partial sums over the ranked stream; only the two scalars reach the
    driver."""
    from ..functions.ranks import global_row_number

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = orders.map_batches(
        _partial_groupby(["o_custkey"], {"o_totalprice": "total_spend"}),
        batch_format="pyarrow",
    )
    agg = _final_groupby(
        partials, ["o_custkey"], ["total_spend"]
    ).map_batches(
        lambda t: _round_cols(t, {"total_spend": 2}), batch_format="pyarrow"
    ).materialize()
    n = agg.count()
    if n == 0:
        return pd.DataFrame(
            {"top_decile_share": pd.Series([np.nan], dtype=np.float64)}
        )
    ranked = global_row_number(agg, "total_spend", tiebreak=["o_custkey"])
    base, rem = divmod(n, 10)
    cut = rem * (base + 1)

    def sums(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = rn - 1
        tile = np.where(
            idx < cut, idx // (base + 1),
            rem + (idx - cut) // max(base, 1),
        ) + 1
        x = t["total_spend"].to_numpy(zero_copy_only=False)
        return pa.table({
            "top": pa.array([float(x[tile == 10].sum())], pa.float64()),
            "total": pa.array([float(x.sum())], pa.float64()),
        })

    parts = ranked.map_batches(sums, batch_format="pyarrow")
    top, total = parts.sum("top"), parts.sum("total")
    return pd.DataFrame(
        {"top_decile_share": pd.Series([np.round(top / total, 6)],
                                       dtype=np.float64)}
    )


def _pareto_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Non-dominated mask for (minimize price, maximize size): A
    dominates B iff A.price ≤ B.price ∧ A.size ≥ B.size with one strict.
    Single scan over ascending price levels (within a level only the
    max-size points can survive; across levels a point survives iff its
    size beats the best size of every strictly-cheaper point).
    Property-tested against brute-force dominance."""
    order = np.lexsort((-size, price))
    p, s = price[order], size[order]
    keep = np.zeros(len(p), bool)
    best = -np.inf
    i = 0
    while i < len(p):
        j = i
        while j < len(p) and p[j] == p[i]:
            j += 1
        level_max = s[i]  # sorted desc within the level
        if level_max > best:
            keep[i:j] = s[i:j] == level_max
        best = max(best, level_max)
        i = j
    out = np.zeros(len(p), bool)
    out[order] = keep
    return out


def parts_pareto_front(sf_dir: str):
    """Pareto-optimal parts on (cheapest price, largest size) — the
    skyline query (public Börzsönyi et al. 2001 block-nested-loop
    family), distributed via the closure property: the front of a union
    is contained in the union of per-block fronts. Each batch emits its
    LOCAL front (vectorized level scan); one candidate-sized exchange
    reduces the unioned candidates with the same kernel. Per-task state
    is bounded by the candidate front (worst case — every point
    mutually non-dominated — degrades to the full relation in the final
    task; real catalogs have fronts orders of magnitude smaller, and a
    k-d re-split would bound it the way stages/knn.py re-splits cells).
    Oracled via the NOT EXISTS dominance self-join."""
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])

    def local_front(t: pa.Table) -> pa.Table:
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(_pareto_mask(price, size)))

    cand = ds.map_batches(local_front, batch_format="pyarrow")
    # final reduce: one task over the unioned (candidate-front-sized)
    # local fronts
    return cand.repartition(1).map_batches(
        local_front, batch_format="pyarrow", batch_size=None
    )


def top_tokens_per_lang(sf_dir: str, *, k: int = 5):
    """Per-language token top-k with rank — the grouped heavy-hitter
    census (per-group TOP-K, deterministic ties by token): per-batch
    (lang, token) partial counts (one row per distinct pair per batch),
    one bucketed sum on the pair, then a per-lang bucketed rank+head —
    the global sort never sees more than |langs|×k rows and the
    exchanges move vocabulary-sized rows, never the token stream."""
    from ..functions.tokens import sql_tokens  # closure-bound: partial
    # runs on workers, where a runtime relative import would die off-repo

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs, toks, ns = [], [], []
        for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in sql_tokens(text):  # SQL-replica tokenization
                counts[w] = counts.get(w, 0) + 1
            langs.extend([lang] * len(counts))
            toks.extend(counts)
            ns.extend(counts.values())
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "n_part": pa.array(ns, pa.int64()),
            }
        )

    from ..functions.groups import bucketed_group_apply

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["lang", "token"], as_index=False, sort=False)[
            "n_part"
        ].sum().rename(columns={"n_part": "n"})

    counts = bucketed_group_apply(partials, ["lang", "token"], sum_bucket)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rnk"] = g.groupby("lang", sort=False).cumcount() + 1
        out = g[g["rnk"] <= k]
        return out.astype({"n": np.int64, "rnk": np.int64})

    return bucketed_group_apply(counts, ["lang"], rank_bucket)


CHUNK_SIZE = 8
CHUNK_STRIDE = 4


def chunk_with_overlap(sf_dir: str, *, size: int = CHUNK_SIZE,
                       stride: int = CHUNK_STRIDE):
    """Overlapping context windows over each document's token stream —
    the sliding-window chunking an LM-pretraining loader applies before
    packing (size-8 windows, stride 4): one row per (doc, chunk) with
    the window's text and token count. Map-only — chunks explode
    row-locally, no shuffle; output rows ≈ corpus tokens / stride."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    from ..functions.tokens import sql_tokens

    def explode(t: pa.Table) -> pa.Table:
        dids, idxs, texts, ns = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = sql_tokens(text)
            start, ci = 0, 0
            while start < len(toks):
                win = toks[start : start + size]
                dids.append(did)
                idxs.append(ci)
                texts.append(" ".join(win))
                ns.append(len(win))
                start += stride
                ci += 1
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
                "n_tokens": pa.array(ns, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def events_value_1h_range_sum(sf_dir: str):
    """Per-user RANGE-framed time window: for every event, the sum of
    ``value`` over that user's events in the trailing ONE HOUR —
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``
    semantics, which (unlike the ROWS frames of the rolling_mean/median
    ops) is keyed on the timestamp and includes the current row's
    equal-timestamp PEERS. One bucketed shuffle on user_id; inside a
    bucket each user's sorted series resolves both frame edges with two
    vectorized searchsorteds over a prefix-sum (left edge ts-1h
    side=left, right edge ts side=right for the peer rule)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])
    HOUR_US = np.int64(3_600_000_000)

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_sum = [], []
        for _, sub in g.groupby("user_id", sort=False):
            sub = sub.sort_values(["ts", "event_id"], kind="mergesort")
            ts = sub["ts"].to_numpy("datetime64[us]").astype(np.int64)
            # prefix differences re-associate the float sum vs DuckDB's
            # frame-local aggregation; carry the prefix in extended
            # precision (longdouble) so the difference approximates the
            # TRUE frame sum to ~1e-19 relative and the 6dp rounding
            # grid is engine-independent (oracle-gate float discipline)
            v = sub["value"].to_numpy(np.float64).astype(np.longdouble)
            prefix = np.concatenate(
                [np.zeros(1, np.longdouble), np.cumsum(v)]
            )
            lo = np.searchsorted(ts, ts - HOUR_US, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # include peers
            out_id.append(sub["event_id"].to_numpy(np.int64))
            out_sum.append(
                np.round((prefix[hi] - prefix[lo]).astype(np.float64), 6)
            )
        if not out_id:
            return pd.DataFrame(
                {"event_id": np.array([], np.int64),
                 "sum_1h": np.array([], np.float64)}
            )
        return pd.DataFrame(
            {"event_id": np.concatenate(out_id),
             "sum_1h": np.concatenate(out_sum)}
        )

    return bucketed_group_apply(ds, ["user_id"], window_bucket)


def lang_unigram_kl(sf_dir: str):
    """KL divergence between every ordered pair of language unigram
    distributions, restricted to the pair's SHARED vocabulary and
    renormalized over it (the corpus-mixing diagnostic: how far apart
    the language token distributions are; symmetric-large values mean
    clean separation, near-zero means near-duplicate sources).

    Shape: per-batch (lang, token) partial counts → one bucketed sum
    (vocabulary-sized exchange); a token-bucketed pass emits per-token
    pair rows for every lang pair sharing that token; the |langs|²
    pair totals reduce natively and broadcast back in the closure for
    the contribution pass — the corpus is scanned once and nothing
    larger than vocab × |lang pairs| crosses an exchange."""
    from ..functions.groups import bucketed_group_apply
    from ..functions.tokens import sql_tokens

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs, toks, ns = [], [], []
        for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in sql_tokens(text):
                counts[w] = counts.get(w, 0) + 1
            langs.extend([lang] * len(counts))
            toks.extend(counts)
            ns.extend(counts.values())
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "n_part": pa.array(ns, pa.int64()),
            }
        )

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["lang", "token"], as_index=False, sort=False)[
            "n_part"
        ].sum().rename(columns={"n_part": "n"})

    counts = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "token"], sum_bucket,
    )

    def pair_rows(g: pd.DataFrame) -> pd.DataFrame:
        out = g.merge(g, on="token", suffixes=("_a", "_b"))
        out = out[out["lang_a"] != out["lang_b"]]
        return out[["lang_a", "lang_b", "token", "n_a", "n_b"]]

    pair_tbl = bucketed_group_apply(counts, ["token"], pair_rows)
    pairs = pair_tbl.materialize()  # vocab × |lang pairs| rows, reused

    # |langs|² intersection totals — native groupby is fine here
    from ray.data.aggregate import Sum

    tot = pairs.groupby(["lang_a", "lang_b"]).aggregate(
        Sum("n_a", alias_name="sa"), Sum("n_b", alias_name="sb")
    ).to_pandas()
    totals = {
        (r.lang_a, r.lang_b): (float(r.sa), float(r.sb))
        for r in tot.itertuples()
    }

    def contrib(t: pa.Table) -> pa.Table:
        la = t["lang_a"].to_pylist()
        lb = t["lang_b"].to_pylist()
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = np.array([totals[(a, b)][0] for a, b in zip(la, lb)])
        sb = np.array([totals[(a, b)][1] for a, b in zip(la, lb)])
        p = na / sa
        q = nb / sb
        return pa.table(
            {
                "lang_a": t["lang_a"],
                "lang_b": t["lang_b"],
                "c": pa.array(p * np.log(p / q), pa.float64()),
            }
        )

    final = _final_groupby(
        pairs.map_batches(contrib, batch_format="pyarrow"),
        ["lang_a", "lang_b"], ["c"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_a": t["lang_a"],
                "lang_b": t["lang_b"],
                "kl": pa.array(
                    np.round(t["c"].to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# table_profile — one-pass data-quality profile (the ingest sweep)
# ---------------------------------------------------------------------------

#: (column, kind) spec shared with the SQL oracle generator — "int"
#: columns profile value min/max/mean (the Ray partial keeps exact
#: int64 sums, so kind MUST be integer-typed; a float column needs a
#: new "float" kind with rounded sums), "str" columns profile their
#: character lengths
PROFILE_SPEC: tuple[tuple[str, str], ...] = (
    ("doc_id", "int"),
    ("text", "str"),
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "int"),
)


def table_profile(sf_dir: str):
    """(col_name, metric, value) data-quality profile of the documents
    table in ONE streaming pass: per column, null_count + min + max +
    mean — over the values for numeric columns, over the character
    lengths for string columns (the ingest-time sweep a pipeline runs
    before committing a new source). Per-batch partials carry exact
    int64 sums (columns × batches rows — bounded driver merge, the
    sketch-op contract), so the means divide identical integers on the
    Ray and SQL sides before the shared 6dp rounding."""
    cols = [c for c, _ in PROFILE_SPEC]
    ds = _read(sf_dir, "documents", columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        names, nulls, mins, maxs, sums, counts = [], [], [], [], [], []
        for col, kind in PROFILE_SPEC:
            arr = t[col].combine_chunks() if isinstance(
                t[col], pa.ChunkedArray) else t[col]
            n_null = arr.null_count
            vals = arr.drop_null()
            if kind == "str":
                vals = pc.utf8_length(vals)
            elif not pa.types.is_integer(vals.type):
                raise TypeError(
                    f"PROFILE_SPEC kind 'int' on non-integer column "
                    f"{col} ({vals.type}) — exact-sum profiling only "
                    "holds for integer columns"
                )
            v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
            names.append(col)
            nulls.append(n_null)
            mins.append(int(v.min()) if len(v) else np.iinfo(np.int64).max)
            maxs.append(int(v.max()) if len(v) else np.iinfo(np.int64).min)
            sums.append(int(v.sum()))
            counts.append(len(v))
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "nulls": pa.array(nulls, pa.int64()),
                "mn": pa.array(mins, pa.int64()),
                "mx": pa.array(maxs, pa.int64()),
                "s": pa.array(sums, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # columns × batches rows — bounded
    g = parts.groupby("col_name", sort=True).agg(
        nulls=("nulls", "sum"), mn=("mn", "min"), mx=("mx", "max"),
        s=("s", "sum"), n=("n", "sum"),
    )
    names, metrics, values = [], [], []
    for col, _ in sorted(PROFILE_SPEC):
        row = g.loc[col]
        empty = row["n"] == 0  # all-null column: SQL min/max/mean are
        # NULL (NaN after .df()) — mirror that instead of the int64
        # merge-identity sentinels
        for metric, val in (
            ("null_count", float(row["nulls"])),
            ("min", np.nan if empty else float(row["mn"])),
            ("max", np.nan if empty else float(row["mx"])),
            ("mean", np.nan if empty
             else float(np.round(row["s"] / row["n"], 6))),
        ):
            names.append(col)
            metrics.append(metric)
            values.append(val)
    return pa.table(
        {
            "col_name": pa.array(names, pa.string()),
            "metric": pa.array(metrics, pa.string()),
            "value": pa.array(values, pa.float64()),
        }
    )


def large_quantity_orders(sf_dir: str):
    """TPC-H Q18 shape (top large-quantity orders): orders whose total
    lineitem quantity exceeds the threshold, enriched with the
    customer, top 100 by (o_totalprice DESC, o_orderkey). Plan: the
    lineitem corpus pre-aggregates per-batch (orderkey, qty) partials →
    ONE domain-sized groupby → HAVING filter → size-routed ``dim_join``
    to orders and customer (broadcast while the qualifying set and the
    dimension fit the gate, bucketed hash join beyond it) → per-batch
    local top-100 partials merged on the driver (top-k is a mergeable
    summary — no global sort exchange). Exactly one all-to-all at these
    sizes; the joins and the ranking shuffle nothing."""
    from ray.data.aggregate import Sum

    from ..functions.joins import dim_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=qty, minlength=len(uniq))
        return pa.table(
            {
                "o_orderkey": pa.array(uniq.astype(np.int64), pa.int64()),
                "q_part": pa.array(sums, pa.float64()),
            }
        )

    totals = (
        li.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("q_part", alias_name="total_qty"))
        .filter(expr="total_qty > 150")
    )
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice",
                            "o_orderdate"])
    joined = dim_join(orders, totals, on="o_orderkey")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    # NAME-based key rename (rename_columns is positional — the
    # neardup_kcore lesson): o_custkey becomes the customer join key
    joined = joined.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_custkey": t["o_custkey"],
                "o_totalprice": t["o_totalprice"],
                "o_orderdate": t["o_orderdate"],
                "total_qty": t["total_qty"],
            }
        ),
        batch_format="pyarrow",
    )
    full = dim_join(joined, cust, on="c_custkey")

    def topk_partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "c_name": t["c_name"],
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderdate": pc.cast(
                    pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                    pa.string(),
                ),
                "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
                "total_qty": pa.array(
                    np.round(
                        t["total_qty"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
            }
        )
        idx = pc.sort_indices(
            out,
            sort_keys=[("o_totalprice", "descending"),
                       ("o_orderkey", "ascending")],
        )
        return out.take(idx[:100])

    parts = full.map_batches(
        topk_partial, batch_format="pyarrow"
    ).to_pandas()  # 100 × batches rows — bounded driver merge
    cols = ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty"]
    if list(parts.columns) != cols:  # zero qualifying orders → the
        # empty driver merge is column-less in this Ray version
        parts = pd.DataFrame({
            "c_name": pd.Series([], dtype=str),
            "c_custkey": pd.Series([], dtype=np.int64),
            "o_orderkey": pd.Series([], dtype=np.int64),
            "o_orderdate": pd.Series([], dtype=str),
            "o_totalprice": pd.Series([], dtype=np.float64),
            "total_qty": pd.Series([], dtype=np.float64),
        })
    parts = parts.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True],
        kind="mergesort",
    ).head(100).reset_index(drop=True)
    return pa.Table.from_pandas(parts, preserve_index=False)


def events_in_windows_distributed(sf_dir: str):
    """The SHUFFLE tier of the interval join: identical output to
    ``events_in_windows`` (same oracle) but built for an interval side
    too large to broadcast. Time-bucket co-partitioning: every window
    replicates to each fixed-width time bucket it overlaps (bounded by
    ceil(window_len / bucket) + 1 rows per window); every event lands
    in exactly ONE bucket, so each matching (event, window) pair meets
    exactly once — no post-join dedup. One bucketed exchange keyed on
    the time bucket, vectorized band checks inside the bucket task,
    per-window partials out, domain-sized final groupby."""
    from ..functions.groups import bucketed_group_apply

    bucket_us = 24 * 3600 * 1_000_000  # 1-day co-partition grid

    win_rows = []
    for wid, ws, we in RANGE_WINDOWS:
        ws_us = int(ws.astype("int64"))
        we_us = int(we.astype("int64"))
        for b in range(ws_us // bucket_us, (we_us - 1) // bucket_us + 1):
            win_rows.append((b, wid, ws_us, we_us))
    import ray.data as rd

    windows = rd.from_arrow(pa.table(
        {
            "bucket": pa.array([r[0] for r in win_rows], pa.int64()),
            "side": pa.array(["w"] * len(win_rows), pa.string()),
            "wid": pa.array([r[1] for r in win_rows], pa.int64()),
            "t0": pa.array([r[2] for r in win_rows], pa.int64()),
            "t1": pa.array([r[3] for r in win_rows], pa.int64()),
            "value": pa.array([0.0] * len(win_rows), pa.float64()),
        }
    ))

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def tag_events(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ts // bucket_us, pa.int64()),
                "side": pa.array(["e"] * len(ts), pa.string()),
                "wid": pa.array(np.full(len(ts), -1), pa.int64()),
                "t0": pa.array(ts, pa.int64()),
                "t1": pa.array(np.zeros(len(ts), np.int64), pa.int64()),
                "value": t["value"],
            }
        )

    tagged = ds.map_batches(tag_events, batch_format="pyarrow").union(
        windows
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("bucket", sort=False):
            w = grp[grp["side"] == "w"]
            e = grp[grp["side"] == "e"]
            if not len(w) or not len(e):
                continue
            ts = e["t0"].to_numpy()
            val = e["value"].to_numpy()
            for wid, t0, t1 in zip(w["wid"].to_numpy(),
                                   w["t0"].to_numpy(),
                                   w["t1"].to_numpy()):
                m = (ts >= t0) & (ts < t1)
                if m.any():
                    rows.append((wid, int(m.sum()), float(val[m].sum())))
        out = pd.DataFrame(
            rows, columns=["window_id", "n_events", "sum_value"]
        )
        return out.astype(
            {"window_id": np.int64, "n_events": np.int64,
             "sum_value": np.float64}
        )

    partials = bucketed_group_apply(tagged, ["bucket"], join_bucket)
    final = _final_groupby(partials, ["window_id"],
                           ["n_events", "sum_value"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_id": pc.cast(t["window_id"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pa.array(
                    np.round(t["sum_value"].to_numpy(), 2), pa.float64()
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def events_debounce(sf_dir: str, *, gap_s: int = 300):
    """Stream debounce: keep an event iff the PREVIOUS event of the
    same (user_id, event_type) — in (ts, event_id) order — is more than
    ``gap_s`` seconds older (or absent). The web-log / telemetry dedup
    that collapses rapid-fire repeats while keeping the cadence. One
    bucketed exchange on the (user, type) key pair; inside each bucket
    the gap test is a vectorized diff over the sorted group (all of a
    key's rows meet in one task — the as-of-join discipline). Oracled
    against the LAG window."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    gap_us = gap_s * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "user_id": t["user_id"],
                "event_type": t["event_type"],
            }
        )

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                          kind="mergesort")
        ts = g["ts_us"].to_numpy()
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        prev_same = np.zeros(len(g), bool)
        prev_same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(len(g), np.int64)
        gap[0] = np.iinfo(np.int64).max
        gap[1:] = ts[1:] - ts[:-1]
        keep = ~prev_same | (gap > gap_us)
        out = g.loc[keep, ["event_id", "user_id", "event_type"]].copy()
        out["ts"] = pd.to_datetime(
            g.loc[keep, "ts_us"], unit="us"
        ).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return bucketed_group_apply(tagged, ["user_id", "event_type"],
                                debounce)


def brand_price_size_slope(sf_dir: str):
    """(p_brand, slope) — per-group least-squares slope of retail price
    over size, computed from MERGEABLE sufficient statistics (n, Σx,
    Σy, Σxy, Σxx): per-batch partials → one domain-sized groupby →
    row-local closed form. The grouped-regression shape: no group ever
    gathers its rows anywhere. The float-bearing sums (Σy, Σxy) round
    to 6 on BOTH sides before the division (the neardup_pagerank
    discipline — the oracle builds the slope from the same explicit
    sums, NOT DuckDB's internal regr_slope accumulator); the x-only
    sums are integer-exact."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_size", "p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["p_size"].to_numpy(np.float64)
        y = b["p_retailprice"].to_numpy(np.float64)
        g = pd.DataFrame(
            {
                "p_brand": b["p_brand"].to_numpy(),
                "n": np.ones(len(b), np.float64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        ).groupby("p_brand", as_index=False, sort=False).sum()
        return g

    totals = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["p_brand"], ["n", "sx", "sy", "sxy", "sxx"],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = np.round(t["sy"].to_numpy(zero_copy_only=False), 6)
        sxy = np.round(t["sxy"].to_numpy(zero_copy_only=False), 6)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        denom = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(
                denom != 0.0, (n * sxy - sx * sy) / denom, np.nan
            )
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "slope": pa.array(np.round(slope, 6), pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")


def event_type_user_overlap(sf_dir: str):
    """(type_a, type_b, n_a, n_b, n_both, n_union, jaccard) — exact
    audience-overlap matrix between event types: for every unordered
    type pair, how many users did each, both, either, and the Jaccard
    of the two user sets. The cohort-overlap question growth analytics
    asks ("do purchasers also error?"), answered EXACTLY — no sketch.

    Shape: the type domain is censused once (|types| rows, gated
    driver state); ONE user-keyed exchange folds each user's types
    into a machine-word BITMASK (vectorized bit matrix + per-user max,
    no Python per-group lambda); the mask census is ≤ 2^|types|
    integer rows and every pairwise overlap is read off that census
    driver-side — no |types|² corpus passes, no pairwise self-joins.
    All counts integer; the one Jaccard division happens per pair at
    the end."""
    from ..functions.groups import bucketed_group_apply, final_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    types = sorted(
        r["event_type"]
        for r in ds.groupby("event_type").count().take_all()
    )
    idx = {t: i for i, t in enumerate(types)}
    T = len(types)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(),
                "bit": np.array(
                    [np.int64(1) << idx[e]
                     for e in t["event_type"].to_pylist()],
                    np.int64,
                ),
            }
        ).drop_duplicates()
        # sum of DISTINCT powers == bitwise OR within the batch
        out = df.groupby("user_id", as_index=False)["bit"].sum()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64),
                                    pa.int64()),
                "mask": pa.array(out["bit"].to_numpy(np.int64),
                                 pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def bucket(df: pd.DataFrame) -> pa.Table:
        masks = df["mask"].to_numpy(np.int64)
        bits = (masks[:, None] >> np.arange(T)[None, :]) & 1
        g = pd.DataFrame(bits, columns=list(range(T)))
        g["user_id"] = df["user_id"].to_numpy(np.int64)
        agg = g.groupby("user_id").max().to_numpy(np.int64)
        mask = (agg * (np.int64(1) << np.arange(T))).sum(axis=1)
        vals, cnts = np.unique(mask, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(vals.astype(np.int64), pa.int64()),
                "n_users": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    census = final_groupby_sum(
        bucketed_group_apply(parts, ["user_id"], bucket),
        ["mask"], ["n_users"],
    ).take_all()  # ≤ 2^|types| rows: census-sized, gated
    counts = {int(r["mask"]): int(r["n_users"]) for r in census}

    ta, tb, na, nb, nboth, nuni, jac = [], [], [], [], [], [], []
    for a in range(T):
        for b in range(a + 1, T):
            n_a = sum(c for m, c in counts.items() if (m >> a) & 1)
            n_b = sum(c for m, c in counts.items() if (m >> b) & 1)
            n_both = sum(
                c for m, c in counts.items()
                if (m >> a) & 1 and (m >> b) & 1
            )
            n_union = n_a + n_b - n_both
            ta.append(types[a])
            tb.append(types[b])
            na.append(n_a)
            nb.append(n_b)
            nboth.append(n_both)
            nuni.append(n_union)
            jac.append(float(np.round(n_both / n_union, 6)))
    return pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "n_both": pa.array(nboth, pa.int64()),
            "n_union": pa.array(nuni, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


#: "new shard" membership rule for the incremental-ingest simulation
INGEST_NEW_MOD, INGEST_NEW_RESIDUE = 10, 9


def incremental_dedup_ingest(sf_dir: str):
    """(doc_id, verdict) for every doc in the NEW shard (deterministic
    membership: ``doc_id % 10 == 9``): ``dup_old`` if its content
    fingerprint already exists in the standing corpus, ``dup_new`` if
    it's a non-canonical copy within the arriving shard itself, else
    ``ingest``. This is the incremental-ingestion dedup every
    continuously-fed corpus runs on each arriving shard — dedup against
    what's stored AND within the delivery, in one pass.

    Shape: ONE exchange bucketed on the content hash over (fingerprint,
    doc_id, is_new) — the old side contributes only its fingerprint
    column (on a production cluster that read is the stored
    fingerprint index, not a re-hash of old text); each bucket resolves
    verdicts vectorized (per-group any-old + first-new via transforms)
    and emits only new-shard rows."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest()
               for s in t["text"].to_pylist()]
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "fingerprint": pa.array(fps, pa.string()),
                "doc_id": t["doc_id"],
                "is_new": pa.array(
                    (ids % INGEST_NEW_MOD == INGEST_NEW_RESIDUE)
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def bucket(g: pd.DataFrame) -> pa.Table:
        grp = g.groupby("fingerprint")
        has_old = grp["is_new"].transform("min").to_numpy() == 0
        # min doc_id among NEW copies per group (old rows masked out)
        masked = g["doc_id"].where(g["is_new"] == 1, np.iinfo(np.int64).max)
        first_new = (
            masked.groupby(g["fingerprint"].to_numpy())
            .transform("min").to_numpy()
        )
        is_new = g["is_new"].to_numpy() == 1
        ids = g["doc_id"].to_numpy()
        verdict = np.where(
            has_old, "dup_old",
            np.where(ids == first_new, "ingest", "dup_new"),
        )
        keep = is_new
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
                "verdict": pa.array(
                    verdict[keep].astype(object), pa.string()
                ),
            }
        )

    return bucketed_group_apply(
        ds.map_batches(fp, batch_format="pyarrow"),
        ["fingerprint"], bucket,
    )


#: shard count for the partition-key skew audit
SKEW_SHARDS = 32


def shard_skew_report(sf_dir: str):
    """(part_key, n_rows, shards_used, max_shard_rows, skew) — the
    partition-design audit run before committing to a shuffle key: for
    each candidate key (doc_id, lang, source), hash rows into
    ``SKEW_SHARDS`` shards and report how unbalanced the result is
    (``skew`` = max shard / ideal shard; 1.0 = perfectly balanced,
    ≥ shards = one hot shard owns everything). Low-cardinality keys
    like ``lang`` show exactly the hot-shard failure this engine's
    salting/bucketing guidance exists for.

    Shape: one scan emits per-batch (key, shard, n) count partials for
    ALL candidate keys at once (no per-key passes); the groupby moves
    ≤ |keys|·SKEW_SHARDS rows per batch and the merged census is
    sketch-sized driver state."""
    from ..functions.groups import final_groupby_sum
    from ..functions.tokens import md5_prefix32

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for key in ("doc_id", "lang", "source"):
            vals = t[key].to_pylist()
            shards = np.array(
                [md5_prefix32(str(v)) % SKEW_SHARDS for v in vals],
                np.int64,
            )
            df = (
                pd.DataFrame({"shard": shards})
                .groupby("shard", as_index=False).size()
                .rename(columns={"size": "n"})
            )
            df.insert(0, "part_key", key)
            frames.append(df)
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    census = final_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["part_key", "shard"], ["n"],
    ).take_all()  # ≤ 3·SKEW_SHARDS rows

    agg: dict[str, list[int]] = {}
    for r in census:
        agg.setdefault(r["part_key"], []).append(int(r["n"]))
    keys = sorted(agg)
    n_rows = [sum(agg[k]) for k in keys]
    used = [len(agg[k]) for k in keys]
    mx = [max(agg[k]) for k in keys]
    skew = [
        float(np.round(m * SKEW_SHARDS / t, 6))
        for m, t in zip(mx, n_rows)
    ]
    return pa.table(
        {
            "part_key": pa.array(keys, pa.string()),
            "n_rows": pa.array(n_rows, pa.int64()),
            "shards_used": pa.array(used, pa.int64()),
            "max_shard_rows": pa.array(mx, pa.int64()),
            "skew": pa.array(skew, pa.float64()),
        }
    )


def theil_sen_slope(sf_dir: str):
    """(p_brand, n_parts, n_pairs, theil_slope) — per-brand Theil-Sen
    estimator (median of all pairwise slopes of retail price over
    size): the robust companion to ``brand_price_size_slope``'s OLS —
    outlier-priced parts move the mean slope but not the median slope.
    Pairs are keyed ``p_partkey_a < p_partkey_b`` with equal-size pairs
    excluded (undefined slope); the slope value is swap-symmetric, so
    the pair orientation can't change the multiset.

    Shape: ONE exchange bucketed on the brand; each bucket forms its
    groups' pairwise slopes vectorized (triangular indices, no Python
    pair loop). The per-group pair count is quadratic in group size —
    fine at the brand cardinalities here; at corpus scale the knob is
    md5-ordered pair sampling (the ``minhash_jaccard_calibration``
    device), documented rather than wired because the estimator is
    exact below the gate. Median parity note: both engines interpolate
    the even-count median of the IDENTICAL double multiset; any
    last-ulp interpolation difference is absorbed by the shared 6dp
    grid (the lm_perplexity tolerance argument)."""
    from ..functions.groups import bucketed_group_apply

    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_partkey", "p_size", "p_retailprice"])

    def bucket(g: pd.DataFrame) -> pa.Table:
        brands, n_parts, n_pairs, med = [], [], [], []
        for brand, grp in g.groupby("p_brand"):
            grp = grp.sort_values("p_partkey")
            x = grp["p_size"].to_numpy(np.float64)
            y = grp["p_retailprice"].to_numpy(np.float64)
            i, j = np.triu_indices(len(grp), 1)
            dx = x[j] - x[i]
            keep = dx != 0
            slopes = (y[j] - y[i])[keep] / dx[keep]
            brands.append(brand)
            n_parts.append(len(grp))
            n_pairs.append(int(keep.sum()))
            med.append(
                float(np.round(np.median(slopes), 6))
                if len(slopes) else None
            )
        return pa.table(
            {
                "p_brand": pa.array(brands, pa.string()),
                "n_parts": pa.array(n_parts, pa.int64()),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "theil_slope": pa.array(med, pa.float64()),
            }
        )

    return bucketed_group_apply(ds, ["p_brand"], bucket)


def daily_volume_cusum(sf_dir: str):
    """(day, n_events, cum_events, cusum_stat, norm_stat) — CUSUM-style
    change-point statistic over the daily event volume: per day,
    ``|D·C_d − rank_d·N|`` (the integer-cleared deviation of the
    cumulative count from a perfectly uniform timeline; the day with
    the max statistic is the most likely volume change point, the same
    ECDF-numerator device as ``source_drift_ks`` applied to the time
    axis). A flat stream scores ~0 everywhere; a step change peaks at
    the step.

    Shape: one streaming daily census (count partials → a
    calendar-bounded groupby); the cumulative pass runs driver-side
    over the ≤ |days| census (gated, output-sized). Integer arithmetic
    end-to-end; the one normalization divides at the end."""
    import ray.data as rd

    from ..functions.groups import final_groupby_sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        days = pc.strftime(t["ts"], format="%Y-%m-%d")
        vc = pc.value_counts(days)
        return pa.table(
            {"day": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    census = sorted(
        final_groupby_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["day"], ["n"],
        ).take_all(),  # ≤ |days| rows: calendar-bounded
        key=lambda r: r["day"],
    )
    dd = len(census)
    nn = sum(int(r["n"]) for r in census)
    days, ns, cums, stats, norms = [], [], [], [], []
    cum = 0
    for rk, r in enumerate(census, start=1):
        cum += int(r["n"])
        stat = abs(dd * cum - rk * nn)
        days.append(r["day"])
        ns.append(int(r["n"]))
        cums.append(cum)
        stats.append(stat)
        norms.append(float(np.round(stat / (dd * nn), 6)))
    return pa.table(
        {
            "day": pa.array(days, pa.string()),
            "n_events": pa.array(ns, pa.int64()),
            "cum_events": pa.array(cums, pa.int64()),
            "cusum_stat": pa.array(stats, pa.int64()),
            "norm_stat": pa.array(norms, pa.float64()),
        }
    )

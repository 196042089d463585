"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its DuckDB oracle —
row count + schema (names) + order-insensitive value equality."""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"


def _entry_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_under_test", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def entry_mod():
    return _entry_module()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    return out


ORACLED = sorted(_entry_module().oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, entry_mod, duck):
    q = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_df(q[name](SF_DIR)))
    want = _canon(duck.sql(sql).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert got.shape == want.shape, f"{name}: shape {got.shape} != {want.shape}"
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


def test_rows_only_queries_run(entry_mod):
    q = entry_mod.queries()
    oracled = set(entry_mod.oracle_sql())
    for name in set(q) - oracled:
        df = _to_df(q[name](SF_DIR))
        assert len(df) > 0, name


def test_dim_join_size_routing(ray_session):
    """dim_join must produce identical results via broadcast and via the
    bucketed hash join (forced by broadcast_limit=0)."""
    import ray.data as rd

    from docling_eval_ray.functions.joins import dim_join

    left = rd.from_items([{"k": i % 5, "v": i} for i in range(50)])
    right = rd.from_items([{"k": i, "name": f"n{i}"} for i in range(5)])
    a = dim_join(left, right, on="k").to_pandas()
    b = dim_join(left, right, on="k", broadcast_limit=0).to_pandas()
    key = ["k", "v", "name"]
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b) and len(a) == 50


def test_hash_join_composite_key(ray_session):
    """Multi-column hash_join: rows join on BOTH key columns; overlap
    validation excludes all keys."""
    import ray.data as rd

    from docling_eval_ray.functions.joins import hash_join

    left = rd.from_items(
        [{"a": i % 3, "b": i % 2, "lv": i} for i in range(24)]
    )
    right = rd.from_items(
        [{"a": a, "b": b, "name": f"{a}-{b}"}
         for a in range(3) for b in range(2)]
    )
    got = hash_join(left, right, on=["a", "b"], num_buckets=4).to_pandas()
    assert len(got) == 24
    assert (got["name"] == got["a"].astype(str) + "-"
            + got["b"].astype(str)).all()


def test_joins_with_empty_sides(ray_session):
    """TYPED empty sides (0-row blocks) join to empty results with the
    full schema; a schema-less empty side raises a clear error instead
    of crashing deep inside the merge."""
    import ray.data as rd

    from docling_eval_ray.functions.joins import dim_join, hash_join

    left = rd.from_items([{"k": i % 3, "v": i} for i in range(10)])
    typed_empty = rd.from_items([{"k": 1, "name": "x"}]).map_batches(
        lambda t: t.slice(0, 0), batch_format="pyarrow"
    )
    assert len(hash_join(left, typed_empty, on="k").to_pandas()) == 0
    out = dim_join(left, typed_empty, on="k").to_pandas()
    assert len(out) == 0
    # Ray's to_pandas over all-empty blocks may drop columns; when it
    # keeps them the joined schema must be intact
    assert not len(out.columns) or set(out.columns) >= {"k", "v", "name"}

    # row-filtered empties lose their schema in Ray; the join must say so
    schemaless = rd.from_items([{"k": 1, "name": "x"}]).filter(
        lambda r: False
    )
    with pytest.raises(ValueError, match="no derivable schema"):
        hash_join(left, schemaless, on="k")
    with pytest.raises(ValueError, match="no derivable schema"):
        dim_join(left, schemaless, on="k")


def test_prf_tokenizer_parity_with_duckdb():
    """The markdown_token_prf tokenizer must behave identically in
    Python re and DuckDB RE2 for ANY input — explicit ASCII classes,
    never \\w (Unicode-aware in Python, ASCII in RE2)."""
    import re

    import duckdb

    pat = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]")
    con = duckdb.connect()
    for text in ["caf\u00e9 na\u00efve", "\u4e2d\u6587 test",
                 "a\u00a0b", "plain ascii, punct!"]:
        sql = con.sql(
            "SELECT regexp_extract_all(?, "
            "'[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\r\\f\\v]')",
            params=[text],
        ).fetchone()[0]
        assert pat.findall(text) == sql, text


def test_semi_anti_join_semantics(ray_session):
    import ray.data as rd

    from docling_eval_ray.functions.joins import semi_anti_join

    left = rd.from_items([{"k": i, "v": i * 10} for i in range(10)])
    right = rd.from_items([{"k": i} for i in (1, 2, 3, 3)])  # dup keys ok
    anti = semi_anti_join(left, right, on="k", anti=True).to_pandas()
    semi = semi_anti_join(left, right, on="k", anti=False).to_pandas()
    assert sorted(anti["k"]) == [0, 4, 5, 6, 7, 8, 9]
    assert sorted(semi["k"]) == [1, 2, 3]
    assert list(anti.columns) == ["k", "v"]  # left schema only


def test_quantiles_approx_path_close_to_exact(ray_session):
    """Forcing the scale path (exact_max=0) must approximate the exact
    quantiles within one bin width."""
    from docling_eval_ray.pipelines.relational import n_chars_quantiles

    exact = n_chars_quantiles(SF_DIR).to_pandas().set_index("q")["value"]
    approx = n_chars_quantiles(SF_DIR, exact_max=0).to_pandas().set_index(
        "q")["value"]
    for q in exact.index:
        assert abs(int(exact[q]) - int(approx[q])) <= max(
            2, exact[q] * 0.01
        ), q


def test_semi_anti_join_null_keys(ray_session):
    """SEMI/ANTI JOIN null convention: a NULL key matches nothing —
    semi drops it, anti keeps it; right-side nulls never empty the
    result (unlike NOT IN)."""
    import pyarrow as pa
    import ray.data as rd

    from docling_eval_ray.functions.joins import semi_anti_join

    left = rd.from_arrow(pa.table(
        {"k": pa.array([1, 2, None, 4], pa.int64()),
         "v": pa.array([10, 20, 30, 40], pa.int64())}
    ))
    right = rd.from_arrow(pa.table(
        {"k": pa.array([2, None], pa.int64())}
    ))
    anti = semi_anti_join(left, right, on="k", anti=True).to_pandas()
    semi = semi_anti_join(left, right, on="k", anti=False).to_pandas()
    assert sorted(anti["v"]) == [10, 30, 40]  # null-key row kept by anti
    assert sorted(semi["v"]) == [20]          # only the real match


def test_blacklist_filter_tiers_agree(ray_session):
    """Broadcast value-set tier and anti-join tier must produce the
    same surviving rows."""
    import ray.data as rd

    from docling_eval_ray.pipelines.relational import blacklist_filter

    ds = rd.from_items([{"doc_id": i, "x": i * 2} for i in range(50)])
    bl_ds = rd.from_items([{"doc_id": i} for i in (3, 7, 11)])
    a = blacklist_filter(ds, (3, 7, 11)).to_pandas()
    b = blacklist_filter(ds, bl_ds).to_pandas()               # broadcast
    c = blacklist_filter(ds, bl_ds, broadcast_max=0).to_pandas()  # anti
    key = ["doc_id", "x"]
    a, b, c = (x[key].sort_values(key).reset_index(drop=True)
               for x in (a, b, c))
    assert a.equals(b) and b.equals(c) and len(a) == 47


def test_event_type_user_overlap_planted(ray_session, tmp_path):
    """Partial-overlap fixture: counts and Jaccard are the exact set
    overlaps, pairs are alphabetical, a type nobody shares shows 0."""
    import numpy as np

    from docling_eval_ray.pipelines.relational import (
        event_type_user_overlap,
    )

    # users 1,2 click; 2,3 view; 4 alone errors (also clicks)
    rows = [
        (1, "click"), (2, "click"), (2, "view"), (3, "view"),
        (4, "error"), (4, "click"), (2, "click"),  # dup event: same user
    ]
    pd.DataFrame(
        {
            "event_id": pd.array(range(len(rows)), dtype="int64"),
            "ts": pd.to_datetime("2026-01-01"),
            "user_id": pd.array([r[0] for r in rows], dtype="int64"),
            "event_type": [r[1] for r in rows],
            "value": 0.0,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")

    got = {
        (r["type_a"], r["type_b"]): r
        for r in event_type_user_overlap(str(tmp_path)).to_pylist()
    }
    assert set(got) == {("click", "error"), ("click", "view"),
                        ("error", "view")}
    ce = got[("click", "error")]
    assert (ce["n_a"], ce["n_b"], ce["n_both"], ce["n_union"]) == (3, 1, 1, 3)
    assert ce["jaccard"] == float(np.round(1 / 3, 6))
    cv = got[("click", "view")]
    assert (cv["n_a"], cv["n_b"], cv["n_both"], cv["n_union"]) == (3, 2, 1, 4)
    assert cv["jaccard"] == 0.25
    ev = got[("error", "view")]
    assert (ev["n_both"], ev["jaccard"]) == (0, 0.0)


def test_shard_skew_report_semantics(ray_session):
    """All keys census the same row count; skew = max·S/total exactly;
    the low-cardinality lang key is visibly hotter than doc_id."""
    import numpy as np

    from docling_eval_ray.pipelines.relational import (
        SKEW_SHARDS,
        shard_skew_report,
    )

    df = shard_skew_report(SF_DIR).to_pandas().set_index("part_key")
    n = df["n_rows"].iloc[0]
    assert (df["n_rows"] == n).all()
    assert (df["shards_used"] <= SKEW_SHARDS).all()
    for _, r in df.iterrows():
        assert r["skew"] == float(
            np.round(r["max_shard_rows"] * SKEW_SHARDS / n, 6)
        )
    assert df.loc["lang", "skew"] > df.loc["doc_id", "skew"]
    assert df.loc["lang", "shards_used"] < df.loc["doc_id", "shards_used"]


def test_theil_sen_robustness_planted(ray_session, tmp_path):
    """The median slope ignores a wild outlier that would wreck OLS;
    equal-size pairs are excluded from the pair count."""
    import numpy as np

    from docling_eval_ray.pipelines.relational import theil_sen_slope

    # brand A: perfect y = 10x line + one absurd outlier point
    rows = [
        (1, "A", 1, 10.0), (2, "A", 2, 20.0), (3, "A", 3, 30.0),
        (4, "A", 4, 40.0), (5, "A", 4, 9999.0),  # outlier shares size 4
        (6, "B", 1, 5.0), (7, "B", 2, 5.0),      # flat brand
    ]
    pd.DataFrame(
        {
            "p_partkey": pd.array([r[0] for r in rows], dtype="int64"),
            "p_brand": [r[1] for r in rows],
            "p_size": pd.array([r[2] for r in rows], dtype="int64"),
            "p_retailprice": [r[3] for r in rows],
        }
    ).to_parquet(tmp_path / "part.parquet")

    got = {r["p_brand"]: r
           for r in theil_sen_slope(str(tmp_path)).take_all()}
    a = got["A"]
    # 10 pairs total, one equal-size pair dropped -> 9
    assert (a["n_parts"], a["n_pairs"]) == (5, 9)
    # 6 clean pairs at slope 10, 3 outlier pairs; median = 10
    assert a["theil_slope"] == 10.0
    b = got["B"]
    assert (b["n_pairs"], b["theil_slope"]) == (1, 0.0)

    # direct recompute at sf: median of all valid pairwise slopes
    full = theil_sen_slope("/root/testdata/sf0.001").to_pandas()
    part = pd.read_parquet("/root/testdata/sf0.001/part.parquet")
    brand = full["p_brand"].iloc[0]
    g = part[part["p_brand"] == brand].sort_values("p_partkey")
    x = g["p_size"].to_numpy(float)
    y = g["p_retailprice"].to_numpy(float)
    i, j = np.triu_indices(len(g), 1)
    dx = x[j] - x[i]
    s = (y[j] - y[i])[dx != 0] / dx[dx != 0]
    assert full.set_index("p_brand").loc[brand, "theil_slope"] == float(
        np.round(np.median(s), 6)
    )


def test_daily_volume_cusum_step_change(ray_session, tmp_path):
    """A step change in daily volume peaks the statistic at the step
    boundary; a perfectly uniform stream scores zero everywhere."""
    import numpy as np

    from docling_eval_ray.pipelines.relational import daily_volume_cusum

    def write_events(path, counts):
        ts, eid = [], []
        for d, n in enumerate(counts, start=1):
            for k in range(n):
                ts.append(pd.Timestamp(f"2026-01-{d:02d}")
                          + pd.Timedelta(seconds=k))
                eid.append(len(eid))
        pd.DataFrame(
            {"event_id": pd.array(eid, dtype="int64"),
             "ts": pd.to_datetime(ts),
             "user_id": pd.array([0] * len(eid), dtype="int64"),
             "event_type": "view", "value": 0.0, "props": "{}"}
        ).to_parquet(path / "events.parquet")

    # 5 days at 10/day, then 5 days at 30/day — change after day 5
    write_events(tmp_path, [10] * 5 + [30] * 5)
    df = daily_volume_cusum(str(tmp_path)).to_pandas()
    assert df.loc[df["cusum_stat"].idxmax(), "day"] == "2026-01-05"
    assert df["cum_events"].iloc[-1] == 200
    assert (df["cusum_stat"].iloc[-1]) == 0  # last row always balances

    uniform = tmp_path / "u"
    uniform.mkdir()
    write_events(uniform, [7] * 6)
    du = daily_volume_cusum(str(uniform)).to_pandas()
    assert (du["cusum_stat"] == 0).all()
    assert (du["norm_stat"] == 0.0).all()

"""Empty-input robustness: every op must degrade to its SQL-on-empty
semantics (zero rows for per-row/grouped ops, the () grouping set for
CUBE, NULL for corr) instead of crashing on schema-less empty blocks —
the block-schema-split hazard class from the round-1 review."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "documents", "events", "embeddings", "lineitem", "orders",
    "customer", "supplier", "part", "nation", "region",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        sch = pq.read_schema(f"{SRC}/{t}.parquet")
        pq.write_table(sch.empty_table(), d / f"{t}.parquet")
    return str(d)


def _run(name, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry_empty_test", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    res = m.queries()[name](sf_dir)
    return res.to_pandas() if hasattr(res, "to_pandas") else res


@pytest.mark.parametrize(
    "name",
    [
        "gopher_quality_filter", "sentences_exploded", "pii_redact",
        "events_interarrival", "latest_event_per_user",
        "events_in_windows", "events_props_stats", "source_quota_cap",
        "suppliers_per_part", "order_priority_counts", "dedup_exact",
        "training_data_pipeline", "embedding_norms", "label_centroids",
        "cohort_retention", "token_pmi_bigrams",
        "top_event_type_per_user", "viewers_never_purchased",
        "bm25_scores", "token_fuzzy_pairs", "user_event_sequences",
        "event_transitions", "orderkey_islands", "dataset_split_assign",
        "lang_mixture_weights", "order_percent_rank", "promo_revenue_share",
        "priority_line_counts", "mixture_resample_census",
        "top_suppliers_by_revenue", "important_parts_stock",
        "lineitem_quantity_ranks", "lineitem_measures_unpivot",
        "customer_order_flags", "price_quantity_regression",
        "cheapest_parts_per_brand", "flag_price_median",
        "daily_active_users", "orders_weekday_census",
        "customer_segment_share", "events_rolling_median",
        "part_cooccurrence", "orderkey_set_compare",
        "daily_revenue_change", "customer_spend_quartiles",
        "events_zscore_by_type", "suppliers_above_region_avg",
        "events_value_mad", "trailing2d_active_users",
        "longest_order_streak", "lineitem_corr_matrix",
        "daily_big_purchases_spine",
    ],
)
def test_empty_input_yields_zero_rows(name, empty_dir, ray_session):
    df = _run(name, empty_dir)
    assert len(df) == 0


def test_empty_input_cube_grand_total(empty_dir, ray_session):
    df = _run("events_cube", empty_dir)
    assert len(df) == 1
    row = df.iloc[0]
    assert (row["event_type"], row["hr"], row["n"]) == ("ALL", -1, 0)


def test_empty_input_corr_is_null(empty_dir, ray_session):
    df = _run("lineitem_discount_corr", empty_dir)
    assert len(df) == 1
    assert np.isnan(df["corr_disc_price"].iloc[0])


def test_empty_input_funnel_zero_counts(empty_dir, ray_session):
    # SQL on empty still emits one row per funnel step, all zero
    df = _run("funnel_conversion", empty_dir)
    assert list(df["step"]) == ["1_view", "2_click", "3_purchase"]
    assert list(df["n_users"]) == [0, 0, 0]


def test_empty_input_percentiles_null_rows(empty_dir, ray_session):
    # scalar-aggregate SQL-on-empty: one (p, NULL) row per percentile
    df = _run("orders_price_percentiles", empty_dir)
    assert len(df) == 4
    assert df["value"].isna().all()


def test_empty_input_q6_null_row(empty_dir, ray_session):
    # scalar SUM over empty input: one row, NULL revenue
    df = _run("q6_forecast_revenue", empty_dir)
    assert len(df) == 1
    assert df["revenue"].isna().all()


def test_empty_input_triangles_zero(empty_dir, ray_session):
    # COUNT over an empty join: one row, 0
    df = _run("cooccurrence_triangles", empty_dir)
    assert len(df) == 1 and df["n_triangles"].iloc[0] == 0


def test_empty_input_entropy_and_gini(empty_dir, ray_session):
    assert len(_run("lang_token_entropy", empty_dir)) == 0
    g = _run("doc_length_gini", empty_dir)  # scalar aggregate: NULL row
    assert len(g) == 1 and g["gini"].isna().all()


def test_empty_input_decile_share_null(empty_dir, ray_session):
    g = _run("top_decile_revenue_share", empty_dir)
    assert len(g) == 1 and g["top_decile_share"].isna().all()


@pytest.mark.parametrize(
    "name",
    ["near_dup_clusters_star", "substring_dup_stats",
     "dedup_substrings_excise", "embedding_near_dups_lsh",
     "quality_percentile_filter", "part_cooccurrence_lift"],
)
def test_empty_input_round4_ops_zero_rows(name, empty_dir, ray_session):
    df = _run(name, empty_dir)
    assert len(df) == 0

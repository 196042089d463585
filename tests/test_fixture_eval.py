"""F3-F7 fixture schemas + consuming evaluators (known-answer cases)."""

import pyarrow as pa
import pytest

from docling_eval_ray.sources.fixtures import (
    F3_SCHEMA,
    F4_SCHEMA,
    F5_SCHEMA,
    F6_SCHEMA,
    F7_SCHEMA,
    kv_graph_fixture,
    layout_boxes_fixture,
    ocr_pages_fixture,
    reading_order_fixture,
    tables_otsl_html_fixture,
)


def test_fixture_schemas_exact():
    assert layout_boxes_fixture().schema == F3_SCHEMA
    assert tables_otsl_html_fixture().schema == F4_SCHEMA
    assert ocr_pages_fixture().schema == F5_SCHEMA
    assert kv_graph_fixture().schema == F6_SCHEMA
    assert reading_order_fixture().schema == F7_SCHEMA


def test_fixture_determinism():
    a = layout_boxes_fixture()
    b = layout_boxes_fixture()
    assert a.equals(b)
    assert reading_order_fixture().equals(reading_order_fixture())


def _mode(df, k):
    return df["doc_id"].str.split("-").str[1].astype(int) % k


def test_fixture_layout_eval(ray_session):
    from docling_eval_ray.pipelines.fixture_eval import fixture_layout_eval

    df = fixture_layout_eval().to_pandas()
    mode = _mode(df, 3)
    identical = df[(mode == 0) & (df["doc_id"] != "doc-000000")]
    assert (identical["image_map"] == 1.0).all()
    shifted = df[mode == 1]
    assert (shifted["image_map"] < 1.0).all()
    # empty pred page scores 0
    assert df[df["doc_id"] == "doc-000000"]["image_map"].iloc[0] == 0.0


def test_fixture_table_eval(ray_session):
    from docling_eval_ray.pipelines.fixture_eval import fixture_table_eval

    df = fixture_table_eval().to_pandas()
    # OTSL → HTML structural parity holds for every fixture table
    assert (df["otsl_html_struct_match"] == 1.0).all()
    mode = _mode(df, 4)
    edited = df[mode == 1]
    assert (edited["teds_struct"] == 1.0).all()
    assert (edited["teds"] < 1.0).all()
    assert (df[mode != 1]["teds"] == 1.0).all()


def test_fixture_ocr_eval(ray_session):
    from docling_eval_ray.pipelines.fixture_eval import fixture_ocr_eval

    df = fixture_ocr_eval().to_pandas()
    mode = _mode(df, 3)
    assert (df[mode == 0]["cer"] == 0.0).all()
    assert (df[mode == 1]["cer"].between(0, 1, inclusive="neither")).all()
    assert (df[mode == 2]["cer"] == 1.0).all()


def test_fixture_kv_eval(ray_session):
    from docling_eval_ray.pipelines.fixture_eval import fixture_kv_eval

    df = fixture_kv_eval().to_pandas()
    one = df[df["doc_id"] == "doc-000000"].set_index("cell_id")["label"]
    # 0→1, 2→3→4: 0 KEY, 1 VALUE, 2 KEY, 3 KEY (leaf child), 4 VALUE
    assert one[0] == "key" and one[1] == "value"
    assert one[2] == "key" and one[3] == "key" and one[4] == "value"
    deeper = df[df["doc_id"] == "doc-000001"].set_index("cell_id")["label"]
    # chain 2→3→4→5: node 3 points at non-leaf 4 → UNSPECIFIED
    assert deeper[3] == "unspecified"


def test_fixture_reading_order_eval(ray_session):
    from docling_eval_ray.pipelines.fixture_eval import (
        fixture_reading_order_eval,
    )

    df = fixture_reading_order_eval().to_pandas()
    assert (df["ard_norm"] == 1.0).all()

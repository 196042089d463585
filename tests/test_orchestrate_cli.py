"""Orchestration (registries, cached multi-evaluation, consolidation),
slicer, viz renderers, CLI verbs."""

import json
from pathlib import Path

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_run_all_evaluations_caches(ray_session, tmp_path):
    from docling_eval_ray.pipelines.orchestrate import (
        consolidate,
        run_all_evaluations,
    )

    out = str(tmp_path / "evals")
    res1 = run_all_evaluations(SF_DIR, out, modalities=["ocr", "timings"])
    assert not res1["ocr"]["cached"] and not res1["timings"]["cached"]
    assert "cer" in res1["ocr"]["metrics"]
    assert res1["ocr"]["metrics"]["cer"]["total"] == 450

    res2 = run_all_evaluations(SF_DIR, out, modalities=["ocr", "timings"])
    assert res2["ocr"]["cached"] and res2["timings"]["cached"]

    df = consolidate(res2)
    assert set(df["modality"]) == {"ocr", "timings"}
    assert {"mean", "median", "std", "total"} <= set(df.columns)


def test_registries_extensible():
    from docling_eval_ray.pipelines.orchestrate import (
        EVALUATOR_REGISTRY,
        _bootstrap,
        register_evaluator,
    )

    _bootstrap()
    assert {"markdown", "ocr", "reading_order", "layout", "tables",
            "timings"} <= set(EVALUATOR_REGISTRY)

    @register_evaluator("custom")
    def my_eval(sf_dir):  # pragma: no cover - registration test
        return None

    assert EVALUATOR_REGISTRY["custom"] is my_eval
    del EVALUATOR_REGISTRY["custom"]


def test_slicer(ray_session):
    from docling_eval_ray.stages.slicer import sliced_documents

    df = sliced_documents(SF_DIR, slice_length=5, overlap=1).to_pandas()
    assert len(df) > 500  # more slices than docs
    base = df[df["doc_id"].str.endswith("#0")]
    assert len(base) == 500
    for spans in df.head(20)["spans"]:
        assert len(spans) <= 5
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_slicer_rejects_bad_overlap(ray_session):
    import ray.data as rd

    from docling_eval_ray.stages.slicer import slice_documents

    with pytest.raises(ValueError):
        slice_documents(rd.from_items([]), slice_length=3, overlap=3)


def test_corpus_layout_map(ray_session):
    from docling_eval_ray.pipelines.evaluate import corpus_layout_map

    df = corpus_layout_map(SF_DIR).to_pandas()
    overall = df[df["label"] == "__overall__"]["ap"].iloc[0]
    assert 0.0 < overall <= 1.0
    assert len(df) > 3  # per-class rows present


def test_viz_renderers():
    from docling_eval_ray.functions.viz import (
        ascii_histogram,
        render_table,
        span_diff,
        stats_to_table,
    )

    stats = {
        "total": 4, "mean": 0.5, "median": 0.5, "std": 0.1,
        "bins": [0.0, 0.5, 1.0], "hist": [1, 3],
    }
    table, headers = stats_to_table(stats, "metric")
    assert len(table) == 2 and table[0][1] == "25.00"
    rendered = render_table(table, headers)
    assert "25.00" in rendered and "prob [%]" in rendered
    assert "#" in ascii_histogram(stats)

    gt = [{"kind": "text", "text": "a", "media_ref": "", "offset": 0}]
    pred = [{"kind": "text", "text": "b", "media_ref": "", "offset": 0}]
    d = span_diff(gt, pred)
    assert d.startswith("-") and "+ [" in d


def test_cli_visualize_and_evaluate(ray_session, tmp_path, capsys):
    from docling_eval_ray.__main__ import main

    out = str(tmp_path / "evals")
    rc = main(["evaluate", "--sf-dir", SF_DIR, "--output", out,
               "--modality", "ocr"])
    assert rc == 0
    assert (Path(out) / "evaluation_ocr.json").exists()
    captured = capsys.readouterr().out
    assert "ocr" in captured and "mean" in captured

    rc = main(["visualize", "--output", out])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "== ocr / cer ==" in captured and "prob [%]" in captured


def test_cli_create_gt_and_sliced(ray_session, tmp_path):
    import ray.data as rd

    from docling_eval_ray.__main__ import main

    gt_dir = str(tmp_path / "gt")
    rc = main(["create-gt", "--sf-dir", SF_DIR, "--output", gt_dir])
    assert rc == 0
    assert json.loads((Path(gt_dir) / "dataset_infos.json").read_text())[
        "num_rows"
    ] == 500
    assert rd.read_parquet(f"{gt_dir}/data").count() == 500

    sl_dir = str(tmp_path / "sliced")
    rc = main(["create-sliced", "--sf-dir", SF_DIR, "--output", sl_dir,
               "--slice-length", "6", "--overlap", "2"])
    assert rc == 0
    assert rd.read_parquet(sl_dir).count() > 500


def test_consolidation_workbook_sink(tmp_path):
    """S10 sink: stacked per-modality subtables + layout manifest
    (CSV fallback in this container; .xlsx when openpyxl exists)."""
    import json as _json

    import pandas as pd

    from docling_eval_ray.pipelines.orchestrate import (
        write_consolidation_workbook,
    )

    df = pd.DataFrame(
        {
            "modality": ["markdown", "markdown", "ocr"],
            "metric": ["bleu", "f1", "cer"],
            "mean": [0.9, 0.95, 0.05],
            "median": [0.92, 0.96, 0.04],
            "std": [0.1, 0.05, 0.02],
            "total": [450, 450, 450],
        }
    )
    path = write_consolidation_workbook(df, str(tmp_path / "wb"))
    assert path.endswith((".csv", ".xlsx"))
    if path.endswith(".csv"):
        layout = _json.loads((tmp_path / "wb" / "workbook.json").read_text())
        assert set(layout["modalities"]) == {"markdown", "ocr"}
        assert layout["modalities"]["markdown"]["n_rows"] == 2
        stacked = pd.read_csv(path, keep_default_na=False)
        # header rows carry the modality name in the first column
        assert (stacked.iloc[0] == ["markdown", "", "", "", "", ""]).all()
        assert layout["col_widths"]["modality"] >= len("markdown")


def test_comparison_html_sink(ray_session, tmp_path):
    """S11 per-doc comparison HTML: one file per doc, escaped content,
    SVG overlays, missing spans highlighted."""
    from docling_eval_ray.functions.viz import write_comparison_html
    from docling_eval_ray.pipelines.evaluate import eval_records

    ds = eval_records(SF_DIR).limit(40)
    out = write_comparison_html(ds, str(tmp_path / "viz")).to_pandas()
    assert len(out) == 40
    sample = (tmp_path / "viz" / f"{out['doc_id'].iloc[0]}.html").read_text()
    assert "<svg" in sample and "polyline" in sample
    assert "ground truth" in sample
    # a dropped-span doc must show a missing highlight
    import pandas as pd

    dropped = out[out["doc_id"].str.split("-").str[1].astype(int) % 10 == 0]
    if len(dropped):
        html = (tmp_path / "viz" /
                f"{dropped['doc_id'].iloc[0]}.html").read_text()
        assert 'class="miss"' in html


def test_cli_create_and_create_cvat(ray_session, tmp_path, capsys):
    import json as _json
    import xml.etree.ElementTree as _ET

    from docling_eval_ray.__main__ import main

    out = str(tmp_path / "combined")
    rc = main(["create", "--sf-dir", SF_DIR, "--output", out,
               "--partitions", "2"])
    assert rc in (0, None)
    assert (tmp_path / "combined" / "gt" / "data").exists()
    assert (tmp_path / "combined" / "eval" / "part=0").exists()

    cv = str(tmp_path / "cvat_out")
    rc = main(["create-cvat", "--sf-dir", SF_DIR, "--output", cv,
               "--buckets", "2"])
    assert rc in (0, None)
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tasks"] == 2 and report["n_images"] == 500
    files = sorted((tmp_path / "cvat_out" / "cvat").glob("*.xml"))
    assert len(files) == 2
    root = _ET.fromstring(files[0].read_text())
    assert root.tag == "annotations"
    assert len(root.findall("image")) > 0
    assert root.find("image/box").get("label")

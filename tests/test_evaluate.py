"""Evaluator pipelines: controlled-mutation fixtures → known metric
behavior per mutation class (F2 strategy)."""

import numpy as np
import pandas as pd
import pytest

from docling_eval_ray.pipelines.evaluate import (
    evaluate_markdown,
    evaluate_ocr,
    evaluate_reading_order,
    evaluate_tables,
    evaluation_summary,
    rejection_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _mode(df):
    return df["doc_id"].str.split("-").str[1].astype(int) % 10


def test_markdown_metrics_by_mutation(ray_session):
    df = evaluate_markdown(SF_DIR).to_pandas()
    mode = _mode(df)
    assert (mode != 3).all()  # failures filtered
    identical = df[mode >= 4]
    assert (identical["f1"] == 1.0).all()
    assert (identical["edit_distance"] == 0.0).all()
    edited = df[mode == 2]
    assert (edited["edit_distance"] > 0).all()
    # dropping the middle span usually changes the markdown — but the
    # dropped span can be a pure-media one (no text), a no-op projection
    dropped = df[mode == 0]
    assert (dropped["bleu"] < 1.0).mean() > 0.7


def test_ocr_cer_by_mutation(ray_session):
    df = evaluate_ocr(SF_DIR).to_pandas()
    mode = _mode(df)
    assert (df[mode >= 4]["cer"] == 0.0).all()
    assert (df[mode == 2]["cer"] > 0.0).all()
    assert np.allclose(df["cer"] + df["char_accuracy"], 1.0)


def test_reading_order_by_mutation(ray_session):
    df = evaluate_reading_order(SF_DIR).to_pandas()
    mode = _mode(df)
    assert (df[mode >= 4]["ard_norm"] == 1.0).all()
    # swapping two identical spans is a no-op for order equality
    swapped = df[mode == 1]
    assert (swapped["ard_norm"] < 1.0).mean() > 0.9


def test_tables_teds_by_mutation(ray_session):
    df = evaluate_tables(SF_DIR).to_pandas()
    mode = df["doc_id"] % 10
    identical = df[~mode.isin([0, 2])]
    assert (identical["teds"] == 1.0).all()
    text_edit = df[mode == 2]
    assert (text_edit["teds_struct"] == 1.0).all()
    assert (text_edit["teds"] < 1.0).all()
    dropped = df[mode == 0]
    assert (dropped["teds_struct"] < 1.0).all()
    assert df["is_complex"].any() and (~df["is_complex"]).any()


def test_rejection_counts(ray_session):
    df = rejection_counts(SF_DIR).to_pandas()
    counts = dict(zip(df["status"], df["n"]))
    assert counts["failure"] == 50  # doc_id%10==3 of 500
    assert counts["success"] == 450


def test_evaluation_summary(ray_session):
    df = evaluation_summary(SF_DIR)
    assert set(df["modality"]) == {
        "markdown", "ocr", "reading_order", "layout", "tables",
        "timings", "bbox_text",
    }
    bounded = df[df["modality"] != "timings"]
    assert ((bounded["mean"] >= -1.0) & (bounded["mean"] <= 1.0)).all()
    assert (df[df["modality"] == "timings"]["mean"] > 0).all()
    assert (df["n"] > 0).all()


def test_eval_records_vectorized_matches_mutate_spec(ray_session):
    """The flattened-array mutation synthesis must reproduce the row-level
    _mutate specification exactly (spans, offsets, status)."""
    from docling_eval_ray.pipelines.evaluate import _mutate, eval_records
    from docling_eval_ray.pipelines.flagship import flagship

    gt = {r["doc_id"]: r["spans"] for r in flagship(SF_DIR).take_all()}
    got = eval_records(SF_DIR).take_all()
    assert len(got) == len(gt)
    for r in got:
        mode = int(r["doc_id"].split("-")[1]) % 10
        assert r["gt_spans"] == gt[r["doc_id"]]
        if mode == 3:
            assert r["status"] == "failure" and r["pred_spans"] == []
        else:
            assert r["status"] == "success"
            assert r["pred_spans"] == _mutate(gt[r["doc_id"]], mode)


def test_evaluation_summary_matches_driver_side_means(ray_session):
    """Distributed (sum, count) aggregate == pandas mean of the per-doc
    tables (the pre-refactor driver-side computation)."""
    from docling_eval_ray.pipelines.evaluate import evaluate_markdown

    df = evaluate_markdown(SF_DIR).to_pandas()
    summary = evaluation_summary(SF_DIR)
    md = summary[summary["modality"] == "markdown"].set_index("metric")
    for c in ["bleu", "f1", "meteor", "edit_distance"]:
        assert md.loc[c, "mean"] == pytest.approx(
            round(float(df[c].dropna().mean()), 6), abs=2e-6
        )
        assert md.loc[c, "n"] == int(df[c].notna().sum())


def test_bbox_text_evaluator(ray_session):
    """Pivot-IoU matched-box text metrics (bbox_text_evaluator.py
    semantics): identical docs -> every match perfect, no orphans;
    dropped-span docs -> pivot is pred side and metrics degrade; edited
    docs -> at least one match with text error."""
    from docling_eval_ray.pipelines.evaluate import evaluate_bbox_text

    df = evaluate_bbox_text(SF_DIR).to_pandas()
    mode = _mode(df)
    ident = df[mode >= 4]
    assert (ident["f1"] == 1.0).all()
    assert (ident["edit_distance"] == 0.0).all()
    assert not ident["is_orphan"].any()
    # identical matches: meteor = 1 − 0.5/m³ (fragmentation penalty),
    # which is 0.5 for single-token matches — bound from below
    assert (ident["meteor"] >= 0.5).all()
    assert ident["meteor"].mean() > 0.95
    edited = df[mode == 2]
    per_doc_err = edited.groupby(df["doc_id"])["edit_distance"].max()
    assert (per_doc_err > 0).all()
    # orphan rows carry zeroed metrics and n_pred == 0
    orph = df[df["is_orphan"]]
    if len(orph):
        assert (orph["n_pred"] == 0).all()
        assert (orph["f1"] == 0.0).all() and (orph["bleu"] == 0.0).all()


def test_pivot_iou_mapping_reference_semantics():
    from docling_eval_ray.functions.geometry import pivot_iou_mapping

    true = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50.0]])
    pred = np.array([[1, 1, 11, 11], [21, 21, 31, 31.0]])
    # pred has fewer boxes -> pivot=pred; every TRUE box maps to its
    # max-IoU pred box; the far true box still maps (no threshold) so
    # no orphans unless a true box is never an argmax... all trues map.
    piv_is_true, mappings, orphans = pivot_iou_mapping(true, pred)
    assert not piv_is_true
    assert sorted(sum(mappings.values(), [])) == [0, 1, 2]
    assert orphans == []
    # empty pred: all trues orphaned
    piv_is_true, mappings, orphans = pivot_iou_mapping(true, true[:0])
    assert mappings == {} and orphans == [0, 1, 2]


def test_corpus_layout_map_distributed_matches_pooled(ray_session):
    """The per-class distributed (score, tp-mask) pooling must equal the
    driver-side corpus_map over the same synthesized boxes (tie order
    differences bounded at 1e-6 by the deterministic tiebreak)."""
    from docling_eval_ray.functions.layout import corpus_map
    from docling_eval_ray.pipelines.evaluate import (
        _doc_boxes,
        corpus_layout_map,
        eval_records,
    )

    got = {r["label"]: r["ap"]
           for r in corpus_layout_map(SF_DIR).to_pylist()}

    per_class = {}
    for r in eval_records(SF_DIR).take_all():
        if r["status"] != "success":
            continue
        doc_num = int(r["doc_id"].split("-")[1])
        n = len(r["gt_spans"])
        if n == 0:
            continue
        gt = _doc_boxes(doc_num, n)
        labels = np.array([s["kind"] for s in r["gt_spans"]])
        shift = 2.0 if doc_num % 10 in (0, 1, 2) else 0.0
        scores = np.linspace(0.95, 0.5, n)
        for cls in np.unique(labels):
            m = labels == cls
            per_class.setdefault(str(cls), []).append(
                (gt[m], gt[m] + shift, scores[m])
            )
    want = corpus_map(per_class)
    assert got["__overall__"] == pytest.approx(want["map"], abs=1e-3)
    for cls, ap in want["per_class"].items():
        if not np.isnan(ap):
            assert got[cls] == pytest.approx(ap, abs=1e-3), cls


def test_corpus_layout_map_sharded_matches_single(ray_session):
    """Two-level per-class pooling (class_shards>1) must produce the
    exact same AP table as the single-task-per-class path. The synthetic
    corpus is already 1-class-dominant (most spans are kind=text), so
    the dominant class genuinely splits across shards."""
    from docling_eval_ray.pipelines.evaluate import corpus_layout_map

    single = corpus_layout_map(SF_DIR).to_pandas()
    sharded = corpus_layout_map(SF_DIR, class_shards=8).to_pandas()
    s = single.sort_values("label").reset_index(drop=True)
    h = sharded.sort_values("label").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, h)

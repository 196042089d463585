"""DocVQA-style grouped GT builder: QA rows -> one record per doc with
interleaved KEY/VALUE cells and bidirectional links."""

from docling_eval_ray.sources.docvqa import SAMPLE_JSONL, build_docvqa_gt


def test_docvqa_grouping_and_cells(ray_session):
    rows = {r["doc_id"]: r for r in build_docvqa_gt(SAMPLE_JSONL).take_all()}
    assert set(rows) == {"rpt_a", "rpt_b", "rpt_c"}

    a = rows["rpt_a"]
    # question_id order: q1 first, then q2; cells interleave Q then answers
    assert [(s["kind"], s["text"]) for s in a["spans"]] == [
        ("key", "Who signed it?"), ("value", "M. Lopez"),
        ("key", "What is the total?"), ("value", "42"), ("value", "42.00"),
    ]
    assert [s["offset"] for s in a["spans"]] == [0, 1, 2, 3, 4]
    assert a["n_questions"] == 2 and a["n_cells"] == 5
    # bidirectional links per answer
    assert sorted(
        (l["source"], l["target"], l["label"]) for l in a["links"]
    ) == sorted([
        (0, 1, "to_value"), (1, 0, "to_key"),
        (2, 3, "to_value"), (3, 2, "to_key"),
        (2, 4, "to_value"), (4, 2, "to_key"),
    ])

    b = rows["rpt_b"]
    assert b["n_questions"] == 1 and len(b["links"]) == 2
    # question with no answers: lone KEY cell, no links
    c = rows["rpt_c"]
    assert [(s["kind"],) for s in c["spans"]] == [("key",)]
    assert c["links"] == []

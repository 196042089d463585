"""FUNSD-style GT builder: raw annotation JSON → span sequence + KV
graph, asserted against hand-computed expected spans (span-sequence
equality on (kind, text, media_ref) in offset order — the per-row
invariant)."""

from docling_eval_ray.sources.funsd import SAMPLE_DIR, build_funsd_gt

EXPECTED_A = [
    ("key", "Name:"), ("value", "Maria Lopez"),
    ("key", "Date:"), ("value", "2024-03-15"),
    ("key", "Department:"), ("value", "Finance"),
]
EXPECTED_B = [
    ("key", "Items:"), ("value", "Bolts"), ("value", "Washers"),
    ("key", "Approved By:"), ("key", "Manager"), ("value", "J. Chen"),
]


def _rows(ray_session):
    return {r["doc_id"]: r for r in build_funsd_gt(SAMPLE_DIR).take_all()}


def test_funsd_span_sequences(ray_session):
    rows = _rows(ray_session)
    assert set(rows) == {"form_a", "form_b", "form_c", "form_d", "form_e"}
    for name, expected in [("form_a", EXPECTED_A), ("form_b", EXPECTED_B)]:
        spans = rows[name]["spans"]
        assert [(s["kind"], s["text"]) for s in spans] == expected
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        assert all(s["media_ref"] == "" for s in spans)


def test_funsd_link_semantics(ray_session):
    rows = _rows(ray_session)
    # form_a: one KV link per pair, renumbered to positional ids
    assert [(l["source"], l["target"]) for l in rows["form_a"]["links"]] == [
        (0, 1), (2, 3), (4, 5)
    ]
    # form_b: duplicate linking pairs deduped (4 distinct of 8 mentions)
    assert rows["form_b"]["n_links"] == 4
    # form_c: duplicate link deduped, dangling link (to missing id 9)
    # dropped; the linked "other" item is KEPT (skip rule requires both
    # no-linking AND header/other label); cell with dropped link
    # degrades to VALUE (outdegree 0)
    c = rows["form_c"]
    assert c["n_cells"] == 3 and c["n_links"] == 1
    assert [(s["kind"], s["text"]) for s in c["spans"]] == [
        ("key", "Ref code"), ("value", "XK-42"), ("value", "Total:")
    ]


def test_funsd_edge_cases(ray_session):
    rows = _rows(ray_session)
    # form_d: everything skipped → empty but present row
    d = rows["form_d"]
    assert d["spans"] == [] and d["n_cells"] == 0 and d["n_words"] == 0
    # form_e: words missing text or box are skipped from the census
    assert rows["form_e"]["n_words"] == 2
    # word census counts only kept items' valid words
    assert rows["form_a"]["n_words"] == 7


def test_xfund_wrapper_and_lang(ray_session):
    """XFUND: multi-doc wrapper, image-filename ordering, lang from the
    id prefix, same item semantics as FUNSD."""
    from docling_eval_ray.sources.funsd import (
        XFUND_SAMPLE_DIR,
        build_xfund_gt,
    )

    rows = build_xfund_gt(XFUND_SAMPLE_DIR).take_all()
    # ordered by img fname: de_val_0 before de_val_1
    assert [r["doc_id"] for r in rows] == ["de_val_0", "de_val_1"]
    assert all(r["lang"] == "de" for r in rows)
    r1 = rows[1]
    # header skipped; KV pair classified
    assert [(s["kind"], s["text"]) for s in r1["spans"]] == [
        ("key", "Name:"), ("value", "Erika Muster")
    ]
    assert r1["n_words"] == 3

"""Language ID heuristic and winnowing stage."""

from docling_eval_ray.stages.textstats import LangId


def test_langid_obvious_samples():
    lid = LangId()
    assert lid.classify("the cat sat on the mat and it was happy") == "en"
    assert lid.classify("el perro corre en la casa de la abuela") == "es"
    assert lid.classify("der Hund läuft in den Garten und die Katze ist da") == "de"
    assert lid.classify("le chat est dans la maison et les enfants sont là") == "fr"
    assert lid.classify("这是一个中文句子") == "zh"
    assert lid.classify("") == "und"
    assert lid.classify("zzz qqq xxx") == "und"


def test_langid_stage_runs(ray_session):
    from docling_eval_ray.stages.textstats import language_id

    df = language_id("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "lang_pred"}
    assert df["lang_pred"].notna().all()


def test_langid_confusion_planted(ray_session, tmp_path):
    """Stopword-distinct fixtures classify to their true language; the
    census cells match a direct kernel sweep."""
    import pandas as pd
    import pyarrow.parquet as pq

    from docling_eval_ray.stages.textstats import (
        LangId,
        langid_confusion,
    )

    rows = [
        (1, "the cat sat on the mat and it was that good", "en"),
        (2, "el que y en un una es no los las por con", "es"),
        (3, "der die das und in den von zu mit ist", "de"),
        (4, "一个 测试 文档", "zh"),
        (5, "qq ww ee rr tt", "en"),  # no stopword hits → und
    ]
    pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        (r["lang_true"], r["lang_pred"]): r["n_docs"]
        for r in langid_confusion(str(tmp_path)).take_all()
    }
    assert got == {("en", "en"): 1, ("es", "es"): 1, ("de", "de"): 1,
                   ("zh", "zh"): 1, ("en", "und"): 1}
    lid = LangId()
    for _, text, _lang in rows[:4]:
        assert lid.classify(text) == _lang

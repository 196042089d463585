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

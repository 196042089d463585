"""Porter stemmer (functions/stemmer.py) + METEOR stem stage.

Covers (a) the canonical transformations from the 1980 paper's step
examples, run through the FULL pipeline, (b) the oracle-safety
invariant the meteor docstring claims: Porter is a bijection on the
driver corpus vocabulary at every committed scale factor, so the
stem stage can never add a match there and the exact-match DuckDB
metric oracles remain valid, and (c) meteor's two-stage behavior."""

import os

import pytest

from docling_eval_ray.functions.stemmer import porter_stem
from docling_eval_ray.functions.textmetrics import meteor

# word → expected FULL-pipeline stem (classic Porter; spot-checked
# against nltk.PorterStemmer on the same words)
CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    "customer": "custom", "customers": "custom", "running": "run",
}


@pytest.mark.parametrize("word,expected", sorted(CASES.items()))
def test_paper_vocabulary(word, expected):
    assert porter_stem(word) == expected


def test_short_and_nonalpha_pass_through():
    for w in ["a", "is", "xq", "x1", "don't", "", "3.14", "#"]:
        assert porter_stem(w) == w


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_stem_is_bijection_on_driver_vocab(sf):
    """The oracle-safety invariant: no two distinct corpus tokens share
    a stem, so METEOR's stem stage is inert on driver data and the
    exact-match SQL metric oracles stay hash-valid."""
    import pyarrow.parquet as pq

    path = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"no testdata at {path}")
    vocab = set()
    for txt in pq.read_table(path, columns=["text"])["text"].to_pylist():
        vocab.update(txt.split())
    stems = [porter_stem(w) for w in sorted(vocab)]
    assert len(set(stems)) == len(vocab), "stem collision on driver vocab"


def test_meteor_stem_stage_matches_inflections():
    ref = ["the", "running", "dog"]
    hyp = ["the", "runs", "dog"]
    assert meteor(ref, hyp, stem=False) < 0.5
    assert meteor(ref, hyp) > 0.9  # stem stage aligns running/runs


def test_meteor_stem_stage_inert_on_equal_tokens():
    ref = ["customer", "value", "table", "merge"]
    assert meteor(ref, ref) == meteor(ref, ref, stem=False)


def test_meteor_exact_stage_takes_priority():
    # one exact + one stem match; exact pairs must not be stolen by
    # the stem stage (nltk enumerate_matches order)
    ref = ["run", "running"]
    hyp = ["running", "run"]
    # both tokens align (one exact each via greedy, or exact+stem):
    # m=2, p=r=1, but the crossed mapping is 2 chunks → penalty 0.5
    assert meteor(ref, hyp) == pytest.approx(0.5)
    # without stems only the exact pairs align
    assert meteor(ref, hyp, stem=False) == pytest.approx(0.5)

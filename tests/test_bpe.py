"""BPE tokenizer training: known-answer merges, segmentation
round-trip, and the distributed pipeline over the synthetic corpus."""

import numpy as np

from docling_eval_ray.functions.bpe import (
    EOW,
    bpe_merges_from_histogram,
    bpe_segment,
    bpe_token_counts,
    bpe_train_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def test_known_answer_merges():
    """Classic BPE example: 'low/lower/newest/widest'-style histogram
    with hand-checked first merges."""
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_merges_from_histogram(hist, 4)
    # 'es' occurs in newest(6) + widest(3) = 9 — the unique max
    assert merges[0] == ("e", "s", 9)
    # then 'es'+'t' = 9, then 'est'+'</w>' = 9 (lexicographic ties
    # resolved deterministically), then 'l'+'o' = 7
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", EOW, 9)
    assert merges[3] == ("l", "o", 7)


def test_segment_applies_merges_in_order():
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_merges_from_histogram(hist, 3)
    # after (e,s), (es,t), (est,EOW): 'widest' ends in the est</w> unit
    assert bpe_segment("widest", merges) == ["w", "i", "d", "est" + EOW]
    # every segmentation reassembles to word + EOW
    for w in hist:
        assert "".join(bpe_segment(w, merges)) == w + EOW


def test_segment_no_merges_is_chars():
    assert bpe_segment("ab", []) == ["a", "b", EOW]


def test_merges_stop_when_no_repeats():
    merges = bpe_merges_from_histogram({"a": 1, "b": 1}, 50)
    # only single-char words with count 1 → no pair reaches count 2
    # except (char, EOW) at count 1 each — training stops early
    assert merges == []


def test_pipeline_over_corpus(ray_session):
    tbl = bpe_train_merges(SF_DIR, n_merges=8)
    assert tbl.num_rows == 8
    counts = tbl["pair_count"].to_numpy()
    assert (counts >= 2).all()
    df = bpe_token_counts(SF_DIR, n_merges=8).to_pandas()
    assert len(df) == 500  # one row per document
    # merging can only shrink the symbol stream vs chars+EOW, and BPE
    # token count is at least the whitespace word count (each word is
    # >= 1 token)
    assert (df["n_bpe_tokens"] >= 0).all()
    # spot-check one doc against the pure kernel
    import pyarrow.parquet as pq

    from docling_eval_ray.functions.bpe import (
        _word_histogram,
        bpe_merges_from_histogram,
    )
    from docling_eval_ray.functions.tokens import sql_tokens

    merges = bpe_merges_from_histogram(_word_histogram(SF_DIR), 8)
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    doc_id = int(t["doc_id"][0].as_py())
    text = t["text"][0].as_py()
    expect = sum(
        len(bpe_segment(w, merges)) for w in sql_tokens(text) if w
    )
    got = int(df.set_index("doc_id").loc[doc_id, "n_bpe_tokens"])
    assert got == expect

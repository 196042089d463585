"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_eval_ray.functions.tables import (
    cells_to_html,
    parse_html_table,
    teds,
)
from docling_eval_ray.functions.textmetrics import (
    ard_norm,
    bleu,
    cer,
    edit_distance,
    tokenize,
)

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0,
    max_size=12
)
texts = words.map(" ".join)


@given(texts, texts)
@settings(max_examples=60, deadline=None)
def test_edit_distance_metric_properties(a, b):
    d = edit_distance(list(a), list(b))
    assert d == edit_distance(list(b), list(a))          # symmetry
    assert d >= abs(len(a) - len(b))                     # lower bound
    assert d <= max(len(a), len(b))                      # upper bound
    assert (d == 0) == (a == b)                          # identity


@given(texts, texts, texts)
@settings(max_examples=30, deadline=None)
def test_edit_distance_triangle(a, b, c):
    ab = edit_distance(list(a), list(b))
    bc = edit_distance(list(b), list(c))
    ac = edit_distance(list(a), list(c))
    assert ac <= ab + bc


@given(texts, texts)
@settings(max_examples=40, deadline=None)
def test_cer_bounds(a, b):
    v = cer(a, b)
    assert 0.0 <= v <= 1.0
    if a and a == b:
        assert v == 0.0


@given(words, words)
@settings(max_examples=40, deadline=None)
def test_bleu_bounds(ref, hyp):
    v = bleu(ref, hyp)
    assert 0.0 <= v <= 1.0 + 1e-12
    if ref and ref == hyp:
        assert v == 1.0 or abs(v - 1.0) < 1e-9


@given(st.permutations(list(range(8))))
@settings(max_examples=40, deadline=None)
def test_ard_bounds_and_identity(perm):
    v, _ = ard_norm(list(perm))
    assert 0.0 <= v <= 1.0
    if list(perm) == list(range(8)):
        assert v == 1.0


@st.composite
def tables_html(draw):
    n_rows = draw(st.integers(1, 4))
    n_cols = draw(st.integers(1, 4))
    rows = []
    for r in range(n_rows):
        tds = "".join(
            f"<td>{draw(st.text(alphabet='xyz', max_size=3))}</td>"
            for _ in range(n_cols)
        )
        rows.append(f"<tr>{tds}</tr>")
    return "<table>" + "".join(rows) + "</table>"


@given(tables_html())
@settings(max_examples=25, deadline=None)
def test_teds_identity_and_roundtrip(html):
    assert teds(html, html) == 1.0
    cells = parse_html_table(html)
    rebuilt = cells_to_html(cells)
    assert teds(html, rebuilt) == 1.0


@given(tables_html(), tables_html())
@settings(max_examples=25, deadline=None)
def test_teds_bounds_and_symmetric_structure(a, b):
    v = teds(a, b, structure_only=True)
    assert 0.0 <= v <= 1.0


def test_extraction_idempotent():
    """extract(extract(x)) == extract(x): the output contains no
    furniture/boilerplate, so a second pass is the identity."""
    import pyarrow as pa

    from docling_eval_ray.datamodel.schema import SPAN_STRUCT
    from docling_eval_ray.sources.interleaved import synth_spans_for_doc
    from docling_eval_ray.stages.extract import ExtractMainContent

    rows = [
        {"doc_id": f"doc-{i:06d}",
         "spans": synth_spans_for_doc(i, "alpha beta gamma delta " * (i + 1))}
        for i in range(25)
    ]
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [pa.field("doc_id", pa.string()),
             pa.field("spans", pa.list_(SPAN_STRUCT))]
        ),
    )
    ex = ExtractMainContent()
    once = ex._extract(t, status="success")
    twice = ex._extract(once.select(["doc_id", "spans"]), status="success")
    assert once["spans"].to_pylist() == twice["spans"].to_pylist()


def test_minhash_estimate_accuracy_sweep():
    """MinHash signature agreement tracks true Jaccard within ~0.15
    across a similarity sweep (128 permutations)."""
    from docling_eval_ray.stages.dedup import MinHasher, _shingles

    mh = MinHasher()
    base_words = [f"w{i}" for i in range(120)]
    base = " ".join(base_words)
    sig_base = mh.signature(base)
    for k in (0, 20, 60, 100):
        other_words = base_words[k:] + [f"z{i}" for i in range(k)]
        other = " ".join(other_words)
        sa, sb = _shingles(base), _shingles(other)
        true_j = len(sa & sb) / len(sa | sb)
        est = float((sig_base == mh.signature(other)).mean())
        assert abs(est - true_j) < 0.15


def test_pareto_mask_matches_brute_force():
    """Skyline kernel: scan result == brute-force dominance on random
    small relations with heavy ties."""
    import numpy as np

    from docling_eval_ray.pipelines.relational import _pareto_mask

    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(1, 40))
        price = rng.integers(0, 6, n).astype(float)
        size = rng.integers(0, 6, n).astype(float)
        m = _pareto_mask(price, size)
        for b in range(n):
            dom = (
                (price <= price[b]) & (size >= size[b])
                & ((price < price[b]) | (size > size[b]))
            ).any()
            assert m[b] == (not dom)


# --- round-3 continuation kernels -----------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 20), st.integers(1, 20),
    st.sampled_from([1, 2, 3, 4]), st.sampled_from([0, 1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(h, w, channels, filter_type, seed):
    """encode→decode is the identity for every shape × color type ×
    scanline filter (the from-scratch codec's core contract)."""
    import numpy as np

    from docling_eval_ray.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=filter_type)), img)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=50,
                max_size=2000),
       st.integers(1, 7))
def test_tdigest_rank_error_property(values, n_chunks):
    """Chunked build + merge keeps total weight exact and rank error
    within the delta bound for arbitrary (finite) inputs."""
    import numpy as np

    from docling_eval_ray.stages.sketches import TDigest

    vals = np.asarray(values, np.float64)
    parts = []
    for chunk in np.array_split(vals, n_chunks):
        td = TDigest(100)
        td.add_many(chunk)
        parts.append(td)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.weights.sum() == len(vals)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        rank = float(np.mean(vals <= est))
        # ties/duplicates can push the empirical rank above q
        assert -0.05 <= rank - q or rank >= q
        assert abs(rank - q) < 0.2 or len(np.unique(vals)) < 10


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1,
                max_size=200))
def test_bloom_no_false_negatives_property(grams):
    """One-sided error: EVERY added string must test positive."""
    from docling_eval_ray.stages.bloom import BloomFilter

    bf = BloomFilter.sized_for(len(grams), 0.01)
    bf.add_many(grams)
    assert bf.contains_many(grams).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=10, max_size=4000),
       st.sampled_from([8000, 16000]))
def test_wav_roundtrip_property(samples, rate):
    """stdlib-wave encode → decode_wav returns the exact samples
    (scaled to [-1, 1])."""
    import io
    import wave

    import numpy as np

    from docling_eval_ray.stages.audio import decode_wav

    pcm = np.asarray(samples, "<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(pcm.tobytes())
    got_rate, got = decode_wav(buf.getvalue())
    assert got_rate == rate
    assert np.array_equal((got * 32768.0).astype("<i2"), pcm)


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 10**6), st.integers(1, 10**6), st.integers(1, 10**6))
def test_pair_scores_bounds_property(c, na, nb):
    """0 < jaccard ≤ containment ≤ 1 whenever the intersection is
    feasible (c ≤ min(na, nb))."""
    import numpy as np

    from docling_eval_ray.stages.dedup import (
        _containment_score,
        _jaccard_score,
    )

    c = min(c, na, nb)
    j = _jaccard_score(np.array([c], float), np.array([na], float),
                       np.array([nb], float))[0]
    t = _containment_score(np.array([c], float), np.array([na], float),
                           np.array([nb], float))[0]
    assert 0 < j <= t <= 1.0

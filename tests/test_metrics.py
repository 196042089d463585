"""Metric kernels: text metrics, CER, ARD, layout AP, KV classify,
stats kernel — known-answer cases mirroring the reference's unit-test
style (SURVEY.md §5)."""

import numpy as np
import pytest

from docling_eval_ray.functions.graphs import (
    KEY,
    UNSPECIFIED,
    VALUE,
    classify_cells,
    distinct_links,
    normalize_cell_ids,
)
from docling_eval_ray.functions.geometry import greedy_iou_match, iou_matrix
from docling_eval_ray.functions.layout import corpus_map, image_map
from docling_eval_ray.functions.textmetrics import (
    ard_norm,
    bleu,
    cer,
    edit_distance,
    text_metrics,
    tokenize,
)


# --- text metrics ----------------------------------------------------------

def test_text_metrics_identical():
    m = text_metrics("hello world foo", "hello world foo")
    assert m["f1"] == m["precision"] == m["recall"] == 1.0
    assert m["edit_distance"] == 0.0
    assert m["bleu"] == pytest.approx(1.0)


def test_text_metrics_known_edit():
    m = text_metrics("a b c d", "a b x d")
    assert m["edit_distance"] == pytest.approx(0.25)
    assert m["precision"] == pytest.approx(0.75)
    assert m["recall"] == pytest.approx(0.75)


def test_bleu_degenerate():
    assert bleu([], ["a"]) == 0.0
    assert bleu(["a", "b"], []) == 0.0
    assert bleu(list("abcd"), list("abcd")) == pytest.approx(1.0)


def test_edit_distance_basic():
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance([], list("ab")) == 2


def test_cer():
    assert cer("abcd", "abcd") == 0.0
    assert cer("abcd", "abxd") == 0.25
    assert cer("abcd", "") == 1.0
    assert cer("", "x") == 1.0


# --- reading order ---------------------------------------------------------

def test_ard_perfect():
    assert ard_norm([0, 1, 2, 3])[0] == 1.0


def test_ard_known_swap():
    # swap adjacent: sum|d| = 2, n=4 → 1 - 2/16 = 0.875
    assert ard_norm([1, 0, 2, 3])[0] == pytest.approx(0.875)


def test_ard_weighted():
    _, w = ard_norm([1, 0], weights=[1.0, 0.0])
    # w_ard = |0-1|*1 + |1-0|*0 = 1 → 1 - 1/4 = 0.75
    assert w == pytest.approx(0.75)


def test_ard_empty():
    assert ard_norm([]) == (0.0, 0.0)


# --- geometry / layout -----------------------------------------------------

def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 dtype=float)
    m = iou_matrix(a, b)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(25 / 175)
    assert m[0, 2] == 0.0


def test_greedy_match():
    gt = np.array([[0, 0, 10, 10], [20, 0, 30, 10]], dtype=float)
    pred = np.array([[19, 0, 29, 10], [1, 0, 11, 10]], dtype=float)
    pairs, un_g, un_p = greedy_iou_match(gt, pred, 0.5)
    assert {(g, p) for g, p, _ in pairs} == {(0, 1), (1, 0)}
    assert not un_g and not un_p


def test_image_map_perfect_and_miss():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], dtype=float)
    labels = np.array(["a", "b"])
    scores = np.array([0.9, 0.8])
    assert image_map(boxes, labels, boxes, labels, scores) == pytest.approx(1.0)
    far = boxes + 100
    assert image_map(boxes, labels, far, labels, scores) == 0.0


def test_corpus_map_pools_across_images():
    b1 = np.array([[0, 0, 10, 10]], dtype=float)
    inputs = {"a": [(b1, b1, np.array([0.9])),
                    (b1, b1 + 100, np.array([0.8]))]}
    out = corpus_map(inputs)
    # one perfect image + one total miss → AP 0.5 at every threshold
    assert out["per_class"]["a"] == pytest.approx(0.5, abs=0.01)


# --- KV graph --------------------------------------------------------------

def test_classify_cells_rules():
    # 0 -> 1 -> 2 ; 3 isolated
    labels = classify_cells([0, 1, 2, 3], [(0, 1), (1, 2)])
    assert labels[0] == KEY          # no incoming, has outgoing
    assert labels[1] == KEY          # in+out, target is leaf
    assert labels[2] == VALUE        # leaf
    assert labels[3] == VALUE        # isolated: outdegree 0

    # mid node pointing at a non-leaf → UNSPECIFIED
    labels = classify_cells([0, 1, 2, 3], [(0, 1), (1, 2), (2, 3)])
    assert labels[1] == UNSPECIFIED


def test_normalize_and_distinct():
    ids, links = normalize_cell_ids([10, 5, 7], [(10, 5), (5, 7)])
    assert ids == [0, 1, 2]
    assert links == [(0, 1), (1, 2)]
    assert distinct_links([(1, 2), (1, 2), (2, 3)]) == [(1, 2), (2, 3)]


# --- stats kernel ----------------------------------------------------------

def test_compute_stats_matches_reference_formula(ray_session):
    import ray.data as rd
    import statistics

    from docling_eval_ray.stages.stats import compute_stats

    vals = [0.1, 0.5, 0.5, 0.9, 0.25, 0.75, 1.0, 0.0]
    ds = rd.from_items([{"v": v} for v in vals])
    out = compute_stats(ds, "v")
    assert out["total"] == len(vals)
    assert out["mean"] == pytest.approx(statistics.mean(vals))
    assert out["median"] == pytest.approx(statistics.median(vals))
    assert out["std"] == pytest.approx(statistics.stdev(vals))
    ref_hist, ref_bins = np.histogram(vals, bins=20, range=(0, 1))
    assert out["hist"] == ref_hist.tolist()
    assert out["bins"] == pytest.approx(ref_bins.tolist())


def test_compute_stats_empty(ray_session):
    import ray.data as rd

    from docling_eval_ray.stages.stats import compute_stats

    ds = rd.from_items([{"v": 1.0}]).filter(lambda r: False)
    out = compute_stats(ds, "v")
    assert out["total"] == 0 and out["mean"] == -1.0


# --- METEOR ----------------------------------------------------------------

def test_meteor_known_answers():
    from docling_eval_ray.functions.textmetrics import meteor

    # identical: m=n, P=R=1, Fmean=1, chunks=1, penalty=0.5/n^3
    ref = "the cat sat on the mat".split()
    assert meteor(ref, ref) == pytest.approx(1 - 0.5 * (1 / 6) ** 3)
    # no overlap
    assert meteor(ref, "dogs bark loudly".split()) == 0.0
    # empty sides
    assert meteor([], ref) == 0.0 and meteor(ref, []) == 0.0
    # hand-computed: ref="a b c d", hyp="a b d c" → m=4, P=R=1,
    # Fmean=1; alignment (0,0)(1,1)(2,3)(3,2) → chunks=3
    got = meteor("a b c d".split(), "a b d c".split())
    assert got == pytest.approx(1.0 * (1 - 0.5 * (3 / 4) ** 3))
    # recall-weighted: hyp covers half the ref contiguously
    # m=2, P=1, R=0.5, Fmean=10*0.5/(0.5+9)≈0.5263, chunks=1
    got = meteor("a b c d".split(), "a b".split())
    fmean = 10 * 1.0 * 0.5 / (0.5 + 9 * 1.0)
    assert got == pytest.approx(fmean * (1 - 0.5 * (1 / 2) ** 3))


def test_meteor_in_text_metrics_bundle():
    from docling_eval_ray.functions.textmetrics import text_metrics

    m = text_metrics("the cat sat", "the cat sat")
    assert m["meteor"] == pytest.approx(1 - 0.5 * (1 / 3) ** 3)
    assert m["bleu"] == pytest.approx(1.0)


def test_compute_stats_approx_median(ray_session):
    import ray.data as rd

    from docling_eval_ray.stages.stats import compute_stats

    rng = np.random.default_rng(3)
    vals = rng.beta(2, 5, size=2000).tolist()
    ds = rd.from_items([{"v": v} for v in vals])
    exact = compute_stats(ds, "v")
    approx = compute_stats(ds, "v", approx_median=True)
    # identical mergeable stats; median within one bin width (0.05)
    assert approx["total"] == exact["total"]
    assert approx["mean"] == pytest.approx(exact["mean"])
    assert approx["hist"] == exact["hist"]
    assert abs(approx["median"] - exact["median"]) <= 0.05


def test_edit_distance_matches_reference_dp():
    """Myers bit-parallel edit_distance must equal the unit-cost DP on
    random strings/token lists of every small size (the exactness
    contract its docstring claims)."""
    import random

    from docling_eval_ray.functions.textmetrics import edit_distance

    def dp(a, b):
        if not a:
            return len(b)
        if not b:
            return len(a)
        prev = list(range(len(b) + 1))
        for i, xa in enumerate(a, 1):
            cur = [i]
            for j, xb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (xa != xb)))
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    for _ in range(1500):
        alpha = "abcd"[: rng.randint(1, 4)]
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
        assert edit_distance(list(a), list(b)) == dp(a, b), (a, b)
    # token lists and >64-length sequences (multi-word bigints)
    for _ in range(300):
        a = [rng.randint(0, 6) for _ in range(rng.randint(0, 150))]
        b = [rng.randint(0, 6) for _ in range(rng.randint(0, 150))]
        assert edit_distance(a, b) == dp(a, b)


def test_meteor_synonym_stage():
    """Stage-3 synonym matching with an injected lexicon: 'car' and
    'automobile' share a synset id, so the pair aligns after exact and
    stem both fail; with the default synsets=None the same pair scores
    0 (stage inert — the oracle-safety default)."""
    import pytest

    from docling_eval_ray.functions.textmetrics import meteor

    lex = {
        "car": frozenset({"auto.n.01"}),
        "automobile": frozenset({"auto.n.01"}),
        "quick": frozenset({"fast.a.01"}),
        "fast": frozenset({"fast.a.01"}),
    }

    def synsets(w):
        return lex.get(w, frozenset())

    ref = "the car is quick".split()
    hyp = "the automobile is fast".split()
    # exact matches: the, is (m=2). synonym stage adds car~automobile,
    # quick~fast -> m=4, perfect in-order alignment, one chunk.
    base = meteor(ref, hyp)
    full = meteor(ref, hyp, synsets=synsets)
    assert full == pytest.approx(1 - 0.5 * (1 / 4) ** 3)
    assert base < full
    # a synonym pair at mismatched positions still aligns (greedy
    # first-free-ref order) and ref tokens are consumed at most once
    got = meteor(["automobile"], ["car", "car"], synsets=synsets)
    m, p, r = 1, 1 / 2, 1 / 1
    fmean = 10 * p * r / (r + 9 * p)
    assert got == pytest.approx(fmean * (1 - 0.5 * (1 / m) ** 3))

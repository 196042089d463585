"""Per-document text metric kernels (pure functions).

Reference semantics (markdown_text_evaluator.py:203-239,
ocr_evaluator.py:145-162): token-set F1/precision/recall, normalized
token edit distance, BLEU (4-gram, brevity penalty), char error rate.
All are plain Python/numpy — they run inside ``map_batches`` over the
(gt_text, pred_text) pairs of a batch.
"""

from __future__ import annotations

import math
import re
from collections import Counter

# module-scope (meteor runs inside worker metric batches; runtime
# relative imports there die on off-repo workers)
from .stemmer import porter_stem

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Word/punctuation tokenizer (stand-in for nltk.word_tokenize /
    BLEU tokenizer_13a: splits words and punctuation marks)."""
    return _TOKEN_RE.findall(text)


def edit_distance(a: list, b: list) -> int:
    """Levenshtein over token (or char) sequences — Myers' bit-parallel
    algorithm (public, Myers JACM 1999 / Hyyrö 2003) on Python big-int
    bitvectors: one O(1)-ish bigint step per element of ``b`` instead
    of an O(len(a)) DP row, ~200× on the per-doc CER path that
    dominated ``evaluation_summary`` (104 ms → 0.5 ms at 600×550
    chars). EXACT — identical to the unit-cost DP (property-tested
    against it in tests/test_metrics.py)."""
    if a == b:
        return 0
    m, n = len(a), len(b)
    if not m:
        return n
    if not n:
        return m
    peq: dict = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    full = (1 << m) - 1
    high = 1 << (m - 1)
    pv = full
    mv = 0
    score = m
    get = peq.get
    for ch in b:
        eq = get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (full & ~(xh | pv))
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & full
        mh = (mh << 1) & full
        pv = mh | (full & ~(xv | ph))
        mv = ph & xv
    return score


def set_prf(true_tokens: list[str], pred_tokens: list[str]) -> dict:
    """Token-SET precision/recall/F1 (reference uses nltk f_measure over
    sets, markdown_text_evaluator.py:218-226)."""
    ts, ps = set(true_tokens), set(pred_tokens)
    if not ts and not ps:
        return {"precision": 1.0, "recall": 1.0, "f1": 1.0}
    inter = len(ts & ps)
    p = inter / len(ps) if ps else 0.0
    r = inter / len(ts) if ts else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f}


def bleu(reference: list[str], hypothesis: list[str],
         max_n: int = 4) -> float:
    """Corpus-of-one BLEU with uniform 4-gram weights and brevity
    penalty (the standard Papineni et al. 2002 definition used by the
    reference's HF `evaluate` metric)."""
    if not hypothesis or not reference:
        return 0.0
    # auto-reweigh: cap the order at the sequence length so short
    # sentences aren't zeroed by missing high-order n-grams
    max_n = min(max_n, len(hypothesis), len(reference))
    log_sum = 0.0
    for n in range(1, max_n + 1):
        h_ngrams = Counter(
            tuple(hypothesis[i : i + n])
            for i in range(len(hypothesis) - n + 1)
        )
        r_ngrams = Counter(
            tuple(reference[i : i + n]) for i in range(len(reference) - n + 1)
        )
        overlap = sum(min(c, r_ngrams[g]) for g, c in h_ngrams.items())
        total = max(1, sum(h_ngrams.values()))
        if overlap == 0:
            return 0.0
        log_sum += math.log(overlap / total) / max_n
    bp = (
        1.0
        if len(hypothesis) >= len(reference)
        else math.exp(1 - len(reference) / len(hypothesis))
    )
    return bp * math.exp(log_sum)


def meteor(reference: list[str], hypothesis: list[str], *,
           stem: bool = True,
           synsets: "Callable[[str], frozenset] | None" = None) -> float:
    """METEOR (Banerjee & Lavie 2005, the public formula the
    reference's nltk meteor_score implements,
    markdown_text_evaluator.py:203-239): unigram alignment → harmonic
    Fmean weighted 9:1 toward recall × a fragmentation penalty
    0.5·(chunks/m)³. Three matcher stages, mirroring nltk's enumeration
    order: exact match first, then Porter-stem match over the leftovers
    (``functions/stemmer.py``), then a synonym stage over what remains —
    two tokens match when their synset-id sets intersect, exactly
    nltk's wordnet-synset rule. The LEXICON is injected via ``synsets``
    (word → frozenset of synset ids): WordNet itself is a licensed
    corpus download this container doesn't ship, so the default is
    ``None`` (stage inert), but the mechanism is implemented and tested
    — plug ``lambda w: frozenset(wn.synsets(w))`` where nltk data
    exists and the reference's full matcher chain is reproduced.
    Alignment per stage is the in-order greedy map, each reference
    token consumed at most once.

    Oracle note: the DuckDB metric CTEs model the exact stage. On the
    driver corpora the stem stage is provably inert — Porter is a
    bijection on the synthetic vocabulary (asserted by
    tests/test_stemmer.py over all three scale factors), so no
    leftover pair can newly match — and the synonym stage is off by
    default, so the hash-match gate holds."""
    if not reference or not hypothesis:
        return 0.0
    # stage 1 — exact: greedy in-order alignment hyp pos -> ref pos
    avail: dict[str, list[int]] = {}
    for j in range(len(reference) - 1, -1, -1):
        avail.setdefault(reference[j], []).append(j)  # ascending pops
    mapping: list[tuple[int, int]] = []
    for i, w in enumerate(hypothesis):
        slots = avail.get(w)
        if slots:
            mapping.append((i, slots.pop()))
    if stem:
        # stage 2 — Porter stems over the UNMATCHED tokens only
        used_h = {i for i, _ in mapping}
        used_r = {j for _, j in mapping}
        savail: dict[str, list[int]] = {}
        for j in range(len(reference) - 1, -1, -1):
            if j not in used_r:
                savail.setdefault(porter_stem(reference[j]), []).append(j)
        extra: list[tuple[int, int]] = []
        for i, w in enumerate(hypothesis):
            if i in used_h:
                continue
            slots = savail.get(porter_stem(w))
            if slots:
                extra.append((i, slots.pop()))
        if extra:
            mapping = sorted(mapping + extra)
    if synsets is not None:
        # stage 3 — synonym overlap over tokens BOTH prior stages left
        # unmatched: hyp token i aligns to the first free ref position j
        # whose synset-id set intersects (nltk's enumeration order —
        # hypothesis outer, reference positions ascending)
        used_h = {i for i, _ in mapping}
        used_r = {j for _, j in mapping}
        free_r = [j for j in range(len(reference)) if j not in used_r]
        extra2: list[tuple[int, int]] = []
        for i, w in enumerate(hypothesis):
            if i in used_h:
                continue
            sw = synsets(w)
            if not sw:
                continue
            for k, j in enumerate(free_r):
                if sw & synsets(reference[j]):
                    extra2.append((i, j))
                    del free_r[k]
                    break
        if extra2:
            mapping = sorted(mapping + extra2)
    m = len(mapping)
    if m == 0:
        return 0.0
    p = m / len(hypothesis)
    r = m / len(reference)
    fmean = 10 * p * r / (r + 9 * p)
    chunks = 1
    for (i0, j0), (i1, j1) in zip(mapping, mapping[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    penalty = 0.5 * (chunks / m) ** 3
    return fmean * (1 - penalty)


def text_metrics(true_txt: str, pred_txt: str) -> dict:
    """The reference's per-doc markdown metric bundle
    (markdown_text_evaluator.py:203-239): bleu, f1, precision, recall,
    normalized token edit distance, meteor."""
    tt, pt = tokenize(true_txt), tokenize(pred_txt)
    out = set_prf(tt, pt)
    denom = max(len(tt), len(pt))
    out["edit_distance"] = edit_distance(pt, tt) / denom if denom else 0.0
    out["bleu"] = bleu(tt, pt)
    out["meteor"] = meteor(tt, pt)
    return out


def cer(true_txt: str, pred_txt: str) -> float:
    """Character error rate = char edit distance / len(reference)
    (reference uses HF evaluate's jiwer CER, ocr_evaluator.py:145-148;
    missing text → 1.0 per ocr_evaluator.py:108-113)."""
    if not true_txt or not pred_txt:
        return 1.0
    return min(1.0, edit_distance(list(pred_txt), list(true_txt))
               / len(true_txt))


def ard_norm(pred_order: list[int], weights: list[float] | None = None
             ) -> tuple[float, float]:
    """Normalized Average Relative Distance of a predicted reading order
    (exact reference formula, readingorder_evaluator.py:229-271):
    ARD_norm = 1 − Σ|pred_k − k| / n²; weighted variant uses bbox-area
    weights."""
    n = len(pred_order)
    if n == 0:
        return 0.0, 0.0
    ard = 0.0
    w_ard = 0.0
    for true_ro, pred_ro in enumerate(pred_order):
        dist = abs(true_ro - pred_ro)
        ard += dist
        if weights is not None:
            w_ard += dist * weights[true_ro]
    n_sq = n * n
    return 1 - ard / n_sq, 1 - w_ard / n_sq

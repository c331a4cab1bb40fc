"""Affine semi-global alignment kernel vs the numpy oracle."""
import random

import numpy as np

from isocon_tpu.ops import oracle
from isocon_tpu.ops.engine import PairEngine


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, n_ops):
    s = list(s)
    for _ in range(n_ops):
        op = rng.choice("SID")
        pos = rng.randrange(len(s)) if s else 0
        if op == "S" and s:
            s[pos] = rng.choice("ACGT")
        elif op == "I":
            s.insert(pos, rng.choice("ACGT"))
        elif op == "D" and len(s) > 1:
            del s[pos]
    return "".join(s)


def check_same_scores(pairs, scores, results):
    """Kernel result must spell the inputs and achieve the oracle's score."""
    from tests.test_oracle import score_alignment

    for (a, b), (ma, mi, go, ge), (a1, a2, stats) in zip(pairs, scores, results):
        assert a1.replace("-", "") == a
        assert a2.replace("-", "") == b
        want1, want2, wstats = oracle.align_semi_global(a, b, ma, mi, go, ge)
        s_got = score_alignment(a1, a2, ma, mi, go, ge)
        s_want = score_alignment(want1, want2, ma, mi, go, ge)
        assert s_got == s_want, (a, b, a1, a2, want1, want2)
        # stats triple must be consistent
        m, x, i = stats
        assert m + x + i == len(a1)


def test_align_related_pairs_both_param_sets():
    rng = random.Random(0)
    eng = PairEngine(batch_pairs=8)
    pairs, scores = [], []
    for _ in range(12):
        a = rand_seq(rng, rng.randrange(40, 160))
        b = mutate(rng, a, rng.randrange(0, 12))
        pairs.append((a, b))
        scores.append((2, -2, 2, 0) if rng.random() < 0.5 else (2, -3, 3, 1))
    res = eng.align_pairs(pairs, scores)
    check_same_scores(pairs, scores, res)


def test_align_exact_alignment_matches_oracle():
    """Beyond score equality: the emitted alignment should equal the
    oracle's when tie-breaking is pinned identically."""
    rng = random.Random(1)
    eng = PairEngine(batch_pairs=4)
    pairs, scores = [], []
    for _ in range(8):
        a = rand_seq(rng, rng.randrange(30, 90))
        b = mutate(rng, a, rng.randrange(1, 8))
        pairs.append((a, b))
        scores.append((2, -2, 2, 0))
    res = eng.align_pairs(pairs, scores)
    for (a, b), (a1, a2, _) in zip(pairs, res):
        w1, w2, _ = oracle.align_semi_global(a, b, 2, -2, 2, 0)
        assert (a1, a2) == (w1, w2), (a, b)


def test_align_length_skew_end_gaps():
    rng = random.Random(2)
    eng = PairEngine(batch_pairs=4)
    a = rand_seq(rng, 120)
    b = a[20:]          # missing prefix -> leading end gap in b
    c = a[:-30]         # missing suffix
    pairs = [(a, b), (a, c), (b, a), (c, a)]
    scores = [(2, -2, 2, 0)] * 4
    res = eng.align_pairs(pairs, scores)
    check_same_scores(pairs, scores, res)
    a1, a2, (m, x, i) = res[0]
    assert m == 100 and x == 0 and i == 20


def test_align_unrelated_band_escalation():
    rng = random.Random(3)
    eng = PairEngine(batch_pairs=4)
    pairs = [(rand_seq(rng, 100), rand_seq(rng, 110)) for _ in range(4)]
    scores = [(2, -3, 3, 1)] * 4
    res = eng.align_pairs(pairs, scores)
    check_same_scores(pairs, scores, res)


def test_align_big_internal_gap():
    """Exon-sized deletions (min_exon_diff=20 regime) must come out as one
    contiguous gap run."""
    rng = random.Random(4)
    eng = PairEngine(batch_pairs=4)
    a = rand_seq(rng, 200)
    b = a[:80] + a[130:]  # 50bp internal deletion
    res = eng.align_pairs([(a, b)], [(2, -2, 2, 0)], ed_hint=[50])
    a1, a2, (m, x, i) = res[0]
    assert i == 50 and x == 0 and m == 150
    assert "-" * 50 in a2

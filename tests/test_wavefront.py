"""Banded wavefront kernel + PairEngine vs the numpy oracle."""
import random

import numpy as np
import pytest

from isocon_tpu.ops import oracle
from isocon_tpu.ops.engine import PairEngine
from isocon_tpu.ops.encode import pad_batch
from isocon_tpu.ops.wavefront import banded_ed, band_certifies


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


def run_kernel(pairs, Wp=128, L=256, hw=False):
    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ed, ej = banded_ed(q, t, qlen, tlen, Wp=Wp, L=L, hw_mode=hw)
    cert = band_certifies(np.asarray(ed), qlen, tlen, Wp, hw_mode=hw)
    return np.asarray(ed), np.asarray(ej), cert


def test_nw_related_pairs():
    rng = random.Random(0)
    pairs = []
    for _ in range(16):
        a = rand_seq(rng, rng.randrange(50, 200))
        b = mutate(rng, a, rng.randrange(0, 20))
        pairs.append((a, b))
    ed, _, cert = run_kernel(pairs)
    for (a, b), d, c in zip(pairs, ed, cert):
        want = oracle.edit_distance(a, b)
        assert c, (len(a), len(b), d)
        assert d == want, (a, b, d, want)


def test_nw_unrelated_pairs_uncertified_or_exact():
    rng = random.Random(1)
    pairs = [(rand_seq(rng, 180), rand_seq(rng, 170)) for _ in range(8)]
    ed, _, cert = run_kernel(pairs)
    for (a, b), d, c in zip(pairs, ed, cert):
        want = oracle.edit_distance(a, b)
        if c:
            assert d == want
        else:
            assert d >= want  # banded value never underestimates


def test_nw_band_escalation_certifies_eventually():
    rng = random.Random(2)
    a = rand_seq(rng, 200)
    b = rand_seq(rng, 200)
    ed, _, cert = run_kernel([(a, b)], Wp=512, L=256)
    assert cert[0]
    assert ed[0] == oracle.edit_distance(a, b)


def test_nw_length_skew():
    rng = random.Random(3)
    a = rand_seq(rng, 100)
    b = a[:40] + a[60:]  # 20bp deletion
    ed, _, cert = run_kernel([(a, b), (b, a)])
    assert cert.all()
    assert ed[0] == ed[1] == oracle.edit_distance(a, b)


def test_nw_identical_and_tiny():
    rng = random.Random(4)
    a = rand_seq(rng, 150)
    pairs = [(a, a), ("A", "A"), ("A", "C"), ("ACGT", "ACGT")]
    ed, _, cert = run_kernel(pairs)
    assert cert.all()
    assert list(ed) == [0, 0, 1, 0]


def test_hw_mode_matches_oracle():
    rng = random.Random(5)
    cases = []
    for _ in range(12):
        t = rand_seq(rng, rng.randrange(80, 200))
        i0 = rng.randrange(0, max(1, len(t) - 60))
        q = mutate(rng, t[i0 : i0 + rng.randrange(40, 60)], rng.randrange(0, 5))
        cases.append((q, t))
    ed, ej, cert = run_kernel(cases, Wp=256, hw=True)
    for (q, t), d, e, c in zip(cases, ed, ej, cert):
        want, _, wend, _ = oracle.edit_distance_hw(q, t)
        if c:
            assert d == want, (q, t, d, want)
            assert e == wend + 1, (q, t, e, wend)
        else:
            assert d >= want


def test_hw_similar_lengths():
    """The get_all_NN use case: candidates of near-equal length
    (end_invariant_functions.py:623-681)."""
    rng = random.Random(6)
    for _ in range(8):
        t = rand_seq(rng, 150)
        q = mutate(rng, t, 4)[3:-2]  # trims ends a bit
        ed, ej, cert = run_kernel([(q, t)], Wp=128, hw=True)
        want, _, wend, _ = oracle.edit_distance_hw(q, t)
        assert cert[0]
        assert ed[0] == want


def test_pair_engine_escalates_and_caps():
    rng = random.Random(7)
    eng = PairEngine(batch_pairs=8)
    pairs = []
    wants = []
    for _ in range(20):
        a = rand_seq(rng, rng.randrange(30, 400))
        if rng.random() < 0.6:
            b = mutate(rng, a, rng.randrange(0, 30))
        else:
            b = rand_seq(rng, rng.randrange(30, 400))
        pairs.append((a, b))
        wants.append(oracle.edit_distance(a, b))
    ed, _ = eng.edit_distances(pairs)
    assert list(ed) == wants
    # with caps: -1 for everything above its cap
    caps = [10] * len(pairs)
    ed2, _ = eng.edit_distances(pairs, k_cap=caps)
    for d, w in zip(ed2, wants):
        assert d == (w if w <= 10 else -1)


def test_pair_engine_hw():
    rng = random.Random(8)
    eng = PairEngine(batch_pairs=4)
    pairs = []
    for _ in range(6):
        t = rand_seq(rng, 300)
        q = mutate(rng, t, 5)[4:-4]
        pairs.append((q, t))
    ed, ej = eng.edit_distances(pairs, hw_mode=True)
    for (q, t), d, e in zip(pairs, ed, ej):
        want, _, wend, _ = oracle.edit_distance_hw(q, t)
        assert d == want
        assert e == wend + 1

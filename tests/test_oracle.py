"""Oracle DPs vs brute-force recursions on tiny random strings."""
import random
from functools import lru_cache

import numpy as np
import pytest

from isocon_tpu.ops import oracle


def brute_ed(a, b):
    @lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
        )

    return d(len(a), len(b))


def brute_sg_score(s1, s2, ma, mi, go, ge):
    """Best affine semi-global score by explicit state DP."""
    NEG = -(10**9)
    n, m = len(s1), len(s2)
    H = [[0] * (m + 1) for _ in range(n + 1)]
    E = [[NEG] * (m + 1) for _ in range(n + 1)]
    F = [[NEG] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            E[i][j] = max(H[i][j - 1] - go, E[i][j - 1] - ge)
            F[i][j] = max(H[i - 1][j] - go, F[i - 1][j] - ge)
            s = ma if s1[i - 1] == s2[j - 1] else mi
            H[i][j] = max(H[i - 1][j - 1] + s, E[i][j], F[i][j])
    return max(max(H[i][m] for i in range(n + 1)), max(H[n][j] for j in range(m + 1)))


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


def test_edit_distance_random():
    rng = random.Random(0)
    for _ in range(40):
        a = rand_seq(rng, rng.randrange(0, 25))
        b = rand_seq(rng, rng.randrange(0, 25))
        assert oracle.edit_distance(a, b) == brute_ed(a, b)


def test_edit_distance_cutoff():
    assert oracle.edit_distance("AAAA", "TTTT", k=2) == -1
    assert oracle.edit_distance("AAAA", "AATA", k=2) == 1


def test_edit_distance_related():
    rng = random.Random(1)
    for _ in range(10):
        a = rand_seq(rng, 200)
        b = mutate(rng, a, 7)
        assert oracle.edit_distance(a, b) == brute_ed(a, b)


def test_nw_unit_alignment_roundtrip():
    rng = random.Random(2)
    for _ in range(20):
        a = rand_seq(rng, rng.randrange(1, 40))
        b = mutate(rng, a, 4)
        ed, ops = oracle.nw_unit_alignment(a, b)
        assert ed == brute_ed(a, b)
        # ops must spell out both sequences and count ed
        ia = ib = cost = 0
        for op in ops:
            if op in "=X":
                cost += op == "X"
                ia += 1
                ib += 1
            elif op == "I":
                cost += 1
                ia += 1
            else:
                cost += 1
                ib += 1
        assert (ia, ib, cost) == (len(a), len(b), ed)


def test_hw_mode_substring():
    ed, start, end, ops = oracle.edit_distance_hw("ACGT", "TTTACGTTTT")
    assert ed == 0
    assert (start, end) == (3, 6)
    assert ops == "===="


def test_hw_mode_with_errors():
    # query has one substitution vs an infix of target
    ed, start, end, ops = oracle.edit_distance_hw("ACGA", "GGACGTGG")
    assert ed == 1
    assert start == 2


def test_align_semi_global_score_matches_brute():
    rng = random.Random(3)
    for _ in range(25):
        a = rand_seq(rng, rng.randrange(1, 18))
        b = rand_seq(rng, rng.randrange(1, 18))
        for (ma, mi, go, ge) in [(2, -3, 2, 0), (2, -3, 3, 1), (2, -1, 2, 0)]:
            a1, a2, (mat, mis, ind) = oracle.align_semi_global(a, b, ma, mi, go, ge)
            # recompute score of the emitted alignment (end gaps free)
            score = score_alignment(a1, a2, ma, mi, go, ge)
            assert score == brute_sg_score(a, b, ma, mi, go, ge), (a, b, a1, a2)
            # alignment spells the inputs
            assert a1.replace("-", "") == a
            assert a2.replace("-", "") == b


def score_alignment(a1, a2, ma, mi, go, ge):
    # Free end gaps are a single run per end, in ONE sequence (sg semantics:
    # alignments start on the first row or column of the DP, not both).
    L = len(a1)
    start, end = 0, L
    if L:
        if a1[0] == "-":
            while start < L and a1[start] == "-":
                start += 1
        elif a2[0] == "-":
            while start < L and a2[start] == "-":
                start += 1
        if a1[-1] == "-":
            while end > start and a1[end - 1] == "-":
                end -= 1
        elif a2[-1] == "-":
            while end > start and a2[end - 1] == "-":
                end -= 1
    score = 0
    gap_state = None  # None | "1" (gap in a1) | "2" (gap in a2)
    for x, y in zip(a1[start:end], a2[start:end]):
        if x == "-":
            score -= ge if gap_state == "1" else go
            gap_state = "1"
        elif y == "-":
            score -= ge if gap_state == "2" else go
            gap_state = "2"
        else:
            gap_state = None
            score += ma if x == y else mi
    return score

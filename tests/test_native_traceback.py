"""Native C++ banded HW traceback must match the numpy oracle exactly."""
import random

import pytest

from isocon_tpu.native import hw_banded_traceback, native_available
from isocon_tpu.ops import oracle


def mutate(rng, s, n_ops):
    s = list(s)
    for _ in range(n_ops):
        op = rng.choice("sid")
        p = rng.randrange(len(s))
        if op == "s":
            s[p] = rng.choice([c for c in "ACGT" if c != s[p]])
        elif op == "i":
            s.insert(p, rng.choice("ACGT"))
        else:
            del s[p]
    return "".join(s)


@pytest.mark.skipif(not native_available(), reason="no native lib")
def test_native_hw_matches_oracle():
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randrange(50, 400)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        # query = infix of t, mutated
        a = rng.randrange(0, n // 3)
        b = rng.randrange(2 * n // 3, n)
        q = mutate(rng, t[a:b], rng.randrange(0, 12))
        got = hw_banded_traceback(q, t, band=64)
        want = oracle.edit_distance_hw_banded(q, t, band=64)
        assert got == want, (trial, got, want)


@pytest.mark.skipif(not native_available(), reason="no native lib")
def test_native_hw_uncertified_band():
    # wildly different sequences: tiny band cannot certify -> both None
    q = "A" * 200
    t = "C" * 200
    assert hw_banded_traceback(q, t, band=8) is None
    assert oracle.edit_distance_hw_banded(q, t, band=8) is None


def test_hw_traceback_batch_matches_oracle():
    """The threaded batch confirm API must agree with the single-pair
    oracle on distance, span, and ops (including band escalation and the
    n>m / empty edge cases)."""
    import random

    from isocon_tpu.native import hw_traceback_batch, native_available
    from isocon_tpu.ops import oracle

    rng = random.Random(31)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for i in range(80):
        t = rs(rng.randrange(50, 400))
        if i % 4 == 0:
            a, b = sorted(rng.sample(range(len(t)), 2))
            q = t[a:b + 1] or t[:5]
        elif i % 4 == 1:
            q = rs(rng.randrange(20, 500))  # unrelated, may exceed len(t)
        elif i % 4 == 2:
            ql = list(t)
            for p in rng.sample(range(len(t)), len(t) // 8):
                ql[p] = rng.choice("ACGT")
            q = "".join(ql)
        else:
            q = t + rs(rng.randrange(1, 40))  # n > m
        pairs.append((q, t))
    pairs.append(("", "ACGT"))
    pairs.append(("ACGT", ""))

    res = hw_traceback_batch(pairs)
    assert len(res) == len(pairs)
    for (q, t), (ed, s0, e0, ops) in zip(pairs, res):
        want_ed, want_s0, want_e0, want_ops = oracle.edit_distance_hw(q, t) \
            if (q and t) else oracle.edit_distance_hw(q, t)
        assert ed == want_ed, (len(q), len(t), ed, want_ed)
        if native_available():
            # span/ops tie rules are pinned to the oracle
            assert (s0, e0, ops) == (want_s0, want_e0, want_ops), (
                len(q), len(t))


def test_hw_traceback_batch_ed_hints():
    """Band hints from a distance prefilter must not change results:
    exact hints certify immediately, too-small hints escalate internally."""
    import random

    from isocon_tpu.native import hw_traceback_batch
    from isocon_tpu.ops import oracle

    rng = random.Random(47)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for i in range(40):
        t = rs(rng.randrange(80, 300))
        ql = list(t)
        for p in rng.sample(range(len(t)), rng.randrange(0, len(t) // 6)):
            ql[p] = rng.choice("ACGT")
        pairs.append(("".join(ql), t))
    want = [oracle.edit_distance_hw(q, t) for q, t in pairs]
    exact = [w[0] for w in want]
    res_exact = hw_traceback_batch(pairs, ed_hint=exact)
    res_small = hw_traceback_batch(pairs, ed_hint=[max(0, e - 3)
                                                  for e in exact])
    res_none = hw_traceback_batch(pairs)
    assert res_exact == res_none == res_small == want

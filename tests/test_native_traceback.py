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

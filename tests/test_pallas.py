"""Pallas kernel == lax.scan kernel (interpret mode on CPU; the bench and
hardware spot-checks cover the compiled TPU path)."""
import random

import numpy as np

from isocon_tpu.ops.encode import pad_batch
from isocon_tpu.ops.wavefront import banded_ed
from isocon_tpu.ops.wavefront_pallas import banded_ed_pallas


def make_pairs(seed, n):
    rng = random.Random(seed)

    def rs(k):
        return "".join(rng.choice("ACGT") for _ in range(k))

    def mut(s, k):
        s = list(s)
        for _ in range(k):
            op = rng.choice("SID")
            p = rng.randrange(len(s))
            if op == "S":
                s[p] = rng.choice("ACGT")
            elif op == "I":
                s.insert(p, rng.choice("ACGT"))
            elif len(s) > 1:
                del s[p]
        return "".join(s)

    pairs = []
    for _ in range(n):
        a = rs(rng.randrange(40, 250))
        b = mut(a, rng.randrange(0, 40)) if rng.random() < 0.8 else rs(200)
        pairs.append((a, b))
    return pairs


def test_pallas_matches_scan_nw_and_hw():
    pairs = make_pairs(0, 128)
    q, qlen = pad_batch([a for a, _ in pairs], 256)
    t, tlen = pad_batch([b for _, b in pairs], 256)
    e1, _ = banded_ed(q, t, qlen, tlen, Wp=128, L=256, small=True)
    e2, _ = banded_ed_pallas(q, t, qlen, tlen, Wp=128, L=256, interpret=True)
    assert (np.asarray(e1) == np.asarray(e2)).all()

    h1, ej1 = banded_ed(q, t, qlen, tlen, Wp=128, L=256, small=True,
                        hw_mode=True)
    h2, ej2 = banded_ed_pallas(q, t, qlen, tlen, Wp=128, L=256, hw_mode=True,
                               interpret=True)
    assert (np.asarray(h1) == np.asarray(h2)).all()
    assert (np.asarray(ej1) == np.asarray(ej2)).all()

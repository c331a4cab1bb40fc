"""Bit-parallel Myers VPU kernel vs oracle (interpret mode)."""
import random

import numpy as np

from isocon_tpu.ops import oracle
from isocon_tpu.ops.encode import pad_batch
from isocon_tpu.ops.myers_pallas import myers_certifies, myers_ed_pallas


def test_myers_kernel_certified_exact():
    rng = random.Random(0)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mut(s, k, maxlen):
        s = list(s)
        for _ in range(k):
            op = rng.choice("SID")
            p = rng.randrange(len(s))
            if op == "S":
                s[p] = rng.choice("ACGT")
            elif op == "I" and len(s) < maxlen:
                s.insert(p, rng.choice("ACGT"))
            elif len(s) > 1:
                del s[p]
        return "".join(s)

    B, L = 1024, 256
    pairs = []
    for i in range(B):
        a = rs(rng.randrange(80, 250))
        b = mut(a, rng.randrange(0, 40), L) if i % 4 else rs(rng.randrange(80, 250))
        pairs.append((a, b))
    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ed = np.asarray(myers_ed_pallas(q, t, qlen, tlen, L=L, interpret=True))
    cert = myers_certifies(ed, qlen, tlen)
    assert cert.mean() > 0.8
    checked = 0
    for i in range(0, B, 11):
        if cert[i]:
            checked += 1
            want = oracle.edit_distance(pairs[i][0], pairs[i][1])
            assert ed[i] == want, (i, ed[i], want)
    assert checked > 50

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


def test_myers_pool_gather_matches_dense():
    """The pool-gather entry must agree with the dense entry pair-for-pair."""
    rng = random.Random(3)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    L = 256
    uniq = [rs(rng.randrange(100, 240)) for _ in range(50)]
    B = 1024
    ia = np.array([rng.randrange(len(uniq)) for _ in range(B)], np.int32)
    ib = np.array([rng.randrange(len(uniq)) for _ in range(B)], np.int32)
    pool, plens = pad_batch(uniq, L)
    from isocon_tpu.ops.myers_pallas import myers_ed_pool

    got = np.asarray(
        myers_ed_pool(pool.reshape(-1), plens, ia, ib, L=L, interpret=True)
    )
    q, qlen = pad_batch([uniq[i] for i in ia], L)
    t, tlen = pad_batch([uniq[i] for i in ib], L)
    want = np.asarray(myers_ed_pallas(q, t, qlen, tlen, L=L, interpret=True))
    assert (got == want).all()


def test_seq_pool_delta_push():
    """Device pool content stays correct across incremental delta pushes."""
    from isocon_tpu.ops.encode import encode_seq
    from isocon_tpu.ops.engine import _SeqPool

    rng = random.Random(5)
    pool = _SeqPool(64)
    enc = encode_seq

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    seqs = [rs(rng.randrange(10, 60)) for _ in range(30)]
    for s in seqs[:10]:
        pool.intern(s, enc)
    m1, l1 = pool.device_arrays()
    for s in seqs[10:]:
        pool.intern(s, enc)
    m2, l2 = pool.device_arrays()   # delta push
    got = np.asarray(m2).reshape(-1, 64)
    lens = np.asarray(l2)
    for s in seqs:
        r = pool.rows[s]
        e = enc(s)
        assert lens[r] == len(s)
        assert (got[r, : len(e)] == e).all(), s


def test_seq_pool_reserved_beyond_host_cap():
    """A reserved row floor above the host arrays' capacity must still
    produce a correct device pool across delta pushes.

    Regression: with ``min_rows`` > the lazily-grown host capacity,
    ``device_arrays`` shipped a TRUNCATED buffer (mat[:R] of a shorter
    mat) and later delta offsets past its end were clamped by
    dynamic_update_slice, silently corrupting rows -- every ED against a
    corrupted row came back wrong and the 50k-read NN search escalated
    its k rounds forever (round-5 scale run)."""
    from isocon_tpu.ops.encode import encode_seq
    from isocon_tpu.ops.engine import _SeqPool

    rng = random.Random(7)
    L = 64
    pool = _SeqPool(L, min_rows=20000)  # R ladder -> 65536 >> host cap 4096
    enc = encode_seq

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    seqs = [rs(rng.randrange(10, 60)) for _ in range(6000)]
    for s in seqs[:3000]:
        pool.intern(s, enc)
    m1, _l1 = pool.device_arrays()
    assert np.asarray(m1).size == 65536 * L
    for s in seqs[3000:]:  # crosses the original 4096-row host cap
        pool.intern(s, enc)
    m2, l2 = pool.device_arrays()  # delta push into the reserved buffer
    got = np.asarray(m2).reshape(-1, L)
    lens = np.asarray(l2)
    for s in seqs[::97] + seqs[-5:]:
        r = pool.rows[s]
        e = enc(s)
        assert lens[r] == len(s)
        assert (got[r, : len(e)] == e).all(), s


def test_engine_myers_window_escalation():
    """Band escalation stays on the Myers pool path: pairs whose ED is
    uncertifiable at win=7 (radius 96) certify at win=9 and must match the
    oracle through the engine."""
    import random

    from isocon_tpu.ops import oracle
    from isocon_tpu.ops.engine import PairEngine

    rng = random.Random(17)
    pairs = []
    for _ in range(6):
        a = "".join(rng.choice("ACGT") for _ in range(300))
        b = list(a)
        # ~140 substitutions: ed in (96, 128] certifies only at win >= 9
        for p in rng.sample(range(300), 140):
            b[p] = rng.choice([c for c in "ACGT" if c != b[p]])
        pairs.append((a, "".join(b)))

    eng = PairEngine(batch_pairs=128, use_pallas=True, ed_batch=512,
                     interpret=True)
    eng.pallas_L0 = 512
    eds, _ = eng.edit_distances(pairs)
    for (a, b), d in zip(pairs, eds):
        want = oracle.edit_distance(a, b)
        assert d == want, (d, want)
        assert want > 96  # really exercised the win=9 escalation


def test_myers_hw_kernel_matches_oracle():
    """HW (infix) mode: certified results equal the oracle's distance AND
    smallest-minimum end position; uncertified results respect the
    escalation floor (true ed > floor)."""
    from isocon_tpu.ops.myers_pallas import (
        myers_certifies_hw, myers_hw_pallas)

    rng = random.Random(11)

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
        t = rs(rng.randrange(100, 250))
        mode = i % 6
        if mode == 0:  # exact substring: HW distance 0
            a, b = sorted(rng.sample(range(len(t)), 2))
            q = t[a:b + 1] or t[:5]
        elif mode == 1:  # mutated substring
            a, b = sorted(rng.sample(range(len(t)), 2))
            q = mut(t[a:b + 1] or t[:20], rng.randrange(0, 12), L - 4)
        elif mode == 2:  # query longer than target (n > m)
            q = mut(t + rs(rng.randrange(1, 25)),
                    rng.randrange(0, 6), L - 4)[:L - 4]
        elif mode == 3:  # comparable, noisy
            q = mut(t, rng.randrange(0, 30), L - 4)
        elif mode == 4:  # unrelated
            q = rs(rng.randrange(40, 240))
        else:  # tiny query
            q = rs(rng.randrange(1, 12))
        pairs.append((q, t))
    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ed, ej = myers_hw_pallas(q, t, qlen, tlen, L=L, interpret=True)
    ed, ej = np.asarray(ed), np.asarray(ej)
    cert = myers_certifies_hw(ed, qlen, tlen)
    assert cert.mean() > 0.3
    margin = 96  # win=7
    checked = 0
    for i in range(0, B, 7):
        want, _s0, e0, _ops = oracle.edit_distance_hw(*pairs[i])
        if cert[i]:
            checked += 1
            assert ed[i] == want, (i, ed[i], want)
            assert ej[i] == e0 + 1, (i, ej[i], e0 + 1)
        else:
            delta = int(tlen[i]) - int(qlen[i])
            floor = min(margin, (margin - max(delta, 0)) // 2)
            assert want > floor, (i, want, floor)
    assert checked > 30


def test_engine_hw_myers_path_matches_oracle():
    """engine.edit_distances(hw_mode=True) through the Myers pool path
    (use_pallas + interpret, native routing disabled by batch size) must
    match the oracle, including pairs that escalate past win=7."""
    import os

    from isocon_tpu.ops.engine import PairEngine

    rng = random.Random(23)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    pairs = []
    for i in range(300):
        t = rs(rng.randrange(150, 400))
        if i % 3 == 0:
            a, b = sorted(rng.sample(range(len(t)), 2))
            q = t[a:b + 1] or t[:10]
        elif i % 3 == 1:
            q = rs(rng.randrange(100, 400))
        else:
            ql = list(t)
            for p in rng.sample(range(len(t)), len(t) // 10):
                ql[p] = rng.choice("ACGT")
            q = "".join(ql)
        pairs.append((q, t))

    os.environ["ISOCON_NO_NATIVE"] = "1"
    try:
        eng = PairEngine(batch_pairs=128, use_pallas=True, ed_batch=1024,
                         interpret=True)
        eng.pallas_L0 = 512
        eds, ejs = eng.edit_distances(pairs, hw_mode=True)
    finally:
        del os.environ["ISOCON_NO_NATIVE"]
    for (q, t), d, ej in zip(pairs, eds, ejs):
        want, _s0, e0, _ops = oracle.edit_distance_hw(q, t)
        assert d == want, (len(q), len(t), d, want)
        assert ej == e0 + 1, (len(q), len(t), ej, e0 + 1)


def test_myers_hw_sub16_packing():
    """The engine runs HW mode at sub=16 for Lb<=2048; the wider sublane
    packing must agree with the oracle too (one 2048-pair block)."""
    from isocon_tpu.ops.myers_pallas import (
        myers_certifies_hw, myers_hw_pallas)

    rng = random.Random(29)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    B, L = 2048, 256
    pairs = []
    for i in range(B):
        t = rs(rng.randrange(100, 250))
        if i % 3 == 0:
            a, b = sorted(rng.sample(range(len(t)), 2))
            q = t[a:b + 1] or t[:6]
        elif i % 3 == 1:
            ql = list(t)
            for p in rng.sample(range(len(t)), len(t) // 12):
                ql[p] = rng.choice("ACGT")
            q = "".join(ql)
        else:
            q = (t + rs(20))[:L - 4]  # n > m
        pairs.append((q, t))
    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ed, ej = myers_hw_pallas(q, t, qlen, tlen, L=L, interpret=True, sub=16)
    ed, ej = np.asarray(ed), np.asarray(ej)
    cert = myers_certifies_hw(ed, qlen, tlen)
    checked = 0
    for i in range(0, B, 13):
        if not cert[i]:
            continue
        want, _s0, e0, _ops = oracle.edit_distance_hw(*pairs[i])
        assert ed[i] == want and ej[i] == e0 + 1, (i, ed[i], ej[i], want, e0)
        checked += 1
    assert checked > 60

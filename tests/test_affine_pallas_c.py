"""Compacted-parity Pallas affine kernel vs the lax.scan reference.

Same contract as test_affine_pallas.py: scores, endpoints, overflow and
decoded alignments must agree pair-for-pair with ``sg_align_with_ops``
(itself pinned to the numpy oracle).  Extra geometry case: Wp=512 (the
first band-escalation width).
"""
import random

import numpy as np

from isocon_tpu.ops.affine import ops_to_alignment, sg_align_with_ops
from isocon_tpu.ops.affine_pallas_c import (sg_align_pool_pallas_c,
                                            sg_align_with_ops_pallas_c,
                                            split_fused_out, unpack_ops)
from isocon_tpu.ops.encode import pad_batch


def make_pairs(rng, B, L):
    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mut(s, k):
        s = list(s)
        for _ in range(k):
            op = rng.choice("SID")
            p = rng.randrange(len(s))
            if op == "S":
                s[p] = rng.choice("ACGT")
            elif op == "I" and len(s) < L - 1:
                s.insert(p, rng.choice("ACGT"))
            elif len(s) > 2:
                del s[p]
        return "".join(s)

    pairs = []
    for i in range(B):
        a = rs(rng.randrange(60, L - 60))
        if i % 5 == 0:
            b = rs(rng.randrange(60, L - 60))   # unrelated
        elif i % 5 == 1:
            b = a[rng.randrange(0, 20):][:max(10, len(a) - rng.randrange(0, 20))]
            b = mut(b, rng.randrange(0, 6))     # clipped ends
        else:
            b = mut(a, rng.randrange(0, 25))
        pairs.append((a, b))
    return pairs


def _check(pairs, B, L, Wp, mi=None, ge=None):
    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ma = np.full(B, 2, np.int16)
    if mi is None:
        mi = np.full(B, -2, np.int16)
    go = np.full(B, 2, np.int16)
    if ge is None:
        ge = np.full(B, 0, np.int16)

    ref = sg_align_with_ops(q, t, qlen, tlen, ma, mi, go, ge, Wp=Wp, L=L)
    got = sg_align_with_ops_pallas_c(q, t, qlen, tlen, ma, mi, go, ge,
                                     Wp=Wp, L=L, interpret=True)
    r_best, r_ei, r_ej, r_ops, r_fi, r_fj, r_ov = [np.asarray(x) for x in ref]
    g_best, g_ei, g_ej, g_ops, g_fi, g_fj, g_ov = [np.asarray(x) for x in got]

    np.testing.assert_array_equal(g_ov, r_ov)
    ok = ~r_ov
    np.testing.assert_array_equal(g_best[ok], r_best[ok])
    np.testing.assert_array_equal(g_ei[ok], r_ei[ok])
    np.testing.assert_array_equal(g_ej[ok], r_ej[ok])
    np.testing.assert_array_equal(g_fi[ok], r_fi[ok])
    np.testing.assert_array_equal(g_fj[ok], r_fj[ok])
    for i in range(B):
        if r_ov[i]:
            continue
        a, b = pairs[i]
        want = ops_to_alignment(r_ops[i], a, b, int(r_ei[i]), int(r_ej[i]),
                                int(r_fi[i]), int(r_fj[i]))
        have = ops_to_alignment(g_ops[i], a, b, int(g_ei[i]), int(g_ej[i]),
                                int(g_fi[i]), int(g_fj[i]))
        assert have == want, i


def test_affine_pallas_c_matches_scan():
    rng = random.Random(11)
    B, L, Wp = 128, 256, 256
    pairs = make_pairs(rng, B, L)
    mi = np.array([(-1, -2, -4)[i % 3] for i in range(B)], np.int16)
    ge = np.array([0, 1] * (B // 2), np.int16)
    _check(pairs, B, L, Wp, mi=mi, ge=ge)


def test_affine_pallas_c_wide_band():
    rng = random.Random(7)
    B, L, Wp = 32, 256, 512
    pairs = make_pairs(rng, B, L)
    _check(pairs, B, L, Wp)


def test_affine_pallas_c_wp1024_geometry():
    # Wp=1024 flips _geometry to CHF=8/CHW=16; pin that path too.
    rng = random.Random(31)
    B, L, Wp = 16, 512, 1024
    pairs = make_pairs(rng, B, L)
    _check(pairs, B, L, Wp)


def test_affine_pallas_c_multi_refill():
    # L=512 -> 1023 diagonals -> multiple 256-step window refills.
    rng = random.Random(13)
    B, L, Wp = 32, 512, 256
    pairs = make_pairs(rng, B, L)
    _check(pairs, B, L, Wp)


def test_affine_pool_c_packed_matches():
    rng = random.Random(23)
    B, L, Wp = 128, 256, 256
    pairs = make_pairs(rng, B, L)
    uniq = sorted({s for p in pairs for s in p})
    rows = {s: i for i, s in enumerate(uniq)}
    pad_rows = 1 << (len(uniq) - 1).bit_length()
    pool, plens = pad_batch(uniq + [""] * (pad_rows - len(uniq)), L)
    ia = np.array([rows[a] for a, _ in pairs], np.int32)
    ib = np.array([rows[b] for _, b in pairs], np.int32)
    ma = np.full(B, 2, np.int16)
    mi = np.full(B, -2, np.int16)
    go = np.full(B, 2, np.int16)
    ge = np.full(B, 0, np.int16)

    q, qlen = pad_batch([a for a, _ in pairs], L)
    t, tlen = pad_batch([b for _, b in pairs], L)
    ref = sg_align_with_ops_pallas_c(q, t, qlen, tlen, ma, mi, go, ge,
                                     Wp=Wp, L=L, interpret=True)
    r = [np.asarray(x) for x in ref]

    got = sg_align_pool_pallas_c(pool.reshape(-1), plens, ia, ib, ma, mi,
                                 go, ge, Wp=Wp, L=L, interpret=True)
    scal = np.asarray(got[0])
    ops_unpacked = unpack_ops(np.asarray(got[1]))
    np.testing.assert_array_equal(ops_unpacked, r[3])
    for row, k in zip(range(6), (0, 1, 2, 4, 5, 6)):
        np.testing.assert_array_equal(scal[row], r[k].astype(np.int32))

    # fused single-buffer wire format
    (buf,) = sg_align_pool_pallas_c(pool.reshape(-1), plens, ia, ib, ma, mi,
                                    go, ge, Wp=Wp, L=L, interpret=True,
                                    fuse_out=True)
    scal2, ops2 = split_fused_out(np.asarray(buf), B)
    np.testing.assert_array_equal(scal2, scal)
    np.testing.assert_array_equal(ops2, ops_unpacked)

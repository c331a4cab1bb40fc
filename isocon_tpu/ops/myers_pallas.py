"""Bit-parallel Myers edit distance on the VPU (Pallas TPU kernel).

The wavefront kernels pay cross-lane shifts per DP diagonal; this kernel
eliminates cross-lane work entirely with Myers' bit-vector formulation
(Myers 1999 / Hyyro 2003): DP columns are vertical-delta bit vectors packed
32 rows per uint32 word, and one text character advances 32 rows with ~16
elementwise int32 ops -- the intra-word carry is a native integer add.
Lanes x sublanes hold 1024 independent pairs ([8, 128] per word), so every
op is a full-vreg elementwise instruction.

Banding: a 5-word (160-row) window follows the diagonal.  Phases of 32 text
chars form a *python-unrolled* loop, so active word indices are static; the
window advances one word per phase with W0(p) = clamp(p-2, 0, nwords-5),
guaranteeing rows [j-64, j+64] stay active.  The window top feeds hin=+1
(exact at row 0, a monotone upper bound after -- the same
certify-or-escalate contract as the wavefront kernels); fresh bottom words
enter as all-(+1) vertical deltas.

Answer extraction (per-pair (n, m) endpoints, n <= m enforced by a host
swap -- ED is symmetric):
  * S(j) = D[j][j] is tracked incrementally: S(j) - S(j-1) = the vertical
    delta bit (row j, column j-1 state) plus the horizontal delta bit
    (row j, fresh Ph/Mh of column j); within phase p, row j lives at the
    static window word p, bit s = (j-1) % 32.
  * at column n the lane latches base = D[n][n];
  * for columns n < c <= m the lane accumulates the horizontal delta of
    row n (per-pair word/bit select over the window's fresh Ph/Mh planes);
  * final D[n][m] = base + walk.

Certified exact iff 0 <= delta <= 63 (after swap) and (v + delta)/2 <= 64
and (v - delta)/2 <= 64; everything else escalates to the wavefront int16
kernel.

Alphabet: codes {0,1,2,3,5} have Peq planes (ACGT + N, matching edlib's
identical-character rule); other codes never match.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024          # default pairs per grid step (SUB * LANES)
SUB = 8   # sublane rows per word plane; raise to pack more pairs per op
LANES = 128
PLANES = (0, 1, 2, 3, 5)
WIN = 7               # active words (224 rows; certification radius 96)

ONES = np.uint32(0xFFFFFFFF)


def _kernel(peq_ref, text_ref, nlen_ref, mlen_ref, nword_ref, nbit_ref,
            out_ref, *refs, L: int, SUB: int, WIN: int, HW: bool = False):
    """peq_ref: [len(PLANES) * nwords * SUB, LANES] uint32
    text_ref: [L * SUB, LANES] int8 codes
    nlen/mlen: [SUB, LANES] int32 (n <= m enforced by a host swap in NW
      mode; HW mode is asymmetric and takes the pair as given)
    nword/nbit: [SUB, LANES] int32 -- word index (n-1)//32 and a uint32
      single-bit mask 1 << ((n-1)%32) for the row-n walk
    out_ref: [SUB, LANES] int32 final D[n][m] (NW) / min_j D[n][j] (HW)
    refs: HW mode only -- ej_ref [SUB, LANES] int32, the 1-indexed end
      column of the smallest minimum (0 = empty target span), matching
      ``oracle.edit_distance_hw``'s smallest-end tie rule.

    The band state (WIN pv/mv word planes) lives entirely in the fori-loop
    carry: the window advances monotonically, so a departing word is never
    read again and fresh words enter as all-(+1) deltas -- no VMEM state
    traffic at all.  Phases are a fori_loop (not python-unrolled), keeping
    the compiled program O(WIN) instead of O(nphases*WIN); executable
    load/compile over a thin host link scales with program size and is the
    dominant fixed cost of small pipeline runs.

    HW (infix / free-target-start) mode (``end_invariant_functions.py:
    593-621``'s edlib mode="HW"): row 0 of the DP is all-zero, realized by
    feeding hin=0 while the window top still sits at row 0; once the window
    advances, the +1 top feed makes every value a monotone upper bound --
    the same certify-or-escalate contract as NW.  The answer is
    min_{j} D[n][j]: the kernel integrates W(j) = sum of row-n horizontal
    deltas (gated to columns where row n's word is in-window -- a
    contiguous span covering [n-margin, n+margin]), anchors at
    D[n][n] (the sdiag latch), and tracks the masked running min of W over
    j in [max(n-margin, 1), m]; then D[n][j*] = D[n][n] + W(j*) - W(n).
    The delete-whole-query endpoint D[n][0] = n competes at the end.
    Certified iff v <= margin and max(m-n, 0) + 2v <= margin
    (``myers_certifies_hw``, mirroring ``band_certifies``' HW rule), so
    escalation semantics match the wavefront path it replaces.
    """
    nwords = L // 32

    nlen = nlen_ref[:]
    mlen = mlen_ref[:]
    # dynamic sweep bound: one static compiled shape (L), but each block
    # stops at its own longest target -- answers are complete once column
    # max(m) has been processed (HW also needs column n for the anchor)
    if HW:
        nphases = (jnp.max(jnp.maximum(mlen, nlen)) + 31) // 32
    else:
        nphases = (jnp.max(mlen) + 31) // 32
    nword = nword_ref[:]
    nbit = nbit_ref[:].astype(jnp.uint32)

    ones = jnp.full((SUB, LANES), ONES, jnp.uint32)
    zeros = jnp.zeros((SUB, LANES), jnp.uint32)
    one = jnp.full((SUB, LANES), 1, jnp.uint32)
    margin = 32 * (WIN // 2)
    if HW:
        jlow = jnp.maximum(nlen - margin, 1)
        WBIG = jnp.full((SUB, LANES), 1 << 29, jnp.int32)

    def run_phase(p, carry):
        """One 32-char phase; p is traced (the phase loop is a fori_loop so
        the compiled program stays O(WIN) -- executable load/compile over a
        thin host link scales with program size and dominates the fixed cost
        of small runs).  W0/dslot/advance derive from p; the window rotation
        and diagonal-word reads become cheap vselects."""
        if HW:
            sdiag, base, walk, wn, wmin, wj, pvs, mvs = carry
        else:
            sdiag, base, walk, pvs, mvs = carry
        W0 = jnp.clip(p - (WIN // 2), 0, nwords - WIN)
        dslot = p - W0  # window slot holding the diagonal word
        advance = (p >= (WIN // 2) + 1) & (p <= nwords - WIN + (WIN // 2))
        pvs = tuple(
            jnp.where(advance, pvs[k + 1] if k + 1 < WIN else ones, pvs[k])
            for k in range(WIN)
        )
        mvs = tuple(
            jnp.where(advance, mvs[k + 1] if k + 1 < WIN else zeros, mvs[k])
            for k in range(WIN)
        )
        # per-phase constants, hoisted out of the 32-char inner loop: the
        # window's Peq planes and the row-n word masks
        peqs = [
            [peq_ref[pl.ds((ci * nwords) * SUB + (W0 + k) * SUB, SUB), :]
             for ci in range(len(PLANES))]
            for k in range(WIN)
        ]
        is_nrow = [nword == W0 + k for k in range(WIN)]

        def char_step(s, carry):
            if HW:
                sdiag, base, walk, wn, wmin, wj, pvs, mvs = carry
            else:
                sdiag, base, walk, pvs, mvs = carry
            j = 32 * p + s + 1        # 1-indexed column
            trow = text_ref[pl.ds((32 * p + s) * SUB, SUB), :].astype(
                jnp.int32)
            su = s.astype(jnp.uint32)
            # hoist the 5 per-char code comparisons out of the word loop
            # (one cmp each instead of one per window word)
            cmask = [trow == PLANES[ci] for ci in range(len(PLANES))]

            # vertical delta at (row j, column j-1): bit s of the diagonal
            # word (slot select)
            pv_d = zeros
            mv_d = zeros
            for k in range(WIN):
                pv_d = jnp.where(k == dslot, pvs[k], pv_d)
                mv_d = jnp.where(k == dslot, mvs[k], mv_d)
            vplus = (jnp.right_shift(pv_d, su) & jnp.uint32(1)).astype(
                jnp.int32)
            vminus = (jnp.right_shift(mv_d, su) & jnp.uint32(1)).astype(
                jnp.int32)
            sdiag = sdiag + vplus - vminus

            if HW:
                # hin = 0 while the window top is the true row 0 (free
                # target start); +1 (upper bound) once it has advanced
                hp = jnp.where(W0 == 0, zeros, one)
            else:
                hp = one  # hin = +1 at window top
            hm = zeros
            ph_diag = zeros
            mh_diag = zeros
            hsel_p = zeros
            hsel_m = zeros
            new_pvs = []
            new_mvs = []
            for k in range(WIN):
                pv = pvs[k]
                mv = mvs[k]
                eq = zeros
                for ci in range(len(PLANES)):
                    eq = jnp.where(cmask[ci], peqs[k][ci], eq)

                xv = eq | mv
                eq = eq | hm
                xh = (((eq & pv) + pv) ^ pv) | eq
                ph = mv | ~(xh | pv)
                mh = pv & xh
                ph_diag = jnp.where(k == dslot, ph, ph_diag)
                mh_diag = jnp.where(k == dslot, mh, mh_diag)
                hsel_p = jnp.where(is_nrow[k], ph, hsel_p)
                hsel_m = jnp.where(is_nrow[k], mh, hsel_m)
                hout_p = jnp.right_shift(ph, jnp.uint32(31))
                hout_m = jnp.right_shift(mh, jnp.uint32(31))
                ph = jnp.left_shift(ph, jnp.uint32(1)) | hp
                mh = jnp.left_shift(mh, jnp.uint32(1)) | hm
                new_pvs.append(mh | ~(xv | ph))
                new_mvs.append(ph & xv)
                hp, hm = hout_p, hout_m

            # horizontal delta at (row j, column j): bit s of fresh diag word
            hplus = (jnp.right_shift(ph_diag, su) & jnp.uint32(1)).astype(
                jnp.int32)
            hminus = (jnp.right_shift(mh_diag, su) & jnp.uint32(1)).astype(
                jnp.int32)
            sdiag = sdiag + hplus - hminus

            # latch base = D[n][n] when j == n
            base = jnp.where(j == nlen, sdiag, base)

            # row-n walk: horizontal delta at per-pair row n
            hbp = ((hsel_p & nbit) != 0).astype(jnp.int32)
            hbm = ((hsel_m & nbit) != 0).astype(jnp.int32)
            if HW:
                # W(j): prefix sum of row-n h-deltas (gated to in-window
                # columns by the hsel select itself); masked running min
                # over valid end columns, smallest j on ties
                walk = walk + (hbp - hbm)
                wn = jnp.where(j == nlen, walk, wn)
                better = (j >= jlow) & (j <= mlen) & (walk < wmin)
                wmin = jnp.where(better, walk, wmin)
                wj = jnp.where(better, j, wj)
                return (sdiag, base, walk, wn, wmin, wj,
                        tuple(new_pvs), tuple(new_mvs))
            in_walk = (j > nlen) & (j <= mlen)
            walk = walk + jnp.where(in_walk, hbp - hbm, 0)

            return (sdiag, base, walk, tuple(new_pvs), tuple(new_mvs))

        if HW:
            inner0 = (sdiag, base, walk, wn, wmin, wj, pvs, mvs)
        else:
            inner0 = (sdiag, base, walk, pvs, mvs)
        return jax.lax.fori_loop(0, 32, char_step, inner0)

    sdiag = jnp.zeros((SUB, LANES), jnp.int32)
    base = jnp.zeros((SUB, LANES), jnp.int32)
    walk = jnp.zeros((SUB, LANES), jnp.int32)
    if HW:
        carry = (sdiag, base, walk, jnp.zeros((SUB, LANES), jnp.int32),
                 WBIG, jnp.zeros((SUB, LANES), jnp.int32),
                 (ones,) * WIN, (zeros,) * WIN)
        carry = jax.lax.fori_loop(0, nphases, run_phase, carry)
        _sdiag, base, _walk, wn, wmin, wj = carry[:6]
        vwalk = base + wmin - wn
        # the delete-whole-query end D[n][0] = n; ties prefer the smaller
        # end column (oracle.edit_distance_hw picks the smallest argmin)
        out_ref[:] = jnp.minimum(vwalk, nlen)
        refs[0][:] = jnp.where(nlen <= vwalk, 0, wj)
    else:
        carry = (sdiag, base, walk, (ones,) * WIN, (zeros,) * WIN)
        carry = jax.lax.fori_loop(0, nphases, run_phase, carry)
        sdiag, base, walk = carry[:3]
        out_ref[:] = base + walk


@functools.partial(jax.jit,
                   static_argnames=("L", "interpret", "sub", "win"))
def myers_ed_pool(pool_flat, plen, ia, ib, *, L: int, interpret: bool = False,
                  sub: int = SUB, win: int = WIN):
    """Pool-gather variant: sequences live in a device-resident pool,
    shipped FLAT ([U*L] int8 + lengths [U]); per batch only the int32 index
    vectors cross the host link.  ia/ib index the pair's two sequences.
    The pool stays 1-D outside the jit on purpose: 1-D int8 has a canonical
    device layout, so host->device pushes are fast and the committed-array
    layout embedded in the compile-cache key is stable across processes."""
    U = pool_flat.shape[0] // L
    pool = pool_flat.reshape(U, L)
    qcodes = jnp.take(pool, ia, axis=0)
    tcodes = jnp.take(pool, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    return _myers_ed(qcodes, tcodes, qlen, tlen, L=L, interpret=interpret,
                     sub=sub, win=win)


@functools.partial(jax.jit,
                   static_argnames=("L", "interpret", "sub", "win"))
def myers_ed_pallas(qcodes, tcodes, qlen, tlen, *, L: int,
                    interpret: bool = False, sub: int = SUB, win: int = WIN):
    """Batched banded Myers NW edit distance; B multiple of 1024, L multiple
    of 32 with L >= 160.  Swaps q/t per pair so that len(q) <= len(t).
    Returns ed [B] int32 (certified per ``myers_certifies``)."""
    return _myers_ed(qcodes, tcodes, qlen, tlen, L=L, interpret=interpret,
                     sub=sub, win=win)


def _myers_ed(qcodes, tcodes, qlen, tlen, *, L: int, interpret: bool,
              sub: int, win: int = WIN, hw: bool = False):
    WINX = win
    assert L % 32 == 0 and L >= 32 * WINX
    SUBX = sub
    block = SUBX * LANES
    B = qcodes.shape[0]
    assert B % block == 0
    nwords = L // 32

    if hw:
        # HW (infix) is asymmetric: q is the fully-consumed pattern, t the
        # free-flank target -- no swap
        q_, t_ = qcodes, tcodes
        n_ = qlen.astype(jnp.int32)
        m_ = tlen.astype(jnp.int32)
    else:
        # enforce n <= m by swapping (ED is symmetric)
        swap = qlen > tlen
        q_ = jnp.where(swap[:, None], tcodes, qcodes)
        t_ = jnp.where(swap[:, None], qcodes, tcodes)
        n_ = jnp.where(swap, tlen, qlen).astype(jnp.int32)
        m_ = jnp.where(swap, qlen, tlen).astype(jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < n_[:, None], q_.astype(jnp.int32), 7)
    t = jnp.where(pos < m_[:, None], t_.astype(jnp.int8), 6)

    weights = jnp.left_shift(
        jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32)
    )[None, None, :]
    planes = []
    for code in PLANES:
        bits = (q == code).reshape(B, nwords, 32).astype(jnp.uint32)
        planes.append(jnp.sum(bits * weights, axis=2, dtype=jnp.uint32))
    peq = jnp.stack(planes)  # [P, B, nwords]

    nword = (n_ - 1) // 32
    nbit = jnp.left_shift(
        jnp.uint32(1), ((n_ - 1) % 32).astype(jnp.uint32)
    )  # stays uint32: converting 1<<31 to int32 would overflow

    G = B // block

    def pack_pairs(arr):
        # arr [B, R] -> [G * R * SUB, LANES]; pair b = g*BLOCK + s*LANES + l
        R = arr.shape[1]
        a = arr.reshape(G, SUBX, LANES, R)
        a = jnp.transpose(a, (0, 3, 1, 2))
        return a.reshape(G * R * SUBX, LANES)

    peq_packed = jnp.concatenate(
        [pack_pairs(peq[ci]).reshape(G, -1, LANES) for ci in range(len(PLANES))],
        axis=1,
    ).reshape(G * len(PLANES) * nwords * SUBX, LANES)
    text_packed = pack_pairs(t)
    nlen_packed = pack_pairs(n_[:, None])
    mlen_packed = pack_pairs(m_[:, None])
    nword_packed = pack_pairs(nword[:, None])
    nbit_packed = pack_pairs(nbit[:, None])

    PEQR = len(PLANES) * nwords * SUBX
    vec = lambda rows: pl.BlockSpec((rows, LANES), lambda g: (g, 0),
                                    memory_space=pltpu.VMEM)
    ostruct = jax.ShapeDtypeStruct((G * SUBX, LANES), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, L=L, SUB=SUBX, WIN=WINX, HW=hw),
        out_shape=[ostruct, ostruct] if hw else ostruct,
        grid=(G,),
        in_specs=[vec(PEQR), vec(L * SUBX), vec(SUBX), vec(SUBX), vec(SUBX),
                  vec(SUBX)],
        out_specs=[vec(SUBX), vec(SUBX)] if hw else vec(SUBX),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(peq_packed, text_packed, nlen_packed, mlen_packed, nword_packed,
      nbit_packed)
    if hw:
        ed, ej = out
        return ed.reshape(B), ej.reshape(B)
    return out.reshape(B)


@functools.partial(jax.jit,
                   static_argnames=("L", "interpret", "sub", "win"))
def myers_hw_pool(pool_flat, plen, ia, ib, *, L: int, interpret: bool = False,
                  sub: int = SUB, win: int = WIN):
    """Pool-gather HW-mode (infix, free target start/end) Myers distance:
    the bit-parallel replacement for the pooled wavefront on the
    ends-ignored candidate graph (``end_invariant_functions.py:757-788``).
    Returns (ed, ej) [B] int32; ej is the 1-indexed exclusive end of the
    target span (smallest among minima), certified per
    ``myers_certifies_hw``."""
    U = pool_flat.shape[0] // L
    pool = pool_flat.reshape(U, L)
    qcodes = jnp.take(pool, ia, axis=0)
    tcodes = jnp.take(pool, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    return _myers_ed(qcodes, tcodes, qlen, tlen, L=L, interpret=interpret,
                     sub=sub, win=win, hw=True)


@functools.partial(jax.jit,
                   static_argnames=("L", "interpret", "sub", "win"))
def myers_hw_pallas(qcodes, tcodes, qlen, tlen, *, L: int,
                    interpret: bool = False, sub: int = SUB, win: int = WIN):
    """Dense-input HW-mode variant of ``myers_hw_pool`` (kernel tests)."""
    return _myers_ed(qcodes, tcodes, qlen, tlen, L=L, interpret=interpret,
                     sub=sub, win=win, hw=True)


def myers_certifies(ed: np.ndarray, qlen: np.ndarray, tlen: np.ndarray,
                    win: int = WIN) -> np.ndarray:
    margin = 32 * (win // 2)  # rows guaranteed active on both diagonal sides
    delta = np.abs(tlen.astype(np.int64) - qlen.astype(np.int64))
    v = ed.astype(np.int64)
    return (
        (v + delta <= 2 * margin)
        & (v - delta <= 2 * margin)
        & (delta <= margin - 1)
        & (v >= 0)
    )


def myers_certifies_hw(ed: np.ndarray, qlen: np.ndarray, tlen: np.ndarray,
                       win: int = WIN) -> np.ndarray:
    """HW-mode certification: the window covers offsets j - i in
    [-margin, margin]; a cost-v path has offsets in [-v, max(delta,0)+v]
    with the target start drifting at most v further (the same rule as
    ``wavefront.band_certifies``' HW case with o_lo = -margin,
    o_hi = margin)."""
    margin = 32 * (win // 2)
    delta = tlen.astype(np.int64) - qlen.astype(np.int64)
    v = ed.astype(np.int64)
    return (v >= 0) & (v <= margin) & (np.maximum(delta, 0) + 2 * v <= margin)

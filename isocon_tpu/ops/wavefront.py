"""Batched banded edit distance as an anti-diagonal wavefront.

This is the TPU-native replacement for per-pair edlib calls
(``edlib_alignment_module.py:111``, ``nearest_neighbor_graph.py:104-107``):
instead of Myers bit-vectors per pair on a CPU core, we advance one
anti-diagonal of B independent DP problems per step, vectorized over a band
of offsets -- all elementwise VPU work with two shifted adds and a min.

Geometry
--------
For a pair (q, t) with |q| = n, |t| = m, cell (i, j) of the Levenshtein DP
lives on anti-diagonal d = i + j at band offset o = j - i.  The recurrence

    D[i][j] = min(D[i-1][j] + 1, D[i][j-1] + 1, D[i-1][j-1] + (q[i-1] != t[j-1]))

becomes, for diagonal arrays A = diag d-1 and B2 = diag d-2 indexed by o:

    new[o] = min(A[o+1] + 1, A[o-1] + 1, B2[o] + neq(i, j))

which is two lane-shifts, two adds and a min over a [batch, band] block.
Valid cells on diagonal d satisfy o === d (mod 2); the opposite-parity lanes
form a disjoint phantom lattice seeded at +INF that never touches real
cells, so no parity compaction is needed.

Character lookup stays a contiguous slice: with qe/te = each sequence with
every code repeated twice, q[i-1] = qe[d-o-2] and t[j-1] = te[d+o-2], so the
whole band's characters are one reversed and one forward dynamic slice.

Band validity (drives the k-escalation search): with band offsets
[o_lo, o_hi] and length difference delta = m - n, a distance v is computed
exactly iff every <=v-cost path fits the band:

    (v + delta) / 2 <= o_hi   and   (v - delta) / 2 <= -o_lo

(prefix D-steps <= (v+delta)/2 bound the positive offsets, prefix I-steps
bound the negative ones).  The host driver checks this bound and escalates
Wp for pairs whose returned value is not certified.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = np.int16(16000)
QPAD = 5  # pad code for q; never equals TPAD or any base code
TPAD = 6


def _expand2(codes: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, 2L] with each code doubled: out[2x] = out[2x+1] = in[x]."""
    B, L = codes.shape
    return jnp.repeat(codes, 2, axis=1)


CLAMP8 = 120  # int8 kernels clamp DP values here; >= CLAMP8 means "> band"


@functools.partial(jax.jit, static_argnames=("Wp", "L", "hw_mode", "small"))
def banded_ed(qcodes, tcodes, qlen, tlen, *, Wp: int, L: int,
              hw_mode: bool = False, small: bool = False):
    """Batched banded edit distance.

    Args:
      qcodes, tcodes: [B, L] int8, padded with distinct pad codes upstream is
        not required -- padding is rewritten here.
      qlen, tlen: [B] int32 true lengths.
      Wp: band width in lanes (static). Offsets are o in [o_lo, o_lo+Wp-1]
        with o_lo = -(Wp//2 - 1).
      L: padded length (static).
      hw_mode: if True, target start/end flanks are free (edlib HW): row 0 is
        all zeros and the result is min over the query's last row, with the
        end position j of the first minimum returned.

    Returns:
      ed [B] int32 (certified only per the band bound -- see module doc),
      end_j [B] int32 (HW: inclusive-exclusive end index j of alignment end
        in t, i.e. alignment covers t[?:end_j]; NW: m).
    """
    B = qcodes.shape[0]
    o_lo = -(Wp // 2 - 1)
    o_vec = o_lo + jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)  # [1, Wp]

    # int8 variant: DP values saturate at CLAMP8 -- exact for all values
    # below it (min-plus with non-negative increments is monotone under a
    # ceiling), and "clamped" results are reported uncertified upstream.
    sdt = jnp.int8 if small else jnp.int16
    ceil_val = CLAMP8 if small else int(INF)

    # mask real pads
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int8), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int8), TPAD)

    P0 = Wp + 2
    qe = _expand2(q)[:, ::-1]                       # reversed expanded q
    te = _expand2(t)
    QP = jnp.pad(qe, ((0, 0), (P0, P0)), constant_values=QPAD)
    TP = jnp.pad(te, ((0, 0), (P0, P0)), constant_values=TPAD)

    d_final = (qlen + tlen).astype(jnp.int32)
    o_final = (tlen - qlen).astype(jnp.int32)
    lane_final = jnp.clip(o_final - o_lo, 0, Wp - 1)

    def boundary(diag_d):
        """Values for cells on row 0 (o == d) and column 0 (o == -d)."""
        top = jnp.where(o_vec == diag_d, 0 if hw_mode else diag_d, ceil_val)
        left = jnp.where(o_vec == -diag_d, diag_d, ceil_val)
        return jnp.minimum(jnp.minimum(top, left), ceil_val).astype(sdt)

    def init_diag(diag_d):
        if diag_d == 0:
            base = jnp.where(o_vec == 0, 0, ceil_val).astype(sdt)
            return jnp.broadcast_to(base, (B, Wp))
        return jnp.broadcast_to(boundary(diag_d), (B, Wp))

    A0 = init_diag(1)   # diagonal d-1 at the start (d = 2)
    B0 = init_diag(0)   # diagonal d-2

    if hw_mode:
        # endpoint cells (n, j) with d = n + j < 2 are missed by the scan:
        # (0, *) -> 0 and (1, 0) -> 1 seed the running minimum.
        res0 = jnp.where(qlen == 0, 0,
                         jnp.where(qlen == 1, 1, INF.astype(jnp.int32)))
    else:
        # (0,0), (0,1), (1,0) sit on diagonals before the scan starts
        res0 = jnp.where(d_final <= 1, jnp.maximum(qlen, tlen),
                         INF.astype(jnp.int32))
    endj0 = jnp.zeros((B,), jnp.int32)

    steps = 2 * L - 1  # d = 2 .. 2L

    def step(carry, d):
        A, B2, res, endj = carry
        # band characters
        qstart = P0 + 2 * L + 1 + o_lo - d
        tstart = P0 + d + o_lo - 2
        qg = jax.lax.dynamic_slice(QP, (0, qstart), (B, Wp))
        tg = jax.lax.dynamic_slice(TP, (0, tstart), (B, Wp))
        neq = (qg != tg).astype(sdt)

        inf_col = jnp.full((B, 1), ceil_val, dtype=sdt)
        up = jnp.concatenate([A[:, 1:], inf_col], axis=1)      # A[o+1]
        down = jnp.concatenate([inf_col, A[:, :-1]], axis=1)   # A[o-1]
        new = jnp.minimum(jnp.minimum(up, down) + sdt(1), B2 + neq)

        # boundaries overwrite; out-of-grid cells and everything above the
        # ceiling -> ceil_val
        d_c = jnp.minimum(d, ceil_val).astype(sdt)
        top_val = sdt(0) if hw_mode else d_c
        new = jnp.where(o_vec == d, top_val, new)
        new = jnp.where(o_vec == -d, d_c, new)
        new = jnp.where((o_vec > d) | (o_vec < -d), sdt(ceil_val), new)
        new = jnp.minimum(new, sdt(ceil_val))

        if hw_mode:
            # running min over the query's last row: cells (n, j), o = d - 2n
            lane_hw = d - 2 * qlen - o_lo
            ok = (lane_hw >= 0) & (lane_hw < Wp) & (d >= qlen) & (d <= qlen + tlen)
            v = jnp.take_along_axis(
                new, jnp.clip(lane_hw, 0, Wp - 1)[:, None], axis=1
            )[:, 0].astype(jnp.int32)
            v = jnp.where(ok, v, INF.astype(jnp.int32))
            better = v < res
            endj = jnp.where(better, (d - qlen).astype(jnp.int32), endj)
            res = jnp.where(better, v, res)
        else:
            v = jnp.take_along_axis(new, lane_final[:, None], axis=1)[:, 0]
            res = jnp.where(d == d_final, v.astype(jnp.int32), res)

        return (new, A, res, endj), None

    (_, _, res, endj), _ = jax.lax.scan(
        step, (A0, B0, res0, endj0), jnp.arange(2, 2 + steps, dtype=jnp.int32),
        unroll=8,
    )
    if not hw_mode:
        endj = tlen.astype(jnp.int32)
    return res, endj


@functools.partial(
    jax.jit,
    static_argnames=("Wp", "L", "hw_mode", "small", "kernel", "interpret"))
def banded_ed_pool(pool_flat, plen, ia, ib, *, Wp: int, L: int,
                   hw_mode: bool = False, small: bool = False,
                   kernel: str = "scan", interpret: bool = False):
    """Pool-gather wrapper: sequences gathered on device from the flat
    interned pool (see ``myers_pallas.myers_ed_pool``), so band-escalation
    and HW-mode batches ship only int32 indices over the host link instead
    of host-assembled [B, L] code planes."""
    U = pool_flat.shape[0] // L
    pool = pool_flat.reshape(U, L)
    qcodes = jnp.take(pool, ia, axis=0)
    tcodes = jnp.take(pool, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    if kernel == "pallas":
        from .wavefront_pallas import banded_ed_pallas

        return banded_ed_pallas(qcodes, tcodes, qlen, tlen, Wp=Wp, L=L,
                                hw_mode=hw_mode, interpret=interpret)
    return banded_ed(qcodes, tcodes, qlen, tlen, Wp=Wp, L=L,
                     hw_mode=hw_mode, small=small)


def band_certifies(ed: np.ndarray, qlen: np.ndarray, tlen: np.ndarray, Wp: int,
                   hw_mode: bool = False, small: bool = False) -> np.ndarray:
    """True where the banded result is exact (see module docstring)."""
    o_lo = -(Wp // 2 - 1)
    o_hi = o_lo + Wp - 1
    delta = tlen.astype(np.int64) - qlen.astype(np.int64)
    v = ed.astype(np.int64)
    if small:
        # int8 kernel saturates at CLAMP8: only sub-ceiling values are real
        base = v < CLAMP8
        if hw_mode:
            return base & (v <= -o_lo) & (np.maximum(delta, 0) + 2 * v <= o_hi)
        return (
            base
            & (v + delta <= 2 * o_hi)
            & (v - delta <= -2 * o_lo)
            & (delta <= o_hi)
            & (delta >= o_lo)
        )
    if hw_mode:
        # Any optimal HW path starts at (0, j0) with j0 <= max(0, delta + v*)
        # (since span >= n - v* and j1 <= m) and drifts at most v* further up
        # and at most v* below zero.  So a returned v certifies itself iff
        # every distance <= v has all its optimal paths within the band:
        return (v <= -o_lo) & (np.maximum(delta, 0) + 2 * v <= o_hi)
    # NW: prefix D-steps <= (v+delta)/2, prefix I-steps <= (v-delta)/2,
    # plus the answer lane itself must be in band.
    return (
        (v + delta <= 2 * o_hi)
        & (v - delta <= -2 * o_lo)
        & (delta <= o_hi)
        & (delta >= o_lo)
    )

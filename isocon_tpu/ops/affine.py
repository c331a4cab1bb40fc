"""Batched banded affine-gap semi-global alignment with traceback.

TPU-native replacement for parasail ``sg_trace_scan_16``
(``SW_alignment_module.py:64-86``): same anti-diagonal band geometry as
``wavefront.py`` but maximizing an affine score with three state planes

    H[i][j] = max(H[i-1][j-1] + s(i,j), E[i][j], F[i][j])
    E[i][j] = max(H[i][j-1] - open, E[i][j-1] - ext)   # gap consuming s2
    F[i][j] = max(H[i-1][j] - open, F[i-1][j] - ext)   # gap consuming s1

with free end gaps in both sequences (H[i][0] = H[0][j] = 0, score = max
over last row + last column).  A gap of length g costs open + (g-1)*ext,
parasail's convention.

Traceback: the kernel emits 4 direction bits per band cell per diagonal
(2 for H's argmax with the pinned preference diag > E > F; 1 each for
E/F open-vs-extend, preference open).  The packed [B, steps, Wp] uint8
tensor is decoded on the host (``decode_traceback``) by walking from the
best endpoint; ~n+m steps per pair.

Oracle: ``oracle.align_semi_global`` (same pinned tie-breaks).

Band validity: the caller supplies a band wide enough for the optimal
path; ``decode_traceback`` raises BandOverflow if the walk ever touches a
band edge lane, and the driver re-runs the pair with a wider band.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .encode import PAD

NEG = np.int16(-16000)
QPAD = 5
TPAD = 6

# H-direction codes (bits 0-1)
H_DIAG = 0
H_FROME = 1
H_FROMF = 2
H_START = 3  # boundary cell (free end gap start)
# bit 2: E opened here; bit 3: F opened here


@functools.partial(jax.jit, static_argnames=("Wp", "L"))
def banded_sg_align(qcodes, tcodes, qlen, tlen, match, mismatch, gopen, gext,
                    *, Wp: int, L: int):
    """Semi-global affine alignment scores + packed traceback.

    Args:
      qcodes/tcodes: [B, L] int8; qlen/tlen: [B] int32.
      match/mismatch/gopen/gext: [B] int16 per-pair scores (mismatch<0,
        gopen/gext >= 0 as penalties).
    Returns:
      best [B] int32 final score, end_i [B], end_j [B] (endpoint on last
      row/col; ties prefer larger i then larger j), dirs [B, steps, Wp]
      uint8 packed directions, for diagonals d = 2 .. 2L.
    """
    B = qcodes.shape[0]
    o_lo = -(Wp // 2 - 1)
    o_vec = o_lo + jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int16), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int16), TPAD)

    P0 = Wp + 2
    qe = jnp.repeat(q, 2, axis=1)[:, ::-1]
    te = jnp.repeat(t, 2, axis=1)
    QP = jnp.pad(qe, ((0, 0), (P0, P0)), constant_values=QPAD)
    TP = jnp.pad(te, ((0, 0), (P0, P0)), constant_values=TPAD)

    matchv = match[:, None].astype(jnp.int16)
    mismv = mismatch[:, None].astype(jnp.int16)
    gov = gopen[:, None].astype(jnp.int16)
    gev = gext[:, None].astype(jnp.int16)

    def boundary_H(diag_d):
        onb = (o_vec == diag_d) | (o_vec == -diag_d)
        return jnp.where(onb, 0, NEG.astype(jnp.int32)).astype(jnp.int16)

    H1 = jnp.broadcast_to(boundary_H(1), (B, Wp))
    H0 = jnp.broadcast_to(boundary_H(0), (B, Wp))
    E1 = jnp.full((B, Wp), NEG, jnp.int16)
    F1 = jnp.full((B, Wp), NEG, jnp.int16)

    # endpoint tracking: last row cells (n, j) and last col cells (i, m)
    best0 = jnp.full((B,), NEG, jnp.int32)
    ei0 = jnp.zeros((B,), jnp.int32)
    ej0 = jnp.zeros((B,), jnp.int32)
    # include trivial endpoints (0, m) and (n, 0): score 0
    best0 = jnp.zeros((B,), jnp.int32)
    ei0 = qlen.astype(jnp.int32)   # (n, 0) preferred over (0, m) by larger i
    ej0 = jnp.zeros((B,), jnp.int32)

    steps = 2 * L - 1
    inf_col = jnp.full((B, 1), NEG, dtype=jnp.int16)

    def shift_up(X):   # X[o+1]
        return jnp.concatenate([X[:, 1:], inf_col], axis=1)

    def shift_down(X):  # X[o-1]
        return jnp.concatenate([inf_col, X[:, :-1]], axis=1)

    def step(carry, d):
        Hp, Hpp, Ep, Fp, best, ei, ej = carry
        qstart = P0 + 2 * L + 1 + o_lo - d
        tstart = P0 + d + o_lo - 2
        qg = jax.lax.dynamic_slice(QP, (0, qstart), (B, Wp))
        tg = jax.lax.dynamic_slice(TP, (0, tstart), (B, Wp))
        sub = jnp.where(qg == tg, matchv, mismv)

        # E[i][j]: parents at (i, j-1): diag d-1, offset o-1
        h_left = shift_down(Hp)
        e_left = shift_down(Ep)
        e_open = h_left - gov
        e_ext = e_left - gev
        E = jnp.maximum(e_open, e_ext)
        e_opened = e_open >= e_ext

        # F[i][j]: parents at (i-1, j): diag d-1, offset o+1
        h_up = shift_up(Hp)
        f_up = shift_up(Fp)
        f_open = h_up - gov
        f_ext = f_up - gev
        F = jnp.maximum(f_open, f_ext)
        f_opened = f_open >= f_ext

        diag = Hpp + sub
        H = jnp.maximum(jnp.maximum(diag, E), F)
        hdir = jnp.where(
            H == diag, H_DIAG, jnp.where(H == E, H_FROME, H_FROMF)
        ).astype(jnp.uint8)

        # boundary cells: H = 0 on row 0 / col 0 (free end gaps)
        on_boundary = (o_vec == d) | (o_vec == -d)
        H = jnp.where(on_boundary, 0, H).astype(jnp.int16)
        hdir = jnp.where(on_boundary, np.uint8(H_START), hdir)
        out_grid = (o_vec > d) | (o_vec < -d)
        H = jnp.where(out_grid, NEG, H)
        E = jnp.where(out_grid | on_boundary, NEG, E).astype(jnp.int16)
        F = jnp.where(out_grid | on_boundary, NEG, F).astype(jnp.int16)
        # floor everything at NEG: degraded band-edge cells otherwise drift
        # a few points lower every diagonal and can wrap int16 on long pairs
        H = jnp.maximum(H, NEG)
        E = jnp.maximum(E, NEG)
        F = jnp.maximum(F, NEG)

        dirs = (
            hdir
            | (e_opened.astype(jnp.uint8) << 2)
            | (f_opened.astype(jnp.uint8) << 3)
        )

        # endpoint scan: last-col cells (i, m) at o = 2m - d, last-row cells
        # (n, j) at o = d - 2n.  Tie rule (same as the oracle): max score,
        # then larger i, then larger j.
        def consider(best, ei, ej, v, i_new, j_new, ok):
            v = jnp.where(ok, v.astype(jnp.int32), NEG.astype(jnp.int32) - 1)
            upd = (v > best) | (
                (v == best)
                & ((i_new > ei) | ((i_new == ei) & (j_new > ej)))
            )
            return (
                jnp.where(upd, v, best),
                jnp.where(upd, i_new, ei),
                jnp.where(upd, j_new, ej),
            )

        lane_col = 2 * tlen - d - o_lo
        okc = (lane_col >= 0) & (lane_col < Wp) & (d >= tlen) & (d <= qlen + tlen)
        vc = jnp.take_along_axis(H, jnp.clip(lane_col, 0, Wp - 1)[:, None], 1)[:, 0]
        best, ei, ej = consider(
            best, ei, ej, vc, (d - tlen).astype(jnp.int32),
            tlen.astype(jnp.int32), okc)

        lane_row = d - 2 * qlen - o_lo
        okr = (lane_row >= 0) & (lane_row < Wp) & (d >= qlen) & (d <= qlen + tlen)
        vr = jnp.take_along_axis(H, jnp.clip(lane_row, 0, Wp - 1)[:, None], 1)[:, 0]
        best, ei, ej = consider(
            best, ei, ej, vr, qlen.astype(jnp.int32),
            (d - qlen).astype(jnp.int32), okr)

        return (H, Hp, E, F, best, ei, ej), dirs

    (Hl, _, _, _, best, ei, ej), dirs = jax.lax.scan(
        step, (H1, H0, E1, F1, best0, ei0, ej0),
        jnp.arange(2, 2 + steps, dtype=jnp.int32), unroll=4,
    )
    dirs = jnp.transpose(dirs, (1, 0, 2))  # [B, steps, Wp]
    return best, ei, ej, dirs


class BandOverflow(Exception):
    pass


# backward-walk opcodes emitted by the device-side decoder
OP_NONE = 0   # walk finished / padding
OP_DIAG = 1   # consume one char of q and t
OP_GAPQ = 2   # E-state: '-' in q, consume t
OP_GAPT = 3   # F-state: consume q, '-' in t


@functools.partial(jax.jit, static_argnames=("Wp", "L"))
def walk_traceback(dirs, qlen, tlen, end_i, end_j, *, Wp: int, L: int):
    """Device-side traceback walk: converts the packed direction planes to
    per-pair backward opcode strings, so only ~2L bytes per pair leave the
    device instead of the full [steps, Wp] direction tensor.

    Returns (opcodes [B, 2L] uint8 in backward order, stop_i [B], stop_j [B],
    overflow [B] bool).
    """
    B = dirs.shape[0]
    o_lo = -(Wp // 2 - 1)
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j, st, overflow = carry
        active = (i > 0) & (j > 0) & (st != 3)
        d = i + j
        c = (j - i) - o_lo
        on_edge = (c <= 0) | (c >= Wp - 1)
        overflow = overflow | (active & on_edge)
        c_cl = jnp.clip(c, 0, Wp - 1)
        d_cl = jnp.clip(d - 2, 0, dirs.shape[1] - 1)
        bits = dirs[bidx, d_cl, c_cl].astype(jnp.int32)
        hd = bits & 3
        e_opened = (bits & 4) != 0
        f_opened = (bits & 8) != 0

        in_h = st == 0
        # The host walk's H->E/F transition re-reads the same cell in the
        # gap state; fused here: acting in E at cell (i,j) means emit the
        # gap, consume, and return to H iff this cell opened the gap.
        hit_start = active & in_h & (hd == H_START)
        act_diag = active & in_h & (hd == H_DIAG)
        act_e = active & ((in_h & (hd == H_FROME)) | (st == 1))
        act_f = active & ((in_h & (hd == H_FROMF)) | (st == 2))

        op = jnp.where(
            act_diag, OP_DIAG,
            jnp.where(act_e, OP_GAPQ, jnp.where(act_f, OP_GAPT, OP_NONE)),
        ).astype(jnp.uint8)
        ni = jnp.where(act_diag | act_f, i - 1, i)
        nj = jnp.where(act_diag | act_e, j - 1, j)
        nst = jnp.where(
            act_diag, 0,
            jnp.where(act_e, jnp.where(e_opened, 0, 1),
                      jnp.where(act_f, jnp.where(f_opened, 0, 2), st)),
        )
        nst = jnp.where(hit_start, 3, nst)
        return (ni, nj, nst, overflow), op

    init = (end_i.astype(jnp.int32), end_j.astype(jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool))
    (fi, fj, fst, overflow), ops = jax.lax.scan(step, init, None, length=2 * L,
                                                unroll=8)
    ops = jnp.transpose(ops, (1, 0))
    # walk "done" states: st==3 (hit free start) or i==0/j==0 exhausted
    return ops, fi, fj, overflow


@functools.partial(jax.jit, static_argnames=("Wp", "L"))
def sg_align_with_ops(qcodes, tcodes, qlen, tlen, match, mismatch, gopen,
                      gext, *, Wp: int, L: int):
    """Fused forward + traceback walk: the [B, steps, Wp] direction tensor
    never leaves the device; only scores, endpoints and ~2L opcodes per
    pair do (critical when the host<->device link is thin)."""
    best, ei, ej, dirs = banded_sg_align(
        qcodes, tcodes, qlen, tlen, match, mismatch, gopen, gext, Wp=Wp, L=L
    )
    ops, fi, fj, overflow = walk_traceback(dirs, qlen, tlen, ei, ej, Wp=Wp, L=L)
    return best, ei, ej, ops, fi, fj, overflow


_DASH = np.uint8(ord("-"))


def ops_to_alignment(opcodes, q: str, t: str, end_i: int, end_j: int,
                     stop_i: int, stop_j: int) -> Tuple[str, str]:
    """Host assembly of the aligned strings from backward opcodes
    (vectorized -- this runs once per aligned pair)."""
    ops = np.asarray(opcodes)
    # the scan walk packs opcodes contiguously; the pallas walk is
    # diagonal-aligned and leaves OP_NONE gaps after each diagonal move
    ops = ops[ops != OP_NONE][::-1]  # forward order, stop -> end
    consq = ops != OP_GAPQ           # consumes a q char
    const = ops != OP_GAPT           # consumes a t char
    nq = int(consq.sum())
    nt = int(const.sum())
    assert (stop_i + nq, stop_j + nt) == (end_i, end_j), (
        stop_i, nq, stop_j, nt, end_i, end_j,
    )
    qa = np.frombuffer(q.encode("latin1"), dtype=np.uint8)
    ta = np.frombuffer(t.encode("latin1"), dtype=np.uint8)
    qi = stop_i + np.cumsum(consq) - 1
    ti = stop_j + np.cumsum(const) - 1
    if len(ops):
        m1 = np.where(consq, qa[np.minimum(qi, len(qa) - 1)], _DASH)
        m2 = np.where(const, ta[np.minimum(ti, len(ta) - 1)], _DASH)
        mid1 = m1.tobytes().decode("latin1")
        mid2 = m2.tobytes().decode("latin1")
    else:
        mid1 = mid2 = ""
    t1 = q[end_i:]
    t2 = t[end_j:]
    a1 = "-" * stop_j + q[:stop_i] + mid1 + t1 + "-" * len(t2)
    a2 = t[:stop_j] + "-" * stop_i + mid2 + "-" * len(t1) + t2
    return a1, a2


def ops_to_alignment_counts(opcodes, q: str, t: str, end_i: int, end_j: int,
                            stop_i: int, stop_j: int):
    """``ops_to_alignment`` plus the reference's (matches, mismatches,
    indels) triple (``SW_alignment_module.py:78-86``), with the counts
    computed from the opcode vectors instead of a per-character Python
    zip over the aligned strings -- that loop was ~half the host decode
    cost of a large affine batch.  Matches/mismatches only occur in the
    mid section (both end-gap regions pair a char against a dash)."""
    ops = np.asarray(opcodes)
    ops = ops[ops != OP_NONE][::-1]
    consq = ops != OP_GAPQ
    const = ops != OP_GAPT
    nq = int(consq.sum())
    nt = int(const.sum())
    assert (stop_i + nq, stop_j + nt) == (end_i, end_j), (
        stop_i, nq, stop_j, nt, end_i, end_j,
    )
    qa = np.frombuffer(q.encode("latin1"), dtype=np.uint8)
    ta = np.frombuffer(t.encode("latin1"), dtype=np.uint8)
    qi = stop_i + np.cumsum(consq) - 1
    ti = stop_j + np.cumsum(const) - 1
    if len(ops):
        m1 = np.where(consq, qa[np.minimum(qi, len(qa) - 1)], _DASH)
        m2 = np.where(const, ta[np.minimum(ti, len(ta) - 1)], _DASH)
        both = consq & const
        eq = m1 == m2
        matches = int((both & eq).sum())
        mismatches = int((both & ~eq).sum())
        mid1 = m1.tobytes().decode("latin1")
        mid2 = m2.tobytes().decode("latin1")
    else:
        mid1 = mid2 = ""
        matches = mismatches = 0
    t1 = q[end_i:]
    t2 = t[end_j:]
    a1 = "-" * stop_j + q[:stop_i] + mid1 + t1 + "-" * len(t2)
    a2 = t[:stop_j] + "-" * stop_i + mid2 + "-" * len(t1) + t2
    indels = len(a1) - matches - mismatches
    return a1, a2, (matches, mismatches, indels)


def decode_traceback(
    dirs: np.ndarray,
    q: str,
    t: str,
    end_i: int,
    end_j: int,
    Wp: int,
) -> Tuple[str, str]:
    """Walk the packed direction bits from (end_i, end_j) back to a free
    start, returning (q_aligned, t_aligned) with end gaps appended.

    Raises BandOverflow if the path touches the outermost band lanes
    (result then untrustworthy; caller should widen the band).
    """
    o_lo = -(Wp // 2 - 1)
    n, m = len(q), len(t)
    a1: List[str] = []
    a2: List[str] = []
    i, j = end_i, end_j
    state = "H"
    while i > 0 and j > 0:
        d = i + j
        c = (j - i) - o_lo
        if c <= 0 or c >= Wp - 1:
            raise BandOverflow((i, j, c))
        bits = int(dirs[d - 2, c])
        if state == "H":
            hd = bits & 3
            if hd == H_START:
                break
            if hd == H_DIAG:
                a1.append(q[i - 1])
                a2.append(t[j - 1])
                i -= 1
                j -= 1
            elif hd == H_FROME:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            a1.append("-")
            a2.append(t[j - 1])
            opened = bool(bits & 4)
            j -= 1
            if opened:
                state = "H"
        else:  # F
            a1.append(q[i - 1])
            a2.append("-")
            opened = bool(bits & 8)
            i -= 1
            if opened:
                state = "H"
    # leading free end gaps
    while i > 0:
        a1.append(q[i - 1])
        a2.append("-")
        i -= 1
    while j > 0:
        a1.append("-")
        a2.append(t[j - 1])
        j -= 1
    a1.reverse()
    a2.reverse()
    t1 = q[end_i:]
    t2 = t[end_j:]
    return "".join(a1) + t1 + "-" * len(t2), "".join(a2) + "-" * len(t1) + t2

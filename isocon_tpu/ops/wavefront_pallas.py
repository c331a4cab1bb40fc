"""Pallas TPU kernel for the banded wavefront edit distance.

Same anti-diagonal recurrence as ``wavefront.banded_ed`` (see that module's
docstring for the geometry), hand-placed in VMEM.  Mosaic requires lane
slices to be 128-aligned, but the band's character windows slide by one
lane per diagonal; the kernel therefore keeps two 256-lane sliding windows
(one per sequence direction) that are rolled by one lane each step --
a static shift -- and refilled from the VMEM character planes every 128
steps with 128-aligned dynamic slices.  Alignment of the refills is by
construction: the wrapper pads the q-plane and t-plane with different
offsets so both windows start phase-0.

Fixed geometry: Wp == 128 lanes (band radius 63), L a multiple of 64,
batch blocks of 128 pairs.  The engine uses this kernel for the dominant
(Wp=128, int8) configuration and falls back to the lax.scan version
otherwise.  Equality of the two backends: tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import CLAMP8, QPAD, TPAD

BB = 128     # batch block per grid step
WP = 128     # band lanes (static for this kernel)
SCAL = 128   # lane width used for per-pair scalar planes
WIN = 256    # sliding-window lanes

BIG = 2 ** 30


def _kernel(qp_ref, tp_ref, qlen_ref, tlen_ref, ed_ref, endj_ref,
            a_ref, b_ref, wq_ref, wt_ref, *, L: int, hw_mode: bool,
            P0q: int, P0t: int):
    ceil_val = CLAMP8
    Wp = WP
    o_lo = -(Wp // 2 - 1)
    o_vec = jnp.broadcast_to(
        o_lo + jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1), (BB, Wp)
    )
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, Wp), 1)

    qlen = qlen_ref[:, 0:1]        # [BB, 1] int32
    tlen = tlen_ref[:, 0:1]
    d_final = qlen + tlen
    lane_final = jnp.clip((tlen - qlen) - o_lo, 0, Wp - 1)  # [BB, 1]

    T0 = P0t + o_lo          # multiple of 128 by construction
    Q0 = P0q + 2 * L - 1 + o_lo

    # initial windows (phase 0, aligned)
    wt_ref[:] = tp_ref[:, pl.ds(T0, WIN)].astype(jnp.int32)
    wq_ref[:] = qp_ref[:, pl.ds(Q0 - 128, WIN)].astype(jnp.int32)

    # init diagonals: d-1 = 1 in a_ref, d-2 = 0 in b_ref
    top1 = 0 if hw_mode else 1
    a_ref[:] = jnp.where(
        o_vec == 1, top1, jnp.where(o_vec == -1, 1, ceil_val)
    ).astype(jnp.int32)
    b_ref[:] = jnp.where(o_vec == 0, 0, ceil_val).astype(jnp.int32)

    if hw_mode:
        ed0 = jnp.where(qlen == 0, 0, jnp.where(qlen == 1, 1, BIG))
    else:
        ed0 = jnp.where(d_final <= 1, jnp.maximum(qlen, tlen), BIG)
    ed_ref[:] = jnp.broadcast_to(ed0, (BB, SCAL))
    endj_ref[:] = jnp.zeros((BB, SCAL), jnp.int32)

    def body(s, carry):
        d = s + 2
        A = a_ref[:]
        B2 = b_ref[:]
        qg = wq_ref[:, 128:256]
        tg = wt_ref[:, 0:128]
        neq = (qg != tg).astype(jnp.int32)

        up = pltpu.roll(A, shift=Wp - 1, axis=1)
        up = jnp.where(lane_iota == Wp - 1, ceil_val, up)       # A[o+1]
        down = pltpu.roll(A, shift=1, axis=1)
        down = jnp.where(lane_iota == 0, ceil_val, down)        # A[o-1]
        new = jnp.minimum(jnp.minimum(up, down) + 1, B2 + neq)
        d_c = jnp.minimum(d, ceil_val)
        top_val = 0 if hw_mode else d_c
        new = jnp.where(o_vec == d, top_val, new)
        new = jnp.where(o_vec == -d, d_c, new)
        new = jnp.where((o_vec > d) | (o_vec < -d), ceil_val, new)
        new = jnp.minimum(new, ceil_val)

        if hw_mode:
            lane_hw = d - 2 * qlen - o_lo          # [BB, 1]
            sel = lane_iota == lane_hw
            ok = (lane_hw >= 0) & (lane_hw < Wp) & (d >= qlen) & (d <= d_final)
            v = jnp.min(jnp.where(sel, new, BIG), axis=1, keepdims=True)
            v = jnp.where(ok, v, BIG)
            better = v < ed_ref[:, 0:1]
            endj_ref[:] = jnp.broadcast_to(
                jnp.where(better, d - qlen, endj_ref[:, 0:1]), (BB, SCAL)
            )
            ed_ref[:] = jnp.broadcast_to(
                jnp.where(better, v, ed_ref[:, 0:1]), (BB, SCAL)
            )
        else:
            sel = lane_iota == lane_final
            v = jnp.min(jnp.where(sel, new, BIG), axis=1, keepdims=True)
            ed_ref[:] = jnp.broadcast_to(
                jnp.where(d == d_final, v, ed_ref[:, 0:1]), (BB, SCAL)
            )

        b_ref[:] = A
        a_ref[:] = new

        # advance the sliding windows to phase s+1
        wt_ref[:] = pltpu.roll(wt_ref[:], shift=WIN - 1, axis=1)  # left by 1
        wq_ref[:] = pltpu.roll(wq_ref[:], shift=1, axis=1)        # right by 1

        @pl.when(jax.lax.rem(s + 1, 128) == 0)
        def _refill():
            sp = s + 1
            t_idx = pl.multiple_of(T0 + sp + 128, 128)
            wt_ref[:, 128:256] = tp_ref[:, pl.ds(t_idx, 128)].astype(jnp.int32)
            q_idx = pl.multiple_of(Q0 - 128 - sp, 128)
            wq_ref[:, 0:128] = qp_ref[:, pl.ds(q_idx, 128)].astype(jnp.int32)

        return carry

    jax.lax.fori_loop(0, 2 * L - 1, body, 0)
    if not hw_mode:
        endj_ref[:] = jnp.broadcast_to(tlen, (BB, SCAL))


def _paddings(L: int):
    # T0 = P0t + o_lo must be 128-aligned; Q0 - 128 = P0q + 2L - 64 - 128
    # must be 128-aligned (L multiple of 64 => 2L = 0 mod 128).
    o_lo = -(WP // 2 - 1)  # -63
    P0t = 191              # T0 = 128
    P0q = 192              # Q0 - 128 = 192 + 2L - 64 - 128 = 2L  (aligned)
    return P0q, P0t


@functools.partial(jax.jit,
                   static_argnames=("Wp", "L", "hw_mode", "interpret"))
def banded_ed_pallas(qcodes, tcodes, qlen, tlen, *, Wp: int = WP, L: int,
                     hw_mode: bool = False, interpret: bool = False):
    """Drop-in int8 Pallas version of ``banded_ed(..., small=True)``
    for Wp == 128 and L a multiple of 64."""
    assert Wp == WP, "pallas kernel is specialized to Wp=128"
    assert L % 64 == 0
    B = qcodes.shape[0]
    assert B % BB == 0, "batch must be a multiple of %d" % BB
    P0q, P0t = _paddings(L)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int8), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int8), TPAD)
    qe = jnp.repeat(q, 2, axis=1)[:, ::-1]
    te = jnp.repeat(t, 2, axis=1)

    def pad_to(x, left, tail_mult=128, cval=0):
        total = left + x.shape[1]
        right = (-total) % tail_mult + 256  # slack for the last refills
        return jnp.pad(x, ((0, 0), (left, right)), constant_values=cval)

    QP = pad_to(qe, P0q, cval=QPAD)
    TP = pad_to(te, P0t, cval=TPAD)

    qlen2 = jnp.tile(qlen.astype(jnp.int32)[:, None], (1, SCAL))
    tlen2 = jnp.tile(tlen.astype(jnp.int32)[:, None], (1, SCAL))

    grid = (B // BB,)
    Wq = QP.shape[1]
    Wt = TP.shape[1]
    ed, endj = pl.pallas_call(
        functools.partial(_kernel, L=L, hw_mode=hw_mode, P0q=P0q, P0t=P0t),
        out_shape=(
            jax.ShapeDtypeStruct((B, SCAL), jnp.int32),
            jax.ShapeDtypeStruct((B, SCAL), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, SCAL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, SCAL), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BB, SCAL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, SCAL), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BB, WP), jnp.int32),   # a_ref (diag d-1)
            pltpu.VMEM((BB, WP), jnp.int32),   # b_ref (diag d-2)
            pltpu.VMEM((BB, WIN), jnp.int32),  # wq_ref sliding window
            pltpu.VMEM((BB, WIN), jnp.int32),  # wt_ref sliding window
        ],
        interpret=interpret,
    )(QP, TP, qlen2, tlen2)
    return ed[:, 0], endj[:, 0]

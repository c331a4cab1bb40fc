"""Dissect the pooled affine Pallas forward kernel cost on the real TPU.

Variants (all device-resident inputs, tiny outputs -> tunnel-neutral):
  full     : fwd kernel as shipped (dirs stores + endpoint scan + rolls)
  nodirs   : per-step dirs store removed
  noend    : endpoint scan removed
  noroll   : DP rolls replaced with unshifted reads (wrong result, cost only)
  walk     : walk kernel alone on device-resident dirs
Usage: python scripts/bench_affine_dissect.py [B] [L] [Wp]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
Wp = int(sys.argv[3]) if len(sys.argv) > 3 else 256

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isocon_tpu.ops import affine_pallas as ap
from isocon_tpu.ops.affine import H_DIAG, H_FROME, H_FROMF, H_START

NEGI = ap.NEGI
BB = ap.BB
SCAL = ap.SCAL

print("backend:", jax.default_backend())


def _fwd_kernel_var(qp_ref, tp_ref, qlen_ref, tlen_ref, ma_ref, mi_ref,
                    go_ref, ge_ref, dirs_ref, best_ref, ei_ref, ej_ref,
                    h1_ref, h0_ref, e1_ref, f1_ref, wq_ref, wt_ref, bst_ref,
                    *, L, Wp, CH, P0q, P0t, dirs_store, endscan, rolls):
    c = pl.program_id(1)
    o_lo = -(Wp // 2 - 1)
    o_vec = jnp.broadcast_to(
        o_lo + jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1), (BB, Wp))
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, Wp), 1)
    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    ma = ma_ref[:, 0:1]
    mi = mi_ref[:, 0:1]
    go = go_ref[:, 0:1]
    ge = ge_ref[:, 0:1]
    T0 = P0t + o_lo
    Q0 = P0q + 2 * L - 1 + o_lo

    @pl.when(c == 0)
    def _init():
        wt_ref[:] = tp_ref[:, pl.ds(T0, Wp + 128)].astype(jnp.int32)
        wq_ref[:] = qp_ref[:, pl.ds(Q0 - 128, Wp + 128)].astype(jnp.int32)
        h1_ref[:] = jnp.where((o_vec == 1) | (o_vec == -1), 0, NEGI).astype(jnp.int32)
        h0_ref[:] = jnp.where(o_vec == 0, 0, NEGI).astype(jnp.int32)
        e1_ref[:] = jnp.full((BB, Wp), NEGI, jnp.int32)
        f1_ref[:] = jnp.full((BB, Wp), NEGI, jnp.int32)
        bst_ref[:, 0:1] = jnp.zeros((BB, 1), jnp.int32)
        bst_ref[:, 1:2] = qlen
        bst_ref[:, 2:3] = jnp.zeros((BB, 1), jnp.int32)

    def step(s, _):
        ss = c * CH + s
        d = ss + 2
        H1 = h1_ref[:]
        H0 = h0_ref[:]
        qg = wq_ref[:, pl.ds(128, Wp)]
        tg = wt_ref[:, pl.ds(0, Wp)]
        sub = jnp.where(qg == tg, ma, mi)

        if rolls:
            h_left = pltpu.roll(H1, shift=1, axis=1)
            h_left = jnp.where(lane_iota == 0, NEGI, h_left)
            e_left = pltpu.roll(e1_ref[:], shift=1, axis=1)
            e_left = jnp.where(lane_iota == 0, NEGI, e_left)
        else:
            h_left, e_left = H1, e1_ref[:]
        e_open = h_left - go
        e_ext = e_left - ge
        E = jnp.maximum(e_open, e_ext)
        e_opened = (e_open >= e_ext).astype(jnp.int32)

        if rolls:
            h_up = pltpu.roll(H1, shift=Wp - 1, axis=1)
            h_up = jnp.where(lane_iota == Wp - 1, NEGI, h_up)
            f_up = pltpu.roll(f1_ref[:], shift=Wp - 1, axis=1)
            f_up = jnp.where(lane_iota == Wp - 1, NEGI, f_up)
        else:
            h_up, f_up = H1, f1_ref[:]
        f_open = h_up - go
        f_ext = f_up - ge
        F = jnp.maximum(f_open, f_ext)
        f_opened = (f_open >= f_ext).astype(jnp.int32)

        diag = H0 + sub
        H = jnp.maximum(jnp.maximum(diag, E), F)
        hdir = jnp.where(H == diag, H_DIAG,
                         jnp.where(H == E, H_FROME, H_FROMF)).astype(jnp.int32)
        on_boundary = (o_vec == d) | (o_vec == -d)
        H = jnp.where(on_boundary, 0, H)
        hdir = jnp.where(on_boundary, H_START, hdir)
        out_grid = (o_vec > d) | (o_vec < -d)
        H = jnp.where(out_grid, NEGI, H)
        E = jnp.where(out_grid | on_boundary, NEGI, E)
        F = jnp.where(out_grid | on_boundary, NEGI, F)
        H = jnp.maximum(H, NEGI)
        E = jnp.maximum(E, NEGI)
        F = jnp.maximum(F, NEGI)

        dirs = (hdir | (e_opened << 2) | (f_opened << 3)).astype(jnp.uint8)
        if dirs_store:
            dirs_ref[:, pl.ds(s * Wp, Wp)] = dirs
        else:
            @pl.when(s == 0)
            def _():
                dirs_ref[:, pl.ds(0, Wp)] = dirs

        if endscan:
            best = bst_ref[:, 0:1]
            ei = bst_ref[:, 1:2]
            ej = bst_ref[:, 2:3]

            def consider(best, ei, ej, lane, i_new, j_new, ok):
                sel = lane_iota == lane
                v = jnp.sum(jnp.where(sel, H, 0), axis=1, keepdims=True)
                v = jnp.where(ok, v, NEGI - 1)
                upd = (v > best) | ((v == best) & ((i_new > ei) | ((i_new == ei) & (j_new > ej))))
                return (jnp.where(upd, v, best), jnp.where(upd, i_new, ei),
                        jnp.where(upd, j_new, ej))

            lane_col = 2 * tlen - d - o_lo
            okc = ((lane_col >= 0) & (lane_col < Wp) & (d >= tlen) & (d <= qlen + tlen))
            best, ei, ej = consider(best, ei, ej, lane_col, d - tlen, tlen, okc)
            lane_row = d - 2 * qlen - o_lo
            okr = ((lane_row >= 0) & (lane_row < Wp) & (d >= qlen) & (d <= qlen + tlen))
            best, ei, ej = consider(best, ei, ej, lane_row, qlen, d - qlen, okr)
            bst_ref[:, 0:1] = best
            bst_ref[:, 1:2] = ei
            bst_ref[:, 2:3] = ej

        h0_ref[:] = H1
        h1_ref[:] = H
        e1_ref[:] = E
        f1_ref[:] = F
        if rolls:
            wt_ref[:] = pltpu.roll(wt_ref[:], shift=Wp + 128 - 1, axis=1)
            wq_ref[:] = pltpu.roll(wq_ref[:], shift=1, axis=1)

        @pl.when(jax.lax.rem(ss + 1, 128) == 0)
        def _refill():
            sp = ss + 1
            t_idx = pl.multiple_of(T0 + sp + Wp, 128)
            wt_ref[:, pl.ds(Wp, 128)] = tp_ref[:, pl.ds(t_idx, 128)].astype(jnp.int32)
            q_idx = pl.multiple_of(Q0 - 128 - sp, 128)
            wq_ref[:, pl.ds(0, 128)] = qp_ref[:, pl.ds(q_idx, 128)].astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, CH, step, 0)
    best_ref[:] = jnp.broadcast_to(bst_ref[:, 0:1], (BB, SCAL))
    ei_ref[:] = jnp.broadcast_to(bst_ref[:, 1:2], (BB, SCAL))
    ej_ref[:] = jnp.broadcast_to(bst_ref[:, 2:3], (BB, SCAL))


@functools.partial(jax.jit, static_argnames=("variant",))
def fwd_variant(qc, tc, qlen, tlen, ma, mi, go, ge, *, variant):
    CH = ap._chunk_len(Wp, L)
    steps = 2 * L - 1
    nchunks = -(-steps // CH)
    per_ops_block = 128 // CH
    nchunks = -(-nchunks // per_ops_block) * per_ops_block
    S = nchunks * CH
    P0q, P0t = ap._paddings(L, Wp)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qc.astype(jnp.int8), ap.QPAD)
    t = jnp.where(pos < tlen[:, None], tc.astype(jnp.int8), ap.TPAD)
    qe = jnp.repeat(q, 2, axis=1)[:, ::-1]
    te = jnp.repeat(t, 2, axis=1)

    def pad_to(x, left, cval):
        total = left + x.shape[1]
        right = (-total) % 128 + S - 2 * L + Wp + 384
        return jnp.pad(x, ((0, 0), (left, right)), constant_values=cval)

    QP = pad_to(qe, P0q, ap.QPAD)
    TP = pad_to(te, P0t, ap.TPAD)
    scal = lambda v: jnp.tile(v.astype(jnp.int32)[:, None], (1, SCAL))
    grid = (B // BB, nchunks)
    pair_block = lambda w: pl.BlockSpec((BB, w), lambda i, c: (i, 0),
                                        memory_space=pltpu.VMEM)
    dirs_store = variant != "nodirs"
    endscan = variant != "noend"
    rolls = variant != "noroll"
    if dirs_store:
        dirs_shape = jax.ShapeDtypeStruct((B, S * Wp), jnp.uint8)
        dirs_spec = pl.BlockSpec((BB, CH * Wp), lambda i, c: (i, c),
                                 memory_space=pltpu.VMEM)
    else:
        dirs_shape = jax.ShapeDtypeStruct((B, nchunks * Wp), jnp.uint8)
        dirs_spec = pl.BlockSpec((BB, Wp), lambda i, c: (i, c),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_var, L=L, Wp=Wp, CH=CH, P0q=P0q,
                          P0t=P0t, dirs_store=dirs_store, endscan=endscan,
                          rolls=rolls),
        out_shape=(dirs_shape,
                   jax.ShapeDtypeStruct((B, SCAL), jnp.int32),
                   jax.ShapeDtypeStruct((B, SCAL), jnp.int32),
                   jax.ShapeDtypeStruct((B, SCAL), jnp.int32)),
        grid=grid,
        in_specs=[pair_block(QP.shape[1]), pair_block(TP.shape[1])]
        + [pair_block(SCAL)] * 6,
        out_specs=(dirs_spec, pair_block(SCAL), pair_block(SCAL),
                   pair_block(SCAL)),
        scratch_shapes=[
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp + 128), jnp.int32),
            pltpu.VMEM((BB, Wp + 128), jnp.int32),
            pltpu.VMEM((BB, SCAL), jnp.int32),
        ],
    )(QP, TP, scal(qlen), scal(tlen), scal(ma), scal(mi), scal(go), scal(ge))
    # tiny summary output only (dirs stays on device, dead for nodirs)
    return outs[1][:, 0] + outs[0][:, 0].astype(jnp.int32)


rng = np.random.default_rng(0)
qc_h = rng.integers(0, 4, size=(B, L), dtype=np.int8)
tc_h = qc_h.copy()
for i in range(B):
    for _ in range(20):
        p = rng.integers(0, L - 1)
        tc_h[i, p] = (tc_h[i, p] + 1) % 4
args_h = (qc_h, tc_h, np.full(B, L - 17, np.int32), np.full(B, L - 5, np.int32),
          np.full(B, 2, np.int16), np.full(B, -2, np.int16),
          np.full(B, 2, np.int16), np.full(B, 0, np.int16))
args = [jax.device_put(a) for a in args_h]


def timeit(name, fn, n=4):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    print("%-10s best %.4fs  -> %8.0f pairs/s" % (name, best, B / best))


for variant in ("full", "nodirs", "noend", "noroll"):
    f = lambda: fwd_variant(*args, variant=variant)
    np.asarray(f())  # compile
    timeit(variant, f)

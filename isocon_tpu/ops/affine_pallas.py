"""Pallas TPU kernels for banded affine semi-global alignment + traceback.

Same recurrence, tie-breaks and direction-bit packing as ``affine.py``
(the lax.scan reference implementation, itself pinned to the numpy oracle
``oracle.align_semi_global``), re-placed for the TPU memory hierarchy:

* Geometry follows ``wavefront_pallas.py``: pairs on sublanes (BB per grid
  block, up to 512 -- sized against the VMEM budget), the band on lanes
  (Wp, a multiple of 128), two sliding character windows rolled one lane
  per anti-diagonal.
* The H/E/F state planes live in VMEM scratch for the whole sweep; the
  character stream is fed in (BB, 128) chunk-indexed blocks so VMEM cost
  is independent of sequence length (the v1 kernel shipped the whole
  padded text per pair block, capping BB at 128).
* Direction bits (4 per cell) stream to HBM in diagonal chunks of CH via
  the output pipeline; the grid is (pair_blocks, diag_chunks) with state
  persisting across the chunk axis.
* The per-step cost is instruction-issue-bound (measured ~54 ns/op at
  BB=128), so the kernel trims per-diagonal work two ways: the free-end-
  gap boundary masks only exist while d <= Wp/2 + 1, so chunks past that
  run a mask-free body (``lax.cond`` on the chunk index); and the
  endpoint scan is a 2-instruction per-lane key accumulation
  (K = H << SB | step) decoded *outside* the kernel instead of a per-step
  cross-lane argmax.
* The backward walk is a second kernel running the same grid in reverse:
  at diagonal d every pair whose walker sits on d consumes one direction
  entry and emits one opcode, so dirs stream sequentially (no gathers).
  The opcode stream may contain OP_NONE gaps (after a diagonal move);
  ``ops_to_alignment`` skips them.

Oracle equality: tests/test_affine_pallas.py checks scores, endpoints and
decoded alignments against ``affine.sg_align_with_ops`` (itself tested
against the numpy oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .affine import H_DIAG, H_FROME, H_FROMF, H_START, NEG, QPAD, TPAD
from .affine import OP_DIAG, OP_GAPQ, OP_GAPT, OP_NONE

SCAL = 128   # lane width for per-pair scalar planes

NEGI = np.int32(NEG)     # same floor value as the int16 scan kernel
ACC_EMPTY = np.int32(-(2 ** 30))  # "no endpoint seen" (< NEG << SB)
EDGE_NEG = np.int32(2 ** 28)      # roll-edge mask folded into gap penalties


def _geometry(Wp: int, L: int, B: int):
    """(BB, CH, CHW): pairs per grid block and diagonals per dirs chunk.

    BB default 256 (clamped to B): the v1 kernel hit a >5 min Mosaic
    compile blowup past 128 sublanes, but the v2 body compiles fine and
    256-sublane blocks measure ~1.2x the 128 throughput (per-op fixed
    cost amortizes over twice the pairs); 512 plateaus at the same rate.
    """
    # Chunk lengths trade Mosaic compile time (the fori body is unrolled;
    # the fwd body is doubled again by the boundary cond: CH=64 -> >250 s
    # compile, CH=16 -> ~11 s) against per-chunk pipeline overhead.  The
    # walk body is smaller, so it affords a longer chunk.  The two kernels
    # may chunk differently: the dirs layout is sequential in the diagonal
    # index, independent of the writer's chunking.
    # ISOCON_AFFINE_CH / ISOCON_AFFINE_CHW override for tuning.
    import os

    CHF = int(os.environ.get("ISOCON_AFFINE_CH", 0)) or (
        16 if Wp < 1024 else 8
    )
    CHW = int(os.environ.get("ISOCON_AFFINE_CHW", 0)) or (
        64 if Wp <= 512 else 16
    )
    BB = int(os.environ.get("ISOCON_AFFINE_BB", 0)) or 256
    BB = min(BB, B)
    return BB, CHF, CHW


def _fwd_kernel(winq_ref, wint_ref, qref_ref, tref_ref, qlen_ref, tlen_ref,
                ma_ref, mi_ref, go_ref, ge_ref, dirs_ref, acol_out, arow_out,
                h1_ref, h0_ref, e1_ref, f1_ref, wq_ref, wt_ref,
                acol_ref, arow_ref, goL_ref, geL_ref, goU_ref, geU_ref,
                *, L: int, Wp: int, CH: int, BB: int, SB: int, CB: int):
    """One (pair_block, diag_chunk) grid step of the forward DP.

    winq/wint: initial character windows (only read at c == 0).
    qref/tref: (BB, 128) refill blocks, chunk-indexed to the next needed
      128-char slab of the doubled/padded text planes.
    acol/arow: per-lane endpoint key accumulators (outputs, block index
      fixed so they persist across chunks like scratch).
    """
    c = pl.program_id(1)
    o_lo = -(Wp // 2 - 1)
    o_vec = jnp.broadcast_to(
        o_lo + jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1), (BB, Wp)
    )
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, Wp), 1)

    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    ma = ma_ref[:, 0:1]
    mi = mi_ref[:, 0:1]
    go = go_ref[:, 0:1]
    ge = ge_ref[:, 0:1]
    # dynamic chunk bounds: the compiled shape is one big static bucket
    # (keeps the tunnel-compiled shape set tiny), but blocks whose pairs are
    # shorter than L stop sweeping once every pair's last diagonal
    # d = qlen + tlen has passed, and the endpoint scan only runs in chunks
    # that can contain endpoint cells (d >= min(qlen, tlen)).
    d_max = jnp.max(qlen + tlen)
    d_min = jnp.min(jnp.minimum(qlen, tlen))
    chunk_live = c * CH + 2 <= d_max
    chunk_has_end = (c + 1) * CH + 1 >= d_min

    @pl.when(c == 0)
    def _init():
        wq_ref[:] = winq_ref[:].astype(jnp.int32)
        wt_ref[:] = wint_ref[:].astype(jnp.int32)
        h1_ref[:] = jnp.where(
            (o_vec == 1) | (o_vec == -1), 0, NEGI
        ).astype(jnp.int32)
        h0_ref[:] = jnp.where(o_vec == 0, 0, NEGI).astype(jnp.int32)
        e1_ref[:] = jnp.full((BB, Wp), NEGI, jnp.int32)
        f1_ref[:] = jnp.full((BB, Wp), NEGI, jnp.int32)
        acol_ref[:] = jnp.full((BB, Wp), ACC_EMPTY, jnp.int32)
        arow_ref[:] = jnp.full((BB, Wp), ACC_EMPTY, jnp.int32)
        # gap penalties with the roll-edge masks folded in: subtracting
        # these replaces a where(lane==edge, NEG, rolled) per parent --
        # edge lanes land ~NEG2 and lose every max, exactly like the
        # explicit masks (the H floor then pins stored values)
        edge0 = jnp.where(lane_iota == 0, EDGE_NEG, 0)
        edgeW = jnp.where(lane_iota == Wp - 1, EDGE_NEG, 0)
        goL_ref[:] = go + edge0
        geL_ref[:] = ge + edge0
        goU_ref[:] = go + edgeW
        geU_ref[:] = ge + edgeW

    def make_step(boundary, endscan):
      def step(s, _):
        ss = c * CH + s          # absolute step; diagonal d = ss + 2
        d = ss + 2
        H1 = h1_ref[:]
        H0 = h0_ref[:]
        qg = wq_ref[:, pl.ds(128, Wp)]
        tg = wt_ref[:, pl.ds(0, Wp)]
        sub = jnp.where(qg == tg, ma, mi)

        # E: parents at (i, j-1) = diag d-1, offset o-1
        h_left = pltpu.roll(H1, shift=1, axis=1)
        e_left = pltpu.roll(e1_ref[:], shift=1, axis=1)
        e_open = h_left - goL_ref[:]
        e_ext = e_left - geL_ref[:]
        E = jnp.maximum(e_open, e_ext)
        e_opened = (e_open >= e_ext).astype(jnp.int32)

        # F: parents at (i-1, j) = diag d-1, offset o+1
        h_up = pltpu.roll(H1, shift=Wp - 1, axis=1)
        f_up = pltpu.roll(f1_ref[:], shift=Wp - 1, axis=1)
        f_open = h_up - goU_ref[:]
        f_ext = f_up - geU_ref[:]
        F = jnp.maximum(f_open, f_ext)
        f_opened = (f_open >= f_ext).astype(jnp.int32)

        diag = H0 + sub
        H = jnp.maximum(jnp.maximum(diag, E), F)
        hdir = jnp.where(
            H == diag, H_DIAG, jnp.where(H == E, H_FROME, H_FROMF)
        ).astype(jnp.int32)

        if boundary:
            # free-end-gap boundary cells exist only while d <= Wp/2 + 1;
            # the plain body (chunks past CB) skips all of this
            on_boundary = (o_vec == d) | (o_vec == -d)
            H = jnp.where(on_boundary, 0, H)
            hdir = jnp.where(on_boundary, H_START, hdir)
            out_grid = (o_vec > d) | (o_vec < -d)
            H = jnp.where(out_grid, NEGI, H)
            E = jnp.where(out_grid | on_boundary, NEGI, E)
            F = jnp.where(out_grid | on_boundary, NEGI, F)
        # floor: degraded band-edge cells otherwise drift below NEG and
        # diverge from the (floored) scan kernel
        H = jnp.maximum(H, NEGI)
        E = jnp.maximum(E, NEGI)
        F = jnp.maximum(F, NEGI)

        dirs = (hdir | (e_opened << 2) | (f_opened << 3)).astype(jnp.uint8)
        dirs_ref[:, pl.ds(s * Wp, Wp)] = dirs

        # endpoint tracking: last-col cells (i, m) at lane 2m - d - o_lo,
        # last-row cells (n, j) at lane d - 2n - o_lo.  Accumulate the key
        # K = (H << SB) | ss per family; ss is monotone in i (col family)
        # and j (row family), so the per-family lane-max reproduces the
        # "max score, then larger i, then larger j" rule; the cross-family
        # merge happens outside the kernel.
        if endscan:
            K = (H << SB) + ss
            lane_col = 2 * tlen - d - o_lo
            okc = (d >= tlen) & (d <= qlen + tlen) & (lane_iota == lane_col)
            acol_ref[:] = jnp.maximum(acol_ref[:],
                                      jnp.where(okc, K, ACC_EMPTY))
            lane_row = d - 2 * qlen - o_lo
            okr = (d >= qlen) & (d <= qlen + tlen) & (lane_iota == lane_row)
            arow_ref[:] = jnp.maximum(arow_ref[:],
                                      jnp.where(okr, K, ACC_EMPTY))

        h0_ref[:] = H1
        h1_ref[:] = H
        e1_ref[:] = E
        f1_ref[:] = F

        wt_ref[:] = pltpu.roll(wt_ref[:], shift=Wp + 128 - 1, axis=1)
        wq_ref[:] = pltpu.roll(wq_ref[:], shift=1, axis=1)

        @pl.when(jax.lax.rem(ss + 1, 128) == 0)
        def _refill():
            wt_ref[:, pl.ds(Wp, 128)] = tref_ref[:].astype(jnp.int32)
            wq_ref[:, pl.ds(0, 128)] = qref_ref[:].astype(jnp.int32)

        return 0
      return step

    jax.lax.cond(
        chunk_live,
        lambda: jax.lax.cond(
            c <= CB,
            # boundary chunks keep the endpoint scan unconditionally: tiny
            # pairs (min length <= Wp/2) can have endpoints there
            lambda: jax.lax.fori_loop(0, CH, make_step(True, True), 0),
            lambda: jax.lax.cond(
                chunk_has_end,
                lambda: jax.lax.fori_loop(0, CH, make_step(False, True), 0),
                lambda: jax.lax.fori_loop(0, CH, make_step(False, False), 0),
            ),
        ),
        lambda: 0,
    )

    @pl.when(c == pl.num_programs(1) - 1)
    def _flush_endpoints():
        acol_out[:] = acol_ref[:]
        arow_out[:] = arow_ref[:]


def _walk_kernel(dirs_ref, ei_ref, ej_ref, ops_ref, st_ref,
                 *, Wp: int, CH: int, BB: int, S: int):
    c = pl.program_id(1)
    o_lo = -(Wp // 2 - 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, Wp), 1)
    # one ops block covers 128 opcode columns = 128 // CH chunks; this
    # chunk's slice starts at lane (c * CH) % 128
    lane_ops = jax.lax.broadcasted_iota(jnp.int32, (BB, 128), 1)
    ops_base = (c * CH) % 128

    @pl.when(c == 0)
    def _init():
        st_ref[:, 0:1] = ei_ref[:, 0:1]       # i
        st_ref[:, 1:2] = ej_ref[:, 0:1]       # j
        st_ref[:, 2:3] = jnp.zeros((BB, 1), jnp.int32)  # gap state
        st_ref[:, 3:4] = jnp.zeros((BB, 1), jnp.int32)  # overflow flag

    # skip chunks whose whole diagonal range lies above every walker's start
    # d = ei + ej (their ops entries are masked to OP_NONE on the host); the
    # walk then costs O(d_max), not O(S), per block
    d_max = jnp.max(ei_ref[:, 0:1] + ej_ref[:, 0:1])
    chunk_live = (S + 2) - (c + 1) * CH <= d_max

    def step(s, _):
        # diagonal processed this step: d = (S + 1) - (c*CH + s)
        d = (S + 1) - (c * CH + s)
        i = st_ref[:, 0:1]
        j = st_ref[:, 1:2]
        st = st_ref[:, 2:3]
        ov = st_ref[:, 3:4]

        active = (i + j == d) & (i > 0) & (j > 0) & (st != 3)
        cl = (j - i) - o_lo
        on_edge = (cl <= 0) | (cl >= Wp - 1)
        ov = jnp.where(active & on_edge, 1, ov)

        # dirs plane for diagonal d lives at local slot (d-2) % CH = CH-1-s
        plane = dirs_ref[:, pl.ds((CH - 1 - s) * Wp, Wp)].astype(jnp.int32)
        sel = lane_iota == jnp.clip(cl, 0, Wp - 1)
        bits = jnp.sum(jnp.where(sel, plane, 0), axis=1, keepdims=True)
        hd = bits & 3
        e_opened = (bits & 4) != 0
        f_opened = (bits & 8) != 0

        in_h = st == 0
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

        # single-lane dynamic stores must be 128-aligned; write the op via a
        # full-block one-hot select instead (every lane is written exactly
        # once across the block's 128 steps)
        ops_ref[:] = jnp.where(lane_ops == ops_base + s, op, ops_ref[:])
        st_ref[:, 0:1] = ni
        st_ref[:, 1:2] = nj
        st_ref[:, 2:3] = nst
        st_ref[:, 3:4] = ov
        return 0

    jax.lax.cond(
        chunk_live,
        lambda: jax.lax.fori_loop(0, CH, step, 0),
        lambda: 0,
    )


def _paddings(L: int, Wp: int):
    o_lo = -(Wp // 2 - 1)
    # T0 = P0t + o_lo and Q0 - 128 = P0q + 2L - 1 + o_lo - 128 must be
    # 128-aligned (L is a multiple of 64 so 2L = 0 mod 128)
    P0t = 128 - o_lo            # T0 = 128
    P0q = 129 - o_lo            # Q0 - 128 = 2L  (aligned)
    return P0q, P0t


def _pick_endpoint(acol, arow, qlen, tlen, SB):
    """Cross-family merge of the endpoint key accumulators: reproduce the
    oracle's 'max score, then larger i, then larger j' rule including the
    trivial (score 0, i=n, j=0) seed."""
    def decode(acc, is_col):
        h = acc >> SB                       # arithmetic shift = floor
        ss = acc - (h << SB)
        d = ss + 2
        valid = acc > ACC_EMPTY
        if is_col:
            i, j = d - tlen, tlen
        else:
            i, j = qlen, d - qlen
        return h, i, j, valid

    hc, ic, jc, vc = decode(jnp.max(acol, axis=1), True)
    hr, ir, jr, vr = decode(jnp.max(arow, axis=1), False)

    best = jnp.zeros_like(hc)
    bi = qlen.astype(jnp.int32)
    bj = jnp.zeros_like(hc)

    def fold(best, bi, bj, h, i, j, valid):
        better = valid & (
            (h > best)
            | ((h == best) & ((i > bi) | ((i == bi) & (j > bj))))
        )
        return (
            jnp.where(better, h, best),
            jnp.where(better, i, bi),
            jnp.where(better, j, bj),
        )

    best, bi, bj = fold(best, bi, bj, hc, ic, jc, vc)
    best, bi, bj = fold(best, bi, bj, hr, ir, jr, vr)
    return best, bi, bj


@functools.partial(jax.jit, static_argnames=("Wp", "L", "interpret"))
def sg_align_with_ops_pallas(qcodes, tcodes, qlen, tlen, match, mismatch,
                             gopen, gext, *, Wp: int, L: int,
                             interpret: bool = False):
    """Drop-in Pallas version of ``affine.sg_align_with_ops``.

    Returns (best, ei, ej, ops, fi, fj, overflow); ops is [B, S] uint8 in
    backward order with possible OP_NONE gaps (see module docstring).
    """
    assert Wp % 128 == 0 and Wp >= 256
    assert L % 64 == 0
    B = qcodes.shape[0]
    assert B % 128 == 0
    BB, CH, CHW = _geometry(Wp, L, B)
    steps = 2 * L - 1
    nchunks = -(-steps // CH)
    group = 128 // CH           # chunks per 128 steps (S must be % 128)
    nchunks = -(-nchunks // group) * group
    S = nchunks * CH
    SB = int(S + 1).bit_length()
    CB = (Wp // 2) // CH + 1    # chunks that need the boundary masks
    P0q, P0t = _paddings(L, Wp)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int8), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int8), TPAD)
    qe = jnp.repeat(q, 2, axis=1)[:, ::-1]
    te = jnp.repeat(t, 2, axis=1)

    def pad_to(x, left, cval):
        total = left + x.shape[1]
        right = (-total) % 128 + S - 2 * L + Wp + 384  # slack for refills
        return jnp.pad(x, ((0, 0), (left, right)), constant_values=cval)

    QP = pad_to(qe, P0q, QPAD)
    TP = pad_to(te, P0t, TPAD)
    T0 = P0t + (-(Wp // 2 - 1))
    Q0 = P0q + 2 * L - 1 + (-(Wp // 2 - 1))
    # initial sliding windows (read once at c == 0)
    winq = jax.lax.dynamic_slice(QP, (0, Q0 - 128), (B, Wp + 128))
    wint = jax.lax.dynamic_slice(TP, (0, T0), (B, Wp + 128))

    def scal(v, dtype=jnp.int32):
        return jnp.tile(v.astype(dtype)[:, None], (1, SCAL))

    grid = (B // BB, nchunks)
    nqb = QP.shape[1] // 128
    fixed = lambda w: pl.BlockSpec((BB, w), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM)
    # refill blocks: the kth refill (fires when ss+1 = 128k) reads
    # TP[:, T0 + Wp + 128k : +128] and QP[:, 2L - 128k : +128];
    # k(c) = ((c+1)*CH) // 128 refills have completed by the end of chunk c
    tp0 = (T0 + Wp) // 128      # T0 = 128, Wp % 128 == 0
    qp0 = (2 * L) // 128
    tref_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, tp0 + ((c + 1) * CH) // 128),
        memory_space=pltpu.VMEM,
    )
    qref_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, jnp.maximum(qp0 - ((c + 1) * CH) // 128, 0)),
        memory_space=pltpu.VMEM,
    )
    acc_spec = pl.BlockSpec((BB, Wp), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)

    dirs, acol, arow = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, Wp=Wp, CH=CH, BB=BB, SB=SB,
                          CB=CB),
        out_shape=(
            jax.ShapeDtypeStruct((B, S * Wp), jnp.uint8),
            jax.ShapeDtypeStruct((B, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, Wp), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            fixed(Wp + 128), fixed(Wp + 128),      # winq, wint
            qref_spec, tref_spec,
            fixed(SCAL), fixed(SCAL), fixed(SCAL),
            fixed(SCAL), fixed(SCAL), fixed(SCAL),
        ],
        out_specs=(
            pl.BlockSpec((BB, CH * Wp), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            acc_spec, acc_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((BB, Wp), jnp.int32),        # h1
            pltpu.VMEM((BB, Wp), jnp.int32),        # h0
            pltpu.VMEM((BB, Wp), jnp.int32),        # e1
            pltpu.VMEM((BB, Wp), jnp.int32),        # f1
            pltpu.VMEM((BB, Wp + 128), jnp.int32),  # wq
            pltpu.VMEM((BB, Wp + 128), jnp.int32),  # wt
            pltpu.VMEM((BB, Wp), jnp.int32),        # acol accumulator
            pltpu.VMEM((BB, Wp), jnp.int32),        # arow accumulator
            pltpu.VMEM((BB, Wp), jnp.int32),        # goL (edge-masked)
            pltpu.VMEM((BB, Wp), jnp.int32),        # geL
            pltpu.VMEM((BB, Wp), jnp.int32),        # goU
            pltpu.VMEM((BB, Wp), jnp.int32),        # geU
        ],
        # wide-band escalation shapes (Wp >= 1024) exceed the default 16 MB
        # scoped-vmem budget; the v5e core has far more physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(winq, wint, QP, TP, scal(qlen), scal(tlen), scal(match),
      scal(mismatch), scal(gopen), scal(gext))

    best, ei, ej = _pick_endpoint(acol, arow, qlen.astype(jnp.int32),
                                  tlen.astype(jnp.int32), SB)

    nchunks_w = S // CHW
    ops, stf = pl.pallas_call(
        functools.partial(_walk_kernel, Wp=Wp, CH=CHW, BB=BB, S=S),
        out_shape=(
            jax.ShapeDtypeStruct((B, S), jnp.uint8),
            jax.ShapeDtypeStruct((B, SCAL), jnp.int32),
        ),
        grid=(B // BB, nchunks_w),
        in_specs=[
            pl.BlockSpec((BB, CHW * Wp), lambda i, c: (i, nchunks_w - 1 - c),
                         memory_space=pltpu.VMEM),
            fixed(SCAL),
            fixed(SCAL),
        ],
        out_specs=(
            pl.BlockSpec((BB, 128), lambda i, c: (i, (c * CHW) // 128),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, SCAL), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dirs, scal(ei), scal(ej))
    # the walk state (i, j, gap-state, overflow) is carried in the second
    # output block itself so it survives across grid steps
    fi = stf[:, 0]
    fj = stf[:, 1]
    overflow = stf[:, 3] != 0
    # ops positions before each walker's start diagonal (d > ei + ej) may
    # come from chunks the walk skipped entirely (uninitialized output
    # blocks); force them to OP_NONE so the stream is deterministic
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    ops = jnp.where(k_iota < (S + 1 - (ei + ej))[:, None],
                    jnp.uint8(OP_NONE), ops)
    return best, ei, ej, ops, fi, fj, overflow


@functools.partial(jax.jit,
                   static_argnames=("Wp", "L", "interpret", "fuse_out"))
def sg_align_pool_pallas(pool_flat, plen, ia, ib, match, mismatch, gopen,
                         gext, *, Wp: int, L: int, interpret: bool = False,
                         fuse_out: bool = False):
    """Pool-gather + packed-opcode variant for thin host links.

    Sequences are gathered on device from the flat interned pool (see
    ``myers_pallas.myers_ed_pool`` for why the pool ships flat) and the
    backward opcode stream is packed 4 opcodes/byte (exactly 2 bits each:
    NONE/DIAG/GAPQ/GAPT), so a pair costs ~S/4 bytes of down-transfer
    instead of 2L up + S down.  Unpack with ``unpack_ops``.

    Returns (scal, packed): scal is [6, B] int32 stacking
    (best, ei, ej, fi, fj, overflow) -- one bulk transfer instead of six
    per-array round trips over the host link (each ~25 ms RTT).
    """
    U = pool_flat.shape[0] // L
    pool = pool_flat.reshape(U, L)
    qcodes = jnp.take(pool, ia, axis=0)
    tcodes = jnp.take(pool, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    best, ei, ej, ops, fi, fj, overflow = sg_align_with_ops_pallas(
        qcodes, tcodes, qlen, tlen, match, mismatch, gopen, gext,
        Wp=Wp, L=L, interpret=interpret)
    S = ops.shape[1]
    packed = ops.reshape(ops.shape[0], S // 4, 4).astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    packed = jnp.sum(packed << shifts[None, None, :], axis=2).astype(jnp.uint8)
    scal = jnp.stack(
        [best, ei, ej, fi, fj, overflow.astype(jnp.int32)]
    ).astype(jnp.int32)
    if fuse_out:
        # single 1-D uint8 download buffer: one host-link round trip for
        # the whole batch (non-sharded path only; decode with
        # ``split_fused_out``)
        scal_u8 = jax.lax.bitcast_convert_type(scal, jnp.uint8)
        return (jnp.concatenate([scal_u8.reshape(-1), packed.reshape(-1)]),)
    return scal, packed


def split_fused_out(buf: np.ndarray, B: int):
    """Host-side inverse of fuse_out: -> (scal [6, B] int32, ops [B, S])."""
    nb = 24 * B
    scal = buf[:nb].view(np.int32).reshape(6, B)
    return scal, unpack_ops(buf[nb:].reshape(B, -1))


def unpack_ops(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of the 2-bit opcode packing ([B, S//4] -> [B, S])."""
    b = packed[:, :, None].astype(np.uint8)
    shifts = (np.arange(4, dtype=np.uint8) * 2)[None, None, :]
    return ((b >> shifts) & 3).reshape(packed.shape[0], -1)

"""Compacted-parity Pallas kernels for banded affine SG alignment.

THE production affine path (same recurrence, tie-breaks and direction
bits as ``affine.py``; oracle: ``oracle.align_semi_global``).  The band
is stored **parity-compacted**: at anti-diagonal d only offsets o with
o == d (mod 2) hold real cells, so the classic layout (lane = o - o_lo,
the retired v2 kernel) wasted every other lane on phantom cells.  Here
lane u holds offset

    o = 2u + AE   on even diagonals   (AE = -(Wp/2 - 2))
    o = 2u + AO   on odd diagonals    (AO = AE - 1 = o_lo)

which shrinks a width-Wp band to W = Wp/2 lanes with every lane live.
TPU-validated against the oracle engine (scripts/check_affine_tpu.py,
0 mismatches on mixed-length mutated pairs) and measured 1.37x the v2
kernel in an interleaved A/B at B=2048 (17.0k vs 12.5k pairs/s with the
fused download).  Consequences of the layout vs v2:

* Parent moves become mostly same-lane: the diagonal parent is always
  same-lane; E's parent (o-1, d-1) is same-lane on even diagonals and a
  1-lane roll on odd ones; F's parent (o+1, d-1) is the mirror image.
  2 rolls per diagonal instead of 4.
* Along the band i and j both change 1 per lane (vs 1 per 2 lanes), so
  the character windows are the *raw* reversed-q / plain-t byte streams
  (no jnp.repeat doubling) and each window advances one lane every
  **2** diagonals (q entering odd d, t entering even d): half the window
  roll traffic, refills every 256 steps.
* Two pairs pack per 256-lane plane (pair 2g in lanes [0, W), pair 2g+1
  in [W, 2W)), so a (BB, 2W) vector op carries 2*BB pairs: the ~80-120 ns
  per-op issue cost (scripts/bench_vpu_micro.py) amortizes over twice the
  work.  Segment-crossing roll contamination is killed by the same
  folded EDGE_NEG gap-penalty trick as v2, now parity-split (the E roll
  only exists on odd diagonals, F's only on even ones).
* Direction-bit traffic to HBM halves (W lanes per diagonal, not Wp).

Wire format and host decode (``split_fused_out`` / ``unpack_ops``): one
fused uint8 buffer = 24*B scalar bytes + B*S/4 packed 2-bit opcodes; the
walk kernel extracts both packed pairs' direction bytes with one plane
reduction via a <<8 merge.

Reference parity anchor: parasail sg_trace_scan_16 call sites,
``SW_alignment_module.py:64-86``.
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


def _geometry(Wp: int, L: int, G: int):
    import os

    CHF = int(os.environ.get("ISOCON_AFFINE_CH", 0)) or (
        16 if Wp < 1024 else 8
    )
    CHW = int(os.environ.get("ISOCON_AFFINE_CHW", 0)) or (
        64 if Wp <= 512 else 16
    )
    BB = int(os.environ.get("ISOCON_AFFINE_BB", 0)) or 256
    # Scoped VMEM per grid step scales with BB*W (19 (BB, 2W) int32 state
    # planes + the (BB, CH*2W) dirs output window), so wide escalation
    # bands must trade pair-block rows for lanes: BB*Wp <= 256*1024 keeps
    # every geometry under the 64 MB scoped limit (measured: Wp=1024
    # BB=256 fits, Wp=2048 BB=256 OOMs at 76.5 MB, BB=128 fits).
    BB = min(BB, max(32, (256 * 1024) // Wp))
    BB = min(BB, G)
    while G % BB:
        BB //= 2
    # env overrides must preserve the kernel's cadence invariants: the
    # window refill fires every 256 diagonals (group = 256 // CHF needs
    # 256 % CHF == 0) and the walk's ops output block index is
    # (c * CHW) // 128, which only tiles when CHW and 128 divide evenly.
    assert CHF >= 2 and CHF % 2 == 0 and 256 % CHF == 0, (
        "ISOCON_AFFINE_CH must be an even divisor of 256, got %d" % CHF)
    assert (128 % CHW == 0) or (CHW % 128 == 0), (
        "ISOCON_AFFINE_CHW must divide 128 or be a multiple of 128, "
        "got %d" % CHW)
    return BB, CHF, CHW


def _fwd_kernel(winq_ref, wint_ref, qrefa_ref, qrefb_ref, trefa_ref,
                trefb_ref, qlen_ref, tlen_ref,
                ma_ref, mi_ref, go_ref, ge_ref, dirs_ref, acol_out, arow_out,
                h1_ref, h0_ref, e1_ref, f1_ref, wq_ref, wt_ref,
                acol_ref, arow_ref, map_ref, mip_ref, qlp_ref, tlp_ref,
                sump_ref, gop_ref, gep_ref, goLo_ref, geLo_ref, goUe_ref,
                geUe_ref, *, L: int, Wp: int, CH: int, BB: int, SB: int,
                CB: int):
    """One (pair_block, diag_chunk) grid step, compacted-parity layout.

    Scalar inputs arrive packed (BB, 2*SCAL): pair 2g at column 0, pair
    2g+1 at column SCAL.  The per-segment broadcast planes (score,
    length, gap-penalty) are built once at c == 0 into scratch.
    """
    c = pl.program_id(1)
    W = Wp // 2
    AE = -(Wp // 2 - 2)
    AO = AE - 1
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, 2 * W), 1)
    lane_loc = lane_iota & (W - 1)
    seg_right = lane_iota >= W

    def seg_plane(ref):
        a = ref[:, 0:1]
        b = ref[:, SCAL:SCAL + 1]
        return jnp.where(seg_right, b, a)

    qlA = qlen_ref[:, 0:1]
    qlB = qlen_ref[:, SCAL:SCAL + 1]
    tlA = tlen_ref[:, 0:1]
    tlB = tlen_ref[:, SCAL:SCAL + 1]
    d_max = jnp.max(jnp.maximum(qlA + tlA, qlB + tlB))
    d_min = jnp.min(jnp.minimum(jnp.minimum(qlA, tlA),
                                jnp.minimum(qlB, tlB)))
    chunk_live = c * CH + 2 <= d_max
    chunk_has_end = (c + 1) * CH + 1 >= d_min

    @pl.when(c == 0)
    def _init():
        wq_ref[:] = winq_ref[:].astype(jnp.int32)
        wt_ref[:] = wint_ref[:].astype(jnp.int32)
        # d=1 (odd layout): o = +-1 at u = Wp/4, Wp/4 - 1
        u1 = Wp // 4
        h1_ref[:] = jnp.where(
            (lane_loc == u1) | (lane_loc == u1 - 1), 0, NEGI
        ).astype(jnp.int32)
        # d=0 (even layout): o = 0 at u = Wp/4 - 1
        h0_ref[:] = jnp.where(lane_loc == u1 - 1, 0, NEGI).astype(jnp.int32)
        e1_ref[:] = jnp.full((BB, 2 * W), NEGI, jnp.int32)
        f1_ref[:] = jnp.full((BB, 2 * W), NEGI, jnp.int32)
        acol_ref[:] = jnp.full((BB, 2 * W), ACC_EMPTY, jnp.int32)
        arow_ref[:] = jnp.full((BB, 2 * W), ACC_EMPTY, jnp.int32)
        map_ref[:] = seg_plane(ma_ref)
        mip_ref[:] = seg_plane(mi_ref)
        qlp_ref[:] = seg_plane(qlen_ref)
        tlp_ref[:] = seg_plane(tlen_ref)
        sump_ref[:] = qlp_ref[:] + tlp_ref[:]
        go = seg_plane(go_ref)
        ge = seg_plane(ge_ref)
        gop_ref[:] = go
        gep_ref[:] = ge
        # parity-split roll-edge masks: the E roll (odd d) wraps into each
        # segment's lane 0; the F roll (even d) into each segment's last
        # lane.  Folding EDGE_NEG into the gap penalty makes those lanes
        # lose every max, like an explicit where-mask but free per step.
        edge0 = jnp.where(lane_loc == 0, EDGE_NEG, 0)
        edgeW = jnp.where(lane_loc == W - 1, EDGE_NEG, 0)
        goLo_ref[:] = go + edge0
        geLo_ref[:] = ge + edge0
        goUe_ref[:] = go + edgeW
        geUe_ref[:] = ge + edgeW

    def substep(ss, even, boundary, endscan):
        """One diagonal d = ss + 2 (parity given statically by ``even``)."""
        d = ss + 2
        ap = AE if even else AO
        H1 = h1_ref[:]
        H0 = h0_ref[:]
        qg = jnp.concatenate(
            [wq_ref[:, pl.ds(128, W)], wq_ref[:, pl.ds(W + 256, W)]], axis=1)
        tg = jnp.concatenate(
            [wt_ref[:, pl.ds(0, W)], wt_ref[:, pl.ds(W + 128, W)]], axis=1)
        sub = jnp.where(qg == tg, map_ref[:], mip_ref[:])

        if even:
            # E parent (o-1, d-1) same lane; F parent (o+1, d-1) at u+1
            h_left = H1
            e_left = e1_ref[:]
            e_open = h_left - gop_ref[:]
            e_ext = e_left - gep_ref[:]
            h_up = pltpu.roll(H1, shift=2 * W - 1, axis=1)
            f_up = pltpu.roll(f1_ref[:], shift=2 * W - 1, axis=1)
            f_open = h_up - goUe_ref[:]
            f_ext = f_up - geUe_ref[:]
        else:
            # E parent at u-1 (roll); F parent same lane
            h_left = pltpu.roll(H1, shift=1, axis=1)
            e_left = pltpu.roll(e1_ref[:], shift=1, axis=1)
            e_open = h_left - goLo_ref[:]
            e_ext = e_left - geLo_ref[:]
            h_up = H1
            f_up = f1_ref[:]
            f_open = h_up - gop_ref[:]
            f_ext = f_up - gep_ref[:]

        E = jnp.maximum(e_open, e_ext)
        e_opened = (e_open >= e_ext).astype(jnp.int32)
        F = jnp.maximum(f_open, f_ext)
        f_opened = (f_open >= f_ext).astype(jnp.int32)

        diag = H0 + sub
        H = jnp.maximum(jnp.maximum(diag, E), F)
        hdir = jnp.where(
            H == diag, H_DIAG, jnp.where(H == E, H_FROME, H_FROMF)
        ).astype(jnp.int32)

        if boundary:
            # free-end-gap cells o = +-d exist only while d <= Wp/2 + 1
            u_hi = (d - ap) // 2
            u_lo_b = (-d - ap) // 2     # exact: d, ap share parity
            on_boundary = (lane_loc == u_hi) | (lane_loc == u_lo_b)
            H = jnp.where(on_boundary, 0, H)
            hdir = jnp.where(on_boundary, H_START, hdir)
            out_grid = (lane_loc > u_hi) | (lane_loc < u_lo_b)
            H = jnp.where(out_grid, NEGI, H)
            E = jnp.where(out_grid | on_boundary, NEGI, E)
            F = jnp.where(out_grid | on_boundary, NEGI, F)
        H = jnp.maximum(H, NEGI)
        E = jnp.maximum(E, NEGI)
        F = jnp.maximum(F, NEGI)

        dirs = (hdir | (e_opened << 2) | (f_opened << 3)).astype(jnp.uint8)
        s_loc = ss - c * CH
        dirs_ref[:, pl.ds(s_loc * 2 * W, 2 * W)] = dirs

        if endscan:
            # last-col cells (i, m) at u = (2m - d - ap)/2, last-row (n, j)
            # at u = (d - 2n - ap)/2; both parities always consistent with
            # d, so u is exact and out-of-band u never matches lane_loc.
            K = (H << SB) + ss
            u_col = (2 * tlp_ref[:] - d - ap) >> 1
            okc = ((d >= tlp_ref[:]) & (d <= sump_ref[:])
                   & (lane_loc == u_col))
            acol_ref[:] = jnp.maximum(acol_ref[:],
                                      jnp.where(okc, K, ACC_EMPTY))
            u_row = (d - 2 * qlp_ref[:] - ap) >> 1
            okr = ((d >= qlp_ref[:]) & (d <= sump_ref[:])
                   & (lane_loc == u_row))
            arow_ref[:] = jnp.maximum(arow_ref[:],
                                      jnp.where(okr, K, ACC_EMPTY))

        h0_ref[:] = H1
        h1_ref[:] = H
        e1_ref[:] = E
        f1_ref[:] = F

        if even:
            # entering odd d+1: i advances -> q window rolls right
            wq_ref[:] = pltpu.roll(wq_ref[:], shift=1, axis=1)

            @pl.when(jax.lax.rem(ss + 2, 256) == 0)
            def _refill_q():
                wq_ref[:, pl.ds(0, 128)] = qrefa_ref[:].astype(jnp.int32)
                wq_ref[:, pl.ds(W + 128, 128)] = qrefb_ref[:].astype(
                    jnp.int32)
        else:
            # entering even d+1: j advances -> t window rolls left
            wt_ref[:] = pltpu.roll(wt_ref[:], shift=2 * (W + 128) - 1,
                                   axis=1)

            @pl.when(jax.lax.rem(ss + 1, 256) == 0)
            def _refill_t():
                wt_ref[:, pl.ds(W, 128)] = trefa_ref[:].astype(jnp.int32)
                wt_ref[:, pl.ds(2 * W + 128, 128)] = trefb_ref[:].astype(
                    jnp.int32)

    def make_body(boundary, endscan):
        def body(t, _):
            ss = c * CH + 2 * t          # chunk starts even: CH % 2 == 0
            substep(ss, True, boundary, endscan)
            substep(ss + 1, False, boundary, endscan)
            return 0
        return body

    jax.lax.cond(
        chunk_live,
        lambda: jax.lax.cond(
            c <= CB,
            lambda: jax.lax.fori_loop(0, CH // 2, make_body(True, True), 0),
            lambda: jax.lax.cond(
                chunk_has_end,
                lambda: jax.lax.fori_loop(0, CH // 2,
                                          make_body(False, True), 0),
                lambda: jax.lax.fori_loop(0, CH // 2,
                                          make_body(False, False), 0),
            ),
        ),
        lambda: 0,
    )

    @pl.when(c == pl.num_programs(1) - 1)
    def _flush_endpoints():
        acol_out[:] = acol_ref[:]
        arow_out[:] = arow_ref[:]


def _walk_kernel(dirs_ref, sc_ref, opsa_ref, opsb_ref, st_ref,
                 *, Wp: int, CH: int, BB: int, S: int):
    """Backward walk over compacted dirs planes; 2 packed pairs per row.

    sc_ref: (BB, 2*SCAL) int32, columns [0]=eiA [1]=ejA, [SCAL]=eiB
    [SCAL+1]=ejB.  State carried in st_ref (output block, persists across
    the chunk axis): columns 0..3 = pair A (i, j, gapstate, overflow),
    4..7 = pair B.
    """
    c = pl.program_id(1)
    W = Wp // 2
    AE = -(Wp // 2 - 2)
    AO = AE - 1
    o_lo = AO
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BB, 2 * W), 1)
    lane_ops = jax.lax.broadcasted_iota(jnp.int32, (BB, 128), 1)
    ops_base = (c * CH) % 128

    @pl.when(c == 0)
    def _init():
        st_ref[:, 0:1] = sc_ref[:, 0:1]
        st_ref[:, 1:2] = sc_ref[:, 1:2]
        st_ref[:, 2:3] = jnp.zeros((BB, 1), jnp.int32)
        st_ref[:, 3:4] = jnp.zeros((BB, 1), jnp.int32)
        st_ref[:, 4:5] = sc_ref[:, SCAL:SCAL + 1]
        st_ref[:, 5:6] = sc_ref[:, SCAL + 1:SCAL + 2]
        st_ref[:, 6:7] = jnp.zeros((BB, 1), jnp.int32)
        st_ref[:, 7:8] = jnp.zeros((BB, 1), jnp.int32)

    # skip chunks whose diagonals all lie above every walker's start
    d_max = jnp.max(jnp.maximum(
        sc_ref[:, 0:1] + sc_ref[:, 1:2],
        sc_ref[:, SCAL:SCAL + 1] + sc_ref[:, SCAL + 1:SCAL + 2]))
    chunk_live = (S + 2) - (c + 1) * CH <= d_max

    def track(i, j, st, ov, bits, d):
        """Shared per-pair walk transition (bits already extracted)."""
        active = (i + j == d) & (i > 0) & (j > 0) & (st != 3)
        o = j - i
        on_edge = (o <= o_lo) | (o >= Wp // 2)
        ov = jnp.where(active & on_edge, 1, ov)
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
        return op, ni, nj, nst, ov

    def step(s, _):
        d = (S + 1) - (c * CH + s)
        ap = jnp.where(d % 2 == 0, AE, AO)
        iA = st_ref[:, 0:1]
        jA = st_ref[:, 1:2]
        iB = st_ref[:, 4:5]
        jB = st_ref[:, 5:6]
        plane = dirs_ref[:, pl.ds((CH - 1 - s) * 2 * W, 2 * W)
                         ].astype(jnp.int32)
        # one reduction extracts both packed pairs: pair B's byte rides
        # bits 8..15 of the summed key (selected lanes are exclusive)
        uA = (jA - iA - ap) >> 1
        uB = W + ((jB - iB - ap) >> 1)
        selA = lane_iota == jnp.clip(uA, 0, W - 1)
        selB = lane_iota == jnp.clip(uB, W, 2 * W - 1)
        key = jnp.where(selA, plane, 0) | jnp.where(selB, plane << 8, 0)
        r = jnp.sum(key, axis=1, keepdims=True)
        opA, niA, njA, nstA, ovA = track(
            iA, jA, st_ref[:, 2:3], st_ref[:, 3:4], r & 0xFF, d)
        opB, niB, njB, nstB, ovB = track(
            iB, jB, st_ref[:, 6:7], st_ref[:, 7:8], r >> 8, d)

        opsa_ref[:] = jnp.where(lane_ops == ops_base + s, opA, opsa_ref[:])
        opsb_ref[:] = jnp.where(lane_ops == ops_base + s, opB, opsb_ref[:])
        st_ref[:, 0:1] = niA
        st_ref[:, 1:2] = njA
        st_ref[:, 2:3] = nstA
        st_ref[:, 3:4] = ovA
        st_ref[:, 4:5] = niB
        st_ref[:, 5:6] = njB
        st_ref[:, 6:7] = nstB
        st_ref[:, 7:8] = ovB
        return 0

    jax.lax.cond(
        chunk_live,
        lambda: jax.lax.fori_loop(0, CH, step, 0),
        lambda: 0,
    )


@functools.partial(jax.jit, static_argnames=("Wp", "L", "interpret"))
def sg_align_with_ops_pallas_c(qcodes, tcodes, qlen, tlen, match, mismatch,
                               gopen, gext, *, Wp: int, L: int,
                               interpret: bool = False):
    """Compacted-parity version of ``sg_align_with_ops_pallas``.

    Same contract: returns (best, ei, ej, ops, fi, fj, overflow); ops is
    [B, S] uint8 backward with OP_NONE gaps.
    """
    assert Wp % 256 == 0 and Wp >= 256
    assert L % 128 == 0
    B = qcodes.shape[0]
    assert B % 2 == 0
    W = Wp // 2
    G = B // 2
    BB, CH, CHW = _geometry(Wp, L, G)
    assert CH % 2 == 0
    steps = 2 * L - 1
    nchunks = -(-steps // CH)
    group = 256 // CH            # keep S % 256 == 0 (refill cadence)
    nchunks = -(-nchunks // group) * group
    S = nchunks * CH
    SB = int(S + 1).bit_length()
    CB = (Wp // 2) // CH + 1
    PQ = Wp // 4 + 128
    PT = Wp // 4 - 1

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int8), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int8), TPAD)
    qr = q[:, ::-1]
    # padded streams, both L + W + 128 wide (see layout derivation below)
    QRP = jnp.pad(qr, ((0, 0), (PQ, Wp // 4)), constant_values=QPAD)
    TP = jnp.pad(t, ((0, 0), (PT, L + W + 128 - PT - L)),
                 constant_values=TPAD)
    # q read lane u at diag d is QRP[Xq0 - nq_rolls + u] with
    # Xq0 = PQ + L - Wp/4 (a multiple of 128 by construction of PQ);
    # t read lane u is TP[PT + x_t0 + nt_rolls + u] with
    # PT + x_t0 = 0.  Initial windows cover one 128-lane staging slab
    # plus the W read lanes.
    Xq0 = PQ + L - Wp // 4
    winq = jax.lax.dynamic_slice(QRP, (0, Xq0 - 128), (B, W + 128))
    wint = jax.lax.dynamic_slice(TP, (0, 0), (B, W + 128))
    q0 = Xq0 // 128 - 1
    tp0 = W // 128

    # pack pairs (2g, 2g+1) into plane row g (reshape = free)
    winq = winq.reshape(G, 2 * (W + 128))
    wint = wint.reshape(G, 2 * (W + 128))
    QRP2 = QRP.reshape(G, 2 * QRP.shape[1])
    TP2 = TP.reshape(G, 2 * TP.shape[1])
    nqb = QRP.shape[1] // 128

    def scal2(v):
        return jnp.tile(v.astype(jnp.int32)[:, None],
                        (1, SCAL)).reshape(G, 2 * SCAL)

    grid = (G // BB, nchunks)
    fixed = lambda w: pl.BlockSpec((BB, w), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM)
    # refill r reads QRP 128-column block q0 - r for pair A and the same
    # block shifted by the A-stream width (nqb blocks) for pair B; the
    # packed plane is fed twice with the two index maps
    qrefa_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, jnp.maximum(q0 - ((c + 1) * CH) // 256, 0)),
        memory_space=pltpu.VMEM,
    )
    qrefb_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, nqb + jnp.maximum(q0 - ((c + 1) * CH) // 256, 0)),
        memory_space=pltpu.VMEM,
    )
    ntb = TP.shape[1] // 128
    trefa_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, tp0 + ((c + 1) * CH) // 256),
        memory_space=pltpu.VMEM,
    )
    trefb_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, ntb + tp0 + ((c + 1) * CH) // 256),
        memory_space=pltpu.VMEM,
    )
    acc_spec = pl.BlockSpec((BB, 2 * W), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)

    dirs, acol, arow = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, Wp=Wp, CH=CH, BB=BB, SB=SB,
                          CB=CB),
        out_shape=(
            jax.ShapeDtypeStruct((G, S * 2 * W), jnp.uint8),
            jax.ShapeDtypeStruct((G, 2 * W), jnp.int32),
            jax.ShapeDtypeStruct((G, 2 * W), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            fixed(2 * (W + 128)), fixed(2 * (W + 128)),
            qrefa_spec, qrefb_spec, trefa_spec, trefb_spec,
            fixed(2 * SCAL), fixed(2 * SCAL), fixed(2 * SCAL),
            fixed(2 * SCAL), fixed(2 * SCAL), fixed(2 * SCAL),
        ],
        out_specs=(
            pl.BlockSpec((BB, CH * 2 * W), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            acc_spec, acc_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # h1
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # h0
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # e1
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # f1
            pltpu.VMEM((BB, 2 * (W + 128)), jnp.int32),  # wq
            pltpu.VMEM((BB, 2 * (W + 128)), jnp.int32),  # wt
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # acol
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # arow
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # ma plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # mi plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # qlen plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # tlen plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # qlen+tlen plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # go plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # ge plane
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # goL odd-masked
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # geL odd-masked
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # goU even-masked
            pltpu.VMEM((BB, 2 * W), jnp.int32),          # geU even-masked
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(winq, wint, QRP2, QRP2, TP2, TP2, scal2(qlen), scal2(tlen),
      scal2(match), scal2(mismatch), scal2(gopen), scal2(gext))

    acolP = acol.reshape(B, W)
    arowP = arow.reshape(B, W)
    best, ei, ej = _pick_endpoint(acolP, arowP, qlen.astype(jnp.int32),
                                  tlen.astype(jnp.int32), SB)

    sc = jnp.stack([ei, ej], axis=1).reshape(G, 4)     # eiA ejA eiB ejB
    sc = jnp.concatenate([
        jnp.pad(sc[:, 0:2], ((0, 0), (0, SCAL - 2))),
        jnp.pad(sc[:, 2:4], ((0, 0), (0, SCAL - 2))),
    ], axis=1)

    assert S % CHW == 0, (
        "walk chunk %d does not divide the step count %d "
        "(bad ISOCON_AFFINE_CHW override)" % (CHW, S))
    nchunks_w = S // CHW
    opsa, opsb, stf = pl.pallas_call(
        functools.partial(_walk_kernel, Wp=Wp, CH=CHW, BB=BB, S=S),
        out_shape=(
            jax.ShapeDtypeStruct((G, S), jnp.uint8),
            jax.ShapeDtypeStruct((G, S), jnp.uint8),
            jax.ShapeDtypeStruct((G, SCAL), jnp.int32),
        ),
        grid=(G // BB, nchunks_w),
        in_specs=[
            pl.BlockSpec((BB, CHW * 2 * W),
                         lambda i, c: (i, nchunks_w - 1 - c),
                         memory_space=pltpu.VMEM),
            fixed(2 * SCAL),
        ],
        out_specs=(
            pl.BlockSpec((BB, 128), lambda i, c: (i, (c * CHW) // 128),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 128), lambda i, c: (i, (c * CHW) // 128),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, SCAL), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dirs, sc)
    ops = jnp.stack([opsa, opsb], axis=1).reshape(B, S)
    fi = jnp.stack([stf[:, 0], stf[:, 4]], axis=1).reshape(B)
    fj = jnp.stack([stf[:, 1], stf[:, 5]], axis=1).reshape(B)
    overflow = jnp.stack([stf[:, 3], stf[:, 7]], axis=1).reshape(B) != 0
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    ops = jnp.where(k_iota < (S + 1 - (ei + ej))[:, None],
                    jnp.uint8(OP_NONE), ops)
    return best, ei, ej, ops, fi, fj, overflow


@functools.partial(jax.jit,
                   static_argnames=("Wp", "L", "interpret", "fuse_out"))
def sg_align_pool_pallas_c(pool_flat, plen, ia, ib, match, mismatch, gopen,
                           gext, *, Wp: int, L: int, interpret: bool = False,
                           fuse_out: bool = False):
    """Pool-gather + packed-opcode wrapper (same wire format as v2)."""
    U = pool_flat.shape[0] // L
    pool = pool_flat.reshape(U, L)
    qcodes = jnp.take(pool, ia, axis=0)
    tcodes = jnp.take(pool, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    best, ei, ej, ops, fi, fj, overflow = sg_align_with_ops_pallas_c(
        qcodes, tcodes, qlen, tlen, match, mismatch, gopen, gext,
        Wp=Wp, L=L, interpret=interpret)
    S = ops.shape[1]
    packed = ops.reshape(ops.shape[0], S // 4, 4).astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    packed = jnp.sum(packed << shifts[None, None, :],
                     axis=2).astype(jnp.uint8)
    scal = jnp.stack(
        [best, ei, ej, fi, fj, overflow.astype(jnp.int32)]
    ).astype(jnp.int32)
    if fuse_out:
        scal_u8 = jax.lax.bitcast_convert_type(scal, jnp.uint8)
        return (jnp.concatenate([scal_u8.reshape(-1), packed.reshape(-1)]),)
    return scal, packed

"""Split fwd-kernel vs walk-kernel cost of the current affine Pallas path.

Times, with device-resident inputs (tunnel-neutral, tiny outputs forced):
  gather+fwd      : pool gather + forward DP (dirs produced, 1 int32 forced)
  walk            : walk kernel alone on a device-resident dirs buffer
  full            : sg_align_pool_pallas end to end
Usage: python scripts/bench_affine_split.py [B] [L] [Wp]
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

from isocon_tpu.io import read_fasta
from isocon_tpu.ops.encode import encode_seq
from isocon_tpu.ops import affine_pallas as ap
from isocon_tpu.ops.affine import QPAD, TPAD
from isocon_tpu.ops.engine import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

READS = "/root/reference/test/data/simulated_pacbio_reads_n_500.fa"
seqs = [s for _a, s in read_fasta(READS) if 1200 <= len(s) <= L]
seqs.sort(key=len)
U = min(len(seqs), 512)
pool = np.full((U, L), 6, dtype=np.int8)
plen = np.ones(U, dtype=np.int32)
for i in range(U):
    e = encode_seq(seqs[i])
    pool[i, : len(e)] = e
    plen[i] = len(e)
rng = np.random.default_rng(0)
ia = rng.integers(0, U - 3, B).astype(np.int32)
ib = (ia + 1 + rng.integers(0, 3, B)).astype(np.int32)
ma = np.full(B, 2, np.int16)
mi = np.full(B, -2, np.int16)
go = np.full(B, 2, np.int16)
ge = np.full(B, 0, np.int16)

dpool = jax.device_put(pool.reshape(-1))
dplen = jax.device_put(plen)
dargs = [jax.device_put(x) for x in (ia, ib, ma, mi, go, ge)]


@functools.partial(jax.jit, static_argnames=("Wp", "L", "upto"))
def fwd_only(pool_flat, plen, ia, ib, match, mismatch, gopen, gext,
             *, Wp, L, upto):
    U = pool_flat.shape[0] // L
    pl_ = pool_flat.reshape(U, L)
    qcodes = jnp.take(pl_, ia, axis=0)
    tcodes = jnp.take(pl_, ib, axis=0)
    qlen = jnp.take(plen, ia)
    tlen = jnp.take(plen, ib)
    if upto == "gather":
        return jnp.sum(qcodes.astype(jnp.int32)) + jnp.sum(qlen + tlen)
    # replicate wrapper up to the fwd pallas_call (copied from
    # sg_align_with_ops_pallas)
    B = qcodes.shape[0]
    BB, CH, CHW = ap._geometry(Wp, L, B)
    steps = 2 * L - 1
    nchunks = -(-steps // CH)
    group = 128 // CH
    nchunks = -(-nchunks // group) * group
    S = nchunks * CH
    SB = int(S + 1).bit_length()
    CB = (Wp // 2) // CH + 1
    P0q, P0t = ap._paddings(L, Wp)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    q = jnp.where(pos < qlen[:, None], qcodes.astype(jnp.int8), QPAD)
    t = jnp.where(pos < tlen[:, None], tcodes.astype(jnp.int8), TPAD)
    qe = jnp.repeat(q, 2, axis=1)[:, ::-1]
    te = jnp.repeat(t, 2, axis=1)

    def pad_to(x, left, cval):
        total = left + x.shape[1]
        right = (-total) % 128 + S - 2 * L + Wp + 384
        return jnp.pad(x, ((0, 0), (left, right)), constant_values=cval)

    QP = pad_to(qe, P0q, QPAD)
    TP = pad_to(te, P0t, TPAD)
    T0 = P0t + (-(Wp // 2 - 1))
    Q0 = P0q + 2 * L - 1 + (-(Wp // 2 - 1))
    winq = jax.lax.dynamic_slice(QP, (0, Q0 - 128), (B, Wp + 128))
    wint = jax.lax.dynamic_slice(TP, (0, T0), (B, Wp + 128))

    def scal(v, dtype=jnp.int32):
        return jnp.tile(v.astype(dtype)[:, None], (1, ap.SCAL))

    grid = (B // BB, nchunks)
    fixed = lambda w: pl.BlockSpec((BB, w), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM)
    tp0 = (T0 + Wp) // 128
    qp0 = (2 * L) // 128
    tref_spec = pl.BlockSpec((BB, 128),
                             lambda i, c: (i, tp0 + ((c + 1) * CH) // 128),
                             memory_space=pltpu.VMEM)
    qref_spec = pl.BlockSpec(
        (BB, 128),
        lambda i, c: (i, jnp.maximum(qp0 - ((c + 1) * CH) // 128, 0)),
        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((BB, Wp), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)
    dirs, acol, arow = pl.pallas_call(
        functools.partial(ap._fwd_kernel, L=L, Wp=Wp, CH=CH, BB=BB, SB=SB,
                          CB=CB),
        out_shape=(
            jax.ShapeDtypeStruct((B, S * Wp), jnp.uint8),
            jax.ShapeDtypeStruct((B, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, Wp), jnp.int32),
        ),
        grid=grid,
        in_specs=[fixed(Wp + 128), fixed(Wp + 128), qref_spec, tref_spec,
                  fixed(ap.SCAL), fixed(ap.SCAL), fixed(ap.SCAL),
                  fixed(ap.SCAL), fixed(ap.SCAL), fixed(ap.SCAL)],
        out_specs=(
            pl.BlockSpec((BB, CH * Wp), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            acc_spec, acc_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp + 128), jnp.int32),
            pltpu.VMEM((BB, Wp + 128), jnp.int32),
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
            pltpu.VMEM((BB, Wp), jnp.int32), pltpu.VMEM((BB, Wp), jnp.int32),
        ],
    )(winq, wint, QP, TP, scal(qlen), scal(tlen), scal(match),
      scal(mismatch), scal(gopen), scal(gext))
    # force dirs without downloading it: fold a 1-element slice
    return (jnp.max(acol) + jnp.max(arow)
            + jnp.sum(dirs[:, :128].astype(jnp.int32)))


def timeit(name, fn, n=3):
    t0 = time.perf_counter()
    np.asarray(fn())
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    print("%-12s %.3fs  (%.0f pairs/s)  [compile+1st %.1fs]"
          % (name, best, B / best, comp))
    return best


timeit("gather", lambda: fwd_only(dpool, dplen, *dargs, Wp=Wp, L=L,
                                  upto="gather"))
timeit("gather+fwd", lambda: fwd_only(dpool, dplen, *dargs, Wp=Wp, L=L,
                                      upto="fwd"))


def full():
    outs = ap.sg_align_pool_pallas(dpool, dplen, *dargs, Wp=Wp, L=L)
    return jnp.sum(outs[0]) + jnp.sum(outs[1][:, :128].astype(jnp.int32))


full_j = jax.jit(full)
timeit("full", full_j)

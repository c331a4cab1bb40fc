"""Microbenchmark: where does the pooled affine Pallas path spend time?

Times (best-of-N, forced with np.asarray per CLAUDE.md) on the real TPU:
  1. myers_ed_pool sanity rate
  2. affine fwd pallas_call alone (banded_sg forward, dirs streamed)
  3. walk pallas_call alone
  4. full sg_align_with_ops_pallas
Run:  python scripts/bench_affine_parts.py [B] [L] [Wp]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
Wp = int(sys.argv[3]) if len(sys.argv) > 3 else 256

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(0)
qc = rng.integers(0, 4, size=(B, L), dtype=np.int8)
# targets = queries with sprinkled edits so alignments are realistic
tc = qc.copy()
for i in range(B):
    for _ in range(20):
        p = rng.integers(0, L - 1)
        tc[i, p] = (tc[i, p] + 1) % 4
qlen = np.full(B, L - 17, np.int32)
tlen = np.full(B, L - 5, np.int32)
ma = np.full(B, 2, np.int16)
mi = np.full(B, -2, np.int16)
go = np.full(B, 2, np.int16)
ge = np.full(B, 0, np.int16)


def timeit(name, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print("%-28s best %.4fs  -> %8.0f pairs/s" % (name, best, B / best))
    return best


from isocon_tpu.ops import affine_pallas as ap
from isocon_tpu.ops.affine import sg_align_with_ops

# compile once
full = lambda: ap.sg_align_with_ops_pallas(
    qc, tc, qlen, tlen, ma, mi, go, ge, Wp=Wp, L=L)
r = full()
np.asarray(r[0])
timeit("pallas fwd+walk (full)", full)

# fwd alone: replicate the setup from sg_align_with_ops_pallas
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fwd_only(qc, tc, qlen, tlen, ma, mi, go, ge):
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
    scal = lambda v: jnp.tile(v.astype(jnp.int32)[:, None], (1, ap.SCAL))
    grid = (B // ap.BB, nchunks)
    Wq = QP.shape[1]
    Wt = TP.shape[1]
    pair_block = lambda w: pl.BlockSpec((ap.BB, w), lambda i, c: (i, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(ap._fwd_kernel, L=L, Wp=Wp, CH=CH, P0q=P0q,
                          P0t=P0t),
        out_shape=(
            jax.ShapeDtypeStruct((B, S * Wp), jnp.uint8),
            jax.ShapeDtypeStruct((B, ap.SCAL), jnp.int32),
            jax.ShapeDtypeStruct((B, ap.SCAL), jnp.int32),
            jax.ShapeDtypeStruct((B, ap.SCAL), jnp.int32),
        ),
        grid=grid,
        in_specs=[pair_block(Wq), pair_block(Wt)] + [pair_block(ap.SCAL)] * 6,
        out_specs=(
            pl.BlockSpec((ap.BB, CH * Wp), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pair_block(ap.SCAL), pair_block(ap.SCAL), pair_block(ap.SCAL),
        ),
        scratch_shapes=[
            pltpu.VMEM((ap.BB, Wp), jnp.int32),
            pltpu.VMEM((ap.BB, Wp), jnp.int32),
            pltpu.VMEM((ap.BB, Wp), jnp.int32),
            pltpu.VMEM((ap.BB, Wp), jnp.int32),
            pltpu.VMEM((ap.BB, Wp + 128), jnp.int32),
            pltpu.VMEM((ap.BB, Wp + 128), jnp.int32),
            pltpu.VMEM((ap.BB, ap.SCAL), jnp.int32),
        ],
    )(QP, TP, scal(qlen), scal(tlen), scal(ma), scal(mi), scal(go), scal(ge))


fwd_j = jax.jit(fwd_only)
r = fwd_j(qc, tc, qlen, tlen, ma, mi, go, ge)
np.asarray(r[1])
timeit("pallas fwd only", lambda: fwd_j(qc, tc, qlen, tlen, ma, mi, go, ge))

# lax.scan reference
scan = lambda: sg_align_with_ops(qc, tc, qlen, tlen, ma, mi, go, ge, Wp=Wp, L=L)
r = scan()
np.asarray(r[0])
timeit("lax.scan fwd+walk", scan)

# myers sanity
from isocon_tpu.ops.myers_pallas import myers_ed_pallas

BM = 4096
qm = rng.integers(0, 4, size=(BM, L), dtype=np.int8)
tm = qm.copy()
lm = np.full(BM, L - 5, np.int32)
my = lambda: myers_ed_pallas(qm, tm, lm, lm, L=L, sub=16)
np.asarray(my())
tbest = timeit("myers ed (B=4096)", my)
print("myers rate: %.0f pairs/s" % (BM / tbest))

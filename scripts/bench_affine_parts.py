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

"""Quick timing of the pooled affine Pallas kernel on the current backend.

Usage: python scripts/bench_affine_now.py [B] [L] [Wp] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
Wp = int(sys.argv[3]) if len(sys.argv) > 3 else 256
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

import jax
import jax.numpy as jnp

from isocon_tpu.io import read_fasta
from isocon_tpu.ops.encode import encode_seq
from isocon_tpu.ops.affine_pallas_c import sg_align_pool_pallas_c as sg_align_pool_pallas
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
args = [jax.device_put(x) for x in (ia, ib, ma, mi, go, ge)]

t0 = time.perf_counter()
outs = sg_align_pool_pallas(dpool, dplen, *args, Wp=Wp, L=L)
res = [np.asarray(o) for o in outs]
print("compile+first run: %.2fs" % (time.perf_counter() - t0))

best = None
for _ in range(REPS):
    t0 = time.perf_counter()
    outs = sg_align_pool_pallas(dpool, dplen, *args, Wp=Wp, L=L)
    _ = np.asarray(outs[0])
    _ = np.asarray(outs[1])
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    print("  run: %.3fs  (%.0f pairs/s)" % (dt, B / dt))
print("BEST: B=%d L=%d Wp=%d  %.3fs  %.0f pairs/s" % (B, L, Wp, best, B / best))

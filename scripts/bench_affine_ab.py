"""Interleaved A/B of the v2 vs compacted-parity affine kernels.

Tunnel variance between runs is huge (CLAUDE.md); interleaving reps in
one process is the only fair comparison.  Prints per-kernel best-of-N.

Usage: python scripts/bench_affine_ab.py [B] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

READS = "/root/reference/test/data/simulated_pacbio_reads_n_500.fa"
L = 2048
WP = 256


def main():
    import jax
    from isocon_tpu.io import read_fasta
    from isocon_tpu.ops.encode import encode_seq
    from isocon_tpu.ops.affine_pallas import sg_align_pool_pallas
    from isocon_tpu.ops.affine_pallas_c import sg_align_pool_pallas_c

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    seqs = [s for _a, s in read_fasta(READS) if 1200 <= len(s) <= L]
    U = 1024
    pool = np.full((U, L), 6, dtype=np.int8)
    plen = np.ones(U, dtype=np.int32)
    for u in range(U):
        e = encode_seq(seqs[u % len(seqs)])
        pool[u, : len(e)] = e
        plen[u] = len(e)
    dp = jax.device_put(pool.reshape(-1))
    dl = jax.device_put(plen)
    rng = np.random.default_rng(0)
    ia = rng.integers(0, U - 3, B).astype(np.int32)
    ib = (ia + 1 + rng.integers(0, 3, B)).astype(np.int32)
    args = [dp, dl, jax.device_put(ia), jax.device_put(ib)] + [
        jax.device_put(np.full(B, v, np.int16)) for v in (2, -2, 2, 0)
    ]

    kernels = {
        "v2": lambda: np.asarray(
            sg_align_pool_pallas(*args, Wp=WP, L=L, fuse_out=True)[0]),
        "compact": lambda: np.asarray(
            sg_align_pool_pallas_c(*args, Wp=WP, L=L, fuse_out=True)[0]),
    }
    for name, fn in kernels.items():
        t0 = time.perf_counter()
        fn()
        print("%s compile+first %.1fs" % (name, time.perf_counter() - t0),
              flush=True)
    best = {k: 0.0 for k in kernels}
    for r in range(reps):
        for name, fn in kernels.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best[name] = max(best[name], B / dt)
            print("  rep%d %s %.1f ms -> %.0f pairs/s"
                  % (r, name, dt * 1e3, B / dt), flush=True)
    for name in kernels:
        print("%s best %.0f pairs/s (B=%d)" % (name, best[name], B),
              flush=True)


if __name__ == "__main__":
    main()

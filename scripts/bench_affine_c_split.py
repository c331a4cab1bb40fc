"""Kernel-vs-download split for the compacted affine path.

Times sg_align_pool_pallas_c at B with (a) outputs reduced on device (no
download: pure gather+fwd+walk+pack cost) and (b) the engine's fused
uint8 buffer downloaded.  The difference is the host-link share of the
per-call cost.

Usage: python scripts/bench_affine_c_split.py [B]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
L = 2048
WP = 256


def main():
    import jax
    import jax.numpy as jnp
    from isocon_tpu.io import read_fasta
    from isocon_tpu.ops.encode import encode_seq
    from isocon_tpu.ops.affine_pallas_c import sg_align_pool_pallas_c
    from isocon_tpu.ops.engine import enable_compilation_cache

    enable_compilation_cache()
    seqs = [s for _a, s in read_fasta(
        "/root/reference/test/data/simulated_pacbio_reads_n_500.fa")
        if 1200 <= len(s) <= L]
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
    scal16 = [np.full(B, v, np.int16) for v in (2, -2, 2, 0)]

    @jax.jit
    def nodl(pf, pl_):
        scal, packed = sg_align_pool_pallas_c(
            pf, pl_, ia, ib, *scal16, Wp=WP, L=L)
        return jnp.sum(scal) + jnp.sum(packed[:, ::128].astype(jnp.int32))

    def full():
        (buf,) = sg_align_pool_pallas_c(dp, dl, ia, ib, *scal16, Wp=WP, L=L,
                                        fuse_out=True)
        return np.asarray(buf)

    for name, fn in (("no-download", lambda: np.asarray(nodl(dp, dl))),
                     ("fused-dl", full)):
        t0 = time.perf_counter()
        fn()
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print("%-12s %7.1f ms  (%.0f pairs/s)  [compile+1st %.1fs]"
              % (name, best * 1e3, B / best, comp), flush=True)

    # engine pattern: launch K batches async, then collect in order --
    # measures whether the next batch's compute overlaps the previous
    # batch's download over the tunnel
    K = 3
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        bufs = [sg_align_pool_pallas_c(dp, dl, ia, ib, *scal16, Wp=WP, L=L,
                                       fuse_out=True)[0] for _ in range(K)]
        for b in bufs:
            np.asarray(b)
        best = min(best, time.perf_counter() - t0)
    print("%-12s %7.1f ms/call  (%.0f pairs/s pipelined, K=%d)"
          % ("launch+coll", best / K * 1e3, K * B / best, K), flush=True)


if __name__ == "__main__":
    main()

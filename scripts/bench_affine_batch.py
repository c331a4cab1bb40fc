"""Measure pooled affine call throughput vs total batch size B.

The per-call split at B=512 (scripts/bench_affine_split.py) is roughly
gather+RTT 28ms / fwd 14ms / walk 13ms -- the fixed tunnel RTT is ~45%
of the call.  Larger B amortizes it linearly until the kernel rate
(~19k pairs/s fwd+walk) dominates.  This script decided the engine's
accelerator align-batch floor (2048: 8.5k -> 12.2k pairs/s; the fit is
~26 ms fixed + ~68 us/pair).  Caveat measured separately: the fused
opcode download is O(Bp) bytes (~1 KB/pair at L=2048), so a mostly-
dummy big-shape call still pays the full download -- the engine drops
small chunks to the smaller {512, 1024} shapes (engine.align_pairs).

Usage: python scripts/bench_affine_batch.py [B ...]
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
    from isocon_tpu.ops.affine_pallas_c import (
        sg_align_pool_pallas_c as sg_align_pool_pallas)

    Bs = [int(x) for x in sys.argv[1:]] or [512, 1024, 2048]
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
    for B in Bs:
        ia = rng.integers(0, U - 3, B).astype(np.int32)
        ib = (ia + 1 + rng.integers(0, 3, B)).astype(np.int32)
        # numpy index/score vectors = the engine calling convention, so the
        # persistent compile cache shares entries with pipeline runs
        args = [dp, dl, ia, ib] + [
            np.full(B, v, np.int16) for v in (2, -2, 2, 0)
        ]

        def run():
            (buf,) = sg_align_pool_pallas(*args, Wp=WP, L=L, fuse_out=True)
            return np.asarray(buf)

        t0 = time.perf_counter()
        run()
        print("B=%d compile+first %.1fs" % (B, time.perf_counter() - t0),
              flush=True)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best = max(best, B / dt)
            print("  B=%d %.1f ms -> %.0f pairs/s" % (B, dt * 1e3, B / dt),
                  flush=True)
        print("B=%d best %.0f pairs/s" % (B, best), flush=True)


if __name__ == "__main__":
    main()

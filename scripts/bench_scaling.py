"""Sharded-engine scaling measurement on an N-virtual-device CPU mesh.

Stand-in for the BASELINE.md >=80%-efficiency-at-2-hosts target until real
multi-chip hardware is reachable: shards the engine's banded-ED batch over
1/2/4/8 virtual CPU devices (XLA host-platform devices are real threads,
so on a multi-core host this measures actual parallel speedup; on this
2-core box the ceiling is 2x and 8-device efficiency is reported against
min(n_devices, n_cores)).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_scaling.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

from isocon_tpu.io import read_fasta
from isocon_tpu.ops.encode import encode_seq

READS = "/root/reference/test/data/simulated_pacbio_reads_n_200.fa"
L = 2048
WP = 128
B = 256

print("backend: %s, devices: %d, cores: %d"
      % (jax.default_backend(), len(jax.devices()), os.cpu_count()))

seqs = [s for _a, s in read_fasta(READS) if len(s) <= L]
seqs.sort(key=len)
q = np.full((B, L), 5, dtype=np.int8)
t = np.full((B, L), 6, dtype=np.int8)
qlen = np.ones(B, dtype=np.int32)
tlen = np.ones(B, dtype=np.int32)
k = 0
for i in range(B):
    a, b = seqs[k % len(seqs)], seqs[(k + 1) % len(seqs)]
    k += 1
    ea, eb = encode_seq(a), encode_seq(b)
    q[i, : len(ea)] = ea
    t[i, : len(eb)] = eb
    qlen[i], tlen[i] = len(ea), len(eb)

from isocon_tpu.parallel.mesh import make_mesh
from isocon_tpu.parallel.sharding import Sharder

rates = {}
for n in (1, 2, 4, 8):
    if n > len(jax.devices()):
        continue
    sh = Sharder(make_mesh(n))
    sh.banded_ed(q, t, qlen, tlen, Wp=WP, L=L)  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        sh.banded_ed(q, t, qlen, tlen, Wp=WP, L=L)
        dt = time.perf_counter() - t0
        best = max(best, B / dt)
    rates[n] = best
    eff = best / (rates[1] * min(n, os.cpu_count())) * 100
    print("devices=%d  %8.1f alignments/s  efficiency vs %d cores: %5.1f%%"
          % (n, best, min(n, os.cpu_count()), eff))

"""Sharded-engine scaling curve on an N-virtual-device CPU mesh.

Stand-in for the BASELINE.md >=80%-efficiency-at-2-hosts target until real
multi-chip hardware is reachable: runs a fixed PairEngine edit-distance
workload (the pipeline's hot op) sharded over 1/2/4/8 virtual CPU devices.
XLA host-platform devices are real threads, so on a multi-core host this
measures actual parallel speedup; on a 2-core box the ceiling is 2x and
efficiency is reported against min(n_devices, n_cores).

Prints one JSON line: {"1": rate, "2": rate, ..., "efficiency": {...}}.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_scaling.py
"""
import json
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

import random

import jax

from isocon_tpu.io import read_fasta
from isocon_tpu.ops.engine import PairEngine
from isocon_tpu.parallel.mesh import make_mesh
from isocon_tpu.parallel.sharding import Sharder

READS = "/root/reference/test/data/simulated_pacbio_reads_n_200.fa"
# B large enough that each device's per-step vector work dominates the
# lax.scan per-step dispatch overhead (which is batch-independent and
# would otherwise flatten the curve at small per-device batches)
B = int(os.environ.get("ISOCON_SCALING_B", 1024))
MAXLEN = int(os.environ.get("ISOCON_SCALING_MAXLEN", 1200))

ncores = os.cpu_count()
print("backend: %s, devices: %d, cores: %d"
      % (jax.default_backend(), len(jax.devices()), ncores),
      file=sys.stderr)

# lightly-mutated pairs (ED <= ~15): every pair certifies at the first
# band, so the measurement is one full-batch kernel round per call --
# escalation rounds would serialize tiny uncertified batches and measure
# the workload's shape, not the mesh scaling
rng = random.Random(0)
seqs = [s for _a, s in read_fasta(READS) if len(s) <= MAXLEN]
seqs.sort(key=len)
pairs = []
k = 0
while len(pairs) < B:
    s = seqs[k % len(seqs)]
    t = list(s)
    for _ in range(rng.randrange(3, 15)):
        p = rng.randrange(len(t))
        t[p] = rng.choice("ACGT")
    pairs.append((s, "".join(t)))
    k += 1

rates = {}
eff = {}
for n in (1, 2, 4, 8):
    if n > len(jax.devices()):
        continue
    # fixed engine workload: sharded POOLED banded-ED batches (replicated
    # device-resident pool, sharded int32 index vectors, lax.scan wavefront
    # on this backend) -- the same dataflow shape the TPU engine runs, so
    # the curve measures mesh scaling rather than host-assembly overhead
    engine = PairEngine(batch_pairs=B, sharder=Sharder(make_mesh(n)),
                        ed_batch=B, use_pallas=True)
    engine.myers_sub = 0   # Myers is a Pallas kernel (interpret-only on
    # CPU); the pooled wavefront scan is the CPU-native sharded path
    engine.edit_distances(pairs)  # compile + pool warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        engine.edit_distances(pairs)
        dt = time.perf_counter() - t0
        best = max(best, B / dt)
    rates[str(n)] = round(best, 1)
    eff[str(n)] = round(best / (rates["1"] * min(n, ncores)) * 100, 1)
    print("devices=%d  %8.1f alignments/s  efficiency vs %d cores: %5.1f%%"
          % (n, best, min(n, ncores), eff[str(n)]), file=sys.stderr)

print(json.dumps({"alignments_per_sec": rates, "efficiency_pct": eff,
                  "cores": ncores, "B": B}))

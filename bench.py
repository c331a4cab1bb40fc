"""Benchmark: pairwise edit-distance alignment throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline workload: realistic NN-search pairs from the reference's bundled
simulated PacBio reads (~2 kb), banded wavefront ED at Wp=128 (k=63) --
the pipeline's hot kernel (HOT LOOP 1 in SURVEY.md).  Baseline: the native
C++ Myers bit-vector kernel (the reference's edlib equivalent) on one CPU
core.  vs_baseline = device alignments/s / CPU alignments/s; the
BASELINE.json target is >= 100x.

extra (BASELINE.json secondary metrics, best-of-N each):
  affine_sg_per_sec / affine_cpu_per_sec / affine_vs_baseline -- pooled
    Pallas affine semi-global alignment with full traceback (HOT LOOP 2),
    device-resident inputs, per chip; the baseline is the native C++
    full-DP kernel pinned to ONE thread.
  e2e_n200_reads_per_sec / e2e_n200_seconds -- full `pipeline` run on the
    bundled 200-read reference dataset on this backend, best-of-3 cold
    processes; e2e_n200_warm_seconds is the same-process warm rerun
    (set ISOCON_BENCH_NO_E2E=1 to skip).

Per-run attribution (init / phase / engine counters for every e2e run)
and the full scaling records land in the BENCH_E2E.json sidecar -- the
stdout line stays under ~1 KB so the driver's tail capture always parses.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

READS = "/root/reference/test/data/simulated_pacbio_reads_n_500.fa"
L = 2048
WP = 128
BATCH = 65536  # sub=16 x 128 lanes x 32 grid blocks
N_BATCHES = 2
CPU_PAIRS = 64


def build_pairs():
    from isocon_tpu.io import read_fasta
    from isocon_tpu.ops.encode import encode_seq

    # restrict to the dominant ~2 kb population so the CPU baseline and the
    # device measure the same per-pair work
    seqs = [s for _a, s in read_fasta(READS) if 1200 <= len(s) <= L]
    seqs.sort(key=len)
    # window pairs like the NN search: neighbors in length-sorted order
    pairs = []
    for i in range(len(seqs)):
        for j in (i + 1, i + 2, i + 3):
            if j < len(seqs) and abs(len(seqs[i]) - len(seqs[j])) <= 63:
                pairs.append((seqs[i], seqs[j]))
    need = BATCH * N_BATCHES
    while len(pairs) < need:
        pairs = pairs + pairs
    pairs = pairs[:need]
    q = np.full((need, L), 5, dtype=np.int8)
    t = np.full((need, L), 6, dtype=np.int8)
    qlen = np.zeros(need, dtype=np.int32)
    tlen = np.zeros(need, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        ea, eb = encode_seq(a), encode_seq(b)
        q[i, : len(ea)] = ea
        t[i, : len(eb)] = eb
        qlen[i] = len(ea)
        tlen[i] = len(eb)
    return q, t, qlen, tlen


def bench_device(q, t, qlen, tlen):
    import jax
    from isocon_tpu.ops.wavefront import banded_ed
    from isocon_tpu.ops.myers_pallas import myers_ed_pallas

    # stage batches on device first: the timed region measures chip
    # throughput, not host->device transfer (which the pipeline overlaps)
    batches = []
    for i in range(N_BATCHES):
        s = slice(i * BATCH, (i + 1) * BATCH)
        batches.append(tuple(jax.device_put(x) for x in
                             (q[s], t[s], qlen[s], tlen[s])))

    def run(i):
        qb, tb, qlb, tlb = batches[i]
        return myers_ed_pallas(qb, tb, qlb, tlb, L=L, sub=16)

    np.asarray(run(0))  # warmup/compile; asarray = forced materialization
    best = 0.0
    for _rep in range(5):  # tunnel weather swings runs >25%; take the best
        # launch everything, then force every result: the engine's async
        # dispatch pattern (block_until_ready alone is unreliable over the
        # remote tunnel; np.asarray cannot lie)
        t0 = time.perf_counter()
        outs = [run(i) for i in range(N_BATCHES)]
        vals = [np.asarray(o) for o in outs]
        dt = time.perf_counter() - t0
        best = max(best, BATCH * N_BATCHES / dt)
    return best


def bench_cpu(q, t, qlen, tlen):
    from isocon_tpu.native import myers_ed_batch, native_available

    # evenly sample across the workload so lengths match the device run
    idx = np.linspace(0, len(qlen) - 1, CPU_PAIRS).astype(int)
    qs = np.ascontiguousarray(q[idx].view(np.uint8))
    ts = np.ascontiguousarray(t[idx].view(np.uint8))
    best = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        myers_ed_batch(qs, qlen[idx], ts, tlen[idx], k=-1)
        dt = time.perf_counter() - t0
        best = max(best, len(idx) / dt)
    return best


def bench_affine(q, t, qlen, tlen):
    """Pooled affine SG alignment + traceback throughput, device-resident
    inputs (the engine's pallas1 path geometry: Wp=256, L=2048, B=8192 --
    the accelerator full-batch target; see scripts/bench_affine_c_split.py)."""
    import jax
    import jax.numpy as jnp
    from isocon_tpu.ops.affine_pallas_c import (
        sg_align_pool_pallas_c as sg_align_pool_pallas)

    B = 8192
    U = 1024
    pool = np.full((U, L), 6, dtype=np.int8)
    plen = np.ones(U, dtype=np.int32)
    for u in range(U):
        pool[u] = t[u % t.shape[0]]
        plen[u] = tlen[u % t.shape[0]]
    rng = np.random.default_rng(0)
    K = 3  # batches in flight: the engine launches every batch, then
    #        collects (engine.py align_pairs), overlapping the fused-buffer
    #        download with the next batch's kernel
    pf = jax.device_put(pool.reshape(-1))
    pl = jax.device_put(plen)
    batches = []
    for _k in range(K):
        ia = rng.integers(0, U - 3, B).astype(np.int32)
        ib = (ia + 1 + rng.integers(0, 3, B)).astype(np.int32)
        # engine calling convention (device-resident 1-D pool, numpy index
        # and score vectors) so the persistent compile cache shares entries
        # with pipeline runs
        batches.append([pf, pl, ia, ib,
                        np.full(B, 2, np.int16), np.full(B, -2, np.int16),
                        np.full(B, 2, np.int16), np.full(B, 0, np.int16)])

    def run(k):
        (buf,) = sg_align_pool_pallas(*batches[k], Wp=256, L=L,
                                      fuse_out=True)
        return buf

    np.asarray(run(0))  # compile
    best = 0.0
    for _rep in range(5):  # tunnel weather swings reps >25%; take the best
        t0 = time.perf_counter()
        outs = [run(k) for k in range(K)]
        _ = [np.asarray(o) for o in outs]
        best = max(best, K * B / (time.perf_counter() - t0))
    return best


def bench_affine_cpu(q, t, qlen, tlen):
    """Single-core CPU affine-SG baseline (the parasail role,
    ``SW_alignment_module.py:64-86``): the native C++ full-DP kernel
    pinned to 1 thread on the same ~2 kb pairs the device path aligns.
    affine_vs_baseline = device rate / this."""
    from isocon_tpu.native import affine_sg_batch, native_available

    if not native_available():
        return None
    n = 16
    idx = np.linspace(0, len(qlen) - 1, n).astype(int)
    qs = np.ascontiguousarray(q[idx].view(np.uint8))
    ts = np.ascontiguousarray(t[idx].view(np.uint8))
    sc = np.tile(np.array([2, -2, 2, 0], dtype=np.int64), (n, 1))
    best = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        affine_sg_batch(qs, qlen[idx], ts, tlen[idx], sc, nthreads=1)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def bench_e2e_n200():
    """Full pipeline on the bundled n_200 dataset (the reference's CI
    workload, .travis.yml:22): reads/s to final_candidates.fa.

    Best-of-3 fresh processes, each capped at 600 s; every run records a
    full attribution (init / per-phase / engine ed+align counters, see
    scripts/bench_e2e_n200.py) so a link stall is distinguishable from a
    real regression.  Each process also times a WARM second pipeline
    (compiled executables + device pools live) -- the steady-state
    figure.  The bundled xla_seed/ cache means even cold runs compile
    nothing."""
    import subprocess

    runs = []
    t_begin = time.perf_counter()
    for _rep in range(3):
        if runs and time.perf_counter() - t_begin > 900:
            # stalled-link budget guard: two 600 s timeouts already prove
            # the weather; don't spend a third
            break
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_e2e_n200.py")],
                capture_output=True, text=True, timeout=600,
            )
            if r.returncode == 0:
                runs.append(json.loads(r.stdout.strip().splitlines()[-1]))
            else:
                runs.append({"error": r.stderr.strip()[-500:]})
        except subprocess.TimeoutExpired:
            # the device tunnel occasionally stalls outright for minutes
            # (docs/ROADMAP.md, known environment ceilings); a hung run
            # must not wedge the whole bench
            runs.append({"timeout_600s": True})
    colds = [u["cold"]["wall_seconds"] + u["init_seconds"]
             for u in runs if "cold" in u]
    warms = [u["warm"]["wall_seconds"] for u in runs if "warm" in u]
    out = {"e2e_n200_runs": runs}
    if colds:
        best = min(colds)
        out["e2e_n200_seconds"] = round(best, 1)
        out["e2e_n200_reads_per_sec"] = round(200.0 / best, 3)
    if warms:
        out["e2e_n200_warm_seconds"] = round(min(warms), 1)
    return out


def _run_json_script(script, extra_env=None, timeout=900):
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    try:
        r = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception:
        return None


def bench_scaling():
    """Multi-chip scaling stand-ins until real multi-chip hardware is
    reachable.  Primary: scripts/bench_scaling_multihost.py -- K real
    processes with separate XLA runtimes, pinned cores, jax.distributed
    over localhost DCN (the BASELINE '>=80% at 2 hosts' measurement).
    Secondary: the N-in-{1,2,4,8} virtual-device curve
    (scripts/bench_scaling.py); virtual CPU devices share one thread
    pool, so that curve understates device-level speedup."""
    mh = _run_json_script("scripts/bench_scaling_multihost.py",
                          {"ISOCON_SCALING_B": "256"})
    curve = _run_json_script(
        "scripts/bench_scaling.py",
        {"ISOCON_SCALING_B": "256",
         "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count=8").strip()})
    out = {}
    if mh is not None:
        out["multihost_2proc"] = mh
    if curve is not None:
        out["virtual_device_curve"] = curve
    return out or None


def main():
    q, t, qlen, tlen = build_pairs()
    cpu_rate = bench_cpu(q, t, qlen, tlen)
    dev_rate = bench_device(q, t, qlen, tlen)
    affine_rate = bench_affine(q, t, qlen, tlen)
    affine_cpu = bench_affine_cpu(q, t, qlen, tlen)
    # the stdout line must stay compact (< ~1 KB): the driver captures a
    # bounded tail, and round 4's full per-run attribution blew past it
    # (BENCH_r04 "parsed": null).  Bulky detail goes to BENCH_E2E.json.
    extra = {"affine_sg_per_sec": round(affine_rate, 2)}
    detail = {}
    if affine_cpu:
        extra["affine_cpu_per_sec"] = round(affine_cpu, 2)
        extra["affine_vs_baseline"] = round(affine_rate / affine_cpu, 1)
    if not os.environ.get("ISOCON_BENCH_NO_E2E"):
        e2e = bench_e2e_n200()
        detail["e2e_n200_runs"] = e2e.pop("e2e_n200_runs", [])
        extra.update(e2e)
        extra["e2e_runs_ok"] = sum(
            1 for u in detail["e2e_n200_runs"] if "cold" in u)
    if not os.environ.get("ISOCON_BENCH_NO_SCALING"):
        sc = bench_scaling()
        if sc is not None:
            detail["scaling_cpu_mesh"] = sc
            mh = sc.get("multihost_2proc") or {}
            if "efficiency_pct" in mh:
                extra["multihost_2proc_eff_pct"] = mh["efficiency_pct"]
            if "rate_4" in mh:
                extra["multihost_4proc_rate"] = mh["rate_4"]
    if detail:
        extra["detail_file"] = "BENCH_E2E.json"
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_E2E.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "pairwise_banded_ed_alignments_per_sec_per_chip",
                "value": round(dev_rate, 2),
                "unit": "alignments/s (2kb reads, banded Myers, k<=64)",
                "vs_baseline": round(dev_rate / cpu_rate, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()

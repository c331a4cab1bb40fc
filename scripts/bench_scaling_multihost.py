"""Two-host scaling stand-in: real processes, pinned cores, DCN on
localhost (BASELINE.md target 3: >=80% efficiency at 2 hosts).

The single-process virtual-device mesh (scripts/bench_scaling.py) shares
one XLA:CPU thread pool across all virtual devices, so device-level
parallel speedup is invisible there.  Real multi-host execution gives
each host its own runtime; this script reproduces that with K worker
processes, each pinned to its own core (taskset) with ONE virtual CPU
device, joined by jax.distributed, running the sharded PairEngine on a
fixed global workload (pooled scan wavefront: pool replicated, index
vectors sharded, results all-gathered inside shard_map).

Prints one JSON line: {"rate_1": r1, "rate_2": r2, "efficiency_pct": e}.

Usage: python scripts/bench_scaling_multihost.py
"""
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, ".")

B = int(os.environ.get("ISOCON_SCALING_B", 512))
MAXLEN = 1200
REPS = 3
PORT = int(os.environ.get("ISOCON_DRYRUN_PORT", 8493))


def make_pairs():
    from isocon_tpu.io import read_fasta

    rng = random.Random(0)
    seqs = [s for _a, s in read_fasta(
        "/root/reference/test/data/simulated_pacbio_reads_n_200.fa")
        if len(s) <= MAXLEN]
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
    return pairs


def worker(nproc: int, pid: int) -> None:
    from isocon_tpu.parallel import distributed as D

    D.initialize("127.0.0.1:%d" % (PORT + nproc), nproc, pid)
    import jax

    from isocon_tpu.ops.engine import PairEngine
    from isocon_tpu.parallel.sharding import Sharder

    mesh = D.make_global_mesh()
    pairs = make_pairs()
    engine = PairEngine(batch_pairs=B, sharder=Sharder(mesh),
                        ed_batch=B, use_pallas=True)
    engine.myers_sub = 0      # pooled scan wavefront (CPU-native path)
    engine.edit_distances(pairs)   # compile + pool warm
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        engine.edit_distances(pairs)
        best = max(best, B / (time.perf_counter() - t0))
    if pid == 0:
        print("RATE %.2f" % best, flush=True)


def run_k(nproc: int) -> float:
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["_ISOCON_SC_WORKER"] = "%d:%d" % (nproc, pid)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1").strip()
        cmd = [sys.executable, os.path.abspath(__file__)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", str(pid % os.cpu_count())] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    rate = None
    rc = 0
    for p in procs:
        out, _ = p.communicate()
        rc |= p.returncode
        for line in (out or "").splitlines():
            if line.startswith("RATE "):
                rate = float(line.split()[1])
    if rc or rate is None:
        raise RuntimeError("worker failed (rc=%d)" % rc)
    return rate


def main() -> None:
    w = os.environ.get("_ISOCON_SC_WORKER")
    if w:
        nproc, pid = (int(x) for x in w.split(":"))
        worker(nproc, pid)
        return
    r1 = run_k(1)
    print("1 host:  %.1f alignments/s" % r1, file=sys.stderr)
    r2 = run_k(2)
    eff = r2 / (2 * r1) * 100
    print("2 hosts: %.1f alignments/s  efficiency %.1f%%" % (r2, eff),
          file=sys.stderr)
    out = {"rate_1": round(r1, 1), "rate_2": round(r2, 1),
           "efficiency_pct": round(eff, 1), "B": B}
    # 4-proc correctness + rate row: on this 2-core host four workers
    # oversubscribe the CPUs, so rate_4 proves the seam runs at 4
    # processes (sharding, DCN collectives, result agreement) but its
    # efficiency is capped by cores, not by the framework -- compare
    # rate_4 to rate_2 (same physical parallelism) rather than to 4*r1.
    try:
        r4 = run_k(4)
        out["rate_4"] = round(r4, 1)
        out["rate_4_vs_rate_2_pct"] = round(r4 / r2 * 100, 1)
        out["host_cores"] = os.cpu_count()
        print("4 procs: %.1f alignments/s (2-core host: vs rate_2 %.1f%%)"
              % (r4, r4 / r2 * 100), file=sys.stderr)
    except RuntimeError as e:
        out["rate_4_error"] = str(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Multi-host seam dryrun: N real processes, one global mesh, localhost.

Spawns N worker processes that join a jax.distributed runtime (CPU
backend, 4 virtual devices each -> 4N global devices), build the global
mesh, and run the sharded PairEngine (banded ED + affine alignments with
traceback) plus a pooled Myers call on a fixed workload.  Every process
must produce the oracle answers locally (results are all-gathered inside
shard_map), proving the seam end-to-end without TPU hardware: process
boundaries, DCN collectives (grpc on localhost), replicated pool
placement and sharded index vectors are all real.

Usage: python scripts/dryrun_multihost.py [n_processes]
"""
import os
import subprocess
import sys

N_PROC = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("ISOCON_DRYRUN_PORT", 8476))


def worker(pid: int) -> None:
    sys.path.insert(0, ".")
    import numpy as np

    from isocon_tpu.parallel import distributed as D

    D.initialize("127.0.0.1:%d" % PORT, N_PROC, pid)
    import jax

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    from isocon_tpu.ops import oracle
    from isocon_tpu.ops.engine import PairEngine
    from isocon_tpu.parallel.sharding import Sharder

    mesh = D.make_global_mesh()
    rng = np.random.default_rng(2)
    alpha = "ACGT"
    L = 128
    base = "".join(alpha[c] for c in rng.integers(0, 4, size=L))
    pairs = []
    for i in range(8 * N_PROC):
        t = list(base)
        p = (11 * i) % L
        t[p] = alpha[(alpha.index(t[p]) + 1) % 4]
        pairs.append((base, "".join(t)))

    engine = PairEngine(batch_pairs=16, sharder=Sharder(mesh))
    ed, _ = engine.edit_distances(pairs)
    want = np.array([oracle.edit_distance(a, b) for a, b in pairs])
    assert (ed == want).all(), (pid, ed, want)

    alns = engine.align_pairs(pairs, [(2, -2, 2, 0)] * len(pairs))
    for (a, b), (a1, a2, (m, mm, ind)) in zip(pairs, alns):
        assert a1.replace("-", "") == a and a2.replace("-", "") == b

    # pooled Pallas path (interpret mode) under the multi-process mesh
    fast = PairEngine(batch_pairs=128, sharder=Sharder(mesh),
                      use_pallas=True, ed_batch=32 * N_PROC * 16)
    fast.pallas_L0 = 256
    ed2, _ = fast.edit_distances(pairs)
    assert (ed2 == want).all(), (pid, ed2, want)

    print("proc %d/%d OK on %d global devices" % (
        pid, N_PROC, len(jax.devices())), flush=True)


def main() -> None:
    if os.environ.get("_ISOCON_MH_WORKER"):
        worker(int(os.environ["_ISOCON_MH_WORKER"]) - 1)
        return
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["_ISOCON_MH_WORKER"] = str(pid + 1)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=%d" % DEV_PER_PROC
        ).strip()
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(N_PROC)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("dryrun_multihost:", "OK" if rc == 0 else "FAILED (rc=%d)" % rc)
    sys.exit(rc)


if __name__ == "__main__":
    main()

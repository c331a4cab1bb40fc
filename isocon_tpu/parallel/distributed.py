"""Multi-host (multi-process) execution seam.

The reference parallelizes with a single-host ``multiprocessing.Pool``
whose workers split row-blocks of the pairwise work matrix
(``nearest_neighbor_graph.py:33-35``); the TPU-native generalization is
one JAX process per host, joined into a single global runtime with
``jax.distributed.initialize``, with the engine's pair axis sharded over
the GLOBAL device mesh.  Pools (interned sequence matrices) are
replicated to every process; only int32 index vectors are sharded, so
cross-host traffic on DCN is per-round metadata while the DP kernels'
operands ride each chip's HBM and results merge over ICI/DCN with one
tiled all-gather per call (``Sharder`` emits the gather inside
``shard_map`` when ``jax.process_count() > 1``, so every host reads the
full result locally and the host-side driver loop stays unchanged).

Launch (one command per host, same everywhere but --process_id):

    ISOCON_COORDINATOR=host0:8476 ISOCON_NUM_PROCESSES=4 \
    ISOCON_PROCESS_ID=<i> python -m isocon_tpu.cli pipeline \
        -fl_reads reads.fa -outfolder out/ --devices -1

(--devices -1 = all global devices).  ``scripts/dryrun_multihost.py``
exercises the full seam with N real processes on localhost CPU meshes.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_from_env() -> bool:
    """Join a multi-process JAX runtime when the coordinator env triple is
    set (no-op otherwise).  Returns True when running multi-process."""
    coord = os.environ.get("ISOCON_COORDINATOR")
    if not coord:
        return False
    num = int(os.environ["ISOCON_NUM_PROCESSES"])
    pid = int(os.environ["ISOCON_PROCESS_ID"])
    initialize(coord, num, pid)
    return True


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axis: str = "pairs") -> Mesh:
    """1-D mesh over ALL devices of ALL processes (row-major: each
    process's local devices are contiguous blocks of the pair axis, so a
    shard's host assembly stays on its owning host)."""
    return Mesh(np.array(jax.devices()), (axis,))


def process_count() -> int:
    return jax.process_count()


def make_array_global(x: np.ndarray, sharding):
    """Build a (possibly non-addressable) global jax.Array from a host
    array every process holds in full.  Works for replicated and sharded
    specs alike; single-process shardings fall back to device_put."""
    if sharding is None or getattr(sharding, "is_fully_addressable", True):
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

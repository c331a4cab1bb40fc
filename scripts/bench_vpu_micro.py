"""Microbenchmark VPU op cost by dtype and op kind on the current backend.

Times a pallas kernel that runs NSTEP iterations of K ops on a (BB, W)
block, for: add (elementwise), max, roll(1 lane), where-select.
Usage: python scripts/bench_vpu_micro.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())

BB = 128
NSTEP = 2048
K = 16  # ops per step


def make_kernel(op, dtype, W):
    def kernel(x_ref, o_ref, s_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            s_ref[:] = x_ref[:]

        def step(s, acc):
            v = s_ref[:]
            for _ in range(K):
                if op == "add":
                    v = v + 1
                elif op == "max":
                    v = jnp.maximum(v, v + 1)
                elif op == "roll":
                    v = pltpu.roll(v, shift=1, axis=1)
                elif op == "sel":
                    v = jnp.where(v > 0, v, v + 1)
            s_ref[:] = v
            return acc

        jax.lax.fori_loop(0, NSTEP, step, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = s_ref[:]

    return kernel


def bench(op, dtype, W, grid=8):
    x = jnp.zeros((BB, W), dtype)
    f = pl.pallas_call(
        make_kernel(op, dtype, W),
        out_shape=jax.ShapeDtypeStruct((BB, W), dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BB, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BB, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BB, W), dtype)],
    )
    fj = jax.jit(f)
    np.asarray(fj(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fj(x))
        best = min(best, time.perf_counter() - t0)
    nops = grid * NSTEP * K
    ns_per_op = best / nops * 1e9
    print("%-5s %-6s W=%-4d  %.3fs total  %7.1f ns/op  (%d-byte block)"
          % (op, np.dtype(dtype).name, W, best, ns_per_op,
             BB * W * np.dtype(dtype).itemsize))


for op in ("add", "max", "sel", "roll"):
    for dtype in (jnp.int32, jnp.int16, jnp.int8):
        for W in (128, 256):
            try:
                bench(op, dtype, W)
            except Exception as e:
                print("%-5s %-6s W=%-4d  FAILED: %s"
                      % (op, np.dtype(dtype).name, W, str(e).split(chr(10))[0][:80]))

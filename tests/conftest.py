"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md
section 4: distributed testing = same-answer checks 1-chip vs N-device).

Set ISOCON_TEST_TPU=1 to run the suite against the real accelerator
instead (the axon PJRT plugin registered in sitecustomize).

Note PALLAS_AXON_POOL_IPS must be scrubbed from os.environ, not just
overridden with JAX_PLATFORMS=cpu: the axon sitecustomize registers its
PJRT plugin whenever the variable is set and that registration wins over
JAX_PLATFORMS, so a subprocess spawned by a test (reference-parity runs,
CLI e2e tests) would silently run over the TPU tunnel -- minutes of
link wait for second-long CPU jobs, and the round-3 suite's 900 s
timeout flake.  In-process, jax.config handles it either way.
"""
import os

if not os.environ.get("ISOCON_TEST_TPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass

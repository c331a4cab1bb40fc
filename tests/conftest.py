"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md
section 4: distributed testing = same-answer checks 1-chip vs N-device).

Set ISOCON_TEST_TPU=1 to run the suite against the real accelerator
instead (the axon PJRT plugin registered in sitecustomize).
"""
import os

if not os.environ.get("ISOCON_TEST_TPU"):
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

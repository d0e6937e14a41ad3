"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so the multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4: the
reference's analogous trick is `mpirun -np N` on one laptop).  Must set env
before jax initializes a backend.
"""
import os

# Force CPU: the session may preset JAX_PLATFORMS=axon (single real TPU);
# tests need 8 virtual devices and f64 support.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# f64 available for precision-sensitive parity tests; all production code
# paths set dtypes explicitly so this does not change f32 behavior.
jax.config.update("jax_enable_x64", True)

"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so the multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4: the
reference's analogous trick is `mpirun -np N` on one laptop).

NOTE: this environment's sitecustomize (/root/.axon_site) imports jax at
interpreter startup and presets JAX_PLATFORMS=axon (the tunneled real TPU),
so env vars set here are too late — use jax.config.update instead.
XLA_FLAGS is still read lazily at first backend init, so the virtual device
count works via the environment.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 available for precision-sensitive parity tests; all production code
# paths set dtypes explicitly so this does not change f32 behavior.
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

"""Test configuration: CPU backend with an 8-device virtual mesh.

Parity tests need f64 and fast compiles, so they run on CPU even when the
environment points JAX at a (tunneled, f32) TPU. Sharding correctness is
validated on a virtual 8-device CPU mesh, exactly as the driver's
``dryrun_multichip`` does. Benchmarks target the TPU explicitly (bench.py).

Note: pytest plugins import jax before this conftest runs, so setting the
environment variable alone is not enough — we also update jax.config, which
works as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Global numeric configuration for pharmsol-tpu.

The reference engine (LAPKB/pharmsol) computes everything in f64 on CPU.
On TPU, f64 is emulated and slow; f32 keeps the VPU/MXU at full rate. We
therefore make the working dtype configurable:

- parity / correctness tests run in float64 (requires jax_enable_x64,
  which this module turns on at import),
- TPU benchmarks run in float32 (or bfloat16 where accuracy allows).

All array-construction sites in the package must use :func:`float_dtype`.
"""

from __future__ import annotations

import os

import jax

# Enable 64-bit *availability*. This does not force f64 computation; it only
# allows it. The working dtype below decides what the engine actually uses.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after the config update)

_FLOAT_DTYPE = jnp.float64 if os.environ.get("PHARMSOL_TPU_F32", "0") != "1" else jnp.float32

# Sentinel used for padded event times: sorts after any real time but stays
# finite so arithmetic on padded rows never produces NaN/Inf.
BIG_TIME = 1e30


def set_float_dtype(dtype) -> None:
    """Set the working float dtype (float32 or float64)."""
    global _FLOAT_DTYPE
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(f"unsupported float dtype {dtype}; use float32 or float64")
    _FLOAT_DTYPE = dtype


def float_dtype():
    """The working float dtype for engine arrays."""
    return _FLOAT_DTYPE


def int_dtype():
    return jnp.int32

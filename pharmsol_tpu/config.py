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

# None = not yet resolved: the default is backend-aware (f32 on TPU where
# f64 is emulated ~30x slower in two-float arithmetic with non-IEEE corner
# cases, f64 elsewhere) and resolving it eagerly would force backend init at
# import time. PHARMSOL_TPU_F32=1 forces f32 everywhere.
_FLOAT_DTYPE = jnp.float32 if os.environ.get("PHARMSOL_TPU_F32", "0") == "1" else None

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
    """The working float dtype for engine arrays.

    Defaults (unless overridden by :func:`set_float_dtype` or
    ``PHARMSOL_TPU_F32=1``): float32 when the default backend is a TPU —
    the MXU/VPU native rate, and the TPU's emulated f64 has non-IEEE
    corner cases (e.g. ``inf ** -n -> nan``) — float64 on CPU, matching
    the reference's precision for parity work.
    """
    global _FLOAT_DTYPE
    if _FLOAT_DTYPE is None:
        _FLOAT_DTYPE = (
            jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
        )
    return _FLOAT_DTYPE


def int_dtype():
    return jnp.int32


_COMPILATION_CACHE_DIR = None


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    Implicit-solver psi programs cost ~8-12 min per remote TPU compile
    through the tunnel; the persistent cache reloads a previously compiled
    executable in seconds across processes (the rebuild's analogue of the
    reference's cache story, cache.rs, applied to compile artifacts).

    ``path`` defaults to ``$PHARMSOL_TPU_CACHE_DIR`` or
    ``~/.cache/pharmsol_tpu/xla``. Returns the cache directory in use.
    Idempotent; safe to call before or after backend initialization.
    """
    global _COMPILATION_CACHE_DIR
    if path is None:
        path = os.environ.get(
            "PHARMSOL_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "pharmsol_tpu", "xla"),
        )
    path = os.path.abspath(os.path.expanduser(path))
    if _COMPILATION_CACHE_DIR == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program (the default only caches compiles >1s); the psi
    # programs that matter here are all past that, but benches/tests reuse
    # small ones too and disk is cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _COMPILATION_CACHE_DIR = path
    return path

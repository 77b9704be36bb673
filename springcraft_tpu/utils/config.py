"""
Precision and backend configuration helpers.

Numerical-parity workloads (matching the reference's float64 NumPy
results, see SURVEY.md §4) need 64-bit floats; throughput workloads on
TPU want float32/bfloat16.  These helpers centralize the dispatch:

* :func:`x64_enabled` — whether JAX runs with 64-bit types.
* :func:`enable_x64` — turn on 64-bit JAX globally (call before tracing).
* :func:`resolve_backend` — decide whether a float64 computation can run
  through JAX or must fall back to NumPy/LAPACK to preserve precision.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = [
    "enable_x64",
    "x64_enabled",
    "resolve_backend",
    "default_dtype",
    "enable_nan_checks",
    "enable_compile_cache",
]


def enable_compile_cache(path, min_compile_time_secs=5.0):
    """
    Enable JAX's persistent compilation cache at `path`.

    Remote TPU compiles take minutes for the big programs (the 30k-dim
    shift-invert modes program measures ~5 min); the persistent cache
    amortizes them across processes.  Must be the explicit
    ``jax.config.update`` form: environments that pre-import
    ``jax._src.config`` from ``sitecustomize`` (the axon TPU relay
    does) read ``JAX_COMPILATION_CACHE_DIR`` before user code runs, so
    setting the env var has no effect there.
    """
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))


def enable_x64(enabled=True):
    """Enable (or disable) 64-bit types in JAX."""
    jax.config.update("jax_enable_x64", bool(enabled))


def x64_enabled():
    return bool(jax.config.jax_enable_x64)


def enable_nan_checks(enabled=True):
    """
    Toggle JAX NaN debugging: every jitted computation re-runs un-jitted
    and raises on the first NaN it produces.  Useful when the fast
    covariance/LOBPCG paths are applied to a disconnected network (extra
    zero modes make them singular — see ``utils.network.is_connected``).
    """
    jax.config.update("jax_debug_nans", bool(enabled))


def default_dtype():
    """float64 when x64 is active, else float32."""
    return np.float64 if x64_enabled() else np.float32


def resolve_backend(dtype):
    """
    Return ``"jax"`` or ``"numpy"`` for a computation requested at
    `dtype`.

    float64 results are only produced by JAX when x64 mode is active;
    otherwise JAX would silently downcast to float32 and break parity
    with the float64 reference, so NumPy is used instead.
    """
    dtype = np.dtype(dtype)
    if dtype == np.float64 and not x64_enabled():
        return "numpy"
    return "jax"

"""
Factor experiments at the headline shape: (A) HIGH (bf16x3) matmul
precision through factor+gram — speed and accuracy vs f64 truth;
(B) dynamic-update-slice assembly of the recursion output instead of
nested concatenates.

Loop-chained timing as in tools/profile_headline.py.

Usage: python tools/exp_factor_variants.py [B] [m] [reps] [chain]
"""

import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.realpath(__file__)), "..",
                 ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))

import jax
import jax.numpy as jnp

# Explicit config update: the axon sitecustomize pre-imports jax
# config, so the env var above is read too late on this image.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np

from springcraft_tpu.ops import pallas_linalg
from springcraft_tpu.ops.pallas_linalg import (
    _choose_padding, _round_up, panel_inverse_batched)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
M = int(sys.argv[2]) if len(sys.argv) > 2 else 900
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 6

HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST


def make_spd(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, M, M).astype(np.float32) / np.sqrt(M)
    a = np.einsum("bij,bkj->bik", x, x) + np.eye(M, dtype=np.float32)[None]
    return jnp.asarray(a)


# --- variant B: DUS assembly --------------------------------------------

def _recursive_dus(a, base, precision):
    s = a.shape[-1]
    if s <= base:
        return panel_inverse_batched(a, interpret=False)
    h = _round_up(s // 2, 128)
    if h >= s:
        h = s // 2
    g11 = _recursive_dus(a[:, :h, :h], base, precision)
    l21 = jnp.einsum("bij,bkj->bik", a[:, h:, :h], g11,
                     precision=precision)
    s22 = a[:, h:, h:] - jnp.einsum("bik,bjk->bij", l21, l21,
                                    precision=precision)
    g22 = _recursive_dus(s22, base, precision)
    g21 = -jnp.einsum(
        "bij,bjk->bik", g22,
        jnp.einsum("bij,bjk->bik", l21, g11, precision=precision),
        precision=precision)
    out = jnp.zeros(a.shape[:-2] + (s, s), a.dtype)
    out = jax.lax.dynamic_update_slice(out, g11, (0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, g21, (0, h, 0))
    out = jax.lax.dynamic_update_slice(out, g22, (0, h, h))
    return out


def factor_dus(a, precision=HIGHEST, block=64):
    m = a.shape[-1]
    mp = _choose_padding(m, block)
    if mp != m:
        pad = mp - m
        a = jnp.pad(a, ((0, 0), (0, pad), (0, pad)))
        diag = jnp.arange(m, mp)
        a = a.at[:, diag, diag].set(1.0)
    return _recursive_dus(a, block, precision)


def timed(name, fn, inputs):
    def chained(c):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = fn(c)
            acc = acc + jnp.sum(out)
            c = c + (acc * jnp.float32(1e-30))[..., None, None]
        return acc

    prog = jax.jit(chained)
    t0 = time.perf_counter()
    float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{name:28s}: {best * 1e3:8.2f} ms/iter (compile "
          f"{compile_s:5.1f}s)", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} m={M} chain={CHAIN}")
    inputs = [make_spd(s) for s in range(REPS + 1)]

    timed("factor HIGHEST (prod)",
          lambda a: pallas_linalg.spd_inverse_factor(a), inputs)
    timed("factor HIGH",
          lambda a: pallas_linalg.spd_inverse_factor(a, precision=HIGH),
          inputs)
    timed("factor DUS HIGHEST",
          lambda a: factor_dus(a, HIGHEST), inputs)
    timed("factor DUS HIGH",
          lambda a: factor_dus(a, HIGH), inputs)

    # accuracy: inverse from G^T G vs f64 truth (one batch element)
    a0 = inputs[0]
    truth = np.linalg.inv(np.asarray(a0[0], np.float64))
    for name, fn in [
            ("HIGHEST", lambda a: pallas_linalg.spd_inverse_factor(a)),
            ("HIGH", lambda a: pallas_linalg.spd_inverse_factor(
                a, precision=HIGH))]:
        g = jax.jit(fn)(a0)
        gg = np.asarray(g[0], np.float64)
        inv = (gg.T @ gg)[:M, :M]
        err = np.abs(inv - truth).max() / np.abs(truth).max()
        diag_err = float(np.sqrt(np.mean(
            (np.diag(inv) - np.diag(truth)) ** 2)
            / np.mean(np.diag(truth) ** 2)))
        print(f"accuracy {name:8s}: inv rel max {err:.2e}  "
              f"diag rel RMSE {diag_err:.2e}")


if __name__ == "__main__":
    main()

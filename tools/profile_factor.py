"""
Micro-decomposition of the recursive aligned inverse factor at the
headline shape (B=128, m=900 -> mp=1024) — where do the 23 ms go?

Each candidate runs as ONE jitted program returning a scalar checksum;
the ~28 ms relay floor is differenced out against a floor-only program.

Usage: python tools/profile_factor.py [B] [m] [reps]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
M = int(sys.argv[2]) if len(sys.argv) > 2 else 900
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST


def make_spd(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, M, M).astype(np.float32) / np.sqrt(M)
    a = np.einsum("bij,bkj->bik", x, x) + np.eye(M, dtype=np.float32)[None]
    return jnp.asarray(a)


def timed(name, fn, inputs, flops=None):
    prog = jax.jit(lambda c: jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), fn(c), jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times)
    extra = ""
    if flops:
        extra = f"  {flops / best / 1e12:6.1f} TF/s"
    print(f"{name:34s}: {best * 1e3:8.2f} ms/call (compile "
          f"{compile_s:5.1f}s){extra}", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} m={M}")
    inputs = [make_spd(s) for s in range(REPS + 1)]
    mp = 1024 if M > 256 else M

    floor = timed("floor (sum only)", lambda a: jnp.sum(a[:, 0, 0]),
                  inputs)

    # pure batched matmul roofline at the padded size, HIGHEST and HIGH
    def mm(prec):
        def f(a):
            x = a[:, :1, :1] * jnp.ones((B, mp, mp), jnp.float32)
            return jnp.einsum("bij,bjk->bik", x, x, precision=prec)
        return f
    fl = 2 * B * mp**3
    timed("matmul (B,mp,mp) HIGHEST", mm(HIGHEST), inputs, fl)
    timed("matmul (B,mp,mp) HIGH", mm(HIGH), inputs, fl)
    timed("matmul (B,mp,mp) DEFAULT", mm(None), inputs, fl)

    # current production factor
    recur_fl = 4 / 3 * B * mp**3
    timed("factor leaf=64 (prod)",
          lambda a: pallas_linalg.spd_inverse_factor(a, block=64),
          inputs, recur_fl)
    timed("factor leaf=64 HIGH",
          lambda a: pallas_linalg.spd_inverse_factor(a, block=64,
                                                     precision=HIGH),
          inputs, recur_fl)
    timed("factor leaf=128",
          lambda a: pallas_linalg.spd_inverse_factor(a, block=128),
          inputs, recur_fl)
    timed("factor leaf=128 HIGH",
          lambda a: pallas_linalg.spd_inverse_factor(a, block=128,
                                                     precision=HIGH),
          inputs, recur_fl)

    # leaf chain alone: 16 dependent augmented-kernel rounds
    def leaf_chain(a):
        p = a[:, :64, :64] + 64.0 * jnp.eye(64, dtype=jnp.float32)
        acc = jnp.float32(0.0)
        for i in range(16):
            w = pallas_linalg.panel_inverse_batched(p)
            acc = acc + jnp.sum(w)
            p = p + w[:, :64, :64] * 1e-6  # serialize the chain
        return acc
    timed("leaf chain x16 (augmented)", leaf_chain, inputs)

    def leaf_chain_old(a):
        p = a[:, :64, :64] + 64.0 * jnp.eye(64, dtype=jnp.float32)
        acc = jnp.float32(0.0)
        for i in range(16):
            l, w = pallas_linalg.panel_cholesky_batched(p)
            acc = acc + jnp.sum(w)
            p = p + w[:, :64, :64] * 1e-6  # serialize the chain
        return acc
    timed("leaf chain x16 (chol+newton)", leaf_chain_old, inputs)

    # single leaf
    def leaf_one(a):
        p = a[:, :64, :64] + 64.0 * jnp.eye(64, dtype=jnp.float32)
        w = pallas_linalg.panel_inverse_batched(p)
        return w
    timed("leaf x1 (augmented)", leaf_one, inputs)

    # gram product (full) and plane-trace contraction, HIGHEST vs HIGH
    n = M // 3
    def gram(prec):
        def f(a):
            g = a[:, :1, :1] * jnp.ones((B, mp, mp), jnp.float32)
            return jnp.einsum("bki,bkj->bij", g, g, precision=prec)
        return f
    timed("gram (mp x mp) HIGHEST", gram(HIGHEST), inputs, fl)
    def trace_g(prec):
        def f(a):
            w = a[:, :1, :1] * jnp.ones((B, mp, M), jnp.float32)
            wc = w.reshape(B, mp * 3, n)
            return jnp.einsum("bkn,bkm->bnm", wc, wc, precision=prec)
        return f
    tfl = 2 * B * mp * 3 * n * n
    timed("plane-trace gram HIGHEST", trace_g(HIGHEST), inputs, tfl)
    timed("plane-trace gram HIGH", trace_g(HIGH), inputs, tfl)


if __name__ == "__main__":
    main()

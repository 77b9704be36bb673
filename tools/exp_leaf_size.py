"""
Leaf-size A/B on the recursive aligned inverse factor at the headline
shape: block=64 (16 shrink-kernel leaves, 4 recursion levels) vs
block=128 (8 bigger leaves, one less level of small matmul dispatches).

The old measurement (43.1 vs 37.6 ms/call at (64, 900)) predates the
in-kernel shrink leaves — the elimination work per leaf element halved,
so the level-removal trade may have flipped.

Loop-chained timing as in tools/profile_headline.py.

Usage: python tools/exp_leaf_size.py [B] [m] [reps] [chain]
"""

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
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 6


def make_spd(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, M, M).astype(np.float32) / np.sqrt(M)
    a = np.einsum("bij,bkj->bik", x, x) \
        + np.eye(M, dtype=np.float32)[None]
    return jnp.asarray(a)


def timed(name, block, inputs):
    def chained(a):
        acc = jnp.float32(0.0)
        p = a
        for _ in range(CHAIN):
            g = pallas_linalg.spd_inverse_factor(p, block=block)
            acc = acc + jnp.sum(g)
            p = p + (acc * jnp.float32(1e-30))
        return acc

    prog = jax.jit(chained)
    t0 = time.perf_counter()
    chk = float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{name:28s}: {best * 1e3:7.2f} ms/iter (compile "
          f"{compile_s:5.1f}s, checksum {chk:.6g})", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} m={M} "
          f"chain={CHAIN}")
    inputs = [make_spd(s) for s in range(REPS + 1)]
    # correctness cross-check once, as ONE jitted program (eager ops
    # pay per-op remote compiles on this target)
    @jax.jit
    def crosscheck(a):
        i64 = pallas_linalg.spd_inverse_blocked(a, block=64)
        i128 = pallas_linalg.spd_inverse_blocked(a, block=128)
        return (jnp.max(jnp.abs(i64 - i128)), jnp.max(jnp.abs(i64)))

    dev, scale = map(float, crosscheck(inputs[0][:4]))
    print(f"inverse cross-dev (64 vs 128): {dev / scale:.2e} relative",
          flush=True)
    for block in (64, 128):
        timed(f"factor block={block}", block, inputs)
    # interleave the other order to expose drift
    for block in (128, 64):
        timed(f"factor block={block} (2nd)", block, inputs)


if __name__ == "__main__":
    main()

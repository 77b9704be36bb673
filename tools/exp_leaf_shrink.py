"""
Leaf-kernel A/B: full-window rank-1 elimination vs triangular-shrink
row retirement (`_panel_inverse_kernel` vs `_panel_inverse_kernel_shrink`)
at the headline leaf shape, loop-chained to amortize the relay floor.

Usage: python tools/exp_leaf_shrink.py [B] [PB] [reps] [chain]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np

from springcraft_tpu.ops import pallas_linalg

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
PB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 16


def make(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, PB, PB).astype(np.float32) / np.sqrt(PB)
    a = np.einsum("bij,bkj->bik", x, x) \
        + PB * np.eye(PB, dtype=np.float32)[None]
    return jnp.asarray(a)


def timed(name, shrink):
    def chained(a):
        acc = jnp.float32(0.0)
        p = a
        for _ in range(CHAIN):
            w = pallas_linalg.panel_inverse_batched(
                p, shrink_block=shrink)
            acc = acc + jnp.sum(w)
            p = p + (acc * jnp.float32(1e-30))
        return acc

    prog = jax.jit(chained)
    inputs = [make(s) for s in range(REPS + 1)]
    t0 = time.perf_counter()
    float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for a in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(a))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{name:22s}: {best * 1e6:9.1f} us/call (compile "
          f"{compile_s:5.1f}s)", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} pb={PB} "
          f"chain={CHAIN}")
    base = timed("rank-1 full window", None)
    for rb in (8, 16, 32):
        if PB % rb == 0:
            t = timed(f"shrink rb={rb}", rb)
            print(f"  -> {base / t:5.2f}x vs rank-1", flush=True)


if __name__ == "__main__":
    main()

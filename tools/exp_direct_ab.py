"""A/B of the blocked fluctuation megabatch headline: assembly-fused
direct prep (coordinates -> factor input in one kernel) vs the fused
planes path (assembly kernel -> raw planes in HBM -> stitch kernel).
Same process, interleaved reps, identical inputs — isolates the
routing choice from relay drift.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np

from springcraft_tpu.ops import ffparams
from springcraft_tpu.parallel import pipeline

B, N, CHUNK = 1024, 300, 128
REPS = 6
_CA_DENSITY = 300 / 34.0**3
PARAMS = ffparams.invariant_params(13.0)


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    spread = (N / _CA_DENSITY) ** (1.0 / 3.0)
    base = (rng.rand(N, 3) * spread).astype(np.float32)
    return jnp.asarray(
        base[None] + 0.05 * rng.randn(B, N, 3).astype(np.float32))


def run(use_direct):
    prep = "direct" if use_direct else "planes"
    return jax.jit(lambda b: sum(
        jnp.sum(v) for v in pipeline.ensemble_anm_fluctuations(
            b, PARAMS, with_dcc=True, with_covariance=False,
            dtype=jnp.float32, use_pallas=True, inverse="blocked",
            chunk=CHUNK, prep=prep).values()))


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} chunk={CHUNK}")
    data = [make_batch(s) for s in range(2)]
    fns = {"direct": run(True), "planes": run(False)}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        a = float(fn(data[0]))
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s "
              f"checksum {a:.6e}")
    best = {k: np.inf for k in fns}
    for r in range(REPS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(data[1]))
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, el in best.items():
        print(f"{name}: {el:.4f}s -> {B / el:.1f} solves/s")


if __name__ == "__main__":
    main()

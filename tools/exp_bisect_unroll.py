"""Does unrolling the bisect kernel's column loop buy VPU pipelining?
Times banded_eigenvalues_pallas at the bench spectral shape
(batch 128, w=9, n=900, n_iter=32) with the column fori_loop unrolled
1/2/4-way via a monkeypatched kernel.

Usage: python tools/exp_bisect_unroll.py [reps]
"""
import functools, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.realpath(__file__)), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np
from springcraft_tpu.ops import spectrum

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B, N, BW = 128, 900, 8

def make_diags(seed):
    rng = np.random.RandomState(seed)
    d = np.zeros((B, BW + 1, N), np.float32)
    d[:, BW] = 2.0 + rng.rand(B, N)          # diagonal
    for k in range(BW):
        d[:, k, : N - (BW - k)] = 0.1 * rng.randn(B, N - (BW - k))
    return jnp.asarray(d)

def timed(name, fn, inputs):
    prog = jax.jit(lambda d: jnp.sum(fn(d)))
    t0 = time.perf_counter(); float(prog(inputs[0]))
    c = time.perf_counter() - t0
    ts = []
    for d in inputs[1:]:
        t0 = time.perf_counter(); float(prog(d)); ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:8.2f} ms/call (compile {c:5.1f}s)",
          flush=True)
    return min(ts)


def main():
    print(f"backend={jax.default_backend()} B={B} n={N} w={BW+1} iters=32")
    inputs = [make_diags(s) for s in range(REPS + 1)]
    floor = timed("floor", lambda d: jnp.sum(d[:, 0, 0]), inputs)
    ref = None
    for u in (8, 16, 30):
        timed(f"bisect pallas unroll={u}",
              lambda d, _u=u: spectrum.banded_eigenvalues_pallas(
                  d, n_iter=32, unroll=_u), inputs)
        got = np.asarray(jax.jit(
            lambda d, _u=u: spectrum.banded_eigenvalues_pallas(
                d, n_iter=32, unroll=_u))(inputs[0]))
        if ref is None:
            ref = got
        else:
            print(f"  max dev vs u=1: {np.max(np.abs(got - ref)):.2e}")

if __name__ == "__main__":
    main()

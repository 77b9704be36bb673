"""
Stage profile of the eigh-free spectral pipeline at (B, N) —
loop-chained device programs, relay-floor aware (same harness shape as
tools/profile_headline.py).

The bench line (bench.py, spectral-banded-k20) runs
``ensemble_anm_spectral(n_modes=20, n_iter_bisect=32)``:
assembly -> covariance (blocked inverse) -> full->band reduction
(compact-WY panel QR + rank-2b updates) -> banded Sturm bisection
(Pallas) -> 20 mode shapes by subspace iteration on the covariance.

Usage:  python tools/profile_spectral.py [B] [N] [reps] [chain]
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

if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np

from springcraft_tpu.ops import modes as modes_mod
from springcraft_tpu.ops import ffparams, pallas_kernels, rigid, spectrum
from springcraft_tpu.parallel import pipeline

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 4

BW = int(os.environ.get("BW", "8"))
N_ITER_BISECT = int(os.environ.get("BISECT", "32"))
N_MODES = 20
# BUCKET: "auto" (default), "none" (full-size sweep), or an integer
_bk = os.environ.get("BUCKET", "auto")
BUCKET = None if _bk == "none" else (_bk if _bk == "auto" else int(_bk))

_CA_DENSITY = 300 / 34.0**3


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    spread = (N / _CA_DENSITY) ** (1.0 / 3.0)
    base = (rng.rand(N, 3) * spread).astype(np.float32)
    return jnp.asarray(
        base[None] + 0.05 * rng.randn(B, N, 3).astype(np.float32))


PARAMS = ffparams.invariant_params(13.0)


def s0_assembly(c):
    return pallas_kernels.hessian_pallas_ensemble(c, PARAMS,
                                                  dtype=jnp.float32)


def _bases(c):
    t = jax.vmap(lambda cc: rigid.rigid_modes_anm(cc, layout="xyz"))(c)
    return t.astype(jnp.float32)


def s1_cov(c):
    h = s0_assembly(c)
    return rigid.covariance_cholesky(h, _bases(c), inverse="blocked")


def s2_reduce(c):
    h = s0_assembly(c)
    return jax.vmap(
        lambda mm: spectrum.band_reduce(mm, BW, bucket=BUCKET))(h)


def s3_bisect(c):
    diags = s2_reduce(c)
    return spectrum.banded_eigenvalues_pallas(diags,
                                              n_iter=N_ITER_BISECT)


def s4_modes(c):
    h = s0_assembly(c)
    bases = _bases(c)
    cov = rigid.covariance_cholesky(h, bases, inverse="blocked")
    return jax.vmap(
        lambda cc, hh, tt: modes_mod.modes_from_covariance(
            cc, hh, tt, k=N_MODES, n_iter=16)
    )(cov, h, bases)


def s5_full(c):
    return pipeline.ensemble_anm_spectral(
        c, PARAMS, dtype=jnp.float32, n_modes=N_MODES,
        n_iter_bisect=N_ITER_BISECT)


def timed(name, fn, batches):
    def chained(c):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = fn(c)
            acc = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), out, acc)
            c = c + (acc * jnp.float32(1e-30))[..., None, None, None]
        return acc

    prog = jax.jit(chained)
    t0 = time.perf_counter()
    float(prog(batches[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in batches[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{name:12s}: {best * 1e3:8.2f} ms/iter (compile "
          f"{compile_s:5.1f}s, {B / best:8.0f} solves/s)", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} m={3 * N} "
          f"chain={CHAIN} bw={BW} bisect={N_ITER_BISECT}")
    batches = [make_batch(seed) for seed in range(REPS + 1)]
    stages = [
        ("assembly", s0_assembly),
        ("cov", s1_cov),
        ("reduce", s2_reduce),
        ("bisect", s3_bisect),
        ("modes", s4_modes),
        ("full", s5_full),
    ]
    results = {}
    for name, fn in stages:
        results[name] = timed(name, fn, batches)
    print("\nincremental stages (ms/iter; reduce/bisect and cov/modes "
          "are separate chains off assembly):")
    a = results["assembly"] * 1e3
    print(f"  assembly     : {a:8.2f}")
    print(f"  cov          : +{results['cov'] * 1e3 - a:8.2f}")
    print(f"  reduce       : +{results['reduce'] * 1e3 - a:8.2f}")
    print(f"  bisect       : +{results['bisect'] * 1e3 - results['reduce'] * 1e3:8.2f}")
    print(f"  modes        : +{results['modes'] * 1e3 - results['cov'] * 1e3:8.2f}")
    print(f"  full         : {results['full'] * 1e3:8.2f}")


if __name__ == "__main__":
    main()

"""
Stage profile of the headline fluctuation pipeline at (B, N) —
differenced cumulative device programs, relay-floor aware.

The headline metric (bench.py) runs
``ensemble_anm_fluctuations(inverse='blocked', with_covariance=False)``
— assembly -> rigid bases + regularize/equilibrate -> recursive
aligned inverse factor -> scale + plane-trace Gram -> observables.
Each cumulative prefix is timed as ONE jitted program returning a
scalar checksum (the relay's ~28 ms per-call floor cancels in the
differences; the batch is large enough that stages dwarf it).

Usage:  python tools/profile_headline.py [B] [N] [reps]
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
import numpy as np

from springcraft_tpu.ops import pallas_kernels, pallas_linalg, rigid
from springcraft_tpu.ops import ffparams
from springcraft_tpu.parallel import pipeline

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

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


def _prep(c):
    h = s0_assembly(c)
    t = jax.vmap(lambda cc: rigid.rigid_modes_anm(cc, layout="xyz"))(c)
    t = t.astype(jnp.float32)
    sigma = jnp.mean(jnp.diagonal(h, axis1=-2, axis2=-1),
                     axis=-1)[..., None, None]
    ttt = jnp.matmul(t, jnp.swapaxes(t, -1, -2), precision="highest")
    reg = h + sigma * ttt
    scale = 1.0 / jnp.sqrt(jnp.diagonal(reg, axis1=-2, axis2=-1))
    reg = reg * scale[..., :, None] * scale[..., None, :]
    return reg, scale


def s1_prep(c):
    return _prep(c)[0]


def s2_factor(c):
    reg, _ = _prep(c)
    return pallas_linalg.spd_inverse_factor(reg)


def _traces(c):
    reg, scale = _prep(c)
    g = pallas_linalg.spd_inverse_factor(reg)
    m = 3 * N
    mp = g.shape[-1]
    if mp != m:
        scale_p = jnp.zeros(scale.shape[:-1] + (mp,), scale.dtype)
        scale_p = scale_p.at[..., :m].set(scale)
    else:
        scale_p = scale
    w = (g * scale_p[..., None, :])[..., :, :m]
    wc = w.reshape(w.shape[:-1] + (3, N))
    return jnp.einsum("...kan,...kam->...nm", wc, wc,
                      precision="highest")


def s3_traces(c):
    return _traces(c)


def s4_full(c):
    return pipeline.ensemble_anm_fluctuations(
        c, PARAMS, with_dcc=True, dtype=jnp.float32, inverse="blocked",
        with_covariance=False)


def s_leaves(c):
    # the 16 leaf panels per matrix, as one batched call on synthetic
    # SPD panels derived from the coords (cost model of the kernel)
    rng_mat = jnp.einsum("bni,bmi->bnm", c, c) + 64.0 * jnp.eye(
        N, dtype=jnp.float32)
    panels = jnp.stack([rng_mat[:, :64, :64] + i for i in range(16)],
                       axis=1).reshape(B * 16, 64, 64)
    l, w = pallas_linalg.panel_cholesky_batched(panels)
    return w


def timed(name, fn, batches):
    prog = jax.jit(lambda c: jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), fn(c), jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(prog(batches[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in batches[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:12s}: {best * 1e3:8.2f} ms/call (compile "
          f"{compile_s:.1f}s, {B / best:8.0f} solves/s)", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} m={3 * N}")
    batches = [make_batch(seed) for seed in range(REPS + 1)]
    stages = [
        ("assembly", s0_assembly),
        ("prep", s1_prep),
        ("factor", s2_factor),
        ("traces", s3_traces),
        ("full", s4_full),
        ("leaves16", s_leaves),
    ]
    results = {}
    for name, fn in stages:
        results[name] = timed(name, fn, batches)
    print("\ndifferenced stages (ms/call):")
    chain = ["assembly", "prep", "factor", "traces", "full"]
    prev = 0.0
    for name in chain:
        cur = results[name] * 1e3
        print(f"  {name:12s}: +{cur - prev:8.2f}  (cum {cur:8.2f})")
        prev = cur
    print(f"  leaves16 alone: {results['leaves16'] * 1e3:.2f} ms")


if __name__ == "__main__":
    main()

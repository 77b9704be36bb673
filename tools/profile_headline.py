"""
Stage profile of the headline fluctuation pipeline at (B, N) —
loop-chained device programs, relay-floor aware.

The headline metric (bench.py) runs
``ensemble_anm_fluctuations(inverse='blocked', with_covariance=False)``
— assembly -> rigid bases + fused regularize/equilibrate -> recursive
aligned inverse factor -> scale + plane-trace Gram -> observables.
Each stage prefix is timed as ONE jitted program that loops the prefix
``CHAIN`` times with a data dependency between iterations, so the
relay's ~28 ms per-call floor amortizes to ~floor/CHAIN and the
per-iteration cost comes out clean.

Usage:  python tools/profile_headline.py [B] [N] [reps] [chain]
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

from springcraft_tpu.ops import pallas_kernels, pallas_linalg, rigid
from springcraft_tpu.ops import ffparams
from springcraft_tpu.parallel import pipeline

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 6

_CA_DENSITY = 300 / 34.0**3


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    spread = (N / _CA_DENSITY) ** (1.0 / 3.0)
    base = (rng.rand(N, 3) * spread).astype(np.float32)
    return jnp.asarray(
        base[None] + 0.05 * rng.randn(B, N, 3).astype(np.float32))


def _make_params():
    """FF=sdenm profiles the tabulated compact family (27-bin sdENM
    tables through the hoisted-plane ensemble kernel); default is the
    invariant headline parameterization."""
    if os.environ.get("FF", "").lower() == "sdenm":
        from springcraft_tpu.models import TabulatedForceField
        from springcraft_tpu.structure.atoms import AtomArray

        rng = np.random.RandomState(7)
        spread = (N / _CA_DENSITY) ** (1.0 / 3.0)
        atoms = AtomArray(N)
        atoms.coord = (rng.rand(N, 3) * spread).astype(np.float32)
        atoms.atom_name[:] = "CA"
        atoms.element[:] = "C"
        atoms.res_id[:] = np.arange(1, N + 1)
        names = np.array(["ALA", "GLY", "LEU", "SER", "VAL"])
        atoms.res_name[:] = names[rng.randint(0, len(names), N)]
        atoms.chain_id[:] = "A"
        return TabulatedForceField.sd_enm(atoms).to_compact_params()
    return ffparams.invariant_params(13.0)


import os  # noqa: E402  (needed before _make_params at module load)
PARAMS = _make_params()


def s0_assembly(c):
    return pallas_kernels.hessian_pallas_ensemble(c, PARAMS,
                                                  dtype=jnp.float32)


def _bases(c):
    t = jax.vmap(lambda cc: rigid.rigid_modes_anm(cc, layout="xyz"))(c)
    return t.astype(jnp.float32)


import os
_TILE = int(os.environ.get("ASM_TILE", "0")) or None


def s0_planes(c):
    return pallas_kernels.hessian_pallas_ensemble(
        c, PARAMS, dtype=jnp.float32, raw_planes=True, tile=_TILE)


def s1_prep(c):
    planes = s0_planes(c)
    reg, scale, sigma = rigid._regularize_equilibrated_planes(
        planes, N, _bases(c), None)
    return reg, scale


def s2_factor(c):
    # parts form — what the pipeline's trace path actually consumes
    # (r5: the final materializing concat is skipped)
    reg, scale = s1_prep(c)
    return pallas_linalg.spd_inverse_factor_parts(reg), scale


def s3_traces(c):
    planes = s0_planes(c)
    return rigid.covariance_plane_traces_from_planes(
        planes, N, _bases(c))


def s4_full(c):
    prep = "direct" if os.environ.get("DIRECT", "") else "planes"
    return pipeline.ensemble_anm_fluctuations(
        c, PARAMS, with_dcc=True, dtype=jnp.float32, inverse="blocked",
        with_covariance=False, prep=prep)


# --- assembly-fused direct path (planes never hit HBM) ---

def d1_prep(c):
    reg, scale, _ = rigid._regularize_equilibrated_direct(
        c, PARAMS, _bases(c), None)
    return reg, scale


def d2_factor(c):
    reg, scale = d1_prep(c)
    return pallas_linalg.spd_inverse_factor(reg), scale


def d3_traces(c):
    return rigid.covariance_plane_traces_direct(c, PARAMS, _bases(c))


def timed(name, fn, batches):
    """Loop-chained timing: CHAIN dependent iterations inside one
    program; the checksum of iteration k perturbs iteration k+1's
    coordinates so XLA cannot parallelize or CSE the chain."""
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
          f"chain={CHAIN}")
    batches = [make_batch(seed) for seed in range(REPS + 1)]
    direct = os.environ.get("DIRECT", "")
    if direct:
        stages = [
            ("bases", _bases),
            ("d_prep", d1_prep),
            ("d_factor", d2_factor),
            ("d_traces", d3_traces),
            ("full", s4_full),
        ]
        chain = ["bases", "d_prep", "d_factor", "d_traces", "full"]
    else:
        stages = [
            ("assembly", s0_planes),
            ("bases", lambda c: (s0_planes(c), _bases(c))),
            ("prep", s1_prep),
            ("factor", s2_factor),
            ("traces", s3_traces),
            ("full", s4_full),
        ]
        chain = ["assembly", "bases", "prep", "factor", "traces",
                 "full"]
    results = {}
    for name, fn in stages:
        results[name] = timed(name, fn, batches)
    print("\ndifferenced stages (ms/iter):")
    prev = 0.0
    for name in chain:
        cur = results[name] * 1e3
        print(f"  {name:12s}: +{cur - prev:8.2f}  (cum {cur:8.2f})")
        prev = cur


if __name__ == "__main__":
    main()

"""
Benchmark harness.

Headline metric (cf. BASELINE.json "NMA solves/sec batched"): complete
fluctuation-NMA solves per second — Hessian assembly + all-mode
covariance + MSF + B-factors + normalized DCC for a 300-residue
protein, batched over a conformer ensemble on one chip.  The TPU path
uses the analytic-null-space Cholesky covariance; the CPU baseline
computes the *same observables* the reference way (pair-list assembly
+ `np.linalg.pinv(hermitian=True)`), single-threaded float64 NumPy —
the reference has no GPU/TPU path and publishes no numbers.

The full spectral pipeline (eigh: eigenvalues/frequencies/modes) is
also measured against an eigh-based CPU baseline and reported on
stderr.

Timing methodology: every jitted program returns a scalar checksum of
all outputs and the clock stops on fetching it — plain
``block_until_ready`` does not synchronize on relayed TPU backends.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import functools
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the remote TPU compiles take minutes;
# caching amortizes them across bench runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.realpath(__file__)),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

N_RES = 300
BATCH = 64
CUTOFF = 13.0
TPU_ITERS = 8
CPU_ITERS = 3


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_batches(n_batches, batch, n_res, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(n_res, 3) * 34.0).astype(np.float32)
    return [
        base[None] + 0.05 * rng.randn(batch, n_res, 3).astype(np.float32)
        for _ in range(n_batches)
    ]


def _timed(fn, inputs):
    """Compile on inputs[0], then time scalar fetches over the rest."""
    t0 = time.perf_counter()
    float(fn(inputs[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    vals = [fn(b) for b in inputs[1:]]
    checksum = sum(float(v) for v in vals)
    return compile_s, time.perf_counter() - t0, checksum


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams
    from springcraft_tpu.parallel import pipeline

    params = ffparams.invariant_params(CUTOFF)
    batches = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(TPU_ITERS + 1, BATCH, N_RES)
    ]

    solves = TPU_ITERS * BATCH

    # Fluctuation pipeline (Cholesky covariance, no eigh) — the
    # headline: MSF + B-factors + normalized DCC per conformer
    fluct = jax.vmap(
        functools.partial(pipeline.anm_fluctuations, params=params,
                          with_dcc=True, dtype=jnp.float32)
    )
    fluct_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in fluct(b).values())
    )
    compile_s, elapsed, _ = _timed(fluct_fn, batches)
    fluct_rate = solves / elapsed
    log(f"tpu[{jax.devices()[0].device_kind}] fluctuation pipeline "
        f"(Cholesky covariance): compile {compile_s:.1f}s; {solves} "
        f"solves (N={N_RES}) in {elapsed:.3f}s -> "
        f"{fluct_rate:.1f} solves/s")

    # Full spectral pipeline (eigh) — diagnostics
    spectral = jax.vmap(
        functools.partial(pipeline.anm_observables, params=params,
                          dtype=jnp.float32)
    )
    spectral_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in spectral(b).values())
    )
    compile_s, elapsed, _ = _timed(spectral_fn, batches)
    spectral_rate = solves / elapsed
    log(f"tpu spectral pipeline (full eigh): compile {compile_s:.1f}s; "
        f"{solves} solves in {elapsed:.3f}s -> "
        f"{spectral_rate:.1f} solves/s")

    return fluct_rate, spectral_rate


def _cpu_hessian(coord):
    """Reference-architecture assembly: pair list + scatter, float64."""
    diff = coord[:, None, :] - coord[None, :, :]
    sq = np.einsum("ijk,ijk->ij", diff, diff)
    adj = (sq <= CUTOFF**2) & ~np.eye(N_RES, dtype=bool)
    i, j = np.where(adj)
    disp = coord[j] - coord[i]
    sqd = np.einsum("kd,kd->k", disp, disp)
    blocks = np.zeros((N_RES, N_RES, 3, 3))
    blocks[i, j] = -(1.0 / sqd)[:, None, None] * np.einsum(
        "ka,kb->kab", disp, disp
    )
    idx = np.arange(N_RES)
    blocks[idx, idx] = -blocks.sum(axis=0)
    return blocks.transpose(0, 2, 1, 3).reshape(3 * N_RES, 3 * N_RES)


def bench_cpu_baselines():
    """Reference-equivalent CPU paths for both pipelines, float64 NumPy:

    * fluctuation: Hessian + ``np.linalg.pinv(hermitian=True)``
      covariance + MSF/B-factor/DCC (reference ``anm.py:133-136``,
      ``nma.py:324-353``);
    * spectral: Hessian + full ``np.linalg.eigh`` + observables
      (reference ``nma.py:61``).
    """
    coords = [b[0].astype(np.float64) for b in
              make_batches(CPU_ITERS, 1, N_RES, seed=1)]

    def fluct_solve(coord):
        hessian = _cpu_hessian(coord)
        cov = np.linalg.pinv(hessian, hermitian=True, rcond=1e-6)
        traces = np.einsum("iaja->ij", cov.reshape(N_RES, 3, N_RES, 3))
        msf = np.diagonal(traces)
        bfac = (8 * np.pi**2) * msf / 3
        dcc = traces / np.sqrt(msf[None, :] * msf[:, None])
        return msf, bfac, dcc

    def spectral_solve(coord):
        hessian = _cpu_hessian(coord)
        vals, vecs = np.linalg.eigh(hessian)
        sq_vecs = np.square(vecs.T[6:]).reshape(3 * N_RES - 6, N_RES, 3)
        msf = (sq_vecs.sum(-1) / vals[6:, None]).sum(0)
        return vals, msf

    def best_rate(solve):
        # Median per-solve time over the coords, repeated twice, for
        # robustness against transient host load
        times = []
        for _ in range(2):
            for c in coords:
                t0 = time.perf_counter()
                solve(c)
                times.append(time.perf_counter() - t0)
        times.sort()
        return 1.0 / times[len(times) // 2]

    fluct_rate = best_rate(fluct_solve)
    log(f"cpu fluctuation baseline (pinv, float64): "
        f"{fluct_rate:.3f} solves/s")
    spectral_rate = best_rate(spectral_solve)
    log(f"cpu spectral baseline (eigh, float64): "
        f"{spectral_rate:.3f} solves/s")
    return fluct_rate, spectral_rate


def main():
    tpu_fluct, tpu_spectral = bench_tpu()
    cpu_fluct, cpu_spectral = bench_cpu_baselines()
    log(f"speedups: fluctuation {tpu_fluct / cpu_fluct:.1f}x, "
        f"spectral {tpu_spectral / cpu_spectral:.1f}x")
    result = {
        "metric": f"anm_fluctuation_nma_solves_per_sec_batched_n{N_RES}",
        "value": round(tpu_fluct, 2),
        "unit": "solves/s",
        "vs_baseline": round(tpu_fluct / cpu_fluct, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

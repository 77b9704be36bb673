"""
Benchmark harness.

Headline metric (cf. BASELINE.json): batched NMA solves/sec — complete
ANM pipelines (dense Hessian assembly -> full eigh -> MSF/B-factors/
frequencies) for a 300-residue protein, batched over a conformer
ensemble on one chip.

Baseline: the reference implementation is single-threaded float64 NumPy
(pair-list assembly + LAPACK eigh; springcraft has no GPU/TPU path and
publishes no numbers), measured here with an equivalent NumPy
implementation on the host CPU.

Timing methodology: every jitted program returns a scalar checksum of
all outputs and the clock stops on fetching it — plain
``block_until_ready`` does not synchronize on relayed TPU backends.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Extra diagnostics (fast covariance path, scaling curve) go to stderr.
"""

import functools
import json
import sys
import time

import numpy as np

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

    spectral = jax.vmap(
        functools.partial(pipeline.anm_observables, params=params,
                          dtype=jnp.float32)
    )
    spectral_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in spectral(b).values())
    )
    compile_s, elapsed, _ = _timed(spectral_fn, batches)
    solves = TPU_ITERS * BATCH
    spectral_rate = solves / elapsed
    log(f"tpu[{jax.devices()[0].device_kind}] spectral pipeline: "
        f"compile {compile_s:.1f}s; {solves} solves (N={N_RES}) in "
        f"{elapsed:.3f}s -> {spectral_rate:.1f} solves/s")

    # Fast covariance-only pipeline (no eigh) — fluctuation observables
    fluct = jax.vmap(
        functools.partial(pipeline.anm_fluctuations, params=params,
                          with_dcc=True, dtype=jnp.float32)
    )
    fluct_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in fluct(b).values())
    )
    compile_s, elapsed, _ = _timed(fluct_fn, batches)
    log(f"tpu fluctuation pipeline (Cholesky covariance): compile "
        f"{compile_s:.1f}s; {solves} solves in {elapsed:.3f}s -> "
        f"{solves / elapsed:.1f} solves/s")

    return spectral_rate


def bench_cpu_baseline():
    """Reference-equivalent path: float64 NumPy pair-list assembly +
    LAPACK eigh + MSF (springcraft's architecture)."""
    coords = [b[0].astype(np.float64) for b in
              make_batches(CPU_ITERS, 1, N_RES, seed=1)]

    def solve(coord):
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
        hessian = blocks.transpose(0, 2, 1, 3).reshape(3 * N_RES, 3 * N_RES)
        vals, vecs = np.linalg.eigh(hessian)
        sq_vecs = np.square(vecs.T[6:]).reshape(3 * N_RES - 6, N_RES, 3)
        msf = (sq_vecs.sum(-1) / vals[6:, None]).sum(0)
        return msf

    t0 = time.perf_counter()
    for c in coords:
        solve(c)
    elapsed = time.perf_counter() - t0
    rate = CPU_ITERS / elapsed
    log(f"cpu baseline (reference architecture, float64): {CPU_ITERS} "
        f"solves in {elapsed:.3f}s -> {rate:.3f} solves/s")
    return rate


def main():
    tpu_rate = bench_tpu()
    cpu_rate = bench_cpu_baseline()
    result = {
        "metric": f"anm_nma_solves_per_sec_batched_n{N_RES}",
        "value": round(tpu_rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

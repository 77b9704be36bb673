"""
Benchmark harness.

Headline metric (cf. BASELINE.json): batched NMA solves/sec — complete
ANM pipelines (dense Hessian assembly -> eigh -> MSF/B-factors) for a
300-residue protein, batched over a conformer ensemble on one chip.

Baseline: the reference implementation is single-threaded float64 NumPy
(pair-list assembly + LAPACK eigh; springcraft has no GPU/TPU path and
publishes no numbers, so the baseline is measured here with an
equivalent NumPy implementation on the host CPU).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

N_RES = 300
BATCH = 64
CUTOFF = 13.0
TPU_ITERS = 10
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


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams
    from springcraft_tpu.parallel import pipeline

    params = ffparams.invariant_params(CUTOFF)
    batches = make_batches(TPU_ITERS + 1, BATCH, N_RES)
    device_batches = [jax.device_put(jnp.asarray(b)) for b in batches]

    import functools

    fn = jax.jit(
        jax.vmap(
            functools.partial(
                pipeline.anm_observables, params=params, dtype=jnp.float32
            )
        )
    )

    def checksum(out):
        # Scalar depending on every output, so fetching it forces the
        # whole computation to finish (block_until_ready alone does not
        # synchronize on relayed backends).
        return sum(jnp.sum(v) for v in out.values())

    # Warm-up / compile
    t0 = time.perf_counter()
    float(checksum(fn(device_batches[0])))
    log(f"tpu compile+first-run: {time.perf_counter() - t0:.2f}s on "
        f"{jax.devices()[0].device_kind}")

    t0 = time.perf_counter()
    acc = 0.0
    for b in device_batches[1:]:
        acc = acc + checksum(fn(b))
    acc = float(acc)
    elapsed = time.perf_counter() - t0
    solves = TPU_ITERS * BATCH
    rate = solves / elapsed
    log(f"tpu: {solves} solves (N={N_RES}) in {elapsed:.3f}s -> "
        f"{rate:.1f} solves/s (checksum {acc:.3e})")
    return rate


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
    log(f"cpu baseline: {CPU_ITERS} solves in {elapsed:.3f}s -> "
        f"{rate:.3f} solves/s")
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

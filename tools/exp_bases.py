"""Micro-bench of the rigid-mode basis stage at (128, 300): vmapped
Householder QR (current) vs Cholesky-QR (Gram + 6x6 triangular solve,
pure MXU) vs Cholesky-QR with the mode stack built by broadcast
writes.  Loop-chained like profile_headline (relay floor amortized).
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

from springcraft_tpu.ops import rigid

B, N = 128, 300
CHAIN = 8
REPS = 5
_CA_DENSITY = 300 / 34.0**3


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    spread = (N / _CA_DENSITY) ** (1.0 / 3.0)
    base = (rng.rand(N, 3) * spread).astype(np.float32)
    return jnp.asarray(
        base[None] + 0.05 * rng.randn(B, N, 3).astype(np.float32))


def bases_qr(c):
    return jax.vmap(lambda x: rigid.rigid_modes_anm(x, layout="xyz"))(c)


def _modes_flat(coord):
    n = coord.shape[0]
    centered = coord - coord.mean(axis=0)
    x, y, z = centered[:, 0], centered[:, 1], centered[:, 2]
    zero = jnp.zeros(n, dtype=coord.dtype)
    one = jnp.ones(n, dtype=coord.dtype)
    modes = jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, one, zero]),
            jnp.stack([zero, zero, one]),
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ],
        axis=-1,
    )
    return modes.reshape(3 * n, 6)


def bases_cholqr(c):
    def one(coord):
        flat = _modes_flat(coord)
        g = jnp.matmul(flat.T, flat, precision="highest")
        ell = jnp.linalg.cholesky(g)
        return jax.lax.linalg.triangular_solve(
            ell, flat, left_side=False, lower=True, transpose_a=True)
    return jax.vmap(one)(c)


def bases_cholqr_batched(c):
    # batch the Gram + solve as one einsum / one batched 6x6 solve
    cen = c - c.mean(axis=1, keepdims=True)
    x, y, z = cen[..., 0], cen[..., 1], cen[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    modes = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=1),
            jnp.stack([zero, one, zero], axis=1),
            jnp.stack([zero, zero, one], axis=1),
            jnp.stack([zero, -z, y], axis=1),
            jnp.stack([z, zero, -x], axis=1),
            jnp.stack([-y, x, zero], axis=1),
        ],
        axis=-1,
    )  # (B, 3, n, 6)
    flat = modes.reshape(c.shape[0], 3 * N, 6)
    g = jnp.einsum("bmi,bmj->bij", flat, flat, precision="highest")
    ell = jnp.linalg.cholesky(g)
    return jax.lax.linalg.triangular_solve(
        ell, flat, left_side=False, lower=True, transpose_a=True)


def timed(name, fn, batches):
    def chained(c):
        def body(carry, _):
            out = fn(c * (1.0 + carry * 1e-20))
            return jnp.sum(out[..., 0, :]), None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=CHAIN)
        return s
    jfn = jax.jit(chained)
    t0 = time.perf_counter()
    float(jfn(batches[0]))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for r in range(REPS):
        t0 = time.perf_counter()
        float(jfn(batches[1]))
        best = min(best, time.perf_counter() - t0)
    per = best / CHAIN
    print(f"{name:22s}: {per * 1e3:8.2f} ms/iter (compile {compile_s:.1f}s)")
    return per


def main():
    print(f"backend={jax.default_backend()} B={B} N={N}")
    batches = [make_batch(s) for s in range(2)]
    # correctness first
    ref = np.asarray(bases_qr(batches[0]))
    for nm, fn in (("cholqr", bases_cholqr),
                   ("cholqr_batched", bases_cholqr_batched)):
        got = np.asarray(fn(batches[0]))
        err = np.max(np.abs(got - ref))
        orth = np.max(np.abs(
            np.einsum("bmi,bmj->bij", got, got) - np.eye(6)))
        print(f"{nm}: max|Q-Qref|={err:.2e}  max|QtQ-I|={orth:.2e}")
    for nm, fn in (("qr (current)", bases_qr),
                   ("cholqr", bases_cholqr),
                   ("cholqr_batched", bases_cholqr_batched)):
        timed(nm, fn, batches)


if __name__ == "__main__":
    main()


def stack_only(c):
    return jax.vmap(_modes_flat)(c)


def _modes_rows(cen_t):
    # (3, n) transposed centered coords -> (6, 3n) xyz-layout F^T,
    # all full-lane-width ops
    x, y, z = cen_t[0], cen_t[1], cen_t[2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    cat = lambda a, b, c_: jnp.concatenate([a, b, c_], axis=-1)
    return jnp.stack([
        cat(one, zero, zero),
        cat(zero, one, zero),
        cat(zero, zero, one),
        cat(zero, -z, y),
        cat(z, zero, -x),
        cat(-y, x, zero),
    ])


def stack_T_only(c):
    cen = c - c.mean(axis=1, keepdims=True)
    return jax.vmap(_modes_rows)(jnp.swapaxes(cen, 1, 2))


def cholqr_T(c):
    """Full transposed pipeline: returns T^t (B, 6, 3n)."""
    cen = c - c.mean(axis=1, keepdims=True)
    ft = jax.vmap(_modes_rows)(jnp.swapaxes(cen, 1, 2))
    g = jax.lax.dot_general(
        ft, ft, (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)
    ell = jnp.linalg.cholesky(g)
    return jax.lax.linalg.triangular_solve(
        ell, ft, left_side=True, lower=True)


def cholqr_T_to_rowmajor(c):
    return jnp.swapaxes(cholqr_T(c), 1, 2)


def main2():
    print(f"backend={jax.default_backend()} B={B} N={N} [part 2]")
    batches = [make_batch(s) for s in range(2)]
    ref = np.asarray(bases_qr(batches[0]))
    got = np.swapaxes(np.asarray(cholqr_T(batches[0])), 1, 2)
    orth = np.max(np.abs(np.einsum("bmi,bmj->bij", got, got) - np.eye(6)))
    # same span check: project ref onto got
    proj = np.einsum("bmi,bmj->bij", got, ref)
    span = np.max(np.abs(np.einsum("bij,bmi->bmj", proj, got) - ref))
    print(f"cholqr_T: max|QtQ-I|={orth:.2e}  span err={span:.2e}")
    for nm, fn in (("stack_only", stack_only),
                   ("stack_T_only", stack_T_only),
                   ("cholqr_T", cholqr_T),
                   ("cholqr_T_to_rowmajor", cholqr_T_to_rowmajor),
                   ("qr (current)", bases_qr)):
        timed(nm, fn, batches)


if __name__ == "__main__" and os.environ.get("PART2"):
    main2()

"""
Eigenvalues-only symmetric spectrum solver (experimental).

XLA's TPU ``eigh`` computes eigenvectors even when only the spectrum is
wanted and runs far below peak (see docs/performance.md); for
frequency/eigenvalue workloads this module provides a two-stage
alternative built from TPU-friendly primitives:

1. **Householder tridiagonalization** — a ``lax.fori_loop`` of
   symmetric rank-2 updates (matvec + outers, O(n^2) per step, VPU/MXU
   work on the full static-shape matrix).
2. **Sturm bisection** — all ``n`` eigenvalues refined simultaneously:
   each iteration evaluates the LDL^t sign-count recurrence for a
   vector of ``n`` shifts in one scan, so the whole bisection costs
   ``O(iters * n^2)`` fully vectorized ops.

Both stages are jit/vmap-compatible (batched spectra).  Accuracy is
float32-level (backward-stable reduction + ~45 bisection halvings of
the Gershgorin interval).  Use :func:`springcraft_tpu.ops.linalg.eigh`
when eigenvectors are needed.

Status: **experimental, not yet faster than XLA's eigh** — the
unblocked rank-2 reduction rewrites the full matrix every step and is
HBM-bandwidth-bound (measured 1.63 s vs 1.27 s for XLA ``eigvalsh`` on
64 x 900-dim f32 on v5e).  The path to a win is a blocked two-stage
reduction (full -> band via panel QR with matmul-rich updates, then
band -> tridiagonal); the bisection stage is already cheap.  Kept as a
correctness-validated building block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["tridiagonalize", "tridiagonal_eigenvalues", "eigvalsh_sturm"]


def tridiagonalize(matrix):
    """
    Reduce a symmetric matrix to tridiagonal form by Householder
    similarity transforms (eigenvalue-preserving).

    Returns
    -------
    diag : ndarray, shape=(n,)
    offdiag : ndarray, shape=(n - 1,)
    """
    matrix = jnp.asarray(matrix)
    n = matrix.shape[-1]
    idx = jnp.arange(n)
    eps = jnp.asarray(1e-30, matrix.dtype)

    def step(k, a):
        col = a[:, k]
        below = idx > k
        x = jnp.where(below, col, 0.0)
        norm_x = jnp.sqrt(jnp.sum(x * x))
        head = jnp.take(x, k + 1, mode="clip")
        alpha = -jnp.sign(jnp.where(head == 0, 1.0, head)) * norm_x
        v = jnp.where(idx == k + 1, x - alpha, x)
        v_norm = jnp.sqrt(jnp.sum(v * v))
        # Skip the update when the column is already reduced
        safe = v_norm > eps
        v = jnp.where(safe, v / jnp.where(safe, v_norm, 1.0), 0.0)

        u = jnp.matmul(a, v, precision="highest")  # (n,)
        gamma = jnp.dot(v, u, precision="highest")
        a = (a - 2.0 * jnp.outer(v, u) - 2.0 * jnp.outer(u, v)
             + 4.0 * gamma * jnp.outer(v, v))
        return a

    a = jax.lax.fori_loop(0, n - 2, step, matrix)
    diag = jnp.diagonal(a)
    offdiag = jnp.diagonal(a, offset=1)
    return diag, offdiag


def _sturm_counts(diag, offdiag, shifts):
    """Number of eigenvalues strictly below each shift (vectorized over
    the shift vector) via the LDL^t recurrence."""
    n = diag.shape[0]
    e2 = jnp.concatenate([jnp.zeros(1, diag.dtype), offdiag * offdiag])
    tiny = jnp.asarray(1e-30, diag.dtype)

    def body(carry, inputs):
        q, count = carry
        d_i, e2_i = inputs
        q_safe = jnp.where(jnp.abs(q) < tiny,
                           jnp.where(q < 0, -tiny, tiny), q)
        q_new = (d_i - shifts) - e2_i / q_safe
        count = count + (q_new < 0)
        return (q_new, count), None

    # First row: q = d[0] - shift
    q0 = diag[0] - shifts
    carry = (q0, (q0 < 0).astype(jnp.int32))
    (q, count), _ = jax.lax.scan(
        body, carry, (diag[1:], e2[1:]), unroll=8
    )
    return count


def tridiagonal_eigenvalues(diag, offdiag, n_iter=45):
    """
    All eigenvalues of a symmetric tridiagonal matrix, ascending, by
    parallel Sturm bisection.
    """
    n = diag.shape[0]
    e_pad = jnp.concatenate([jnp.zeros(1, diag.dtype),
                             jnp.abs(offdiag),
                             jnp.zeros(1, diag.dtype)])
    radius = e_pad[:-1] + e_pad[1:]
    lo = jnp.full(n, jnp.min(diag - radius))
    hi = jnp.full(n, jnp.max(diag + radius))
    targets = jnp.arange(n, dtype=jnp.int32)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        counts = _sturm_counts(diag, offdiag, mid)
        # count <= j  ->  eigenvalue j is >= mid
        go_up = counts <= targets
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def eigvalsh_sturm(matrix, n_iter=45):
    """
    Eigenvalues (ascending) of symmetric `matrix` without computing
    eigenvectors; supports one leading batch dimension via vmap inside.
    """
    matrix = jnp.asarray(matrix)
    if matrix.ndim == 2:
        d, e = tridiagonalize(matrix)
        return tridiagonal_eigenvalues(d, e, n_iter=n_iter)
    fn = jax.vmap(lambda m: eigvalsh_sturm(m, n_iter=n_iter))
    return fn(matrix)

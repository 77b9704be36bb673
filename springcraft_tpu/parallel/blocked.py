"""
Distributed blocked Cholesky and triangular solves for mega-assembly
all-mode covariance.

The single-chip fast-covariance path (``ops.rigid.covariance_cholesky``,
reference semantics ``anm.py:133-136``) holds the full factor on one
device; at the 30k-dim north star that replication exceeds one chip
once the covariance right-hand sides join it.  This module factors and
solves with the matrix kept **row-sharded** and the right-hand side
**column-sharded** across the mesh, using global-semantics ``jnp`` ops
under ``jit`` with sharding constraints — GSPMD partitions the panel
matmuls and inserts the (small) collectives for the ``(n, b)`` panels.

Per-device memory: ``n^2/R`` for the matrix + ``n^2/R`` for the
solution block + ``O(n b)`` panel workspace, vs ``2 n^2`` replicated.

Algorithms (right-looking, panel width ``b``):

* :func:`blocked_cholesky` — per panel: factor the ``b x b`` diagonal
  block, triangular-solve the panel column, one symmetric rank-``b``
  trailing update (a single ``(n, b) @ (b, n)`` matmul).
* :func:`blocked_solve_lower` / :func:`blocked_solve_lower_t` —
  forward/backward substitution in row panels; each step is a
  ``(n, b) @ (b, m)`` matmul over the column-sharded right-hand side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import rigid
from .sharded import sharded_hessian

__all__ = [
    "blocked_cholesky",
    "blocked_solve_lower",
    "blocked_solve_lower_t",
    "sharded_covariance_blocked",
    "sharded_all_mode_msf",
]


def _constrain(x, sharding):
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def blocked_cholesky(a, block, sharding=None):
    """
    Lower Cholesky factor of a symmetric positive-definite matrix by
    right-looking panel factorization.

    Parameters
    ----------
    a : ndarray, shape=(n, n)
        SPD matrix; ``n`` must be divisible by `block`.
    block : int
        Panel width.
    sharding : jax.sharding.NamedSharding, optional
        Row sharding to maintain on the work matrix throughout the
        factorization (e.g. ``P(("ens", "row"), None)``).

    Returns
    -------
    l : ndarray, shape=(n, n)
        Lower-triangular factor with ``l @ l.T == a``.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if n % block != 0:
        raise ValueError(f"block={block} must divide n={n}")
    nb = n // block
    idx = jnp.arange(n)

    def step(k, a):
        c = k * block
        akk = jax.lax.dynamic_slice(a, (c, c), (block, block))
        lkk = jnp.linalg.cholesky(akk)
        panel = jax.lax.dynamic_slice(a, (0, c), (n, block))
        # x = panel @ inv(lkk)^T, valid below the diagonal block
        x = jsl.solve_triangular(lkk, panel.T, lower=True).T
        x = jnp.where((idx >= c + block)[:, None], x, 0.0)
        # Rank-b trailing update (touches only rows/cols >= c + block)
        a = a - jnp.matmul(x, x.T, precision="highest")
        # Write the finished L panel (zeros above, lkk, x below)
        lpanel = jax.lax.dynamic_update_slice(x, lkk, (c, 0))
        a = jax.lax.dynamic_update_slice(a, lpanel, (0, c))
        return _constrain(a, sharding)

    a = jax.lax.fori_loop(0, nb, step, _constrain(a, sharding))
    return jnp.tril(a)


def blocked_solve_lower(l, rhs, block, sharding=None):
    """
    Solve ``L Y = rhs`` (forward substitution) in row panels; `rhs` may
    be column-sharded — each panel step is one ``(n, b) @ (b, m)``
    matmul that GSPMD partitions over the columns.
    """
    l = jnp.asarray(l)
    rhs = jnp.asarray(rhs)
    n = l.shape[-1]
    nb = n // block
    idx = jnp.arange(n)

    def step(k, y):
        c = k * block
        lkk = jax.lax.dynamic_slice(l, (c, c), (block, block))
        bk = jax.lax.dynamic_slice(y, (c, 0), (block, y.shape[1]))
        xk = jsl.solve_triangular(lkk, bk, lower=True)
        y = jax.lax.dynamic_update_slice(y, xk, (c, 0))
        lcol = jax.lax.dynamic_slice(l, (0, c), (n, block))
        lcol = jnp.where((idx >= c + block)[:, None], lcol, 0.0)
        y = y - jnp.matmul(lcol, xk, precision="highest")
        return _constrain(y, sharding)

    return jax.lax.fori_loop(0, nb, step, _constrain(rhs, sharding))


def blocked_solve_lower_t(l, rhs, block, sharding=None):
    """Solve ``L^T X = rhs`` (backward substitution) in row panels."""
    l = jnp.asarray(l)
    rhs = jnp.asarray(rhs)
    n = l.shape[-1]
    nb = n // block
    idx = jnp.arange(n)

    def step(k, x):
        c = (nb - 1 - k) * block
        lkk = jax.lax.dynamic_slice(l, (c, c), (block, block))
        bk = jax.lax.dynamic_slice(x, (c, 0), (block, x.shape[1]))
        xk = jsl.solve_triangular(lkk, bk, lower=True, trans=1)
        x = jax.lax.dynamic_update_slice(x, xk, (c, 0))
        lrow = jax.lax.dynamic_slice(l, (c, 0), (block, n))
        lrow = jnp.where((idx < c)[None, :], lrow, 0.0)
        x = x - jnp.matmul(lrow.T, xk, precision="highest")
        return _constrain(x, sharding)

    return jax.lax.fori_loop(0, nb, step, _constrain(rhs, sharding))


@functools.lru_cache(maxsize=None)
def _msf_fn(mesh, block, full_cov):
    row_sh = NamedSharding(mesh, P(("ens", "row"), None))
    col_sh = NamedSharding(mesh, P(None, ("ens", "row")))

    @jax.jit
    def run(h, t, sig):
        n3 = h.shape[0]
        reg = h + sig * jnp.matmul(t, t.T, precision="highest")
        # Jacobi equilibration (see ops.rigid.covariance_cholesky)
        scale = 1.0 / jnp.sqrt(jnp.diagonal(reg))
        reg = reg * scale[:, None] * scale[None, :]
        chol = blocked_cholesky(reg, block, sharding=row_sh)

        idx = jnp.arange(n3)
        eye = _constrain(
            (idx[:, None] == idx[None, :]).astype(h.dtype), col_sh
        )
        y = blocked_solve_lower(chol, eye, block, sharding=col_sh)
        if full_cov:
            z = blocked_solve_lower_t(chol, y, block, sharding=col_sh)
            cov = z * scale[:, None] * scale[None, :]
            cov = cov - jnp.matmul(t, t.T, precision="highest") / sig
            diag_cov = jnp.diagonal(cov)
            return cov, diag_cov
        # inv(reg_scaled) = Y^T Y  ->  its diagonal is the squared
        # column norms of Y; undo the equilibration, subtract the
        # null-space term
        diag_inv = jnp.sum(y * y, axis=0) * scale * scale
        diag_cov = diag_inv - jnp.sum(t * t, axis=1) / sig
        return None, diag_cov

    return run


def _prepare(coord, params, mesh, dtype):
    coord = jnp.asarray(coord, dtype=dtype)
    hessian = sharded_hessian(coord, params, mesh, dtype=dtype)
    basis = rigid.rigid_modes_anm(coord, layout="atom")
    sig = jnp.mean(jnp.diagonal(hessian))
    return hessian, jnp.asarray(basis, dtype=dtype), sig


def sharded_covariance_blocked(coord, params, mesh, block=1024,
                               dtype=jnp.float32):
    """
    Mega-assembly all-mode covariance (atom layout, reference
    ``pinv(hessian, rcond=1e-6)`` semantics via the regularized
    null-space Cholesky) with **no replicated factor**: the Hessian is
    born row-sharded, the blocked Cholesky keeps it row-sharded, and
    both triangular solves run on a column-sharded identity.  Output is
    column-sharded across the full mesh.
    """
    hessian, basis, sig = _prepare(coord, params, mesh, dtype)
    cov, _ = _msf_fn(mesh, block, True)(hessian, basis, sig)
    return cov


def sharded_all_mode_msf(coord, params, mesh, block=1024,
                         dtype=jnp.float32):
    """
    All-mode MSF + B-factors of a mega-assembly ANM on a mesh, via one
    distributed triangular solve (the covariance diagonal equals the
    squared column norms of ``L^{-1}``) — half the work and none of the
    replication of the full-covariance path.
    """
    from ..ops import nma_core

    hessian, basis, sig = _prepare(coord, params, mesh, dtype)
    _, diag_cov = _msf_fn(mesh, block, False)(hessian, basis, sig)
    n = diag_cov.shape[0] // 3
    msf = jnp.sum(diag_cov.reshape(n, 3), axis=1)  # atom layout
    return {"msf": msf, "bfactor": nma_core.bfactor_from_msf(msf)}

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
float32-level (backward-stable reduction + bisection halvings of the
Gershgorin interval).  Use :func:`springcraft_tpu.ops.linalg.eigh`
when eigenvectors are needed.

The production path is the **blocked two-stage solver**
:func:`eigvalsh_banded`:

1. **Blocked full -> band reduction** (:func:`band_reduce`) — per
   ``b``-column panel, one self-contained Householder QR of the
   below-band block (compact WY form) followed by a single symmetric
   rank-``2b`` trailing update ``A - W V^T - V W^T`` built from three
   full-size matmuls.  Unlike the rank-2 tridiagonalization above, the
   matrix is rewritten ``n/b`` times instead of ``n`` times, so the
   stage is MXU-bound rather than HBM-bound.
2. **Banded Sturm bisection** (:func:`banded_eigenvalues`) — the
   LDL^t inertia count generalizes from the scalar tridiagonal
   recurrence to a ``(b+1, b+1)`` trailing-window scan, evaluated for
   all ``n`` shifts simultaneously; no bulge-chasing band ->
   tridiagonal step is needed.

The legacy rank-2 path (`tridiagonalize` + `tridiagonal_eigenvalues`)
is the ``bandwidth=1`` special case and is kept for reference
(measured 1.63 s vs 1.27 s for XLA ``eigvalsh`` on 64 x 900-dim f32 on
v5e; the blocked solver is the one that beats XLA — see
docs/performance.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "tridiagonalize",
    "tridiagonal_eigenvalues",
    "eigvalsh_sturm",
    "band_reduce",
    "band_reduce_with_reflectors",
    "banded_eigenvalues",
    "banded_eigenvalues_pallas",
    "banded_eigenvectors",
    "back_transform",
    "eigvalsh_banded",
    "eigh_banded",
    "eigh_banded_staged",
]


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


# ---------------------------------------------------------------------------
# Blocked two-stage solver: full -> band (matmul-rich) + banded Sturm
# ---------------------------------------------------------------------------


def _panel_qr(panel, start_row, b):
    """
    Compact-WY Householder QR of the below-band block of a panel.

    Parameters
    ----------
    panel : ndarray, shape=(n, b)
        Columns ``c:c+b`` of the matrix; rows above `start_row`
        (= ``c + b``) are ignored.
    start_row : int (traced)
        First row of the block to triangularize.

    Returns
    -------
    v : ndarray, shape=(n, b)
        Unit Householder vectors (``H_j = I - 2 v_j v_j^T``), zero above
        row ``start_row + j``.
    t : ndarray, shape=(b, b)
        Upper-triangular factor with
        ``Q = H_0 ... H_{b-1} = I - V T V^T``.
    """
    n = panel.shape[0]
    dtype = panel.dtype
    idx = jnp.arange(n)
    eps = jnp.asarray(1e-30, dtype)

    def col_step(j, carry):
        p, v_acc, t_acc = carry
        pivot = start_row + j
        x = jnp.where(idx >= pivot, jax.lax.dynamic_slice(
            p, (0, j), (n, 1)
        )[:, 0], 0.0)
        norm_x = jnp.sqrt(jnp.sum(x * x))
        head = jnp.take(x, pivot, mode="clip")
        alpha = -jnp.sign(jnp.where(head == 0, 1.0, head)) * norm_x
        v = jnp.where(idx == pivot, x - alpha, x)
        v_norm = jnp.sqrt(jnp.sum(v * v))
        safe = v_norm > eps
        v = jnp.where(safe, v / jnp.where(safe, v_norm, 1.0), 0.0)

        # Apply H_j to the remaining panel columns
        proj = jnp.matmul(v, p, precision="highest")  # (b,)
        p = p - 2.0 * jnp.outer(v, proj)

        # T recurrence: T[:j, j] = -2 T[:j, :j] (V^T v_j); T[j, j] = 2
        vtv = jnp.matmul(v_acc.T, v, precision="highest")  # (b,)
        col_mask = jnp.arange(b) < j
        t_col = -2.0 * jnp.matmul(t_acc, jnp.where(col_mask, vtv, 0.0),
                                  precision="highest")
        t_col = jnp.where(jnp.arange(b) == j, 2.0, t_col)
        t_col = jnp.where(jnp.arange(b) <= j, t_col, 0.0)
        t_acc = jax.lax.dynamic_update_slice(t_acc, t_col[:, None], (0, j))
        v_acc = jax.lax.dynamic_update_slice(v_acc, v[:, None], (0, j))
        return p, v_acc, t_acc

    v0 = jnp.zeros((n, b), dtype)
    t0 = jnp.zeros((b, b), dtype)
    _, v, t = jax.lax.fori_loop(0, b, col_step, (panel, v0, t0))
    return v, t


def _band_panel_update(tr, v, t):
    """Symmetric compact-WY rank-``2b`` similarity update
    ``A <- A - W V^T - V W^T`` of the (trailing) block `tr`."""
    y = jnp.matmul(tr, jnp.matmul(v, t, precision="highest"),
                   precision="highest")           # (t, b)
    s = jnp.matmul(t.T, jnp.matmul(v.T, y, precision="highest"),
                   precision="highest")           # (b, b)
    w = y - 0.5 * jnp.matmul(v, s, precision="highest")
    # One (t, 2b) @ (2b, t) matmul instead of two rank-b updates —
    # both pad to the 128-wide MXU anyway, so this halves the
    # update's matmul passes
    wv = jnp.concatenate([w, v], axis=1)
    vw = jnp.concatenate([v, w], axis=1)
    return tr - jnp.matmul(wv, vw.T, precision="highest")


def _compound_panel_group(tr, first_col, b, g, t_rows):
    """Delayed-update SBR group: run `g` consecutive ``b``-column
    panels against the group-start matrix `tr`, each panel's columns
    and ``W`` corrected by the group's accumulated ``(V, W)`` (skinny
    matmuls), then apply ONE compound rank-``2 b g`` trailing update —
    inner contraction dimension ``2 b g`` (128 at b=8, g=8) instead of
    ``2 b`` (16), which is what the MXU needs on the dominant update.
    Same Householder transforms as the eager per-panel form; only the
    f32 summation order differs.

    Returns ``(tr_updated, [(v, t), ...])`` — the per-panel compact-WY
    reflectors, for callers that record them (the back-transform
    variant)."""
    hp = "highest"
    vs, ws, vts = [], [], []
    for t_idx in range(g):
        cc = first_col + t_idx * b
        panel = jax.lax.dynamic_slice(tr, (0, cc), (t_rows, b))
        if vs:
            vv = jnp.concatenate(vs, axis=1)
            ww = jnp.concatenate(ws, axis=1)
            vc = jax.lax.dynamic_slice(vv, (cc, 0), (b, vv.shape[1]))
            wc = jax.lax.dynamic_slice(ww, (cc, 0), (b, ww.shape[1]))
            panel = (panel - jnp.matmul(ww, vc.T, precision=hp)
                     - jnp.matmul(vv, wc.T, precision=hp))
        v, tmat = _panel_qr(panel, cc + b, b)
        vt = jnp.matmul(v, tmat, precision=hp)
        y = jnp.matmul(tr, vt, precision=hp)
        if vs:
            y = (y
                 - jnp.matmul(ww, jnp.matmul(vv.T, vt, precision=hp),
                              precision=hp)
                 - jnp.matmul(vv, jnp.matmul(ww.T, vt, precision=hp),
                              precision=hp))
        s = jnp.matmul(tmat.T, jnp.matmul(v.T, y, precision=hp),
                       precision=hp)
        w = y - 0.5 * jnp.matmul(v, s, precision=hp)
        vs.append(v)
        ws.append(w)
        vts.append((v, tmat))
    wv = jnp.concatenate(ws + vs, axis=1)
    vw = jnp.concatenate(vs + ws, axis=1)
    return tr - jnp.matmul(wv, vw.T, precision=hp), vts


def _resolve_bucket(bucket, n):
    """~8 lane-aligned trailing-sweep buckets (compile-bounded at any
    n); ``None``/``0`` disables the bucketing (one full-size sweep)."""
    if bucket == "auto":
        return max(128, -(-((n + 7) // 8) // 128) * 128)
    if bucket is None or bucket <= 0:
        return n
    return int(bucket)


def band_reduce(matrix, bandwidth, bucket="auto", group=8):
    """
    Reduce a symmetric matrix to band form (semi-bandwidth `bandwidth`)
    by blocked two-sided Householder transforms (eigenvalue-preserving).

    Per panel of `bandwidth` columns: one self-contained QR of the
    below-band block, then a symmetric rank-``2b`` update
    ``A <- A - W V^T - V W^T`` — the full -> band stage of successive
    band reduction (SBR).

    The sweep is **bucketed on the trailing submatrix**: the panel at
    column ``c`` only touches rows/cols ``>= c`` (its reflectors vanish
    above row ``c + b`` and ``W = A (V T)`` vanishes on the already
    band-reduced rows ``< c``, whose beyond-band columns are zero), so
    panels run on a static `bucket`-aligned trailing view that shrinks
    as leading rows finalize — ~3x fewer update flops than full-size
    updates at large ``n/bucket``, identical result up to the O(eps)
    below-band residues the full-size form multiplies back in.
    ``bucket="auto"`` (default) caps the sweep at ~8 lane-aligned
    buckets so the unrolled loop count stays compile-friendly at any
    ``n``; ``bucket=None`` keeps the single full-size sweep.

    `group` panels share one **compound (delayed) trailing update**:
    each panel in the group reads its columns and forms its ``W``
    against the group-start matrix plus skinny corrections from the
    group's accumulated ``(V, W)`` (classic delayed-update SBR), and
    the trailing matrix is touched ONCE per group by a rank-``2 b
    group`` update — inner contraction dimension ``2 * b * group``
    (128 at the b=8 default) instead of ``2 b`` (16), which is what
    the MXU needs to run the dominant update at full tilt (measured
    ~2.4x on the (128, 900) reduce stage).  Same transforms, f32
    summation order differences only; ``group=1`` recovers the
    eager form.

    Returns
    -------
    diags : ndarray, shape=(bandwidth + 1, n)
        Band diagonals: ``diags[d, i] = A_band[i, i + d]``
        (zero-padded at the tail).
    """
    a = jnp.asarray(matrix)
    n = a.shape[-1]
    b = int(bandwidth)
    if b < 1:
        raise ValueError("bandwidth must be >= 1")
    bucket = _resolve_bucket(bucket, n)
    g = max(1, int(group))
    n_panels = max(0, -(-(n - b - 1) // b))  # panels with rows below band

    parts = [[] for _ in range(b + 1)]
    trail = a
    r0 = 0  # rows/cols above r0 are finalized and sliced off
    k = 0
    while k < n_panels:
        k_end = min(n_panels, -(-(r0 + bucket) // b))
        t_rows = n - r0

        def panel_step(kk, tr, r0=r0, t_rows=t_rows):
            cc = kk * b - r0
            panel = jax.lax.dynamic_slice(tr, (0, cc), (t_rows, b))
            v, t = _panel_qr(panel, cc + b, b)
            return _band_panel_update(tr, v, t)

        def group_step(gi, tr, k0=k, r0=r0, t_rows=t_rows):
            first_col = (k0 + gi * g) * b - r0
            tr, _ = _compound_panel_group(tr, first_col, b, g, t_rows)
            return tr

        n_groups = (k_end - k) // g if g > 1 else 0
        if n_groups:
            trail = jax.lax.fori_loop(0, n_groups, group_step, trail)
            k += n_groups * g
        if k < k_end:
            trail = jax.lax.fori_loop(k, k_end, panel_step, trail)
        k = k_end
        if k < n_panels:
            # rows [r0, r0 + bucket) saw their last panel: extract
            # their band and shrink the working view
            for d in range(b + 1):
                parts[d].append(
                    jnp.diagonal(trail[:bucket, : bucket + b], offset=d))
            trail = trail[bucket:, bucket:]
            r0 += bucket

    for d in range(b + 1):
        parts[d].append(
            jnp.concatenate([jnp.diagonal(trail, offset=d),
                             jnp.zeros(d, a.dtype)]))
    diags = jnp.stack([
        p[0] if len(p) == 1 else jnp.concatenate(p) for p in parts
    ])
    return diags


def _gershgorin_bounds(diags):
    """Per-batch Gershgorin interval (lo, hi) of band matrices given as
    ``(batch, w, n)`` diagonals."""
    n_batch, w, n = diags.shape
    dtype = diags.dtype
    radius = jnp.zeros((n_batch, n), dtype)
    for d in range(1, w):
        off = jnp.abs(diags[:, d, : n - d])
        radius = radius.at[:, : n - d].add(off)
        radius = radius.at[:, d:].add(off)
    lo = jnp.min(diags[:, 0] - radius, axis=1)
    hi = jnp.max(diags[:, 0] + radius, axis=1)
    return lo, hi


def band_reduce_with_reflectors(matrix, bandwidth, bucket="auto",
                                group=8):
    """
    :func:`band_reduce` variant that also returns the compact-WY panel
    reflectors, enabling the eigenvector back-transform.  Uses the same
    bucketed trailing-submatrix sweep (reflectors are stored at full
    height, zero above the trailing view) and the same compound
    `group`-panel delayed trailing updates.

    Returns
    -------
    diags : ndarray, shape=(bandwidth + 1, n)
    v_all : ndarray, shape=(n_panels, n, bandwidth)
        Panel Householder vectors (``Q_k = I - V_k T_k V_k^T``).
    t_all : ndarray, shape=(n_panels, bandwidth, bandwidth)
    """
    a = jnp.asarray(matrix)
    n = a.shape[-1]
    b = int(bandwidth)
    if b < 1:
        raise ValueError("bandwidth must be >= 1")
    bucket = _resolve_bucket(bucket, n)
    g = max(1, int(group))
    n_panels = max(0, -(-(n - b - 1) // b))
    dtype = a.dtype

    v_all = jnp.zeros((max(n_panels, 1), n, b), dtype)
    t_all = jnp.zeros((max(n_panels, 1), b, b), dtype)

    parts = [[] for _ in range(b + 1)]
    trail = a
    r0 = 0
    k = 0
    while k < n_panels:
        k_end = min(n_panels, -(-(r0 + bucket) // b))
        t_rows = n - r0

        def panel_step(kk, carry, r0=r0, t_rows=t_rows):
            tr, v_all, t_all = carry
            cc = kk * b - r0
            panel = jax.lax.dynamic_slice(tr, (0, cc), (t_rows, b))
            v, t = _panel_qr(panel, cc + b, b)
            tr = _band_panel_update(tr, v, t)
            v_all = jax.lax.dynamic_update_slice(v_all, v[None],
                                                 (kk, r0, 0))
            t_all = jax.lax.dynamic_update_slice(t_all, t[None],
                                                 (kk, 0, 0))
            return tr, v_all, t_all

        def group_step(gi, carry, k0=k, r0=r0, t_rows=t_rows):
            tr, v_all, t_all = carry
            k_first = k0 + gi * g
            tr, vts = _compound_panel_group(
                tr, k_first * b - r0, b, g, t_rows)
            for t_idx, (v, tmat) in enumerate(vts):
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v[None], (k_first + t_idx, r0, 0))
                t_all = jax.lax.dynamic_update_slice(
                    t_all, tmat[None], (k_first + t_idx, 0, 0))
            return tr, v_all, t_all

        n_groups = (k_end - k) // g if g > 1 else 0
        if n_groups:
            trail, v_all, t_all = jax.lax.fori_loop(
                0, n_groups, group_step, (trail, v_all, t_all))
            k += n_groups * g
        if k < k_end:
            trail, v_all, t_all = jax.lax.fori_loop(
                k, k_end, panel_step, (trail, v_all, t_all))
        k = k_end
        if k < n_panels:
            for d in range(b + 1):
                parts[d].append(
                    jnp.diagonal(trail[:bucket, : bucket + b], offset=d))
            trail = trail[bucket:, bucket:]
            r0 += bucket

    for d in range(b + 1):
        parts[d].append(
            jnp.concatenate([jnp.diagonal(trail, offset=d),
                             jnp.zeros(d, dtype)]))
    diags = jnp.stack([
        p[0] if len(p) == 1 else jnp.concatenate(p) for p in parts
    ])
    return diags, v_all, t_all


def back_transform(v_all, t_all, u):
    """
    Map band-space vectors to original-space: ``u <- Q_1 ... Q_L u``
    with ``Q_k = I - V_k T_k V_k^T`` (reflectors from
    :func:`band_reduce_with_reflectors`), applied last panel first.
    `u` is ``(n, k)`` columns.
    """
    n_panels = v_all.shape[0]

    def step(i, u):
        k = n_panels - 1 - i
        v = v_all[k]
        t = t_all[k]
        return u - jnp.matmul(
            v, jnp.matmul(t, jnp.matmul(v.T, u, precision="highest"),
                          precision="highest"),
            precision="highest")

    return jax.lax.fori_loop(0, n_panels, step, u)


def banded_eigenvalues(diags, n_iter=40):
    """
    All eigenvalues of a symmetric band matrix (ascending) by parallel
    bisection on the banded LDL^t inertia count.

    Parameters
    ----------
    diags : ndarray, shape=(b + 1, n) or (batch, b + 1, n)
        Band diagonals as returned by :func:`band_reduce`; the batch
        dimension is vectorized *inside* the count scan (together with
        the ``n`` shifts) rather than via ``vmap``, so the tiny
        ``(w, w)`` window dims stay leading and the large batch x shift
        plane occupies the TPU vector lanes.
    n_iter : int
        Bisection iterations (interval halvings of the Gershgorin
        bound); 40 reaches float32 resolution.
    """
    diags = jnp.asarray(diags)
    squeeze = diags.ndim == 2
    if squeeze:
        diags = diags[None]
    n_batch, w, n = diags.shape
    b = w - 1
    dtype = diags.dtype

    lo0, hi0 = _gershgorin_bounds(diags)  # (batch,) each
    feed = _band_feed(diags)

    targets = jnp.arange(n, dtype=jnp.int32)[None, :]
    lo = jnp.broadcast_to(lo0[:, None], (n_batch, n))
    hi = jnp.broadcast_to(hi0[:, None], (n_batch, n))

    def bisect(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        counts = _banded_sturm_counts(feed, mid)
        go_up = counts <= targets
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, bisect, (lo, hi))
    out = 0.5 * (lo + hi)
    return out[0] if squeeze else out


def _banded_sturm_counts(feed, shifts):
    """
    Eigenvalue counts strictly below each shift for symmetric band
    matrices, via the LDL^t inertia recurrence on a trailing
    ``(w, w)`` Schur-complement window, vectorized over batch x shifts.

    The window before body step ``i`` holds ``S[i+p, i+q] - shift *
    (p == q)`` for ``p, q < w`` (S = running Schur complement); each
    step counts pivot ``S[i, i]``, eliminates it, shifts the window
    up-left and appends band column ``i + w``.  Seeding appends columns
    ``0..w-1``; the pad columns in `feed` flush the final pivots
    through — the scan ends after exactly ``n`` eliminations, so pads
    are never counted.

    Parameters
    ----------
    feed : ndarray, shape=(n + w, w, batch)
    shifts : ndarray, shape=(batch, n_shifts)

    Returns
    -------
    counts : ndarray, shape=(batch, n_shifts), int32
    """
    w = feed.shape[1]
    n_batch, n_shifts = shifts.shape
    dtype = feed.dtype
    tiny = jnp.asarray(1e-30, dtype)

    def append(win, col):
        # win: (w, w, batch, shifts); col: (w, batch)
        entry = jnp.broadcast_to(
            col[:, :, None], (w, n_batch, n_shifts)
        )
        entry = entry.at[w - 1].add(-shifts)
        new = jnp.zeros_like(win)
        new = new.at[: w - 1, : w - 1].set(win[1:, 1:])
        new = new.at[: w - 1, w - 1].set(entry[: w - 1])
        new = new.at[w - 1, : w - 1].set(entry[: w - 1])
        new = new.at[w - 1, w - 1].set(entry[w - 1])
        return new

    win0 = jnp.zeros((w, w, n_batch, n_shifts), dtype)
    for j in range(w):  # static warmup: w appends, no eliminations
        win0 = append(win0, feed[j])

    def body(carry, col):
        win, count = carry
        pivot = win[0, 0]  # (batch, shifts)
        count = count + (pivot < 0).astype(jnp.int32)
        safe = jnp.where(jnp.abs(pivot) < tiny,
                         jnp.where(pivot < 0, -tiny, tiny), pivot)
        row0 = win[0, 1:]  # (w - 1, batch, shifts)
        l_row = row0 / safe
        sub = win[1:, 1:] - l_row[:, None] * row0[None, :]
        # Stage the Schur complement at rows/cols 1..w so append's
        # up-left shift lands it at 0..w-1 with the new column added
        staged = win.at[1:, 1:].set(sub)
        return (append(staged, col), count), None

    count0 = jnp.zeros((n_batch, n_shifts), jnp.int32)
    (_, counts), _ = jax.lax.scan(body, (win0, count0), feed[w:])
    return counts


# ---------------------------------------------------------------------------
# Band eigenvectors: factored inverse iteration, vectorized over shifts
# ---------------------------------------------------------------------------


def _band_feed(diags):
    """Column-major band feed (see :func:`banded_eigenvalues`):
    ``feed[i, p, batch] = A[i - b + p, i]`` plus ``w`` zero pad
    columns.  `diags` is ``(batch, w, n)``."""
    n_batch, w, n = diags.shape
    b = w - 1
    dtype = diags.dtype
    cols = []
    for p in range(w):
        d = b - p
        vals = diags[:, d]
        cols.append(jnp.concatenate(
            [jnp.zeros((n_batch, d), dtype), vals[:, : n - d]], axis=1
        ))
    new_cols = jnp.stack(cols, axis=0)  # (w, batch, n)
    return jnp.concatenate(
        [jnp.transpose(new_cols, (2, 0, 1)),
         jnp.zeros((w, w, n_batch), dtype)],
        axis=0,
    )  # (n + w, w, batch)


def _banded_factorize(feed, shifts, pivot_floor=None):
    """
    LDL^t factors of ``B - s I`` for a plane of shifts simultaneously
    (same trailing-window elimination as :func:`_banded_sturm_counts`,
    but storing the factors).

    Parameters
    ----------
    feed : ndarray, shape=(n + w, w, batch)
    shifts : ndarray, shape=(batch, S)
    pivot_floor : scalar, optional
        Magnitude floor for the pivots.  Inverse-iteration callers must
        pass ``~eps * ||B||``: with shifts at eigenvalues, pivots cross
        zero, and dividing by an unclamped near-zero pivot overflows the
        ``L`` entries (f32) and garbles the solve.  The Sturm counter
        only needs signs, so its floor can be denormal-small.

    Returns
    -------
    d : ndarray, shape=(n, batch, S)
        Pivots.
    l : ndarray, shape=(n, w - 1, batch, S)
        ``l[j, p] = L[j + 1 + p, j]`` (unit lower triangular, band).
    """
    w = feed.shape[1]
    n_batch, n_shifts = shifts.shape
    dtype = feed.dtype
    tiny = (jnp.asarray(1e-30, dtype) if pivot_floor is None
            else jnp.asarray(pivot_floor, dtype))

    def append(win, col):
        entry = jnp.broadcast_to(
            col[:, :, None], (w, n_batch, n_shifts))
        entry = entry.at[w - 1].add(-shifts)
        new = jnp.zeros_like(win)
        new = new.at[: w - 1, : w - 1].set(win[1:, 1:])
        new = new.at[: w - 1, w - 1].set(entry[: w - 1])
        new = new.at[w - 1, : w - 1].set(entry[: w - 1])
        new = new.at[w - 1, w - 1].set(entry[w - 1])
        return new

    win0 = jnp.zeros((w, w, n_batch, n_shifts), dtype)
    for j in range(w):
        win0 = append(win0, feed[j])

    def body(win, col):
        pivot = win[0, 0]
        safe = jnp.where(jnp.abs(pivot) < tiny,
                         jnp.where(pivot < 0, -tiny, tiny), pivot)
        row0 = win[0, 1:]                  # (w - 1, batch, S)
        l_row = row0 / safe
        sub = win[1:, 1:] - l_row[:, None] * row0[None, :]
        staged = win.at[1:, 1:].set(sub)
        return append(staged, col), (safe, l_row)

    _, (d, l) = jax.lax.scan(body, win0, feed[w:])
    return d, l


def _banded_solve(d, l, rhs):
    """Solve ``(L D L^t) x = rhs`` with factors from
    :func:`_banded_factorize`; everything vectorized over the trailing
    (batch, S) plane.  `rhs` is ``(n, batch, S)``-broadcastable."""
    n, bw = l.shape[0], l.shape[1]
    plane = d.shape[1:]
    dtype = d.dtype
    rhs = jnp.broadcast_to(rhs, (n,) + plane)

    # forward: z_j = rhs_j - sum_p L[j, j-1-p] z_{j-1-p}, carried as a
    # sliding accumulator of future contributions
    def fwd(acc, inp):
        rhs_j, l_j = inp
        z_j = rhs_j - acc[0]
        acc = jnp.concatenate([acc[1:], jnp.zeros_like(acc[:1])], axis=0)
        acc = acc + l_j * z_j[None]
        return acc, z_j

    acc0 = jnp.zeros((bw,) + plane, dtype)
    _, z = jax.lax.scan(fwd, acc0, (rhs, l))

    y = z / d

    # backward: x_j = y_j - sum_p L[j+1+p, j] x_{j+1+p}
    def bwd(xwin, inp):
        y_j, l_j = inp
        x_j = y_j - jnp.sum(l_j * xwin, axis=0)
        xwin = jnp.concatenate([x_j[None], xwin[:-1]], axis=0)
        return xwin, x_j

    _, x = jax.lax.scan(bwd, acc0, (y, l), reverse=True)
    return x


def _separate_shifts(eigvals, sep):
    """Strictly increasing inverse-iteration shifts:
    ``s_i = max(lam_i, s_{i-1} + sep)`` vectorized as a running max."""
    idx = jnp.arange(eigvals.shape[-1], dtype=eigvals.dtype)
    adj = eigvals - sep * idx
    run = jax.lax.associative_scan(jnp.maximum, adj, axis=-1)
    return run + sep * idx


def _eigvec_kernel(w, n, n_solves, seed, *refs):
    """One grid cell: 128 shifts (lanes) of one batch element — LDL^t
    factorization of ``B - s I`` with the factors resident in VMEM,
    then `n_solves` inverse-iteration sweeps (forward/diagonal/backward
    substitution), normalized via a running sum of squares.  The XLA
    scan lowering pays loop overhead + HBM round-trips on each of the
    ~5n steps; in-kernel they are pure VPU work."""
    feed_ref, shifts_ref, idx_ref, pf_ref = refs[:4]
    out_ref = refs[4]
    l_ref, d_ref, x_ref = refs[5:8]

    j = pl.program_id(1)
    lanes = shifts_ref.shape[-1]
    dtype = d_ref.dtype
    shifts = shifts_ref[0, pl.ds(j, 1), :][0]         # (C,)
    pf = pf_ref[0, pl.ds(j, 1), :][0]                 # (C,) pivot floor
    # Derive the loop-carry zeros from loaded data: Mosaic cannot
    # relayout concrete vectors into replicated-constant carries
    fzero = (shifts * 0.0)[None, :]

    # ---- factorization: sliding (w, w) window over the band ----
    def append(win, col_vals, with_shift):
        new = [[win[p + 1][q + 1] if (p < w - 1 and q < w - 1)
                else None for q in range(w)] for p in range(w)]
        for p in range(w - 1):
            new[p][w - 1] = col_vals[p]
            new[w - 1][p] = col_vals[p]
        last = col_vals[w - 1]
        if with_shift:
            last = last - shifts[None, :]
        new[w - 1][w - 1] = last
        return new

    def feed_col(i):
        # w band values of column i: feed layout stacks the w offsets
        # along the sublane axis at stride (n + w)
        return [feed_ref[0, pl.ds(p * (n + w) + i, 1), :]
                for p in range(w)]

    # Triangular window carry + one-sided Schur elimination (the
    # window is symmetric) — see the matching note in _bisect_kernel
    def _tri_flatten(win):
        return tuple(win[p][q] for p in range(w) for q in range(p + 1))

    def _tri_unflatten(flat):
        win = [[None] * w for _ in range(w)]
        i = 0
        for p in range(w):
            for q in range(p + 1):
                win[p][q] = flat[i]
                win[q][p] = flat[i]
                i += 1
        return win

    win = [[fzero for _ in range(w)] for _ in range(w)]
    for jj in range(w):  # NOTE: must not shadow j = program_id(1)
        win = append(win, feed_col(jj), with_shift=True)

    def factor_body(i, carry):
        win = _tri_unflatten(carry)
        pivot = win[0][0]
        safe = jnp.where(jnp.abs(pivot) < pf[None, :],
                         jnp.where(pivot < 0, -pf[None, :], pf[None, :]),
                         pivot)
        d_ref[pl.ds(i, 1), :] = safe
        inv_p = 1.0 / safe
        staged = [row[:] for row in win]
        for p in range(1, w):
            lp = win[0][p] * inv_p
            l_ref[pl.ds((p - 1) * n + i, 1), :] = lp
            for q in range(p, w):
                val = win[p][q] - lp * win[0][q]
                staged[p][q] = val
                staged[q][p] = val
        new = append(staged, feed_col(i + w), with_shift=True)
        return _tri_flatten(new)

    jax.lax.fori_loop(0, n, factor_body, _tri_flatten(win))

    # ---- inverse iteration: distinct pseudo-random start per shift ----
    idx = idx_ref[0, pl.ds(j, 1), :][0]               # (C,) global index
    inv_norm = fzero + 1.0

    for it in range(n_solves):
        # forward: z_i = rhs_i - acc[0]; push l_i * z_i
        def fwd_body(i, carry):
            acc = list(carry[:-1])
            sumsq = carry[-1]
            if it == 0:
                rhs_i = jnp.cos(0.7 * i.astype(dtype) + seed
                                + 2.347 * idx)[None, :] + 1e-3
            else:
                rhs_i = x_ref[pl.ds(i, 1), :] * inv_norm
            z_i = rhs_i - acc[0]
            acc = acc[1:] + [fzero]
            for p in range(w - 1):
                acc[p] = acc[p] + l_ref[pl.ds(p * n + i, 1), :] * z_i
            x_ref[pl.ds(i, 1), :] = z_i
            return tuple(acc) + (sumsq,)

        acc0 = tuple(fzero for _ in range(w - 1)) + (fzero,)
        jax.lax.fori_loop(0, n, fwd_body, acc0)

        # backward: x_i = z_i / d_i - sum_p l[i, p] x_{i+1+p}
        def bwd_body(step, carry):
            xwin = list(carry[:-1])
            sumsq = carry[-1]
            i = n - 1 - step
            y_i = x_ref[pl.ds(i, 1), :] / d_ref[pl.ds(i, 1), :]
            s = fzero
            for p in range(w - 1):
                s = s + l_ref[pl.ds(p * n + i, 1), :] * xwin[p]
            x_i = y_i - s
            x_ref[pl.ds(i, 1), :] = x_i
            xwin = [x_i] + xwin[:-1]
            return tuple(xwin) + (sumsq + x_i * x_i,)

        xwin0 = tuple(fzero for _ in range(w - 1)) + (fzero,)
        out = jax.lax.fori_loop(0, n, bwd_body, xwin0)
        sumsq = out[-1]
        inv_norm = 1.0 / jnp.sqrt(jnp.maximum(sumsq, 1e-30))

    # ---- normalized write-out ----
    def write_body(i, _):
        out_ref[0, pl.ds(i, 1), :] = x_ref[pl.ds(i, 1), :] * inv_norm
        return 0

    jax.lax.fori_loop(0, n, write_body, 0)


def _banded_eigenvectors_pallas(diags, shifts, pivot_floor, n_solves,
                                seed, interpret):
    """Pallas path of :func:`banded_eigenvectors`: grid over
    (batch, 128-shift chunks), factors + iterates resident in VMEM.
    Returns un-orthogonalized unit vectors ``(batch, n, n_ev_pad)``."""
    n_batch, w, n = diags.shape
    dtype = diags.dtype
    lanes = 128
    n_ev = shifts.shape[-1]
    from .pallas_kernels import _round_up
    n_pad_ev = _round_up(n_ev, lanes)
    shifts_p = jnp.concatenate(
        [shifts, jnp.broadcast_to(shifts[:, -1:] + 1.0,
                                  (n_batch, n_pad_ev - n_ev))], axis=1)
    n_chunks = n_pad_ev // lanes
    shifts_c = shifts_p.reshape(n_batch, n_chunks, lanes)
    idx_c = jnp.broadcast_to(
        jnp.arange(n_pad_ev, dtype=dtype).reshape(1, n_chunks, lanes),
        (n_batch, n_chunks, lanes))
    pf_c = jnp.broadcast_to(pivot_floor[:, None, None],
                            (n_batch, n_chunks, lanes))

    # Feed: the w band offsets of column i stacked along sublanes at
    # stride (n + w), replicated across the 128 lanes
    cols = []
    b = w - 1
    for p in range(w):
        d = b - p
        vals = diags[:, d]
        cols.append(jnp.concatenate(
            [jnp.zeros((n_batch, d), dtype), vals[:, : n - d],
             jnp.zeros((n_batch, w), dtype)], axis=1))  # (batch, n+w)
    feed = jnp.concatenate(cols, axis=1)                # (batch, w*(n+w))
    feed = jnp.broadcast_to(feed[:, :, None],
                            (n_batch, w * (n + w), lanes))

    kernel = functools.partial(_eigvec_kernel, w, n, n_solves,
                               float(seed))
    out = pl.pallas_call(
        kernel,
        grid=(n_batch, n_chunks),
        in_specs=[
            pl.BlockSpec((1, w * (n + w), lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # Mosaic needs the last two block dims divisible by (8, 128)
            # or equal to the array's — ship all chunks of the small
            # lane vectors and select row j in-kernel
            pl.BlockSpec((1, n_chunks, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, lanes), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_batch, n, n_pad_ev), dtype),
        scratch_shapes=[
            pltpu.VMEM(((w - 1) * n, lanes), dtype),
            pltpu.VMEM((n, lanes), dtype),
            pltpu.VMEM((n, lanes), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(feed, shifts_c, idx_c, pf_c)
    return out


def banded_eigenvectors(diags, eigvals, n_solves=2, shift_chunk=256,
                        window=8, seed=1, use_pallas=None):
    """
    Eigenvectors of a symmetric band matrix at the given eigenvalues,
    by factored inverse iteration (shifts separated xSTEIN-style so
    clustered eigenvalues get distinct factorizations) followed by a
    windowed Gram-Schmidt sweep in eigenvalue order.

    Parameters
    ----------
    diags : ndarray, shape=(b + 1, n) or (batch, b + 1, n)
    eigvals : ndarray, shape=(n_ev,) or (batch, n_ev), ascending
    n_solves : int
        Inverse-iteration steps per shift (factors reused; 2 reaches
        working precision for separated eigenvalues).
    shift_chunk : int
        Shifts factored simultaneously — bounds the live factor storage
        at ``n * b * batch * shift_chunk`` floats.
    window : int
        Gram-Schmidt window: each vector is orthogonalized against this
        many predecessors (covers clusters; distant pairs are already
        orthogonal).

    Returns
    -------
    u : ndarray, shape=([batch,] n, n_ev)
        Eigenvector columns (unit norm), ordered as `eigvals`.
    """
    diags = jnp.asarray(diags)
    squeeze = diags.ndim == 2
    if squeeze:
        diags = diags[None]
        eigvals = jnp.asarray(eigvals)[None]
    eigvals = jnp.asarray(eigvals, diags.dtype)
    n_batch, w, n = diags.shape
    n_ev = eigvals.shape[-1]
    dtype = diags.dtype
    eps = jnp.finfo(dtype).eps

    # Gershgorin span sets the separation scale
    lo, hi = _gershgorin_bounds(diags)
    span = hi - lo                                 # (batch,)
    sep = (span * (100.0 * eps))[:, None]
    shifts = _separate_shifts(eigvals, sep)

    if use_pallas is None:
        # Per grid cell the kernel keeps feed (w*(n+w) sublanes) plus
        # (w+1) n-row scratch buffers live at 128 lanes — stay inside
        # the ~16 MB VMEM with headroom, else fall back to the chunked
        # XLA path (which bounds memory via shift_chunk)
        vmem_est = (2 * w + 2) * n * 128 * 4
        use_pallas = (jax.default_backend() == "tpu"
                      and vmem_est < 11 * 2**20)
    if use_pallas:
        x = _banded_eigenvectors_pallas(
            diags, shifts, span * eps, n_solves, seed,
            interpret=jax.default_backend() != "tpu")[:, :, :n_ev]
        u = _windowed_mgs(x, window)
        return u[0] if squeeze else u

    feed = _band_feed(diags)

    chunk = max(1, min(int(shift_chunk), n_ev))
    n_pad = -(-n_ev // chunk) * chunk
    shifts_p = jnp.concatenate(
        [shifts, jnp.broadcast_to(shifts[:, -1:],
                                  (n_batch, n_pad - n_ev))], axis=1)
    shifts_c = shifts_p.reshape(n_batch, n_pad // chunk, chunk)
    idx_c = jnp.arange(n_pad, dtype=dtype).reshape(n_pad // chunk, chunk)

    pivot_floor = jnp.max(span) * eps

    # f32 no-pivot LDL element growth can overflow interior-shift
    # solves into inf/NaN; at mid sizes the polish absorbs the damage,
    # but at n >= ~4k whole columns go non-finite (measured at 5,328:
    # NaN output on a real Hessian).  The rescue pass re-solves with
    # jittered shifts and keeps the finite result — doubles this
    # stage's cost, so it is gated to large n.
    rescue = n >= 2048

    def solve_chunk(inp):
        shift_plane, idx = inp  # (batch, chunk), (chunk,)
        # A distinct pseudo-random start per shift: within an exactly
        # degenerate cluster the resolvent amplifies the whole
        # eigenspace identically, so a shared start would collapse all
        # cluster vectors onto one direction and Gram-Schmidt would be
        # left with pure noise.
        row = jnp.arange(n, dtype=dtype)[:, None, None]
        x0 = jnp.cos(row * 0.7 + seed + 2.347 * idx[None, None, :]) + 1e-3
        x0 = jnp.broadcast_to(x0, (n, n_batch, chunk))
        x0 = x0 / jnp.linalg.norm(x0, axis=0, keepdims=True)

        def run(shift_p):
            d, l = _banded_factorize(feed, shift_p,
                                     pivot_floor=pivot_floor)
            x = x0
            for _ in range(n_solves):
                x = _banded_solve(d, l, x)
                x = x / jnp.maximum(
                    jnp.linalg.norm(x, axis=0, keepdims=True), 1e-30)
            return x

        x = run(shift_plane)
        if rescue:
            bad = ~jnp.all(jnp.isfinite(x), axis=0)      # (batch, chunk)
            # Small jitter: element growth is hypersensitive to the
            # shift (near-zero pivot cascades), so a few separations
            # escape the pocket while staying closest to the same
            # eigenvalue
            x2 = run(shift_plane + 5.0 * sep)
            x = jnp.where(bad[None], x2, x)
            still_bad = ~jnp.all(jnp.isfinite(x), axis=0)
            x = jnp.where(still_bad[None], x0, x)
        return x  # (n, batch, chunk)

    x = jax.lax.map(solve_chunk,
                    (jnp.transpose(shifts_c, (1, 0, 2)), idx_c))
    # (n_chunks, n, batch, chunk) -> (batch, n, n_pad)
    x = jnp.transpose(x, (2, 1, 0, 3)).reshape(n_batch, n, n_pad)
    x = x[:, :, :n_ev]

    u = _windowed_mgs(x, window)
    return u[0] if squeeze else u


def _windowed_mgs(x, window):
    """Windowed Gram-Schmidt in eigenvalue order (scan over columns);
    `x` is ``(batch, n, n_ev)``."""
    n_batch, n, n_ev = x.shape
    dtype = x.dtype
    cw = max(1, min(int(window), n_ev))

    def mgs(win, x_i):
        # win: (cw, batch, n); x_i: (batch, n).  Two projection passes
        # ("twice is enough"): after the first subtraction the
        # remainder of a near-parallel cluster vector is small, and a
        # single pass would leave O(eps / |remainder|) overlap after
        # normalization.
        for _ in range(2):
            dots = jnp.sum(win * x_i[None], axis=-1)     # (cw, batch)
            x_i = x_i - jnp.sum(win * dots[:, :, None], axis=0)
        x_i = x_i / jnp.maximum(
            jnp.linalg.norm(x_i, axis=-1, keepdims=True), 1e-30)
        win = jnp.concatenate([win[1:], x_i[None]], axis=0)
        return win, x_i

    cols = jnp.transpose(x, (2, 0, 1))                   # (n_ev, batch, n)
    win0 = jnp.zeros((cw, n_batch, n), dtype)
    _, cols = jax.lax.scan(mgs, win0, cols)
    return jnp.transpose(cols, (1, 2, 0))                # (batch, n, n_ev)


# ---------------------------------------------------------------------------
# Pallas bisection kernel: the entire bisection (all iterations x all
# columns) runs inside one kernel with the window state resident in
# VMEM/registers — the XLA lowering pays an HBM round-trip plus loop
# overhead on every one of the n_iter * n scan steps, which dominates
# its runtime (measured ~0.9 s of a 1.4 s total at (64, 900, 900) on
# v5e); in-kernel the stage is pure VPU work.
# ---------------------------------------------------------------------------


def _bisect_kernel(w, n, n_iter, unroll, *refs):
    feed_refs = refs[:w]                      # each (n + w, B)
    lo_ref, hi_ref, targets_ref = refs[w:w + 3]   # (B, S)
    out_ref = refs[w + 3]

    lo = lo_ref[...]
    hi = hi_ref[...]
    targets = targets_ref[...]
    b_dim, s_dim = lo.shape
    fzero = jnp.zeros((b_dim, s_dim), lo.dtype)
    tiny = jnp.asarray(1e-30, lo.dtype)

    def read_col(i, mid):
        """Band column `i` broadcast to (B, S); diagonal entry shifted
        by -mid."""
        vals = []
        for p in range(w):
            v = feed_refs[p][0, pl.ds(i, 1), :][0]
            vals.append(v[:, None] + fzero)
        vals[w - 1] = vals[w - 1] - mid
        return vals

    # The sliding window is symmetric at every step, so only its lower
    # triangle is carried (w(w+1)/2 slots instead of w^2: less VMEM,
    # less loop-carry copy traffic) and the Schur elimination computes
    # each mirrored pair once — XLA's CSE cannot unify the two
    # association orders ((w0p*inv)*w0q vs (w0q*inv)*w0p), so the
    # triangular form halves the per-column VPU work for real.
    def _tri_flatten(win):
        return tuple(win[p][q] for p in range(w) for q in range(p + 1))

    def _tri_unflatten(flat):
        win = [[None] * w for _ in range(w)]
        i = 0
        for p in range(w):
            for q in range(p + 1):
                win[p][q] = flat[i]
                win[q][p] = flat[i]
                i += 1
        return win

    def bisect_body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)

        # Window: win[p][q] = S[i+p, i+q] - mid*(p==q), symmetric
        win = [[fzero for _ in range(w)] for _ in range(w)]
        count = jnp.zeros((b_dim, s_dim), jnp.int32)

        def append(win, col):
            new = [[win[p + 1][q + 1] if (p < w - 1 and q < w - 1)
                    else None for q in range(w)] for p in range(w)]
            for p in range(w - 1):
                new[p][w - 1] = col[p]
                new[w - 1][p] = col[p]
            new[w - 1][w - 1] = col[w - 1]
            return new

        for j in range(w):  # warmup: w appends, no eliminations
            win = append(win, read_col(j, mid))

        def col_step(i, carry2):
            count = carry2[-1]
            win = _tri_unflatten(carry2[:-1])
            pivot = win[0][0]
            count = count + jnp.where(pivot < 0, 1, 0).astype(jnp.int32)
            safe = jnp.where(jnp.abs(pivot) < tiny,
                             jnp.where(pivot < 0, -tiny, tiny), pivot)
            inv_p = 1.0 / safe
            # Schur complement of the pivot, staged at rows/cols 1..w
            staged = [row[:] for row in win]
            for p in range(1, w):
                lp = win[0][p] * inv_p
                for q in range(p, w):
                    val = win[p][q] - lp * win[0][q]
                    staged[p][q] = val
                    staged[q][p] = val
            col = read_col(i + w, mid)
            new = append(staged, col)
            return _tri_flatten(new) + (count,)

        init = _tri_flatten(win) + (count,)
        if unroll <= 1:
            out = jax.lax.fori_loop(0, n, col_step, init)
        else:
            # Mosaic supports only full or no fori_loop unrolling, so
            # block the column loop by hand: fewer loop-carry
            # round-trips of the w(w+1)/2 window planes per column
            n_blocks = n // unroll

            def blk_body(k, carry2):
                i0 = k * unroll
                for t in range(unroll):
                    carry2 = col_step(i0 + t, carry2)
                return carry2

            out = jax.lax.fori_loop(0, n_blocks, blk_body, init)
            for t in range(n - n_blocks * unroll):  # static tail
                out = col_step(n_blocks * unroll + t, out)
        counts = out[-1]

        go_up = counts <= targets
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, bisect_body, (lo, hi))
    out_ref[...] = 0.5 * (lo + hi)


def banded_eigenvalues_pallas(diags, n_iter=40, interpret=None,
                              vmem_budget=8 * 2**20, unroll=16):
    """
    :func:`banded_eigenvalues` as a Pallas TPU kernel (window state in
    VMEM across all bisection iterations).  `diags` is ``(b + 1, n)``
    or ``(batch, b + 1, n)``.  The batch is processed in grid chunks
    sized so the ``(b+1)^2`` live ``(chunk, n)`` window vectors fit
    `vmem_budget` — large bandwidths trade chunk width for window size.

    `unroll` blocks the sequential column loop by hand (Mosaic has no
    partial ``fori_loop`` unrolling), cutting the loop-carry
    round-trips of the ``w(w+1)/2`` window planes per column.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    diags = jnp.asarray(diags)
    squeeze = diags.ndim == 2
    if squeeze:
        diags = diags[None]
    n_batch, w, n = diags.shape
    b = w - 1
    dtype = diags.dtype

    lo0, hi0 = _gershgorin_bounds(diags)
    lo = jnp.broadcast_to(lo0[:, None], (n_batch, n))
    hi = jnp.broadcast_to(hi0[:, None], (n_batch, n))
    targets = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (n_batch, n))

    # Batch chunking: (w(w+1)/2 + ~6) live (chunk, n) f32 window
    # vectors per cell (triangular carry — the window is symmetric)
    # plus the feed blocks (whose chunk dim pads to 128 lanes)
    feed_bytes = w * (n + w) * 128 * 4
    bytes_per_row = (w * (w + 1) // 2 + 6) * n * 4
    chunk = max(1, min(n_batch,
                       (vmem_budget - feed_bytes) // bytes_per_row))
    while n_batch % chunk:
        chunk -= 1
    n_chunks = n_batch // chunk

    # Chunk-major feed arrays (n_chunks, n + w, chunk):
    # feed_p[g, i, j] = A[i - b + p, i] of batch g*chunk + j
    feeds = []
    for p in range(w):
        d = b - p
        col = jnp.concatenate(
            [jnp.zeros((n_batch, d), dtype), diags[:, d, : n - d],
             jnp.zeros((n_batch, w), dtype)], axis=1)  # (batch, n + w)
        feeds.append(
            col.reshape(n_chunks, chunk, n + w).transpose(0, 2, 1)
        )

    kernel = functools.partial(_bisect_kernel, w, n, n_iter,
                               max(1, int(unroll)))
    feed_spec = pl.BlockSpec((1, n + w, chunk), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((chunk, n), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[feed_spec] * w + [row_spec] * 3,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_batch, n), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*feeds, lo, hi, targets)
    return out[0] if squeeze else out


@functools.partial(jax.jit,
                   static_argnames=("bandwidth", "n_iter", "use_pallas"))
def eigvalsh_banded(matrix, bandwidth=8, n_iter=40, use_pallas=None):
    """
    Eigenvalues (ascending) of symmetric `matrix` via the blocked
    two-stage solver: full -> band reduction (matmul-rich) + banded
    Sturm bisection.  Supports one leading batch dimension.

    On TPU the bisection stage runs as a single Pallas kernel by
    default (`use_pallas=None` auto-selects for ``bandwidth <= 8``;
    the kernel sizes its batch chunks to the VMEM budget) — the XLA
    lowering pays loop overhead + an HBM round-trip per scan step and
    is several times slower.
    """
    matrix = jnp.asarray(matrix)
    n = matrix.shape[-1]
    if n <= bandwidth + 1:
        return jnp.linalg.eigvalsh(matrix)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and bandwidth <= 8
    if matrix.ndim == 3:
        # vmap only the matmul-rich reduction; the bisection stage
        # vectorizes the batch internally (see banded_eigenvalues)
        diags = jax.vmap(lambda mm: band_reduce(mm, bandwidth))(matrix)
    else:
        diags = band_reduce(matrix, bandwidth)
    if use_pallas:
        return banded_eigenvalues_pallas(diags, n_iter=n_iter)
    return banded_eigenvalues(diags, n_iter=n_iter)


def _perturbative_polish(a, u, vals, min_gap):
    """First-order perturbative cleanup of an approximate eigenbasis:
    contamination of ``u_i`` by eigendirection ``j`` shows up in
    ``C = U^T (A U - U diag(vals))`` as ``C[j, i] ~ c_ji (l_j - l_i)``,
    so subtracting ``U @ (C / (l_j - l_i))`` removes it wherever the
    gap is resolvable (``> min_gap``) — two matmuls, quadratic
    contamination reduction.  Near-degenerate pairs are left to the
    windowed Rayleigh-Ritz."""
    hp = jax.lax.Precision.HIGHEST
    r = jnp.matmul(a, u, precision=hp) - u * vals[None, :]
    c = jnp.matmul(u.T, r, precision=hp)
    denom = vals[:, None] - vals[None, :]
    coef = jnp.where(jnp.abs(denom) > min_gap,
                     c / jnp.where(denom == 0, 1.0, denom), 0.0)
    # First-order validity guard: a correction of O(1) norm says the
    # column is mostly contamination — subtracting it leaves a
    # near-zero column whose normalization overflows (measured at
    # 5,328 dims: the fused double-polish program rounded such a
    # column's norm to 0 -> inf -> NaN while the unfused sequence
    # happened to keep a denormal).  Skip those columns (the windowed
    # Rayleigh-Ritz repairs them) and floor the norm.
    coef_norm = jnp.linalg.norm(coef, axis=0, keepdims=True)
    coef = coef * (coef_norm <= 0.5)
    u = u - jnp.matmul(u, coef, precision=hp)
    return u / jnp.maximum(
        jnp.linalg.norm(u, axis=0, keepdims=True),
        jnp.asarray(1e-30, u.dtype))


def _window_refine(a, u, vals, window):
    """Windowed Rayleigh-Ritz refinement of an approximate eigensystem:
    two offset passes of per-window orthonormalization + projection +
    small eigh, so every adjacent (near-degenerate) eigenpair is
    interior to some window.  Fixes the f32 inverse-iteration failure
    mode — vectors of eigenvalues closer than the band-reduction
    backward error (~30 eps ||A||) come out mixed — at the cost of two
    ``A @ U`` matmuls and batched ``(W, W)`` eighs."""
    n = a.shape[-1]
    w = min(window, n)

    def refine_block(ub):
        # ub: (nw, n, w) window columns -> orthonormalize + project +
        # diagonalize; returns rotated columns and their Ritz values
        q, _ = jnp.linalg.qr(ub)
        aq = jnp.einsum("ij,bjk->bik", a, q,
                        precision=jax.lax.Precision.HIGHEST)
        s = jnp.matmul(jnp.swapaxes(q, 1, 2), aq, precision="highest")
        theta, v = jnp.linalg.eigh((s + jnp.swapaxes(s, 1, 2)) / 2)
        return jnp.matmul(q, v, precision="highest"), theta

    n_main = (n // w) * w

    def one_pass(u, vals, offset):
        # Modular rotation: windows start at `offset`; the wrap window
        # pairs the spectrum's two ends, which is harmless (RR just
        # re-diagonalizes well-separated pairs), and the final argsort
        # restores global order.
        perm = (jnp.arange(n) + offset) % n
        inv = jnp.argsort(perm)
        u = u[:, perm]
        vals = vals[perm]
        ub = jnp.transpose(
            u[:, :n_main].reshape(n, n_main // w, w), (1, 0, 2))
        ub, theta = refine_block(ub)
        u = jnp.concatenate(
            [jnp.transpose(ub, (1, 0, 2)).reshape(n, n_main),
             u[:, n_main:]], axis=1)
        vals = jnp.concatenate([theta.reshape(n_main), vals[n_main:]])
        if n_main != n:
            # remainder: one window overlapping the previous tail
            tail, theta_t = refine_block(u[:, n - w:][None])
            u = jnp.concatenate([u[:, : n - w], tail[0]], axis=1)
            vals = jnp.concatenate([vals[: n - w], theta_t[0]])
        return u[:, inv], vals[inv]

    u, vals = one_pass(u, vals, 0)
    u, vals = one_pass(u, vals, w // 2)
    # restore ascending order (offset passes keep it only windowwise)
    order = jnp.argsort(vals)
    return u[:, order], vals[order]


@functools.partial(
    jax.jit,
    static_argnames=("bandwidth", "n_iter", "use_pallas", "n_solves",
                     "shift_chunk", "window"),
)
def eigh_banded(matrix, bandwidth=8, n_iter=40, use_pallas=None,
                n_solves=2, shift_chunk=256, window=8):
    """
    Full eigensystem (ascending values, **modes in rows**) via the
    blocked two-stage solver:

    1. full -> band reduction with stored compact-WY reflectors
       (:func:`band_reduce_with_reflectors` — matmul-rich);
    2. all eigenvalues by banded Sturm bisection (Pallas kernel on TPU);
    3. band-space eigenvectors by factored inverse iteration with
       separated shifts + windowed Gram-Schmidt
       (:func:`banded_eigenvectors`);
    4. back-transform through the panel reflectors
       (:func:`back_transform` — three matmuls per panel).

    No O(n^3) dense eigensolve anywhere — the only ``eigh`` calls are
    the tiny batched ``(W, W)`` window diagonalizations.  Accuracy is
    iterative-solver level: f32 residuals ~1e-5 relative for
    well-separated spectra; tightly clustered eigenvalues rely on the
    Gram-Schmidt window (raise `window` for pathological spectra), so
    verify residuals when in doubt.  Supports one leading batch dim.
    """
    matrix = jnp.asarray(matrix)
    squeeze = matrix.ndim == 2
    if squeeze:
        matrix = matrix[None]
    n = matrix.shape[-1]
    if n <= bandwidth + 1:
        vals, vecs = jnp.linalg.eigh(matrix)
        vals_ = vals[0] if squeeze else vals
        vecs_ = (vecs[0].T if squeeze
                 else jnp.swapaxes(vecs, -1, -2))
        return vals_, vecs_
    vec_pallas = use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and bandwidth <= 8

    diags, v_all, t_all = jax.vmap(
        lambda mm: band_reduce_with_reflectors(mm, bandwidth))(matrix)
    if use_pallas:
        vals = banded_eigenvalues_pallas(diags, n_iter=n_iter)
    else:
        vals = banded_eigenvalues(diags, n_iter=n_iter)
    # Pass the CALLER's use_pallas (usually None) to the eigenvector
    # stage, not the bisection's resolved True: banded_eigenvectors
    # has its own VMEM guard, and forcing its Pallas kernel past that
    # guard at large n (5,328 dims: ~54 MB of per-cell VMEM) crashes
    # the TPU compiler.
    u_band = banded_eigenvectors(diags, vals, n_solves=n_solves,
                                 shift_chunk=shift_chunk, window=window,
                                 use_pallas=vec_pallas)
    u = jax.vmap(back_transform)(v_all, t_all, u_band)
    # Refinement against the original matrix (all matmuls + small
    # batched eighs): two perturbative polish rounds remove the
    # far-spectrum contamination left by no-pivot f32 band solves
    # (element growth at ~10% of interior shifts), then a windowed
    # Rayleigh-Ritz un-mixes near-degenerate pairs and restores
    # orthonormality.  Measured at (900, f32): worst residual drops
    # from 5e-3 ||A|| to ~2e-6 ||A||.
    span = (vals[:, -1] - vals[:, 0])[:, None]
    min_gap = 0.01 * span

    def refine(aa, uu, vv, gap):
        uu = _perturbative_polish(aa, uu, vv, gap)
        uu = _perturbative_polish(aa, uu, vv, gap)
        return _window_refine(aa, uu, vv, max(32, window))

    u, vals = jax.vmap(refine)(matrix, u, vals, min_gap)
    vecs = jnp.swapaxes(u, -1, -2)  # modes in rows
    return (vals[0], vecs[0]) if squeeze else (vals, vecs)


@functools.partial(jax.jit, static_argnames=("bandwidth",))
def _staged_reduce(matrix, bandwidth):
    return band_reduce_with_reflectors(matrix, bandwidth)


@functools.partial(jax.jit,
                   static_argnames=("n_solves", "shift_chunk", "window",
                                    "use_pallas"))
def _staged_vectors(diags, vals, *, n_solves, shift_chunk, window,
                    use_pallas):
    return banded_eigenvectors(diags, vals, n_solves=n_solves,
                               shift_chunk=shift_chunk, window=window,
                               use_pallas=use_pallas)


_staged_back = jax.jit(back_transform)


@jax.jit
def _staged_polish(matrix, u, vals):
    min_gap = 0.01 * (vals[-1] - vals[0])
    u = _perturbative_polish(matrix, u, vals, min_gap)
    return _perturbative_polish(matrix, u, vals, min_gap)


@functools.partial(jax.jit, static_argnames=("window",))
def _staged_window(matrix, u, vals, *, window):
    u, vals = _window_refine(matrix, u, vals, window)
    # Final global QR: at 5k+ dims the band-reduction backward error
    # (~30 eps ||A||) exceeds the mean eigenvalue gap, so clustered
    # vectors come out overlapping (measured orthonormality error 0.8
    # at 5,328).  QR restores an orthonormal basis of the same spans;
    # Rayleigh quotients re-estimate the values on that basis.
    hp = jax.lax.Precision.HIGHEST
    q, _ = jnp.linalg.qr(u)
    aq = jnp.matmul(matrix, q, precision=hp)
    theta = jnp.sum(q * aq, axis=0)
    order = jnp.argsort(theta)
    return theta[order], q[:, order].T  # modes in rows


def _staged_finish(matrix, v_all, t_all, u_band, vals, *, window):
    # Three separate device programs, NOT one: the fused form emitted
    # non-finite columns at 5,328 dims on the remote TPU toolchain
    # while the identical unfused sequence is finite (verified stage
    # by stage) — a fusion-level numerics hazard we sidestep rather
    # than depend on.
    u = _staged_back(v_all, t_all, u_band)
    u = _staged_polish(matrix, u, vals)
    return _staged_window(matrix, u, vals, window=max(32, window))


def eigh_banded_staged(matrix, bandwidth=8, n_iter=40, use_pallas=None,
                       n_solves=2, shift_chunk=256, window=8):
    """
    :func:`eigh_banded` executed as four separately compiled device
    programs (reduce -> bisect -> band vectors -> back-transform +
    refine) instead of one.

    At large single-structure sizes (measured: 5,328 dims / 7cal) the
    monolithic program crashes the remote TPU compile helper, while
    every stage compiles and runs fine on its own — so the staged form
    is the production path for big matrices; the fused form remains
    best for batched mid-size pipelines (the relay charges ~28 ms per
    program launch, which four launches quadruple — irrelevant at
    seconds-long stage runtimes).  Single matrix only (no batch dim).
    Returns ``(eig_values, modes-in-rows)`` like :func:`eigh_banded`.
    """
    matrix = jnp.asarray(matrix)
    if matrix.ndim != 2:
        raise ValueError("eigh_banded_staged takes a single (n, n) "
                         "matrix; use eigh_banded for batches")
    n = matrix.shape[-1]
    if n <= bandwidth + 1:
        vals, vecs = jnp.linalg.eigh(matrix)
        return vals, vecs.T
    vec_pallas = use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and bandwidth <= 8

    diags, v_all, t_all = _staged_reduce(matrix, bandwidth)
    if use_pallas:
        vals = banded_eigenvalues_pallas(diags[None], n_iter=n_iter)[0]
    else:
        vals = banded_eigenvalues(diags[None], n_iter=n_iter)[0]
    u_band = _staged_vectors(diags[None], vals[None], n_solves=n_solves,
                             shift_chunk=shift_chunk, window=window,
                             use_pallas=vec_pallas)[0]
    return _staged_finish(matrix, v_all, t_all, u_band, vals,
                          window=window)

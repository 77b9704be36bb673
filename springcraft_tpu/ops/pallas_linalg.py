"""
Batched dense symmetric-positive-definite inverse, TPU-first.

Motivation (measured, v5e): XLA's batched ``cholesky`` at ``(64, 900)``
float32 costs ~31 ms on device and ``cho_solve`` against the identity
~43 ms — the dominant cost of the fluctuation-NMA pipeline
(``parallel.pipeline.anm_fluctuations``).  XLA lowers Cholesky to a
While program whose ~``m`` sequential elimination steps each round-trip
panel state through HBM.

The TPU-native formulation here splits the work by what each unit is
good at:

* the unavoidable sequential elimination steps run inside ONE Pallas
  kernel over small diagonal leaf panels with the whole batch resident
  in VMEM (`panel_cholesky_batched`) — each step is one fused rank-1
  pass over a ``(batch, pb, pb)`` block, no HBM traffic.  The panel
  inverses ``Ld^-1`` come from exact log-depth Newton iterations on
  the factors (MXU matmuls, outside the kernel);
* everything else is a divide-and-conquer inverse factor
  (`_recursive_inverse_factor`): four *square* half-size batched
  matmuls per node on 128-lane-aligned splits, plus the final Gram
  product ``A^-1 = G^T G`` — matmul-rich XLA (MXU at full tilt,
  streamed through HBM): **no** ``triangular_solve`` anywhere.  (A
  left-looking panel scheme was measured first: its 64-wide trailing
  updates and substitution rows ran at ~2.6% MFU — 49.6 ms/call at
  (64, 900) f32 where the aligned recursion takes 37.6 ms.)

The batch lives *inside* the kernel: ``vmap`` of a sequential kernel
would serialize grid instances, so callers with an ensemble use the
batched entry points directly (cf. the layout note on
``parallel.pipeline.ensemble_anm_spectral``).

Reference semantics served: ``np.linalg.pinv(hermitian=True)``
covariance at `/root/reference/src/springcraft/anm.py:133-136` via
`ops.rigid.covariance_cholesky` (which regularizes + equilibrates and
calls :func:`spd_inverse_factor` on its batched fast path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["panel_cholesky_batched", "panel_inverse_batched",
           "spd_inverse_blocked", "spd_inverse_factor",
           "spd_inverse_factor_parts"]

_HIGH = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return -(-x // m) * m


def _panel_kernel(pb, d_ref, l_ref):
    """Batched in-VMEM Cholesky of (bc, pb, pb) SPD panels.

    In-place rank-1 elimination, two vector passes per step: step i
    zeroes trailing column i and deposits the finished L column there
    in the same fused update (``m -= lcol (lcol - e_i)^T``).  The upper
    triangle keeps stale values — the host wrapper masks it.
    """
    m0 = d_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (pb, pb), 1)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
    one = jnp.asarray(1.0, m0.dtype)
    zero = jnp.asarray(0.0, m0.dtype)

    def body(i, m):
        sel_col = (col == i)[None]
        # column i of the reduced matrix and its pivot
        ci = jnp.sum(jnp.where(sel_col, m, zero), axis=2)  # (bc, pb)
        di = jnp.sum(jnp.where(rvec == i, ci, zero), axis=1)  # (bc,)
        # no pivot clamp: a non-positive pivot (matrix not SPD —
        # e.g. a null space beyond the caller's regularization) must
        # surface as inf/NaN in the outputs, matching XLA cholesky's
        # detectable breakdown rather than silent garbage
        rs = jax.lax.rsqrt(di)
        lcol = jnp.where(rvec >= i, ci * rs[:, None], zero)  # (bc, pb)
        # rank-1 elimination; columns j > i are reduced, column i is
        # left holding lcol (the elimination zeroes it, +e_i restores),
        # columns j < i have lcol[j] == 0 and stay untouched
        ei = jnp.where(rvec == i, one, zero)
        return m - lcol[:, :, None] * (lcol - ei)[:, None, :]

    l_ref[:] = jax.lax.fori_loop(0, pb, body, m0)


def _panel_inverse_kernel(pb, d_ref, w_ref):
    """Batched in-VMEM ``L^-1`` of (bc, pb, pb) SPD panels via augmented
    row-operation elimination.

    The state is the augmented ``[M | W]`` (bc, pb, 2 pb) block, ``W``
    initialized to I.  Step i applies the row operations that reduce
    ``M`` toward ``L^T`` (scale row i by ``1/sqrt(pivot)``, then zero
    column i below the diagonal); their product is exactly ``L^-1``, so
    after pb steps the right half holds it.  Both operations fold into
    ONE fused rank-1 update ``S -= c (x) row_i`` with

        c[k] = rs^2 * M[k, i]   (k > i)     elimination multipliers
        c[i] = 1 - rs                        row scaling
        c[k] = 0                (k < i)

    (eliminating with the *scaled* row i: ``rs * M[k,i] * (rs * row_i)``
    == ``rs^2 * M[k,i] * row_i``).  A 64-column panel already pads to
    128 lanes on TPU, so the augmentation is free in VMEM, and the
    whole triangular inverse costs the same loop the Cholesky alone
    did — replacing the per-leaf log-depth Newton matmul chain that
    dominated the recursive factor's runtime (measured ~0.75 ms per
    leaf round at (128, 64, 64); the 16-leaf dependent chain was ~12 ms
    of the 23 ms factor at (128, 1024) f32).

    No pivot clamp, as in :func:`_panel_kernel`: breakdown must surface
    as inf/NaN.
    """
    m0 = d_ref[:]
    col2 = jax.lax.broadcasted_iota(jnp.int32, (pb, 2 * pb), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (pb, 2 * pb), 0)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
    zero = jnp.asarray(0.0, m0.dtype)
    one = jnp.asarray(1.0, m0.dtype)
    # augmented state [M | I]
    eye_right = jnp.where(col2 == row2 + pb, one, zero)
    s0 = jnp.concatenate([m0, jnp.zeros_like(m0)], axis=2) + eye_right[None]

    def body(i, s):
        ci = jnp.sum(jnp.where((col2 == i)[None], s, zero), axis=2)
        di = jnp.sum(jnp.where(rvec == i, ci, zero), axis=1)   # (bc,)
        rs = jax.lax.rsqrt(di)
        rowi = jnp.sum(jnp.where((row2 == i)[None], s, zero), axis=1)
        c = jnp.where(rvec > i, ci * (rs * rs)[:, None], zero)
        c = c + jnp.where(rvec == i, (one - rs)[:, None], zero)
        return s - c[:, :, None] * rowi[:, None, :]

    s = jax.lax.fori_loop(0, pb, body, s0)
    w_ref[:] = s[:, :, pb:]


def _panel_inverse_kernel_shrink(pb, rb, d_ref, w_ref):
    """Triangular-shrink variant of :func:`_panel_inverse_kernel`.

    Row k of the augmented state is FINAL after elimination step k
    (steps ``i > k`` add ``c[k] * row_i`` with ``c[k] == 0`` exactly),
    so the kernel processes ``pb / rb`` unrolled row blocks: each block
    runs ``rb`` elimination steps on the *active* (not-yet-final)
    row window only, then retires its top ``rb`` rows by storing them
    straight into the output ref (a finals list concatenated at the
    end would hold the whole panel live next to the shrinking window;
    the direct stores cut peak VMEM enough to fit a 128-member batch
    chunk in one grid instance at pb=64 f32).  Total row work drops
    from ``pb^2`` to ``~pb^2 / 2`` with bit-identical arithmetic (the
    skipped updates are exact zeros).  Masks use local row / global
    column indexing; lanes stay the full ``2 pb`` augmentation
    throughout.
    """
    m0 = d_ref[:]
    zero = jnp.asarray(0.0, m0.dtype)
    one = jnp.asarray(1.0, m0.dtype)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (pb, 2 * pb), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (pb, 2 * pb), 0)
    eye_right = jnp.where(col2 == row2 + pb, one, zero)
    act = jnp.concatenate([m0, jnp.zeros_like(m0)], axis=2) \
        + eye_right[None]

    for b in range(pb // rb):
        r0 = b * rb
        rows = pb - r0
        cloc = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * pb), 1)
        rloc = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * pb), 0)
        rvec = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)

        def body(i, s, r0=r0, cloc=cloc, rloc=rloc, rvec=rvec):
            # global pivot column r0 + i; local pivot row i
            ci = jnp.sum(jnp.where((cloc == r0 + i)[None], s, zero),
                         axis=2)                         # (bc, rows)
            di = jnp.sum(jnp.where(rvec == i, ci, zero), axis=1)
            rs = jax.lax.rsqrt(di)
            rowi = jnp.sum(jnp.where((rloc == i)[None], s, zero),
                           axis=1)                       # (bc, 2 pb)
            c = jnp.where(rvec > i, ci * (rs * rs)[:, None], zero)
            c = c + jnp.where(rvec == i, (one - rs)[:, None], zero)
            return s - c[:, :, None] * rowi[:, None, :]

        act = jax.lax.fori_loop(0, rb, body, act)
        w_ref[:, r0:r0 + rb, :] = act[:, :rb, pb:]
        act = act[:, rb:, :]


def _tri_inverse_newton(l, pb):
    """Exact inverse of batched lower-triangular panels by log-depth
    Newton iteration: with ``X0 = diag(L)^-1`` the residual
    ``E = I - X L`` is strictly lower triangular (nilpotent), and each
    ``X <- X (2I - L X)`` squares it — ``ceil(log2(pb))`` iterations
    terminate exactly.  All MXU matmuls, no sequential substitution."""
    d = jnp.diagonal(l, axis1=-2, axis2=-1)
    eye = jnp.eye(pb, dtype=l.dtype)
    x = eye / d[..., :, None]
    n_iter = max(1, (pb - 1).bit_length())
    for _ in range(n_iter):
        lx = jnp.einsum("bij,bjk->bik", l, x, precision=_HIGH)
        x = 2.0 * x - jnp.einsum("bij,bjk->bik", x, lx, precision=_HIGH)
    return x


def panel_cholesky_batched(panels, interpret=None, batch_chunk=None):
    """
    Cholesky factor and its inverse for a batch of small SPD panels.

    Parameters
    ----------
    panels : ndarray, shape=(b, pb, pb), float32
        SPD diagonal panels (pb a multiple of 8; intended pb <= 128 so
        a batch chunk stays VMEM-resident).

    Returns
    -------
    l : ndarray, shape=(b, pb, pb)
        Lower Cholesky factors (strict upper zero).
    w : ndarray, shape=(b, pb, pb)
        ``L^-1`` (lower triangular).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, pb, pb2 = panels.shape
    if pb != pb2 or pb % 8:
        raise ValueError(f"panels must be (b, pb, pb) with pb % 8 == 0, "
                         f"got {panels.shape}")
    if batch_chunk is None:
        # ~4 live (bc, pb, pb_lanes) buffers (input, loop carry,
        # output, slack) must fit the ~16 MB VMEM budget.
        lanes = max(pb, 128)
        itemsize = panels.dtype.itemsize
        batch_chunk = max(
            8, min(128, (14 * 2**20) // (4 * itemsize * pb * lanes)))
    # Split the batch into the fewest chunks that fit, sized to
    # minimize padding (a chunk size just under the cap can otherwise
    # nearly double the padded batch, and padded rows cost real
    # elimination work).
    n_chunks = -(-b // batch_chunk)
    bc = min(_round_up(b, 8), _round_up(-(-b // n_chunks), 8))
    b_pad = _round_up(b, bc)
    if b_pad != b:
        # pad with identity panels so the elimination stays finite
        eye = jnp.broadcast_to(jnp.eye(pb, dtype=panels.dtype),
                               (b_pad - b, pb, pb))
        panels = jnp.concatenate([panels, eye], axis=0)

    spec = pl.BlockSpec((bc, pb, pb), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    l = pl.pallas_call(
        functools.partial(_panel_kernel, pb),
        grid=(b_pad // bc,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, pb, pb), panels.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(panels)
    l = l[:b]
    row = jnp.arange(pb)
    l = jnp.where(row[:, None] >= row[None, :], l, 0.0)
    return l, _tri_inverse_newton(l, pb)


def panel_inverse_batched(panels, interpret=None, batch_chunk=None,
                          shrink_block=None):
    """
    ``L^-1`` of a batch of small SPD panels in ONE Pallas kernel —
    the leaf operation of :func:`spd_inverse_factor`.

    Same contract as :func:`panel_cholesky_batched` but returns only
    the inverse factor ``w = L^-1`` (lower triangular), computed
    in-kernel by augmented row-operation elimination
    (:func:`_panel_inverse_kernel`) instead of a separate log-depth
    Newton matmul chain — one kernel launch, no post-processing.

    ``shrink_block``: rows retire in blocks of this size as their
    pivots complete (:func:`_panel_inverse_kernel_shrink`, ~pb^2/2 row
    work, bit-identical results); ``None`` keeps the full-window
    rank-1 kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, pb, pb2 = panels.shape
    if pb != pb2 or pb % 8:
        raise ValueError(f"panels must be (b, pb, pb) with pb % 8 == 0, "
                         f"got {panels.shape}")
    if batch_chunk is None:
        # ~4 live (bc, pb, 2 pb lanes) buffers (augmented state, loop
        # carry, output, slack) in the ~16 MB VMEM budget; the shrink
        # variant additionally keeps the retired row blocks alive next
        # to the active window (measured: bc=88 at pb=64 f32 overflows
        # the 16 MB scoped limit by ~0.3 MB), so budget ~6 buffers.
        live = 4 if shrink_block is None else 6
        lanes = max(2 * pb, 128)
        itemsize = panels.dtype.itemsize
        batch_chunk = max(
            8, min(128, (14 * 2**20) // (live * itemsize * pb * lanes)))
    n_chunks = -(-b // batch_chunk)
    bc = min(_round_up(b, 8), _round_up(-(-b // n_chunks), 8))
    b_pad = _round_up(b, bc)
    if b_pad != b:
        eye = jnp.broadcast_to(jnp.eye(pb, dtype=panels.dtype),
                               (b_pad - b, pb, pb))
        panels = jnp.concatenate([panels, eye], axis=0)

    if shrink_block is not None and (shrink_block <= 0
                                     or pb % shrink_block):
        raise ValueError(f"shrink_block must divide pb={pb}, "
                         f"got {shrink_block}")
    kernel = (functools.partial(_panel_inverse_kernel, pb)
              if shrink_block is None else
              functools.partial(_panel_inverse_kernel_shrink, pb,
                                shrink_block))
    spec = pl.BlockSpec((bc, pb, pb), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w = pl.pallas_call(
        kernel,
        grid=(b_pad // bc,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, pb, pb), panels.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(panels)
    w = w[:b]
    row = jnp.arange(pb)
    return jnp.where(row[:, None] >= row[None, :], w, 0.0)


def spd_inverse_blocked(a, block=64, interpret=None, precision=None):
    """
    Dense inverse of a batch of SPD matrices via recursive blocked
    Cholesky with Pallas panel factorization — the fast path for
    ensemble covariance solves (several-fold faster than ``cho_solve``
    against the identity on TPU at ensemble shapes, e.g.
    ``(64, 900, 900)`` float32).

    Algorithm: divide-and-conquer inverse factor
    (:func:`_recursive_inverse_factor`: square half-size batched
    matmuls at every node, the sequential elimination confined to
    VMEM-resident Pallas leaf panels from
    :func:`panel_cholesky_batched`), then ``A^-1 = G^T G`` (one Gram
    matmul).  All contractions run at ``precision='highest'`` (MXU
    bf16 hazard — see CLAUDE.md).

    Parameters
    ----------
    a : ndarray, shape=(..., m, m)
        SPD batch (use Jacobi equilibration upstream for
        ill-conditioned inputs — see ``ops.rigid.covariance_cholesky``).
    block : int
        Leaf-panel cap (multiple of 8, <= 128).  64 measures fastest on
        v5e at ensemble shapes — the in-kernel elimination work scales
        as ``leaf**2`` per matrix element (43.1 ms/call at leaf 128 vs
        37.6 at leaf 64, (64, 900) f32).

    Returns
    -------
    inv : ndarray, shape=(..., m, m)
    """
    a = jnp.asarray(a)
    if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
        raise ValueError(f"expected (..., m, m), got {a.shape}")
    batch_shape = a.shape[:-2]
    m = a.shape[-1]
    a = a.reshape((-1, m, m))
    prec = _HIGH if precision is None else precision
    g = _padded_inverse_factor(a, m, block, interpret, prec)
    inv = jnp.einsum("bki,bkj->bij", g, g, precision=prec)
    if inv.shape[-1] != m:
        inv = inv[:, :m, :m]
    return inv.reshape(batch_shape + (m, m))


def spd_inverse_factor(a, block=64, interpret=None, precision=None):
    """
    Inverse Gram factor of an SPD batch: returns ``G`` of shape
    ``(..., mp, mp)`` — the padded factorization's ``L^-1``, with
    ``mp = base * 2**d`` the recursion-friendly padded size
    (``base <= block``; e.g. 960 for m = 900) — such that
    ``A^-1 = (G^T @ G)[:m, :m]``.  G stays at the padded (tile-aligned)
    size: trimming before the Gram product would force an unaligned
    matmul, which measures slower than the padded one on TPU.  Callers
    that post-scale the inverse (e.g. Jacobi-equilibration un-scaling
    in ``ops.rigid.covariance_cholesky``) fold the scaling into G's
    columns (zero-padded past ``m``) and save full elementwise passes
    over the inverse.
    """
    a = jnp.asarray(a)
    if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
        raise ValueError(f"expected (..., m, m), got {a.shape}")
    batch_shape = a.shape[:-2]
    m = a.shape[-1]
    a = a.reshape((-1, m, m))
    prec = _HIGH if precision is None else precision
    g = _padded_inverse_factor(a, m, block, interpret, prec)
    return g.reshape(batch_shape + g.shape[-2:])


def spd_inverse_factor_parts(a, block=64, interpret=None,
                             precision=None):
    """
    Top-split form of :func:`spd_inverse_factor`: the blocks
    ``(g11, g21, g22)`` with ``G = [[g11, 0], [g21, g22]]`` at the
    padded size (``g21 is None`` when the padded problem fits a single
    leaf and ``g11`` is the whole factor).

    Consumers that contract ``G`` blockwise — the fluctuation
    pipeline's plane-trace Grams (``ops.rigid``) — skip the factor's
    final materializing concat this way: measured 3.1 ms of pure HBM
    round-trip at the (128, 1024) f32 headline shape
    (tools/exp_concat_cost.py).  The intermediate recursion levels
    keep their concats — XLA's slice-of-concat simplification already
    elides those against the parent's block reads (a block-tree
    variant replacing them with dynamic-update-slice materialization
    measured 11 ms SLOWER standalone), so the top level, whose
    consumer used to be a dense Gram, is the only one worth splitting.
    """
    a = jnp.asarray(a)
    if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
        raise ValueError(f"expected (..., m, m), got {a.shape}")
    batch_shape = a.shape[:-2]
    m = a.shape[-1]
    a = a.reshape((-1, m, m))
    prec = _HIGH if precision is None else precision
    base = max(8, min(128, block))
    mp = _choose_padding(m, base)
    if mp != m:
        pad = mp - m
        a = jnp.pad(a, ((0, 0), (0, pad), (0, pad)))
        diag = jnp.arange(m, mp)
        a = a.at[:, diag, diag].set(1.0)
    g11, g21, g22 = _top_inverse_factor_parts(a, base, interpret, prec)
    if g21 is None:
        return g11.reshape(batch_shape + g11.shape[-2:]), None, None
    return (g11.reshape(batch_shape + g11.shape[-2:]),
            g21.reshape(batch_shape + g21.shape[-2:]),
            g22.reshape(batch_shape + g22.shape[-2:]))


def _top_inverse_factor_parts(a, base, interpret, precision):
    """One node of the divide-and-conquer inverse factor with the
    final concat left to the caller: ``(g11, g21, g22)``, or
    ``(g, None, None)`` when ``a`` fits a single leaf."""
    s = a.shape[-1]
    if s <= base:
        return (panel_inverse_batched(a, interpret=interpret,
                                      shrink_block=8), None, None)
    h = _round_up(s // 2, 128)
    if h >= s:
        h = s // 2
    g11 = _recursive_inverse_factor(a[:, :h, :h], base, interpret,
                                    precision)
    l21, s22 = _schur_lower(a, h, g11, precision)
    g22 = _recursive_inverse_factor(s22, base, interpret, precision)
    g21 = -_tri_left_mm(g22, _tri_right_mm(l21, g11, precision),
                        precision)
    return g11, g21, g22


def padded_size(m, block=64):
    """Public probe of the recursion's padded size: callers that can
    emit the SPD input already identity-padded to this size (e.g.
    ``rigid._regularize_equilibrated(pad_to=...)``) save the factor's
    own O(m^2) pad pass (~3.2 ms at (128, 900 -> 1024) f32 on v5e)."""
    return _choose_padding(m, max(8, min(128, block)))


def _choose_padding(m, base_max):
    """Padded size for the recursive inverse factor: the next multiple
    of 128 (so every recursion level splits on a lane-aligned
    boundary — measured at (64, 900) f32 the 128-aligned mp=1024
    recursion beats the smaller but misaligned mp=960 one by ~11%
    despite 21% more flops), or the next multiple of 8 for single-leaf
    inputs."""
    if m <= max(8, min(128, base_max)):
        return _round_up(m, 8)
    if m <= 256:
        return _round_up(m, 64)
    return _round_up(m, 128)


def _padded_inverse_factor(a, m, block, interpret, precision=_HIGH):
    """(b, m, m) SPD -> (b, mp, mp) inverse factor of the
    identity-padded problem (exact: padding decouples)."""
    mp = _choose_padding(m, block)
    if mp != m:
        pad = mp - m
        a = jnp.pad(a, ((0, 0), (0, pad), (0, pad)))
        # identity on the padding diagonal keeps the factorization exact
        diag = jnp.arange(m, mp)
        a = a.at[:, diag, diag].set(1.0)
    return _recursive_inverse_factor(a, max(8, min(128, block)),
                                     interpret, precision)


def _recursive_inverse_factor(a, base, interpret, precision=_HIGH):
    """``G = L^-1`` of batched SPD ``(b, s, s)`` by divide-and-conquer:

        A = [[A11,   .], [A21, A22]]
        G11 = invfactor(A11);  L21 = A21 @ G11^T
        G22 = invfactor(A22 - L21 @ L21^T)
        G21 = -G22 @ (L21 @ G11)

    Every node is four *square-ish* half-size batched matmuls —
    MXU-shaped, unlike the left-looking panel scheme whose trailing
    updates and substitution rows are 64-wide (measured ~2.6% MFU at
    (64, 960): the 15-step panel loop cost 28 ms where this recursion's
    matmuls are square at every level).  The split point rounds up to
    the 128-lane boundary so every sub-block stays tile-aligned; the
    sequential elimination only ever runs inside the VMEM-resident
    Pallas leaf panels (size <= ``base``).
    """
    s = a.shape[-1]
    # NOTE on leaves (inside _top_inverse_factor_parts): the
    # triangular-shrink leaf retires rows in blocks of 8 as their
    # pivots complete — measured 0.29 vs 0.56 ms/call at (128, 64, 64)
    # f32 on v5e (tools/exp_leaf_shrink.py, floor-differenced), ~4 ms
    # off the headline factor stage.
    g11, g21, g22 = _top_inverse_factor_parts(a, base, interpret,
                                              precision)
    if g21 is None:
        return g11
    h = g11.shape[-1]
    top = jnp.concatenate(
        [g11, jnp.zeros(a.shape[:-2] + (h, s - h), a.dtype)], axis=2)
    bot = jnp.concatenate([g21, g22], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _tri_split(h):
    """128-aligned split point for exploiting a sub-factor's
    lower-triangular block structure, or 0 when ``h`` is too small to
    split (the dense form is then used)."""
    q = _round_up(h // 2, 128)
    return q if 0 < q < h else 0


def _schur_lower(a, h, g11, precision):
    """``L21 = A21 G11^T`` and ``S22 = A22 - L21 L21^T`` with the
    sub-factor's zero blocks skipped.

    G11 is lower-triangular with EXACT zero top-right blocks at every
    recursion split (the concatenated zeros above), so with
    ``G11 = [[T1, 0], [X, T2]]`` the product columns ``[:q]`` contract
    only ``q`` terms.  S22's strict upper-right quadrant is zero-FILLED
    rather than computed: the recursion consuming it only ever reads
    diagonal blocks and lower-left blocks (inductively down to the leaf
    panels, which receive full true diagonal blocks), so those values
    are never used.  Together ~1/4 of the node's Schur/stitch flops are
    skipped; results are bit-identical up to f32 summation of the
    dropped exact-zero terms (measured 6e-8 relative vs the dense forms
    at (128, 1024)).
    """
    a21 = a[:, h:, :h]
    q = _tri_split(h)
    if not q:
        l21 = jnp.einsum("bij,bkj->bik", a21, g11, precision=precision)
        s22 = a[:, h:, h:] - jnp.einsum("bik,bjk->bij", l21, l21,
                                        precision=precision)
        return l21, s22
    l21 = jnp.concatenate([
        jnp.einsum("bij,bkj->bik", a21[:, :, :q], g11[:, :q, :q],
                   precision=precision),
        jnp.einsum("bij,bkj->bik", a21, g11[:, q:, :],
                   precision=precision),
    ], axis=2)
    w = a.shape[-1] - h
    qq = _tri_split(w)
    if not qq:
        s22 = a[:, h:, h:] - jnp.einsum("bik,bjk->bij", l21, l21,
                                        precision=precision)
        return l21, s22
    s22_l = a[:, h:, h:h + qq] - jnp.einsum(
        "bik,bjk->bij", l21, l21[:, :qq, :], precision=precision)
    s22_br = a[:, h + qq:, h + qq:] - jnp.einsum(
        "bik,bjk->bij", l21[:, qq:, :], l21[:, qq:, :],
        precision=precision)
    s22 = jnp.concatenate([
        jnp.concatenate(
            [s22_l[:, :qq, :],
             jnp.zeros(a.shape[:-2] + (qq, w - qq), a.dtype)], axis=2),
        jnp.concatenate([s22_l[:, qq:, :], s22_br], axis=2),
    ], axis=1)
    return l21, s22


def _tri_right_mm(x, g, precision):
    """``X @ G`` for a sub-factor ``G`` with exact zero top-right
    blocks: output columns ``[q:]`` contract only ``G``'s bottom
    rows."""
    h = g.shape[-1]
    q = _tri_split(h)
    if not q:
        return jnp.einsum("bij,bjk->bik", x, g, precision=precision)
    return jnp.concatenate([
        jnp.einsum("bij,bjk->bik", x, g[:, :, :q], precision=precision),
        jnp.einsum("bij,bjk->bik", x[:, :, q:], g[:, q:, q:],
                   precision=precision),
    ], axis=2)


def _tri_left_mm(g, x, precision):
    """``G @ X`` for a sub-factor ``G`` with exact zero top-right
    blocks: output rows ``[:q]`` contract only ``G``'s leading
    columns."""
    h = g.shape[-2]
    q = _tri_split(h)
    if not q:
        return jnp.einsum("bij,bjk->bik", g, x, precision=precision)
    return jnp.concatenate([
        jnp.einsum("bij,bjk->bik", g[:, :q, :q], x[:, :q, :],
                   precision=precision),
        jnp.einsum("bij,bjk->bik", g[:, q:, :], x, precision=precision),
    ], axis=1)



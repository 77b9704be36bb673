"""
Pallas TPU kernels: fused tiled assembly of ENM interaction matrices.

This is the TPU-native replacement for the reference's neighbor-search +
scatter pipeline (biotite ``CellList`` + ``np.where`` pair lists +
fancy-indexing scatter, reference ``interaction.py:114-190``): one fused
pass over (row-tile, col-tile) blocks of the pairwise plane computes
displacements, squared distances, the cutoff mask and the force-constant
rule, and writes interaction-matrix tiles directly — no pair lists, no
scatter, O(tile) VMEM.

Layout: the Hessian is produced in ``xyz`` plane layout ``(3, n, 3, n)``
(component-major) — each of the nine ``(n, n)`` planes is a clean tile
target, avoiding the interleaved 3x3 superelement layout that fights TPU
tiling.  ``reshape(3n, 3n)`` of the result is free (row-major view) and
is permutation-similar to the reference's atom-interleaved layout
(identical eigenvalues; see ``assembly.atom_to_xyz_permutation``).

Diagonal handling uses a *diagonal-last column ordering*: for row-tile
``i`` the column tiles are visited in the rolled order
``i+1, i+2, ..., i`` so the diagonal tile comes last, by which point the
running row-sum accumulator holds the full ``-sum_j k_ij (...)`` needed
for the diagonal (super)elements — the matrix leaves the kernel
finished, with no second pass over HBM.

Supported force-field families: the analytic ones (``invariant``,
``hinsen``, ``pfenm``) and ``table_compact`` (type-pair tables applied
via one-hot MXU matmuls).  ``table_pair``/overlay families use the XLA
dense path instead (they are O(n^2)-parameterized and small by
construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "hessian_pallas",
    "kirchhoff_pallas",
    "hessian_pallas_ensemble",
    "kirchhoff_pallas_ensemble",
    "pair_constant_planes",
    "supports_params",
    "supports_ensemble",
    "fused_prep_plan",
    "regularize_stitch_pallas",
    "assembly_prep_plan",
    "assembly_stitch_pallas",
]


def supports_params(params):
    """O(n)-parameter families the fused kernels handle.  Patch
    overlays are supported via a sparse post-pass rank correction
    (``assembly.overlay_correction_*``) as long as their masks are
    concrete — the affected pair set is extracted host-side at trace
    time."""
    from . import ffparams as _fp

    return params.kind in ("invariant", "hinsen", "pfenm",
                           "table_compact") \
        and (not params.overlays or _fp.overlays_concrete(params))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _auto_tile(n):
    """Default tile edge for the assembly kernels.

    A single lane-aligned tile that exactly covers ``n`` beats the fixed
    256 default whenever it fits VMEM: padding waste dominates at small
    n (n=300 pads to 512 under tile 256 — 2.9x the useful pair plane).
    Measured on v5e at (128 conformers, n=300) sdENM fluctuation
    pipeline: tile 384 -> 1613 solves/s, tile 128 -> 1463, tile 256
    (old default) -> 1259.  Beyond 384 the nine double-buffered output
    tiles approach the 16 MB VMEM budget, so large systems stay on 256.
    """
    if n <= 384:
        return max(128, _round_up(n, 128))
    return 256


# ---------------------------------------------------------------------------
# In-kernel force-constant rules
# ---------------------------------------------------------------------------

def _analytic_constants(kind, sq):
    """Unmasked spring constants for the analytic families — the single
    source of the per-family rules, shared by the assembly kernels and
    the matrix-free evaluators (``ops.matfree``).  Semantics match the
    reference (``forcefield.py:264-366``)."""
    if kind == "invariant":
        return jnp.ones_like(sq)
    if kind == "hinsen":
        dist = jnp.maximum(jnp.sqrt(sq), 2.9)
        return jnp.where(dist < 4.0, dist * 8.6e2 - 2.39e3,
                         (1.28e6) / (sq * sq * sq))
    if kind == "pfenm":
        return 1.0 / jnp.where(sq == 0, 1.0, sq)
    raise NotImplementedError(kind)


def _mask_and_constants(sq, row0, col0, n, params, extra):
    """Masked spring constants for one (TI, TJ) tile.

    Returns k with zeros outside the interaction set (beyond cutoff,
    self-pairs, padding)."""
    ti, tj = sq.shape
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    valid = (rows != cols) & (rows < n) & (cols < n)
    if params.has_cutoff:
        valid &= sq <= np.float32(params.cutoff_sq)

    if params.kind == "table_compact":
        k = _compact_tile_constants(sq, rows, cols, params, extra)
    else:
        k = _analytic_constants(params.kind, sq)
    return jnp.where(valid, k, 0.0)


def _compact_tile_constants(sq, rows, cols, params, extra):
    """Tabulated constants for one tile via one-hot MXU matmuls.

    ``k_ij = sum_b [bin_ij == b] * (O_i T_b O_j^t)_ij`` where ``O`` are
    one-hot type matrices — turns the per-pair table gather (TPU-hostile)
    into a short scan of small matmuls (TPU-native).
    """
    onehot_rows, onehot_cols, chain_rows, chain_cols, bonded_rows, \
        bonded_cols, tables = extra
    # tables: (n_bins, 3, 20, 20) stacked [intra, inter, bonded]
    n_bins = tables.shape[0]

    if n_bins > 1:
        # Statically unrolled searchsorted (side='left'): the bin index
        # is the number of edges strictly below sq.  Static Python
        # floats avoid capturing the edge array as a kernel constant.
        bins = jnp.zeros(sq.shape, jnp.int32)
        for edge_sq in np.asarray(params.edges_sq, dtype=np.float32):
            bins = bins + (sq > edge_sq).astype(jnp.int32)
        bins = jnp.clip(bins, 0, n_bins - 1)
    else:
        bins = jnp.zeros(sq.shape, jnp.int32)

    # Broadcast int32 vectors to the 2D tile before comparing — Mosaic
    # only supports minor-dim insertion for 32-bit types, so boolean
    # vectors must not be reshaped/broadcast directly.
    shape = sq.shape
    chain_r2 = jnp.broadcast_to(chain_rows[:, None], shape)
    chain_c2 = jnp.broadcast_to(chain_cols[None, :], shape)
    same_chain = chain_r2 == chain_c2
    delta = cols - rows
    bond_r2 = jnp.broadcast_to(bonded_rows[:, None], shape)
    bond_c2 = jnp.broadcast_to(bonded_cols[None, :], shape)
    bonded = ((delta == 1) & (bond_r2 != 0)) | ((delta == -1) & (bond_c2 != 0))

    k = jnp.zeros_like(sq)
    for b in range(n_bins):
        intra = _pair_table_product(onehot_rows, tables[b, 0], onehot_cols)
        inter = _pair_table_product(onehot_rows, tables[b, 1], onehot_cols)
        bond = _pair_table_product(onehot_rows, tables[b, 2], onehot_cols)
        k_b = jnp.where(bonded, bond, jnp.where(same_chain, intra, inter))
        k = jnp.where(bins == b, k_b, k)
    return k


def _pair_table_product(onehot_rows, table, onehot_cols):
    # (TI, 32) @ (32, 32) @ (32, TJ) on the MXU.  precision=HIGHEST:
    # the default bf16 MXU pass would round the table *values* (~0.4%),
    # and a one-hot gather must reproduce them exactly.
    left = jnp.dot(onehot_rows, table,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(left, onehot_cols.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Hessian kernel
# ---------------------------------------------------------------------------

def _hessian_kernel(params, n, n_tiles, tile, *refs):
    """One grid instance computes the ``(tile, tile)`` blocks of all nine
    component planes at (row-tile ``i``, rolled col-tile) — the nine
    planes are separate outputs so every HBM write is a clean contiguous
    tile (a fused ``(3, T, 3, T)`` block write is an order of magnitude
    slower)."""
    if params.kind == "table_compact":
        (coord_row_ref, coord_col_ref, type_row_ref, type_col_ref,
         chain_row_ref, chain_col_ref, bond_row_ref, bond_col_ref,
         tables_ref) = refs[:9]
        out_refs = refs[9:18]
        acc_ref = refs[18]
    else:
        coord_row_ref, coord_col_ref = refs[:2]
        out_refs = refs[2:11]
        acc_ref = refs[11]

    i = pl.program_id(0)
    j = pl.program_id(1)

    col_tile = (i + 1 + j) % n_tiles  # diagonal-last rolled ordering
    row0 = i * tile
    col0 = col_tile * tile

    rows = coord_row_ref[:]  # (3, T)
    cols = coord_col_ref[:]  # (3, T)
    dx = rows[0][:, None] - cols[0][None, :]
    dy = rows[1][:, None] - cols[1][None, :]
    dz = rows[2][:, None] - cols[2][None, :]
    sq = dx * dx + dy * dy + dz * dz

    if params.kind == "table_compact":
        extra = (
            type_row_ref[:], type_col_ref[:],
            chain_row_ref[0], chain_col_ref[0],
            bond_row_ref[0], bond_col_ref[0],
            tables_ref[:],
        )
    else:
        extra = None
    k = _mask_and_constants(sq, row0, col0, n, params, extra)
    g = -k / jnp.where(sq == 0, 1.0, sq)
    disp = (dx, dy, dz)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    is_diag_tile = j == n_tiles - 1  # rolled order puts col_tile == i last
    rows_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, sq.shape, 0)
    cols_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
    eye = rows_ids == cols_ids

    for a in range(3):
        for b in range(3):
            plane = g * disp[a] * disp[b]
            acc_ref[3 * a + b, :] += jnp.sum(plane, axis=1)

            @pl.when(jnp.logical_not(is_diag_tile))
            def _(plane=plane, a=a, b=b):
                out_refs[3 * a + b][:] = plane

            @pl.when(is_diag_tile)
            def _(plane=plane, a=a, b=b):
                out_refs[3 * a + b][:] = plane + jnp.where(
                    eye, -acc_ref[3 * a + b, :][:, None], 0.0
                )


def hessian_pallas(coord, params, tile=None, dtype=jnp.float32,
                   interpret=None):
    """
    Fused tiled ANM Hessian on TPU.

    Parameters
    ----------
    coord : ndarray, shape=(n, 3)
    params : FFParams
        Must satisfy :func:`supports_params`.
    tile : int, optional
        Square tile edge (atoms per tile); default picks a single
        covering tile for small n and 256 otherwise (:func:`_auto_tile`).

    Returns
    -------
    hessian : ndarray, shape=(3n, 3n), dtype
        xyz plane layout (see module docstring).
    """
    if not supports_params(params):
        raise ValueError(
            f"Pallas path does not support kind={params.kind!r} "
            f"with overlays={bool(params.overlays)}"
        )
    if params.overlays:
        # Sparse rank correction on top of the base-family kernel:
        # overlays touch a handful of pairs, so the fused kernel runs
        # unmodified and the patches scatter in at O(P).
        from . import assembly, ffparams as _fp

        coord = jnp.asarray(coord, dtype=dtype)
        base = hessian_pallas(coord, _fp.strip_overlays(params),
                              tile=tile, dtype=dtype,
                              interpret=interpret)
        return assembly.overlay_correction_hessian_xyz(
            base, coord, params, jnp)
    if interpret is None:
        # Compiled Mosaic kernels need a TPU; fall back to the
        # interpreter elsewhere (tests, CPU debugging).  The heuristic
        # keys off the *default* backend — when explicitly placing the
        # computation on a non-default device, pass interpret= yourself.
        interpret = jax.default_backend() != "tpu"
    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    if tile is None:
        tile = _auto_tile(n)
    n_pad = _round_up(n, tile)
    n_tiles = n_pad // tile

    coord_t = jnp.zeros((3, n_pad), dtype=dtype)
    coord_t = coord_t.at[:, :n].set(coord.T)

    kernel = functools.partial(_hessian_kernel, params, n, n_tiles, tile)

    nt = n_tiles
    in_specs = [
        pl.BlockSpec((3, tile), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i, j: (0, (i + 1 + j) % nt),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [coord_t, coord_t]

    if params.kind == "table_compact":
        (onehot, chain, bonded, tables) = _compact_device_inputs(
            params, n, n_pad, dtype
        )
        in_specs += [
            pl.BlockSpec((tile, 32), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 32),
                         lambda i, j: ((i + 1 + j) % nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile),
                         lambda i, j: (0, (i + 1 + j) % nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile),
                         lambda i, j: (0, (i + 1 + j) % nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs += [onehot, onehot, chain, chain, bonded, bonded, tables]

    plane_spec = pl.BlockSpec(
        (tile, tile), lambda i, j: (i, (i + 1 + j) % nt),
        memory_space=pltpu.VMEM,
    )
    planes = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_tiles),
        in_specs=in_specs,
        out_specs=[plane_spec] * 9,
        out_shape=[jax.ShapeDtypeStruct((n_pad, n_pad), dtype)] * 9,
        scratch_shapes=[pltpu.VMEM((9, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    if n_pad != n:
        planes = [p[:n, :n] for p in planes]
    # Assemble (3n, 3n) by concatenation — contiguous block copies only
    # (a (3, n, 3, n) -> (3n, 3n) transpose is pathologically slow).
    return jnp.concatenate(
        [
            jnp.concatenate([planes[3 * a + b] for b in range(3)], axis=1)
            for a in range(3)
        ],
        axis=0,
    )


def _compact_device_inputs(params, n, n_pad, dtype):
    """Padded device-side metadata for the compact tabulated family.
    Built with jnp ops so the (traced) parameter arrays stay traceable
    under jit."""
    type_idx = jnp.zeros(n_pad, dtype=jnp.int32).at[:n].set(
        jnp.asarray(params.type_idx, dtype=jnp.int32)
    )
    onehot = jax.nn.one_hot(type_idx, 32, dtype=dtype)

    # Chain padding uses -1 (never a real chain code) so padded atoms
    # are never same-chain; padded atoms are never bonded.  Padded rows
    # are masked out by index anyway.
    chain = jnp.full((1, n_pad), -1, dtype=jnp.int32).at[0, :n].set(
        jnp.asarray(params.chain_code, dtype=jnp.int32)
    )
    bonded = jnp.zeros((1, n_pad), dtype=jnp.int32).at[0, :n].set(
        jnp.asarray(params.bonded_next).astype(jnp.int32)
    )

    intra = jnp.asarray(params.intra_table, dtype=jnp.float32)
    inter = jnp.asarray(params.inter_table, dtype=jnp.float32)
    bond = jnp.asarray(params.bonded_table, dtype=jnp.float32)
    n_bins = intra.shape[-1]
    # (n_bins, 3, 32, 32): pad the 20x20 tables to MXU-friendly 32
    tables = jnp.zeros((n_bins, 3, 32, 32), dtype=jnp.float32)
    tables = tables.at[:, 0, :20, :20].set(jnp.moveaxis(intra, -1, 0))
    tables = tables.at[:, 1, :20, :20].set(jnp.moveaxis(inter, -1, 0))
    tables = tables.at[:, 2, :20, :20].set(jnp.moveaxis(bond, -1, 0))

    return onehot, chain, bonded, tables


# ---------------------------------------------------------------------------
# Kirchhoff kernel
# ---------------------------------------------------------------------------

def _kirchhoff_kernel(params, n, n_tiles, tile, *refs):
    if params.kind == "table_compact":
        (coord_row_ref, coord_col_ref, type_row_ref, type_col_ref,
         chain_row_ref, chain_col_ref, bond_row_ref, bond_col_ref,
         tables_ref, out_ref, acc_ref) = refs
    else:
        coord_row_ref, coord_col_ref, out_ref, acc_ref = refs

    i = pl.program_id(0)
    j = pl.program_id(1)

    rows = coord_row_ref[:]
    cols = coord_col_ref[:]
    dx = rows[0][:, None] - cols[0][None, :]
    dy = rows[1][:, None] - cols[1][None, :]
    dz = rows[2][:, None] - cols[2][None, :]
    sq = dx * dx + dy * dy + dz * dz

    col_tile = (i + 1 + j) % n_tiles
    row0 = i * tile
    col0 = col_tile * tile

    if params.kind == "table_compact":
        extra = (
            type_row_ref[:], type_col_ref[:],
            chain_row_ref[0], chain_col_ref[0],
            bond_row_ref[0], bond_col_ref[0],
            tables_ref[:],
        )
    else:
        extra = None

    k = _mask_and_constants(sq, row0, col0, n, params, extra)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += jnp.sum(k, axis=1)

    is_diag_tile = j == n_tiles - 1

    @pl.when(jnp.logical_not(is_diag_tile))
    def _():
        out_ref[:] = -k

    @pl.when(is_diag_tile)
    def _():
        rows_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        cols_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        eye = rows_ids == cols_ids
        out_ref[:] = -k + jnp.where(eye, acc_ref[0, :][:, None], 0.0)


def kirchhoff_pallas(coord, params, tile=None, dtype=jnp.float32,
                     interpret=None):
    """Fused tiled GNM Kirchhoff matrix on TPU (see
    :func:`hessian_pallas`)."""
    if not supports_params(params):
        raise ValueError(
            f"Pallas path does not support kind={params.kind!r} "
            f"with overlays={bool(params.overlays)}"
        )
    if params.overlays:
        from . import assembly, ffparams as _fp

        coord = jnp.asarray(coord, dtype=dtype)
        base = kirchhoff_pallas(coord, _fp.strip_overlays(params),
                                tile=tile, dtype=dtype,
                                interpret=interpret)
        return assembly.overlay_correction_kirchhoff(
            base, coord, params, jnp)
    if interpret is None:
        # Compiled Mosaic kernels need a TPU; fall back to the
        # interpreter elsewhere (tests, CPU debugging).  The heuristic
        # keys off the *default* backend — when explicitly placing the
        # computation on a non-default device, pass interpret= yourself.
        interpret = jax.default_backend() != "tpu"
    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    if tile is None:
        tile = _auto_tile(n)
    n_pad = _round_up(n, tile)
    n_tiles = n_pad // tile

    coord_t = jnp.zeros((3, n_pad), dtype=dtype)
    coord_t = coord_t.at[:, :n].set(coord.T)

    kernel = functools.partial(_kirchhoff_kernel, params, n, n_tiles, tile)

    in_specs = [
        pl.BlockSpec((3, tile), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile),
                     lambda i, j, _nt=n_tiles: (0, (i + 1 + j) % _nt),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [coord_t, coord_t]
    if params.kind == "table_compact":
        (onehot, chain, bonded, tables) = _compact_device_inputs(
            params, n, n_pad, dtype
        )
        in_specs += [
            pl.BlockSpec((tile, 32), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 32),
                         lambda i, j, _nt=n_tiles: ((i + 1 + j) % _nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile),
                         lambda i, j, _nt=n_tiles: (0, (i + 1 + j) % _nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile),
                         lambda i, j, _nt=n_tiles: (0, (i + 1 + j) % _nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs += [onehot, onehot, chain, chain, bonded, bonded, tables]

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, tile),
            lambda i, j, _nt=n_tiles: (i, (i + 1 + j) % _nt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), dtype),
        scratch_shapes=[pltpu.VMEM((1, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    if n_pad != n:
        out = out[:n, :n]
    return out


# ---------------------------------------------------------------------------
# Batched ensemble kernels (one parameter set, many conformers)
# ---------------------------------------------------------------------------
#
# A conformer ensemble shares its type/chain/bond metadata — only the
# coordinates vary.  For the tabulated family that makes every one-hot
# table product batch-invariant: :func:`pair_constant_planes` resolves
# the per-bin pair-constant planes ONCE with large MXU-friendly matmuls,
# and the batched kernel reduces to distances + one bin select per pair
# — zero matmuls inside the batch.  (``vmap(hessian_pallas)`` instead
# repeats 3*n_bins inner-dim-32 matmuls per tile *per conformer*:
# measured ~36 ms of the 128-conformer sdENM ensemble call at n=300.)


def _ensemble_tile(n, n_bins):
    """Tile edge for the ensemble kernels: start from the padding-free
    :func:`_auto_tile` choice and shrink (in lane-aligned steps) until
    the double-buffered ``(n_bins, tile, tile)`` plane block plus the
    nine output tiles fit the ~16 MB VMEM budget."""
    tile = _auto_tile(n)
    while tile > 128 and n_bins * tile * tile * 4 * 2 > 8 * 1024**2:
        tile -= 128
    return tile


def supports_ensemble(params, n, max_plane_bytes=2 * 1024**3):
    """Whether :func:`hessian_pallas_ensemble` handles ``params`` at
    ``n``: tabulated compact family only (the analytic families carry no
    per-pair tables worth hoisting — vmap the single-structure kernel),
    with the precomputed planes capped to ``max_plane_bytes`` of HBM."""
    if not supports_params(params) or params.kind != "table_compact":
        return False
    n_pad = _round_up(n, _ensemble_tile(n, params.n_bins))
    return params.n_bins * n_pad * n_pad * 4 <= max_plane_bytes


def pair_constant_planes(params, n, n_pad, dtype=jnp.float32):
    """Context-resolved per-bin pair force constants, ``(n_bins, n_pad,
    n_pad)`` — the batch-invariant part of tabulated assembly.

    ``planes[b, i, j]`` is the force constant for pair (i, j) *if* its
    distance falls in bin ``b``: the bonded/intra/inter context tables
    are selected per pair here, so the batched kernel only bins the
    per-conformer distances and selects a plane.  Built from one-hot
    matmuls over the full padded extent (inner dim 32 but n_pad-tall —
    far better MXU shapes than per-tile products, and paid once per
    ensemble rather than per conformer).
    """
    onehot, chain, bonded, tables = _compact_device_inputs(
        params, n, n_pad, jnp.float32
    )
    hp = jax.lax.Precision.HIGHEST
    # (n_bins, 3, n_pad, 32): fold each 32x32 table into the row one-hots
    left = jnp.einsum("ik,bckl->bcil", onehot, tables, precision=hp)

    same_chain = chain[0][:, None] == chain[0][None, :]
    idx = jnp.arange(n_pad)
    delta = idx[None, :] - idx[:, None]
    bnext = bonded[0]
    bonded_pair = ((delta == 1) & (bnext[:, None] != 0)) | (
        (delta == -1) & (bnext[None, :] != 0)
    )

    planes = []
    for b in range(tables.shape[0]):
        # (3, n_pad, n_pad) candidate values for bin b, then resolve the
        # context per pair: bonded > same-chain intra > inter
        vals = jnp.einsum("cil,jl->cij", left[b], onehot, precision=hp)
        planes.append(
            jnp.where(bonded_pair, vals[2],
                      jnp.where(same_chain, vals[0], vals[1]))
        )
    return jnp.stack(planes).astype(dtype)


def _planes_tile_constants(sq, params, kplanes_ref):
    """Tabulated constants for one tile from precomputed pair planes:
    bin the squared distances and select the matching plane.

    The bin of a pair is ``min(#edges below sq, n_bins - 1)`` (the
    clipped count the one-hot path also uses); rather than
    materializing that integer (n_edges compare+add passes) and then
    walking a linear ``bins == b`` select chain (compare+select per
    bin), a balanced binary search over the first ``n_bins - 1`` edges
    reaches the same plane in ``n_bins - 1`` selects total with no
    index materialization — half the full-tile VPU passes of the
    constants rule, bit-identical plane choice (measured 7.45 -> 7.18
    ms on the (128, n=300) 26-bin sdENM assembly stage together with
    the conformer-inner grid; the stage is not VPU-bound, so the gain
    is modest).  Edges beyond index ``n_bins - 2`` cannot change the
    clipped bin and are ignored, matching the clip exactly.
    """
    n_bins = kplanes_ref.shape[0]
    if n_bins == 1:
        return kplanes_ref[0]
    edges = np.asarray(params.edges_sq, dtype=np.float32)[:n_bins - 1]
    # bins beyond the last edge are unreachable (count <= n_edges)
    n_reach = min(n_bins, len(edges) + 1)
    if n_reach == 1:
        return kplanes_ref[0]

    def sel(lo, hi):
        # the plane for bins in [lo, hi): bin >= mid <=> sq > edges[mid-1]
        if hi - lo == 1:
            return kplanes_ref[lo]
        mid = (lo + hi) // 2
        return jnp.where(sq > edges[mid - 1], sel(mid, hi),
                         sel(lo, mid))

    return sel(0, n_reach)


def _valid_pair_mask(sq, row0, col0, n, params):
    ti, tj = sq.shape
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    valid = (rows != cols) & (rows < n) & (cols < n)
    if params.has_cutoff:
        valid &= sq <= np.float32(params.cutoff_sq)
    return valid


def _tile_sq_distance(coord_row_ref, coord_col_ref):
    rows = coord_row_ref[0]  # (3, T)
    cols = coord_col_ref[0]  # (3, T)
    dx = rows[0][:, None] - cols[0][None, :]
    dy = rows[1][:, None] - cols[1][None, :]
    dz = rows[2][:, None] - cols[2][None, :]
    return dx, dy, dz, dx * dx + dy * dy + dz * dz


def _hessian_ensemble_kernel(params, n, n_tiles, tile, batch_inner,
                             *refs):
    """Identical math to :func:`_hessian_kernel`, with the tabulated
    constants read from the precomputed pair planes instead of
    in-kernel one-hot matmuls.

    Two grid orders (see :func:`_ensemble_setup`):

    * ``batch_inner=False`` — ``(row-tile i, conformer b, rolled col
      j)``: ``j`` innermost so the diagonal-last accumulator trick
      carries per (i, b) in a ``(9, tile)`` scratch.
    * ``batch_inner=True`` — ``(i, j, conformer b)``: the conformer is
      innermost so the ``(n_bins, tile, tile)`` pair-plane block index
      is CONSTANT across the inner loop and Pallas skips its re-fetch
      (the (i, b, j) order re-streams it per conformer — ~2 GB of HBM
      per 128-conformer sdENM call at n=300; measured 7.69 -> 7.45
      ms/iter on the assembly stage — the streams were largely
      overlapped, but the win is free).  The accumulator gains a
      conformer slot: ``(B, 9, tile)`` scratch, dynamically indexed by
      ``b``.
    """
    if params.kind == "table_compact":
        coord_row_ref, coord_col_ref, kplanes_ref = refs[:3]
        out_refs = refs[3:12]
        acc_ref = refs[12]
    else:
        coord_row_ref, coord_col_ref = refs[:2]
        out_refs = refs[2:11]
        acc_ref = refs[11]

    i = pl.program_id(0)
    if batch_inner:
        j = pl.program_id(1)
        bconf = pl.program_id(2)
    else:
        j = pl.program_id(2)
        bconf = 0  # scratch has a single slot

    col_tile = (i + 1 + j) % n_tiles
    row0 = i * tile
    col0 = col_tile * tile

    dx, dy, dz, sq = _tile_sq_distance(coord_row_ref, coord_col_ref)

    valid = _valid_pair_mask(sq, row0, col0, n, params)
    if params.kind == "table_compact":
        k = _planes_tile_constants(sq, params, kplanes_ref)
    else:
        k = _analytic_constants(params.kind, sq)
    k = jnp.where(valid, k, 0.0)
    g = -k / jnp.where(sq == 0, 1.0, sq)
    disp = (dx, dy, dz)

    @pl.when(j == 0)
    def _():
        acc_ref[bconf] = jnp.zeros(acc_ref.shape[1:], acc_ref.dtype)

    is_diag_tile = j == n_tiles - 1
    rows_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, sq.shape, 0)
    cols_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
    eye = rows_ids == cols_ids

    for a in range(3):
        for b in range(3):
            plane = g * disp[a] * disp[b]
            acc_ref[bconf, 3 * a + b, :] += jnp.sum(plane, axis=1)

            @pl.when(jnp.logical_not(is_diag_tile))
            def _(plane=plane, a=a, b=b):
                out_refs[3 * a + b][0] = plane

            @pl.when(is_diag_tile)
            def _(plane=plane, a=a, b=b):
                out_refs[3 * a + b][0] = plane + jnp.where(
                    eye, -acc_ref[bconf, 3 * a + b, :][:, None], 0.0
                )


def _kirchhoff_ensemble_kernel(params, n, n_tiles, tile, batch_inner,
                               *refs):
    if params.kind == "table_compact":
        coord_row_ref, coord_col_ref, kplanes_ref, out_ref, acc_ref = refs
    else:
        coord_row_ref, coord_col_ref, out_ref, acc_ref = refs

    i = pl.program_id(0)
    if batch_inner:
        j = pl.program_id(1)
        bconf = pl.program_id(2)
    else:
        j = pl.program_id(2)
        bconf = 0

    col_tile = (i + 1 + j) % n_tiles
    row0 = i * tile
    col0 = col_tile * tile

    _, _, _, sq = _tile_sq_distance(coord_row_ref, coord_col_ref)

    valid = _valid_pair_mask(sq, row0, col0, n, params)
    if params.kind == "table_compact":
        k = _planes_tile_constants(sq, params, kplanes_ref)
    else:
        k = _analytic_constants(params.kind, sq)
    k = jnp.where(valid, k, 0.0)

    @pl.when(j == 0)
    def _():
        acc_ref[bconf] = jnp.zeros(acc_ref.shape[1:], acc_ref.dtype)

    acc_ref[bconf, 0, :] += jnp.sum(k, axis=1)

    is_diag_tile = j == n_tiles - 1

    @pl.when(jnp.logical_not(is_diag_tile))
    def _():
        out_ref[0] = -k

    @pl.when(is_diag_tile)
    def _():
        rows_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        cols_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        eye = rows_ids == cols_ids
        out_ref[0] = -k + jnp.where(eye, acc_ref[bconf, 0, :][:, None],
                                    0.0)


def _batch_inner_auto(params, batch, tile, n_acc_rows, dtype):
    """Default grid order for the ensemble kernels: conformer-innermost
    whenever there are pair-plane blocks worth reusing (tabulated
    family) and the per-conformer accumulator scratch stays small
    (sublane-padded ``(B, n_acc_rows -> 8k, tile)``)."""
    if params.kind != "table_compact":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    acc_bytes = batch * _round_up(n_acc_rows, 8) * tile * itemsize
    return acc_bytes <= 4 * 1024**2


def _ensemble_setup(coords, params, tile, dtype, interpret,
                    batch_inner, n_acc_rows):
    if not supports_params(params):
        raise ValueError(
            f"Pallas path does not support kind={params.kind!r} "
            f"with overlays={bool(params.overlays)}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    coords = jnp.asarray(coords, dtype=dtype)
    batch, n = coords.shape[0], coords.shape[1]
    if tile is None:
        tile = (_ensemble_tile(n, params.n_bins)
                if params.kind == "table_compact" else _auto_tile(n))
    if batch_inner is None:
        batch_inner = _batch_inner_auto(params, batch, tile, n_acc_rows,
                                        dtype)
    n_pad = _round_up(n, tile)
    n_tiles = n_pad // tile

    coords_t = jnp.zeros((batch, 3, n_pad), dtype=dtype)
    coords_t = coords_t.at[:, :, :n].set(jnp.swapaxes(coords, 1, 2))

    nt = n_tiles
    if batch_inner:
        # grid (i, j, b): conformer innermost — the kplanes block
        # index map omits b, so its fetch is skipped across the whole
        # inner loop (see _hessian_ensemble_kernel).
        in_specs = [
            pl.BlockSpec((1, 3, tile), lambda i, j, b: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 3, tile),
                lambda i, j, b, _nt=nt: (b, 0, (i + 1 + j) % _nt),
                memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 3, tile), lambda i, b, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 3, tile),
                lambda i, b, j, _nt=nt: (b, 0, (i + 1 + j) % _nt),
                memory_space=pltpu.VMEM),
        ]
    inputs = [coords_t, coords_t]
    if params.kind == "table_compact":
        kplanes = pair_constant_planes(params, n, n_pad, jnp.float32)
        if batch_inner:
            kspec = pl.BlockSpec(
                (params.n_bins, tile, tile),
                lambda i, j, b, _nt=nt: (0, i, (i + 1 + j) % _nt),
                memory_space=pltpu.VMEM)
        else:
            kspec = pl.BlockSpec(
                (params.n_bins, tile, tile),
                lambda i, b, j, _nt=nt: (0, i, (i + 1 + j) % _nt),
                memory_space=pltpu.VMEM)
        in_specs.append(kspec)
        inputs.append(kplanes)
    return (interpret, coords, batch, n, n_pad, n_tiles, tile,
            batch_inner, in_specs, inputs)


def hessian_pallas_ensemble(coords, params, tile=None, dtype=jnp.float32,
                            interpret=None, raw_planes=False,
                            batch_inner=None):
    """Batched fused ANM Hessians for a conformer ensemble sharing one
    parameter set: ``(B, n, 3) -> (B, 3n, 3n)`` (xyz plane layout).

    Equivalent to ``vmap(hessian_pallas)`` but with the batch inside the
    kernel grid and — for the tabulated family — all one-hot table work
    hoisted out of the batch via :func:`pair_constant_planes`.  Check
    :func:`supports_ensemble` before calling with tabulated params (the
    planes are O(n_bins * n_pad^2) in HBM).

    ``raw_planes=True`` returns the nine ``(B, n, n)`` component planes
    as a list (``planes[3 a + b][:, p, q] == H[:, a n + p, b n + q]``)
    instead of the concatenated matrix — the input form of the fused
    regularize/stitch prep (:func:`regularize_stitch_pallas`), which
    skips the lane-misaligned nine-way concatenation entirely (the
    concat materializes at offsets ``n``/``2 n`` — not 128-multiples —
    and measured ~2.9 ms of relayout copies at (128, n=300) f32 on
    v5e).  Unsupported with patch overlays (the sparse correction is
    defined on the assembled matrix).
    """
    if params.overlays and supports_params(params):
        from . import assembly, ffparams as _fp

        if raw_planes:
            raise ValueError(
                "raw_planes=True is unsupported with patch overlays — "
                "the sparse overlay correction applies to the "
                "assembled matrix")
        coords = jnp.asarray(coords, dtype=dtype)
        base = hessian_pallas_ensemble(
            coords, _fp.strip_overlays(params), tile=tile, dtype=dtype,
            interpret=interpret, batch_inner=batch_inner)
        corr = jax.vmap(lambda h, c: assembly.overlay_correction_hessian_xyz(
            h, c, params, jnp))
        return corr(base, coords)
    (interpret, coords, batch, n, n_pad, n_tiles, tile, batch_inner,
     in_specs, inputs) = _ensemble_setup(coords, params, tile, dtype,
                                         interpret, batch_inner, 9)

    kernel = functools.partial(
        _hessian_ensemble_kernel, params, n, n_tiles, tile, batch_inner)
    nt = n_tiles
    if batch_inner:
        plane_spec = pl.BlockSpec(
            (1, tile, tile),
            lambda i, j, b, _nt=nt: (b, i, (i + 1 + j) % _nt),
            memory_space=pltpu.VMEM,
        )
        grid = (n_tiles, n_tiles, batch)
        scratch = pltpu.VMEM((batch, 9, tile), dtype)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        plane_spec = pl.BlockSpec(
            (1, tile, tile),
            lambda i, b, j, _nt=nt: (b, i, (i + 1 + j) % _nt),
            memory_space=pltpu.VMEM,
        )
        grid = (n_tiles, batch, n_tiles)
        scratch = pltpu.VMEM((1, 9, tile), dtype)
        semantics = ("parallel", "parallel", "arbitrary")
    planes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[plane_spec] * 9,
        out_shape=[jax.ShapeDtypeStruct((batch, n_pad, n_pad), dtype)] * 9,
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(*inputs)

    if raw_planes:
        # Untruncated (B, n_pad, n_pad) planes (pad region is exactly
        # zero — the in-kernel validity mask zeroes k beyond n): the
        # fused prep reads them directly when its VMEM plan allows,
        # else truncates with aligned offset-0 copies.
        return planes
    if n_pad != n:
        planes = [p[:, :n, :n] for p in planes]
    return jnp.concatenate(
        [
            jnp.concatenate([planes[3 * a + b] for b in range(3)], axis=2)
            for a in range(3)
        ],
        axis=1,
    )


def kirchhoff_pallas_ensemble(coords, params, tile=None,
                              dtype=jnp.float32, interpret=None,
                              batch_inner=None):
    """Batched fused GNM Kirchhoff matrices, ``(B, n, 3) -> (B, n, n)``
    (see :func:`hessian_pallas_ensemble`)."""
    if params.overlays and supports_params(params):
        from . import assembly, ffparams as _fp

        coords = jnp.asarray(coords, dtype=dtype)
        base = kirchhoff_pallas_ensemble(
            coords, _fp.strip_overlays(params), tile=tile, dtype=dtype,
            interpret=interpret, batch_inner=batch_inner)
        corr = jax.vmap(lambda k, c: assembly.overlay_correction_kirchhoff(
            k, c, params, jnp))
        return corr(base, coords)
    (interpret, coords, batch, n, n_pad, n_tiles, tile, batch_inner,
     in_specs, inputs) = _ensemble_setup(coords, params, tile, dtype,
                                         interpret, batch_inner, 1)

    kernel = functools.partial(
        _kirchhoff_ensemble_kernel, params, n, n_tiles, tile,
        batch_inner)
    nt = n_tiles
    if batch_inner:
        out_spec = pl.BlockSpec(
            (1, tile, tile),
            lambda i, j, b, _nt=nt: (b, i, (i + 1 + j) % _nt),
            memory_space=pltpu.VMEM,
        )
        grid = (n_tiles, n_tiles, batch)
        scratch = pltpu.VMEM((batch, 1, tile), dtype)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        out_spec = pl.BlockSpec(
            (1, tile, tile),
            lambda i, b, j, _nt=nt: (b, i, (i + 1 + j) % _nt),
            memory_space=pltpu.VMEM,
        )
        grid = (n_tiles, batch, n_tiles)
        scratch = pltpu.VMEM((1, 1, tile), dtype)
        semantics = ("parallel", "parallel", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n_pad, n_pad), dtype),
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(*inputs)

    if n_pad != n:
        out = out[:, :n, :n]
    return out


# ---------------------------------------------------------------------------
# Fused regularize/equilibrate/stitch prep (assembly planes -> factor input)
# ---------------------------------------------------------------------------

def fused_prep_plan(n, n_pad, mp, itemsize=4, budget=14 * 2**20):
    """Row-tile plan for :func:`regularize_stitch_pallas`.

    Returns ``(tr, truncate)`` — the row-tile edge (a multiple of 8,
    the Mosaic sublane-block granularity; tiles may straddle plane
    bands — the kernel emits a static segment list per tile) and
    whether the raw ``(B, n_pad, n_pad)`` planes must first be
    host-truncated to ``(B, n, n)`` (aligned offset-0 copies) to fit
    the nine double-buffered full-plane VMEM blocks — or ``None`` when
    no configuration fits the budget (callers fall back to the
    concatenate + XLA prep path).
    """
    def lanes(x):
        return _round_up(x, 128)

    def fits(npl, tr):
        planes_v = 9 * npl * lanes(npl) * itemsize * 2
        out_v = tr * lanes(mp) * itemsize * 2
        aux_v = (tr * 128 + 8 * lanes(mp)) * itemsize * 4
        temps = 3 * tr * lanes(mp) * itemsize
        return planes_v + out_v + aux_v + temps <= budget

    for truncate, npl in ((False, n_pad), (True, n)):
        if truncate and n_pad == n:
            break
        for tr in (256, 128, 64, 32, 16, 8):
            if fits(npl, tr):
                return tr, truncate
    return None


def _row_segments(row0, tr, n):
    """Static decomposition of output rows ``[row0, row0 + tr)`` into
    component-plane bands: ``(local_offset, band a, p0, rows)`` tuples
    covering the part below ``3 n`` (identity-padding rows are handled
    separately)."""
    segs = []
    r = row0
    end = min(row0 + tr, 3 * n)
    while r < end:
        a, p = divmod(r, n)
        take = min(end - r, n - p)
        segs.append((r - row0, a, p, take))
        r += take
    return segs


def _regularize_stitch_kernel(n, n_pad, mp, tr, n_row_tiles, *refs):
    """One output row-band of ``reg = S' H S' + (S T sqrt(sigma))
    (S T sqrt(sigma))^T + eye_pad`` straight from the nine assembly
    component planes (``S' = S W`` folds optional mass weights into the
    equilibration diagonal).

    Grid ``(b, i)``: row tile ``i`` covers global rows
    ``[i tr, i tr + tr)`` of the ``(mp, mp)`` output.  ``tr`` is a
    multiple of 8 (Mosaic's sublane block granularity — no divisor of
    an arbitrary ``n`` qualifies), so a tile may straddle component
    plane bands; each unrolled ``i`` gets a STATIC segment list
    (:func:`_row_segments`) of ``(a, p0, rows)`` plane slices plus an
    identity segment for rows past ``3 n``.  The nine plane blocks
    keep block index ``(b, 0, 0)`` so Mosaic fetches them once per
    conformer, not once per row tile.

    Replaces the XLA pipeline's nine-way lane-misaligned concatenation
    (column offsets ``n``/``2 n``) plus the separate scale/pad/rank-6
    pass: one aligned read of the planes, one aligned write of ``reg``.
    The rank-6 null-space term is six VPU broadcast fmas (exact f32 —
    no MXU rounding), and the only relayout left is the in-VMEM lane
    concat of the three scaled column segments.
    """
    plane_refs = refs[:9]
    rows_aux_ref = refs[9]
    cols_aux_ref = refs[10]
    out_ref = refs[11]
    i = pl.program_id(1)
    dtype = out_ref.dtype

    scol = cols_aux_ref[0, 0:1, :]           # (1, mp)   S' columns
    tst = cols_aux_ref[0, 1:7, :]            # (6, mp)   (S T sqrt(s))^T
    srow = rows_aux_ref[0, :, 0:1]           # (tr, 1)   S' rows
    tsr = rows_aux_ref[0, :, 1:7]            # (tr, 6)

    rank = tsr[:, 0:1] * tst[0:1, :]
    for k in range(1, 6):
        rank = rank + tsr[:, k:k + 1] * tst[k:k + 1, :]

    pad_cols = mp - 3 * n
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    for it in range(n_row_tiles):
        row0 = it * tr
        segs = _row_segments(row0, tr, n)
        pad_rows = tr - sum(s[3] for s in segs)

        @pl.when(i == it)
        def _(row0=row0, segs=segs, pad_rows=pad_rows):
            # Two passes over the output ref: store the raw plane
            # pieces at their (misaligned) band offsets first, then
            # scale in place with full-width offset-0 vectors.
            # Mosaic handles masked slice STORES at arbitrary offsets,
            # but cannot broadcast lane-offset slivers and its
            # tpu.concatenate crashes on lane-misaligned operands —
            # so neither a sliced scol broadcast nor an in-VMEM
            # concat of the pieces survives compilation.
            if pad_cols or pad_rows:
                out_ref[0] = jnp.zeros((tr, mp), dtype)
            for lo, a, p0, rows in segs:
                for bc in range(3):
                    out_ref[0, lo:lo + rows, bc * n:(bc + 1) * n] = \
                        plane_refs[3 * a + bc][0][p0:p0 + rows, 0:n]
            # identity rows past 3n enter AFTER the scaling (their
            # scol entries are zero-padded); the rank term is zero
            # there (zero-padded ts rows)
            rows_g = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (tr, mp), 0)
            cols_g = jax.lax.broadcasted_iota(jnp.int32, (tr, mp), 1)
            eye = jnp.where((rows_g == cols_g) & (rows_g >= 3 * n),
                            one, zero)
            out_ref[0] = out_ref[0] * srow * scol + rank + eye


def assembly_prep_plan(n, mp, itemsize=4, budget=14 * 2**20):
    """Row-tile plan for :func:`assembly_stitch_pallas` (the
    assembly-fused prep), or ``None`` when no tile fits the VMEM
    budget.  Unlike :func:`fused_prep_plan` there are no plane blocks
    to hold — the live set is the double-buffered output row band, the
    rank temp, and ~7 ``(tr, n)`` pair-plane temporaries — so the plan
    admits much larger ``n`` than the stitch-from-planes path."""
    def lanes(x):
        return _round_up(x, 128)

    nl = lanes(n)
    for tr in (256, 128, 64, 32, 16, 8):
        # mp is always a multiple of 8 (pallas_linalg.padded_size), so
        # a single exact-cover tile is valid when mp < tr
        tr = min(tr, mp)
        out_v = tr * lanes(mp) * itemsize * 2
        rank_v = tr * lanes(mp) * itemsize
        temps = 7 * tr * nl * itemsize
        aux_v = (tr * 128 + 8 * lanes(mp)) * itemsize * 4
        coords_v = 8 * nl * itemsize * 2
        if out_v + rank_v + temps + aux_v + coords_v <= budget:
            return tr
    return None


def _assembly_stitch_kernel(params, n, mp, tr, n_row_tiles, *refs):
    """One output row-band of the regularized/equilibrated factor input
    computed STRAIGHT from coordinates — the pair planes never touch
    HBM.

    Fuses :func:`_hessian_ensemble_kernel` (single covering column
    tile) with :func:`_regularize_stitch_kernel`: each static row
    segment (:func:`_row_segments`) recomputes its plane rows from the
    row-atom coordinates (packed per-row in ``rows_aux`` lanes 8:11 —
    a lane-offset sliver read at a SMALL static offset, the same
    pattern the rank fmas already use for ``ts``) against the full
    column coordinate vectors, applies the diagonal superelement
    correction in-segment (the single column tile sees the whole row
    sum at once — no rolled-order accumulator), stores the raw pieces
    at their band offsets, then scales in place with full-width
    offset-0 vectors exactly as the stitch kernel does.

    Replaces assembly (414 MB of plane writes at (128, n=300) f32)
    plus the stitch's plane reads (another 414 MB) with one aligned
    write of ``reg`` — the only O(n^2) HBM traffic left in the prep.
    Analytic families only (the tabulated pair-constant planes do not
    fit VMEM alongside the output band).
    """
    coord_ref = refs[0]
    rows_aux_ref = refs[1]
    cols_aux_ref = refs[2]
    out_ref = refs[3]
    i = pl.program_id(1)
    dtype = out_ref.dtype

    # Aux lane layout (see rigid._regularize_equilibrated_direct):
    # rows_aux lanes [0:6] = ts rows, [6] = S' rows, [7] = 0,
    # [8:11] = per-row atom xyz; cols_aux rows [0:6] = ts^T, [6] = 0,
    # [7] = S' columns.  The complementary zeros at 6/7 make the rank-6
    # term ONE MXU dot over the first 8 lanes (the scale cross terms
    # contract against zeros) — measured ~1 ms cheaper per (128, 1024)
    # chunk than six full-width VPU broadcast fmas.  HIGHEST precision:
    # a default bf16 pass would round the O(1) rank entries by ~4e-3.
    scol = cols_aux_ref[0, 7:8, :]           # (1, mp)   S' columns
    srow = rows_aux_ref[0, :, 6:7]           # (tr, 1)   S' rows
    rank = jax.lax.dot_general(
        rows_aux_ref[0][:, 0:8], cols_aux_ref[0][0:8, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    xc = coord_ref[0, 0:1, :]                # (1, n) column atoms
    yc = coord_ref[0, 1:2, :]
    zc = coord_ref[0, 2:3, :]

    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    for it in range(n_row_tiles):
        row0 = it * tr
        segs = _row_segments(row0, tr, n)

        @pl.when(i == it)
        def _(row0=row0, segs=segs):
            out_ref[0] = jnp.zeros((tr, mp), dtype)
            for lo, a, p0, rows in segs:
                xr = rows_aux_ref[0, lo:lo + rows, 8:9]   # (rows, 1)
                yr = rows_aux_ref[0, lo:lo + rows, 9:10]
                zr = rows_aux_ref[0, lo:lo + rows, 10:11]
                dx = xr - xc
                dy = yr - yc
                dz = zr - zc
                sq = dx * dx + dy * dy + dz * dz
                rows_ids = p0 + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, n), 0)
                cols_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, n), 1)
                eye = rows_ids == cols_ids
                valid = ~eye
                if params.has_cutoff:
                    valid &= sq <= np.float32(params.cutoff_sq)
                k = jnp.where(valid,
                              _analytic_constants(params.kind, sq), 0.0)
                g = -k / jnp.where(sq == 0, 1.0, sq)
                disp = (dx, dy, dz)
                da = disp[a]
                for b in range(3):
                    plane = g * da * disp[b]
                    acc = jnp.sum(plane, axis=1, keepdims=True)
                    plane = plane + jnp.where(eye, -acc, zero)
                    out_ref[0, lo:lo + rows, b * n:(b + 1) * n] = plane
            if row0 + tr > 3 * n:
                # identity padding exists only in this tile's rows —
                # tiles fully below 3n skip the iota/select work
                rows_g = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tr, mp), 0)
                cols_g = jax.lax.broadcasted_iota(
                    jnp.int32, (tr, mp), 1)
                eyep = jnp.where(
                    (rows_g == cols_g) & (rows_g >= 3 * n), one, zero)
                out_ref[0] = out_ref[0] * srow * scol + rank + eyep
            else:
                out_ref[0] = out_ref[0] * srow * scol + rank


def assembly_stitch_pallas(coords_t, params, rows_aux, cols_aux, n, mp,
                           tr, interpret=None):
    """Assembly-fused prep: ``(B, 3, n)`` transposed coordinates ->
    identity-padded, null-space-regularized, Jacobi-equilibrated
    ``(B, mp, mp)`` factor input in ONE kernel (see
    :func:`_assembly_stitch_kernel`;
    ``rigid._regularize_equilibrated_direct`` packs the aux arrays —
    ``rows_aux`` is ``(B, n_rows, 16)`` with lanes ``[0]`` = scaled
    rows, ``[1:7]`` = ts rows, ``[8:11]`` = per-row atom coordinates).
    Analytic families without overlays only.
    """
    if params.kind not in ("invariant", "hinsen", "pfenm") \
            or params.overlays:
        raise ValueError(
            f"assembly_stitch_pallas supports analytic families "
            f"without overlays, got kind={params.kind!r} "
            f"overlays={bool(params.overlays)}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = coords_t.shape[0]
    dtype = coords_t.dtype
    if tr % 8:
        raise ValueError(f"tr={tr} must be a multiple of 8 (Mosaic "
                         f"sublane block granularity)")
    n_row_tiles = -(-mp // tr)
    if rows_aux.shape != (batch, n_row_tiles * tr, 16):
        raise ValueError(
            f"rows_aux must be (B, n_row_tiles * tr, 16) = "
            f"({batch}, {n_row_tiles * tr}, 16), got {rows_aux.shape}")

    kernel = functools.partial(
        _assembly_stitch_kernel, params, n, mp, tr, n_row_tiles)
    return pl.pallas_call(
        kernel,
        grid=(batch, n_row_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 16), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, mp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, mp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, mp, mp), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(coords_t, rows_aux, cols_aux)


def regularize_stitch_pallas(planes, n, rows_aux, cols_aux, mp, tr,
                             interpret=None):
    """Fused prep: nine raw assembly planes -> identity-padded,
    null-space-regularized, Jacobi-equilibrated ``(B, mp, mp)`` factor
    input (see :func:`_regularize_stitch_kernel`;
    ``rigid._regularize_equilibrated_planes`` builds the packed aux
    vectors and is the semantic twin of
    ``rigid._regularize_equilibrated(pad_to=mp)``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, n_pad = planes[0].shape[0], planes[0].shape[-1]
    dtype = planes[0].dtype
    if tr % 8:
        raise ValueError(f"tr={tr} must be a multiple of 8 (Mosaic "
                         f"sublane block granularity)")
    n_row_tiles = -(-mp // tr)
    if rows_aux.shape != (batch, n_row_tiles * tr, 8):
        raise ValueError(
            f"rows_aux must be (B, n_row_tiles * tr, 8) = "
            f"({batch}, {n_row_tiles * tr}, 8), got {rows_aux.shape}")

    kernel = functools.partial(
        _regularize_stitch_kernel, n, n_pad, mp, tr, n_row_tiles)
    plane_spec = pl.BlockSpec((1, n_pad, n_pad), lambda b, i: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(batch, n_row_tiles),
        in_specs=[plane_spec] * 9 + [
            pl.BlockSpec((1, tr, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, mp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, mp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, mp, mp), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*planes, rows_aux, cols_aux)

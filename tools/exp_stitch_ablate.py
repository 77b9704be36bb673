"""Ablation micro-bench of the assembly-fused stitch kernel
(`pallas_kernels._assembly_stitch_kernel`): which part of the ~4.7 ms
at (128, n=300, mp=1024) is misaligned segment stores vs the rank/eye/
scale full-width pass vs the in-kernel pair-plane compute.

Variants (loop-chained, floor-differenced like profile_headline):
  full        — the production kernel
  nostore     — compute planes but store only into a fixed aligned slot
  nocompute   — store precomputed constants at the misaligned offsets
  noscale     — skip the rank/eye/scale full-width pass
  writeonly   — zero-init + scale pass only (no segments at all)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from springcraft_tpu.ops import ffparams, pallas_kernels, pallas_linalg
from springcraft_tpu.ops.pallas_kernels import (_analytic_constants,
                                                _row_segments)

B, N = 128, 300
MP = pallas_linalg.padded_size(3 * N)
TR = pallas_kernels.assembly_prep_plan(N, MP, 4)
CHAIN = 6
PARAMS = ffparams.invariant_params(13.0)


def kernel(variant, n, mp, tr, n_row_tiles, *refs):
    coord_ref, rows_aux_ref, cols_aux_ref, out_ref = refs
    i = pl.program_id(1)
    dtype = out_ref.dtype

    scol = cols_aux_ref[0, 0:1, :]
    tst = cols_aux_ref[0, 1:7, :]
    srow = rows_aux_ref[0, :, 0:1]
    tsr = rows_aux_ref[0, :, 1:7]

    rank = tsr[:, 0:1] * tst[0:1, :]
    for kk in range(1, 6):
        rank = rank + tsr[:, kk:kk + 1] * tst[kk:kk + 1, :]

    xc = coord_ref[0, 0:1, :]
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
            if variant != "writeonly":
                for lo, a, p0, rows in segs:
                    if variant == "nocompute":
                        plane = jnp.full((rows, n), 0.5, dtype)
                    else:
                        xr = rows_aux_ref[0, lo:lo + rows, 8:9]
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
                        valid &= sq <= np.float32(PARAMS.cutoff_sq)
                        k = jnp.where(
                            valid, _analytic_constants("invariant", sq),
                            0.0)
                        g = -k / jnp.where(sq == 0, 1.0, sq)
                        disp = (dx, dy, dz)
                        da = disp[a]
                    for b in range(3):
                        if variant != "nocompute":
                            plane = g * da * disp[b]
                            acc = jnp.sum(plane, axis=1, keepdims=True)
                            plane = plane + jnp.where(eye, -acc, zero)
                        if variant == "nostore":
                            out_ref[0, lo:lo + rows, 0:n] = plane
                        else:
                            out_ref[0, lo:lo + rows,
                                    b * n:(b + 1) * n] = plane
            if variant != "noscale":
                rows_g = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tr, mp), 0)
                cols_g = jax.lax.broadcasted_iota(
                    jnp.int32, (tr, mp), 1)
                eyep = jnp.where((rows_g == cols_g) & (rows_g >= 3 * n),
                                 one, zero)
                out_ref[0] = out_ref[0] * srow * scol + rank + eyep


def run_variant(variant, coords_t, rows_aux, cols_aux):
    n_row_tiles = -(-MP // TR)
    kern = functools.partial(kernel, variant, N, MP, TR, n_row_tiles)
    call = pl.pallas_call(
        kern,
        grid=(B, n_row_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 16), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, MP), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, MP), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, MP, MP), jnp.float32),
    )

    def chained(ct, ra, ca):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = call(ct, ra, ca)
            acc = acc + jnp.sum(out[:, ::97, ::97])
            ct = ct + acc * jnp.float32(1e-30)
        return acc

    prog = jax.jit(chained)
    t0 = time.perf_counter()
    float(prog(coords_t, rows_aux, cols_aux))
    comp = time.perf_counter() - t0
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(prog(coords_t, rows_aux, cols_aux))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{variant:10s}: {best * 1e3:7.2f} ms/iter "
          f"(compile {comp:5.1f}s)", flush=True)


def main():
    rng = np.random.RandomState(0)
    spread = (N / (300 / 34.0 ** 3)) ** (1 / 3.0)
    coords = (rng.rand(B, N, 3) * spread).astype(np.float32)
    coords_t = jnp.asarray(np.swapaxes(coords, 1, 2))
    n_rows = -(-MP // TR) * TR
    rows_aux = jnp.asarray(rng.rand(B, n_rows, 16).astype(np.float32))
    cols_aux = jnp.asarray(rng.rand(B, 8, MP).astype(np.float32))
    print(f"B={B} N={N} MP={MP} TR={TR}")
    for variant in ("full", "nostore", "nocompute", "noscale",
                    "writeonly"):
        run_variant(variant, coords_t, rows_aux, cols_aux)


if __name__ == "__main__":
    main()

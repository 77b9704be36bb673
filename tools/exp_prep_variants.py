"""
Prep-stage (regularize + equilibrate + pad) variants at the headline
shape (B=128, m=900 -> mp=1024): the measured 5.9 ms is ~5x the
read-mat + write-reg HBM roofline (~1.2 ms), because the rank-6
``ts @ ts^T`` lowers to a batched dot_general whose (B, mp, mp) output
XLA materializes instead of fusing into the elementwise scale pass.

Variants:
  matmul   — production form (jnp.matmul, precision=HIGHEST)
  bcast    — sum of 6 explicit broadcast multiplies (contraction-free,
             exact f32, should fuse into ONE loop kernel with the
             scale products, the pad, and the identity mask)
  bcast-stack — same but via a single stacked multiply + sum(axis)

Each variant runs loop-chained inside one jitted program (chain=6) so
the ~28 ms relay floor amortizes; floor differenced.  Also prints the
max abs deviation vs the matmul form.

Usage: python tools/exp_prep_variants.py [B] [m] [reps]
"""

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

from springcraft_tpu.ops import pallas_linalg, rigid

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
M = int(sys.argv[2]) if len(sys.argv) > 2 else 900
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
CHAIN = 6
K = 6


def make_inputs(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, M, M).astype(np.float32) / np.sqrt(M)
    mat = (np.einsum("bij,bkj->bik", x, x)
           + np.eye(M, dtype=np.float32)[None])
    t = rng.randn(B, M, K).astype(np.float32)
    t, _ = np.linalg.qr(t)
    return jnp.asarray(mat), jnp.asarray(t.astype(np.float32))


def prep_matmul(mat, t):
    reg, scale, sigma = rigid._regularize_equilibrated(
        mat, t, None, pad_to=pallas_linalg.padded_size(M))
    return reg, scale


def prep_bcast(mat, t):
    mp = pallas_linalg.padded_size(M)
    diag_m = jnp.diagonal(mat, axis1=-2, axis2=-1)
    sigma = jnp.mean(diag_m, axis=-1)[..., None, None]
    tn2 = jnp.sum(t * t, axis=-1)
    scale = jax.lax.rsqrt(diag_m + sigma[..., 0] * tn2)
    ts = t * (scale * jnp.sqrt(sigma[..., 0]))[..., None]
    pad = mp - M
    mat_p = jnp.pad(mat, ((0, 0), (0, pad), (0, pad)))
    sc_p = jnp.pad(scale, ((0, 0), (0, pad)), constant_values=1.0)
    ts_p = jnp.pad(ts, ((0, 0), (0, pad), (0, 0)))
    idx = jnp.arange(mp)
    eye_pad = ((idx[:, None] == idx[None, :])
               & (idx[:, None] >= M)).astype(mat.dtype)
    reg = mat_p * sc_p[..., :, None] * sc_p[..., None, :] + eye_pad
    for k in range(K):
        reg = reg + ts_p[..., :, k, None] * ts_p[..., None, :, k]
    return reg, scale


def prep_bcast_stack(mat, t):
    mp = pallas_linalg.padded_size(M)
    diag_m = jnp.diagonal(mat, axis1=-2, axis2=-1)
    sigma = jnp.mean(diag_m, axis=-1)[..., None, None]
    tn2 = jnp.sum(t * t, axis=-1)
    scale = jax.lax.rsqrt(diag_m + sigma[..., 0] * tn2)
    ts = t * (scale * jnp.sqrt(sigma[..., 0]))[..., None]
    pad = mp - M
    mat_p = jnp.pad(mat, ((0, 0), (0, pad), (0, pad)))
    sc_p = jnp.pad(scale, ((0, 0), (0, pad)), constant_values=1.0)
    ts_p = jnp.pad(ts, ((0, 0), (0, pad), (0, 0)))
    idx = jnp.arange(mp)
    eye_pad = ((idx[:, None] == idx[None, :])
               & (idx[:, None] >= M)).astype(mat.dtype)
    rank = jnp.sum(ts_p[..., :, None, :] * ts_p[..., None, :, :],
                   axis=-1)
    return (mat_p * sc_p[..., :, None] * sc_p[..., None, :]
            + rank + eye_pad), scale


def timed(name, fn, inputs):
    def chained(args):
        mat, t = args
        acc = jnp.float32(0.0)
        for i in range(CHAIN):
            reg, scale = fn(mat + acc * 1e-30, t)
            acc = acc + reg[0, 0, 0] + jnp.sum(scale[0])
        return acc

    prog = jax.jit(chained)
    t0 = time.perf_counter()
    float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(c))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:16s}: {best / CHAIN * 1e3:7.2f} ms/iter "
          f"(chain total {best * 1e3:7.2f} ms, compile {compile_s:5.1f}s)",
          flush=True)
    return best / CHAIN


def main():
    print(f"backend={jax.default_backend()} B={B} m={M} chain={CHAIN}")
    inputs = [make_inputs(s) for s in range(REPS + 1)]

    # correctness cross-check first (small tolerance: HIGHEST matmul vs
    # exact-f32 broadcast differ only in summation order over k=6)
    ra, _ = jax.jit(prep_matmul)(*inputs[0])
    rb, _ = jax.jit(prep_bcast)(*inputs[0])
    rc, _ = jax.jit(prep_bcast_stack)(*inputs[0])
    dev_b = float(jnp.max(jnp.abs(ra - rb)))
    dev_c = float(jnp.max(jnp.abs(ra - rc)))
    print(f"max |matmul - bcast| = {dev_b:.3e}, "
          f"|matmul - bcast_stack| = {dev_c:.3e}")

    def floor_fn(args):
        return args[0][0, 0, 0] + args[1][0, 0, 0]
    prog = jax.jit(floor_fn)
    float(prog(inputs[0]))
    t0 = time.perf_counter()
    float(prog(inputs[1]))
    floor = time.perf_counter() - t0
    print(f"relay floor ~{floor * 1e3:.1f} ms (whole-chain overhead; "
          f"divide by chain={CHAIN} per iter)")

    timed("matmul (prod)", prep_matmul, inputs)
    timed("bcast x6", prep_bcast, inputs)
    timed("bcast stacked", prep_bcast_stack, inputs)


if __name__ == "__main__":
    main()

"""
Layout variants for the plane-trace Gram contraction
(`rigid.covariance_plane_traces` final stage) at the headline shape —
w is the scaled inverse factor (B, mp, m) with mp = 1024, m = 900,
n = 300; traces[i, j] = sum_a sum_k w[k, a n + i] w[k, a n + j].

Loop-chained device programs (relay floor amortized); each variant is
checked against the baseline einsum on the first input.

Usage: python tools/exp_trace_variants.py [B] [N] [reps] [chain]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CHAIN = int(sys.argv[4]) if len(sys.argv) > 4 else 16

M = 3 * N
MP = -(-M // 128) * 128
HI = jax.lax.Precision.HIGHEST


def make(seed):
    rng = np.random.RandomState(seed)
    w = rng.randn(B, MP, MP).astype(np.float32) / np.sqrt(MP)
    w[:, :, M:] = 0.0  # scaled factor: padding columns zeroed
    return jnp.asarray(w)


def v_baseline(w):
    """Current production form: slice to m, reshape-split minor dim."""
    wc = w[..., :M].reshape(w.shape[:-1] + (3, N))
    return jnp.einsum("...kan,...kam->...nm", wc, wc, precision=HI)


def v_pad384(w):
    """Split planes, zero-pad n -> 384 lanes, aligned Gram, slice."""
    npad = -(-N // 128) * 128
    wc = w[..., :M].reshape(w.shape[:-1] + (3, N))
    wc = jnp.pad(wc, ((0, 0), (0, 0), (0, 0), (0, npad - N)))
    tr = jnp.einsum("...kan,...kam->...nm", wc, wc, precision=HI)
    return tr[..., :N, :N]


def v_merge_rows(w):
    """Fold the plane axis into the contraction dim explicitly:
    (B, mp, 3, n) -> transpose -> (B, 3 mp, n) single Gram."""
    wc = w[..., :M].reshape(w.shape[:-1] + (3, N))
    wt = jnp.moveaxis(wc, -2, -3).reshape(w.shape[0], 3 * w.shape[1], N)
    return jnp.einsum("...kn,...km->...nm", wt, wt, precision=HI)


def v_three_slices(w):
    """Three sliced Grams, no reshape of the minor dim."""
    acc = None
    for a in range(3):
        wa = w[..., a * N:(a + 1) * N]
        g = jnp.einsum("...kn,...km->...nm", wa, wa, precision=HI)
        acc = g if acc is None else acc + g
    return acc


def v_onehot_pack(w):
    """Pack planes into aligned 384-wide columns by a one-hot matmul
    (MXU relayout instead of vector copies), then one aligned Gram."""
    npad = -(-N // 128) * 128
    # P[(a n + i), (a npad + i)] = 1 : (mp, 3 npad) one-hot
    src = np.arange(M)
    dst = (src // N) * npad + (src % N)
    p = np.zeros((MP, 3 * npad), np.float32)
    p[src, dst] = 1.0
    pj = jnp.asarray(p)
    wp = jnp.einsum("...km,...mq->...kq", w[..., :MP], pj[None],
                    precision=HI)
    wc = wp.reshape(w.shape[:-1] + (3, npad))
    tr = jnp.einsum("...kan,...kam->...nm", wc, wc, precision=HI)
    return tr[..., :N, :N]


def v_three_slices_pad(w):
    """Sliced Grams with each slice lane-padded to 384 (aligned
    output), accumulated padded, sliced once at the end."""
    npad = -(-N // 128) * 128
    acc = None
    for a in range(3):
        wa = w[..., a * N:(a + 1) * N]
        wa = jnp.pad(wa, ((0, 0), (0, 0), (0, npad - N)))
        g = jnp.einsum("...kn,...km->...nm", wa, wa, precision=HI)
        acc = g if acc is None else acc + g
    return acc[..., :N, :N]


def timed(name, fn, inputs, ref_out):
    def chained(w):
        acc = jnp.float32(0.0)
        x = w
        for _ in range(CHAIN):
            t = fn(x)
            acc = acc + jnp.sum(t)
            x = x + (acc * jnp.float32(1e-30))
        return acc

    out = fn(inputs[0])
    err = float(jnp.max(jnp.abs(out - ref_out))
                / (jnp.max(jnp.abs(ref_out)) + 1e-30))
    prog = jax.jit(chained)
    t0 = time.perf_counter()
    float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for w in inputs[1:]:
        t0 = time.perf_counter()
        float(prog(w))
        times.append(time.perf_counter() - t0)
    best = min(times) / CHAIN
    print(f"{name:16s}: {best * 1e3:8.3f} ms/call  relerr {err:.1e} "
          f"(compile {compile_s:5.1f}s)", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} mp={MP} "
          f"chain={CHAIN}")
    inputs = [make(s) for s in range(REPS + 1)]
    ref = v_baseline(inputs[0])
    for name, fn in [("baseline", v_baseline), ("pad384", v_pad384),
                     ("merge_rows", v_merge_rows),
                     ("three_slices", v_three_slices),
                     ("onehot_pack", v_onehot_pack),
                     ("three_slices_pad", v_three_slices_pad)]:
        timed(name, fn, inputs, ref)


if __name__ == "__main__":
    main()

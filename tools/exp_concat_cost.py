"""Is the recursive factor's missing time really the per-level concat
materialization?  Three probes at the pipeline shape (B=128, mp=1024),
floor-differenced:

1. the production factor (pre-padded input, as the pipeline feeds it);
2. the same recursion with the TOP-level concat skipped (parts
   returned separately — the parent never exists here, so this is the
   only concat a probe can elide without rewriting the consumers);
3. the three top-level concats alone on materialized parts.

Usage: python tools/exp_concat_cost.py [B] [reps]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.realpath(__file__)), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np
from springcraft_tpu.ops import pallas_linalg as pli

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
MP = 1024

def make_spd(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, MP, MP).astype(np.float32) / np.sqrt(MP)
    a = np.einsum("bij,bkj->bik", x, x) + np.eye(MP, dtype=np.float32)[None]
    return jnp.asarray(a)

def timed(name, fn, inputs):
    prog = jax.jit(lambda c: jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), fn(c), jnp.float32(0.0)))
    t0 = time.perf_counter(); float(prog(inputs[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for c in inputs[1:]:
        t0 = time.perf_counter(); float(prog(c))
        times.append(time.perf_counter() - t0)
    print(f"{name:30s}: {min(times)*1e3:8.2f} ms/call "
          f"(compile {compile_s:5.1f}s)", flush=True)
    return min(times)

def factor_parts(a):
    """Level-0 of the recursion with the top concat skipped."""
    h = 512
    g11 = pli._recursive_inverse_factor(a[:, :h, :h], 64, False)
    l21, s22 = pli._schur_lower(a, h, g11, pli._HIGH)
    g22 = pli._recursive_inverse_factor(s22, 64, False)
    g21 = -pli._tri_left_mm(g22, pli._tri_right_mm(l21, g11, pli._HIGH),
                            pli._HIGH)
    return g11, g21, g22

def concat_only(a):
    g11 = a[:, :512, :512] * 0.5
    g21 = a[:, 512:, :512] * 0.25
    g22 = a[:, 512:, 512:] * 0.125
    top = jnp.concatenate(
        [g11, jnp.zeros((B, 512, 512), jnp.float32)], axis=2)
    bot = jnp.concatenate([g21, g22], axis=2)
    return jnp.concatenate([top, bot], axis=1)

def main():
    print(f"backend={jax.default_backend()} B={B} mp={MP}")
    inputs = [make_spd(s) for s in range(REPS + 1)]
    floor = timed("floor (sum only)", lambda a: jnp.sum(a[:, 0, 0]), inputs)
    full = timed("factor (prod, prepadded)",
                 lambda a: pli._recursive_inverse_factor(a, 64, False),
                 inputs)
    parts = timed("factor minus top concat", factor_parts, inputs)
    cat = timed("top 3-concat alone", concat_only, inputs)
    print(f"top-concat attributable: {(full - parts)*1e3:.2f} ms; "
          f"standalone concat cost {(cat - floor)*1e3:.2f} ms")

if __name__ == "__main__":
    main()

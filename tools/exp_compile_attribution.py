"""Attribute the ~300 s remote compile of the 30k-dim shift-invert
modes program to its constituent ops (AOT lower+compile, no execution).

Run on the real TPU: `python tools/exp_compile_attribution.py [m]`.
Each candidate program is lowered and compiled standalone so the
remote-compiler cost of cholesky / triangular solves / QR / the full
fori_loop can be differenced.  Findings land in docs/performance.md.
"""

import sys
import time

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def time_compile(name, fn, *avals):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*avals)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    compile_s = time.perf_counter() - t0
    print(f"{name:32s} lower {lower_s:6.1f}s  compile {compile_s:7.1f}s",
          flush=True)
    return compile_s


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    p = 24 + 24  # k+4 buffer, oversample max(k,8) -> 2*24 at k=20+4
    f32 = jnp.float32
    a_mm = jax.ShapeDtypeStruct((m, m), f32)
    a_mp = jax.ShapeDtypeStruct((m, p), f32)
    a_m6 = jax.ShapeDtypeStruct((m, 6), f32)

    time_compile("cholesky(m,m)", jnp.linalg.cholesky, a_mm)
    time_compile("cho_solve(m,p)",
                 lambda c, x: jsl.cho_solve((c, True), x), a_mm, a_mp)
    time_compile("qr(m,p)", lambda x: jnp.linalg.qr(x)[0], a_mp)
    time_compile("matmul m,m@m,p",
                 lambda h, x: jnp.matmul(h, x, precision="highest"),
                 a_mm, a_mp)

    def iter_loop(chol, t, x):
        def deflate(v):
            return v - t @ (t.T @ v)

        def step(_, x):
            y = deflate(jsl.cho_solve((chol, True), x))
            q, _ = jnp.linalg.qr(y)
            return q

        return jax.lax.fori_loop(0, 24, step, x)

    time_compile("fori(24): solve+deflate+qr", iter_loop, a_mm, a_m6,
                 a_mp)

    def full(matrix, t, x):
        sigma = jnp.mean(jnp.diagonal(matrix))
        reg = matrix + sigma * (t @ t.T)
        scale = 1.0 / jnp.sqrt(jnp.diagonal(reg))
        reg = reg * scale[:, None] * scale[None, :]
        chol = jnp.linalg.cholesky(reg)

        def deflate(v):
            return v - t @ (t.T @ v)

        def step(_, x):
            y = scale[:, None] * jsl.cho_solve((chol, True),
                                               scale[:, None] * x)
            q, _ = jnp.linalg.qr(deflate(y))
            return q

        x = jax.lax.fori_loop(0, 24, step, x)
        hx = jnp.matmul(matrix, x, precision="highest")
        s = jnp.matmul(x.T, hx, precision="highest")
        vals, w = jnp.linalg.eigh((s + s.T) / 2)
        return vals, x @ w

    time_compile("full shift-invert program", full, a_mm, a_m6, a_mp)


if __name__ == "__main__":
    main()

"""Profiling/config utility tests."""

import numpy as np

from springcraft_tpu.utils import Timer, resolve_backend, synchronize, timed
from springcraft_tpu.utils.config import x64_enabled


def test_resolve_backend():
    assert x64_enabled()  # conftest enables x64
    assert resolve_backend(np.float64) == "jax"
    assert resolve_backend(np.float32) == "jax"


def test_timer_and_synchronize():
    import jax.numpy as jnp

    timer = Timer()
    with timer("matmul", sync=None):
        a = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    synchronize({"a": a, "b": [a, None]})
    assert timer.counts["matmul"] == 1
    assert timer.totals["matmul"] >= 0

    import io

    buf = io.StringIO()
    timer.report(stream=buf)
    assert "matmul" in buf.getvalue()


def test_timed():
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x * 2.0)
    seconds, result = timed(fn, jnp.arange(8.0), repeats=2)
    assert seconds >= 0
    assert np.allclose(np.asarray(result), np.arange(8.0) * 2)

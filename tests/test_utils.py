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


def test_connected_components(ca_1l2y):
    from springcraft_tpu.utils.network import connected_components, is_connected

    # Real protein at a sane cutoff is one component
    assert is_connected(ca_1l2y.coord, 13.0)

    # Two distant clusters -> two components
    coords = np.concatenate(
        [ca_1l2y.coord, ca_1l2y.coord + np.float32(500.0)]
    )
    assert not is_connected(coords, 13.0)

    diff = coords[:, None, :] - coords[None, :, :]
    adj = np.einsum("ijk,ijk->ij", diff, diff) <= 169.0
    np.fill_diagonal(adj, False)
    labels, count = connected_components(adj)
    assert count == 2
    assert len(np.unique(labels[:20])) == 1
    assert labels[0] != labels[20]


def test_enable_nan_checks_toggle():
    import jax

    from springcraft_tpu.utils.config import enable_nan_checks

    try:
        enable_nan_checks(True)
        assert jax.config.jax_debug_nans
    finally:
        enable_nan_checks(False)
    assert not jax.config.jax_debug_nans

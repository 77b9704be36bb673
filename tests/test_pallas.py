"""
Pallas kernel parity tests (interpreter mode on CPU): the fused tiled
assembly must match the XLA dense path at float32 precision for every
supported force-field family, including padded (non-tile-divisible)
sizes and the compact tabulated family.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.ops import assembly, ffparams, pallas_kernels


def _rel_err(test, ref):
    scale = max(float(np.max(np.abs(ref))), 1e-12)
    return float(np.max(np.abs(test - ref))) / scale


@pytest.fixture(scope="module")
def coords():
    rng = np.random.RandomState(0)
    return (rng.rand(100, 3) * 12).astype(np.float32)


@pytest.mark.parametrize(
    "make_params",
    [
        lambda: ffparams.invariant_params(8.0),
        lambda: ffparams.hinsen_params(),
        lambda: ffparams.pfenm_params(),
        lambda: ffparams.hinsen_params(9.0),
    ],
)
@pytest.mark.parametrize("tile", [32, 64])
def test_hessian_analytic(coords, make_params, tile):
    params = make_params()
    ref = np.asarray(
        assembly.hessian_matrix(coords.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(coords, params, tile=tile,
                                      interpret=True)
    )
    assert test.shape == ref.shape
    assert _rel_err(test, ref) < 1e-6


@pytest.mark.parametrize("tile", [32])
def test_kirchhoff_analytic(coords, tile):
    for params in (ffparams.invariant_params(8.0), ffparams.pfenm_params()):
        ref = np.asarray(
            assembly.kirchhoff_matrix(coords.astype(np.float64), params,
                                      jnp)
        ).astype(np.float32)
        test = np.asarray(
            pallas_kernels.kirchhoff_pallas(coords, params, tile=tile,
                                            interpret=True)
        )
        assert _rel_err(test, ref) < 1e-6


@pytest.fixture(scope="module")
def shifted_two_chain(ca_1l2y):
    first = ca_1l2y.copy()
    second = ca_1l2y.copy()
    first.chain_id[:] = "A"
    second.chain_id[:] = "B"
    second.coord = second.coord + np.float32(8.0)
    return first + second


@pytest.mark.parametrize("maker", ["e_anm", "sd_enm", "s_enm_10"])
def test_hessian_tabulated_compact(shifted_two_chain, maker):
    ff = getattr(sc.TabulatedForceField, maker)(shifted_two_chain)
    params = ff.to_compact_params()
    coord = shifted_two_chain.coord

    ref = np.asarray(
        assembly.hessian_matrix(coord.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(coord, params, tile=16,
                                      interpret=True)
    )
    assert _rel_err(test, ref) < 1e-5

    kref = np.asarray(
        assembly.kirchhoff_matrix(coord.astype(np.float64), params, jnp)
    ).astype(np.float32)
    ktest = np.asarray(
        pallas_kernels.kirchhoff_pallas(coord, params, tile=16,
                                        interpret=True)
    )
    assert _rel_err(ktest, kref) < 1e-5


def test_padding(coords):
    """Non-tile-divisible n exercises the pad + slice path."""
    params = ffparams.invariant_params(8.0)
    sub = coords[:70]
    ref = np.asarray(
        assembly.hessian_matrix(sub.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(sub, params, tile=32, interpret=True)
    )
    assert test.shape == (210, 210)
    assert _rel_err(test, ref) < 1e-6


def test_unsupported_params_raise(coords):
    params = ffparams.table_pair_params(np.zeros((100, 100, 1)), None)
    with pytest.raises(ValueError):
        pallas_kernels.hessian_pallas(coords, params)
    assert not pallas_kernels.supports_params(params)

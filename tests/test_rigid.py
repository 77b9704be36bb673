"""
Fast-covariance path tests: analytic rigid-body null modes and the
regularized Cholesky pseudo-inverse must reproduce the eigh-based
reference results.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.ops import assembly, ffparams, rigid
from springcraft_tpu.parallel import anm_fluctuations, gnm_fluctuations


def test_rigid_modes_span_nullspace(ca_1l2y):
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    basis = np.asarray(rigid.rigid_modes_anm(coord, layout="xyz"))

    assert basis.shape == (3 * len(coord), 6)
    # Orthonormal
    assert np.allclose(basis.T @ basis, np.eye(6), atol=1e-10)
    # Annihilated by the Hessian
    assert np.max(np.abs(h @ basis)) < 1e-8


def test_rigid_modes_mass_weighted(ca_1l2y):
    params = ffparams.hinsen_params()
    coord = ca_1l2y.coord.astype(np.float64)
    masses = np.linspace(60.0, 180.0, len(coord))

    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    w3 = np.tile(1.0 / np.sqrt(masses), 3)
    h_mw = h * np.outer(w3, w3)
    basis = np.asarray(
        rigid.rigid_modes_anm(coord, masses=jnp.asarray(masses),
                              layout="xyz")
    )
    assert np.max(np.abs(h_mw @ basis)) < 1e-8


def test_covariance_cholesky_matches_pinv(ca_1l2y):
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    basis = rigid.rigid_modes_anm(coord, layout="xyz")

    fast = np.asarray(rigid.covariance_cholesky(jnp.asarray(h), basis))
    ref = np.linalg.pinv(h, hermitian=True, rcond=1e-6)
    assert np.allclose(fast, ref, atol=1e-8)


def test_gnm_null_mode_and_covariance(ca_1l2y):
    params = ffparams.invariant_params(7.0)
    coord = ca_1l2y.coord.astype(np.float64)
    k = np.asarray(assembly.kirchhoff_matrix(coord, params, jnp))

    basis = rigid.null_mode_gnm(len(coord), dtype=jnp.float64)
    assert np.max(np.abs(k @ np.asarray(basis))) < 1e-10

    fast = np.asarray(rigid.covariance_cholesky(jnp.asarray(k), basis))
    ref = np.linalg.pinv(k, hermitian=True, rcond=1e-6)
    assert np.allclose(fast, ref, atol=1e-9)


def test_anm_fluctuations_match_model(ca_1l2y):
    ff = sc.InvariantForceField(13.0)
    out = anm_fluctuations(
        ca_1l2y.coord.astype(np.float64), ff.to_params(),
        with_dcc=True, with_prs=True, dtype=jnp.float64,
    )
    anm = sc.ANM(ca_1l2y, ff)
    assert np.allclose(out["msf"], anm.mean_square_fluctuation(),
                       atol=1e-8)
    assert np.allclose(out["bfactor"], anm.bfactor(), atol=1e-7)
    assert np.allclose(out["dcc"], anm.dcc(), atol=1e-8)

    prs_ref, eff_ref, sens_ref = anm.prs_effector_sensor()
    assert np.allclose(out["prs"], prs_ref, atol=1e-8)
    assert np.allclose(out["effector"], eff_ref, atol=1e-8)
    assert np.allclose(out["sensor"], sens_ref, atol=1e-8)


def test_anm_fluctuations_mass_weighted(ca_1l2y):
    ff = sc.HinsenForceField()
    masses = np.linspace(60.0, 180.0, len(ca_1l2y))
    out = anm_fluctuations(
        ca_1l2y.coord.astype(np.float64), ff.to_params(),
        masses=jnp.asarray(masses), dtype=jnp.float64,
    )
    anm = sc.ANM(ca_1l2y, ff, masses=masses)
    assert np.allclose(out["msf"], anm.mean_square_fluctuation(),
                       atol=1e-8)


def test_gnm_fluctuations_match_model(ca_1l2y):
    ff = sc.InvariantForceField(7.0)
    out = gnm_fluctuations(
        ca_1l2y.coord.astype(np.float64), ff.to_params(),
        dtype=jnp.float64,
    )
    gnm = sc.GNM(ca_1l2y, ff)
    assert np.allclose(out["msf"], gnm.mean_square_fluctuation(),
                       atol=1e-9)
    assert np.allclose(out["dcc"], gnm.dcc(), atol=1e-9)


def test_covariance_cholesky_blocked(ca_1l2y):
    """The blocked right-hand-side variant must equal the full solve."""
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    basis = rigid.rigid_modes_anm(coord, layout="xyz")

    full = np.asarray(rigid.covariance_cholesky(jnp.asarray(h), basis))
    blocked = np.asarray(
        rigid.covariance_cholesky(jnp.asarray(h), basis, block_size=12)
    )
    assert np.allclose(full, blocked, atol=1e-10)

    with pytest.raises(ValueError):
        rigid.covariance_cholesky(jnp.asarray(h), basis, block_size=7)


def test_pinv_diagonal(ca_1l2y):
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    basis = rigid.rigid_modes_anm(coord, layout="xyz")

    diag = np.asarray(
        rigid.pinv_diagonal(jnp.asarray(h), basis, block_size=12)
    )
    ref = np.diagonal(np.linalg.pinv(h, hermitian=True, rcond=1e-6))
    assert np.allclose(diag, ref, atol=1e-8)

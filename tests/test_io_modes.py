"""Checkpoint round-trips, PDB writing, and the partial-spectrum
solver."""

import jax.numpy as jnp
import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.io import (
    load_model,
    load_results,
    save_model,
    save_results,
)
from springcraft_tpu.ops import assembly, ffparams, modes
from springcraft_tpu.structure import load_structure, write_pdb


def test_model_checkpoint_roundtrip(ca_1l2y, tmp_path):
    ff = sc.InvariantForceField(13.0)
    anm = sc.ANM(ca_1l2y, ff)
    _ = anm.hessian  # populate the cache
    path = tmp_path / "anm.npz"
    save_model(path, anm)

    restored = load_model(path)
    assert np.allclose(restored.hessian, anm.hessian)
    # Observables work without a force field
    assert np.allclose(
        restored.mean_square_fluctuation(), anm.mean_square_fluctuation()
    )

    # GNM path + covariance cache
    gnm = sc.GNM(ca_1l2y, sc.InvariantForceField(7.0))
    _ = gnm.covariance
    path2 = tmp_path / "gnm.npz"
    save_model(path2, gnm)
    restored2 = load_model(path2)
    assert np.allclose(restored2.covariance, gnm.covariance)
    assert np.allclose(restored2.dcc(), gnm.dcc())


def test_restored_model_without_ff_errors(ca_1l2y, tmp_path):
    anm = sc.ANM(ca_1l2y, sc.InvariantForceField(13.0))
    path = tmp_path / "empty.npz"
    # Save without populating any matrix
    save_model(path, anm)
    restored = load_model(path)
    with pytest.raises(RuntimeError):
        _ = restored.hessian


def test_results_roundtrip(tmp_path):
    results = {"msf": np.arange(5.0), "evals": np.ones((3, 3))}
    path = tmp_path / "results.npz"
    save_results(path, results)
    back = load_results(path)
    assert set(back) == {"msf", "evals"}
    assert np.allclose(back["msf"], results["msf"])


def test_write_pdb_roundtrip(ca_1l2y, tmp_path):
    path = tmp_path / "out.pdb"
    write_pdb(path, ca_1l2y)
    back = load_structure(path)
    assert back.array_length() == ca_1l2y.array_length()
    assert np.allclose(back.coord, ca_1l2y.coord, atol=1e-3)
    assert np.all(back.res_name == ca_1l2y.res_name)
    assert np.all(back.chain_id == ca_1l2y.chain_id)


def test_write_pdb_trajectory(ca_1l2y, tmp_path):
    anm = sc.ANM(ca_1l2y, sc.InvariantForceField(13.0))
    disp = anm.normal_mode(6, amplitude=1.5, frames=4)
    traj = ca_1l2y.coord[None] + disp

    path = tmp_path / "mode.pdb"
    write_pdb(path, ca_1l2y, coord_models=traj)

    from springcraft_tpu.structure import PDBFile

    pdb = PDBFile.read(path)
    assert pdb.get_model_count() == 4
    m2 = pdb.get_structure(model=2)
    assert np.allclose(m2.coord, traj[1], atol=1e-3)


def test_lowest_modes_match_eigh(ca_1l2y):
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    ref_vals = np.linalg.eigvalsh(h)

    vals, vecs = modes.lowest_modes_anm(jnp.asarray(h), coord, k=6,
                                        n_iter=300)
    vals = np.asarray(vals)
    assert np.allclose(vals, ref_vals[6:12], rtol=1e-6)
    # Eigenpair residuals
    residual = np.max(np.abs(h @ np.asarray(vecs).T
                             - np.asarray(vecs).T * vals[None, :]))
    assert residual < 1e-8


def test_lowest_modes_gnm(ca_1l2y):
    from springcraft_tpu.ops import rigid

    params = ffparams.invariant_params(7.0)
    coord = ca_1l2y.coord.astype(np.float64)
    k_mat = np.asarray(assembly.kirchhoff_matrix(coord, params, jnp))
    ref_vals = np.linalg.eigvalsh(k_mat)

    basis = rigid.null_mode_gnm(len(coord), dtype=jnp.float64)
    vals, _ = modes.lowest_modes(jnp.asarray(k_mat), 4, null_basis=basis,
                                 n_iter=300)
    assert np.allclose(np.asarray(vals), ref_vals[1:5], rtol=1e-6)


def test_mode_residuals(ca_1l2y):
    params = ffparams.invariant_params(13.0)
    coord = ca_1l2y.coord.astype(np.float64)
    h = np.asarray(assembly.hessian_matrix(coord, params, jnp,
                                           layout="xyz"))
    vals, vecs = modes.lowest_modes_anm(jnp.asarray(h), coord, k=6,
                                        n_iter=300)
    res = np.asarray(modes.mode_residuals(jnp.asarray(h), vals, vecs))
    assert res.shape == (6,)
    assert np.all(res < 1e-8)

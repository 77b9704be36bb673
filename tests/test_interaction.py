"""
Kirchhoff/Hessian assembly parity and invariants, mirroring the
reference test strategy (``/root/reference/tests/test_interaction.py``):
ProDy golden data on random coordinates, Hessian symmetry on randomized
inputs, Cartesian pair coverage without cutoff, and (new) host-vs-dense
backend equivalence.
"""

import itertools

import numpy as np
import pytest

import springcraft_tpu as sc

from .conftest import load_csv
from .util import HostOnlyForceField


@pytest.mark.parametrize(
    "seed, cutoff, backend",
    itertools.product([1, 323, 777, 999], [5, 10, 15], ["dense", "host"]),
)
def test_kirchhoff_vs_prody(seed, cutoff, backend):
    coord = load_csv(f"random_coord_seed_{seed}.csv.gz")
    ff = sc.InvariantForceField(cutoff)
    if backend == "host":
        ff = HostOnlyForceField(ff)
    kirchhoff, _ = sc.compute_kirchhoff(coord, ff)
    ref = load_csv(
        f"prody_gnm_{cutoff}_ang_cutoff_kirchhoff_random_coords_seed_{seed}.csv.gz"
    )
    assert np.allclose(kirchhoff, ref)


# Golden Hessian data exists for the 10 A cutoff only
@pytest.mark.parametrize(
    "seed, cutoff, backend",
    itertools.product([1, 323, 777, 999], [10], ["dense", "host"]),
)
def test_hessian_vs_prody(seed, cutoff, backend):
    coord = load_csv(f"random_coord_seed_{seed}.csv.gz")
    ff = sc.InvariantForceField(cutoff)
    if backend == "host":
        ff = HostOnlyForceField(ff)
    hessian, _ = sc.compute_hessian(coord, ff)
    ref = load_csv(
        f"prody_anm_{cutoff}_ang_cutoff_hessian_random_coords_seed_{seed}.csv.gz"
    )
    assert np.allclose(hessian, ref, atol=1e-6, rtol=1e-3)


@pytest.mark.parametrize(
    "seed, cutoff, use_cell_list",
    itertools.product(range(6), [5, 10, 15], [False, True]),
)
def test_hessian_symmetric(seed, cutoff, use_cell_list):
    rng = np.random.RandomState(seed)
    coord = rng.rand(500, 3) * 50

    ff = sc.InvariantForceField(cutoff)
    hessian, _ = sc.compute_hessian(coord, ff, use_cell_list)
    assert np.allclose(hessian, hessian.T)


@pytest.mark.parametrize("use_cell_list", [False, True])
def test_cartesian_index_product(use_cell_list):
    """Without a cutoff, every pair except self-pairs must interact."""

    class AllConnected(sc.ForceField):
        def force_constant(self, atom_i, atom_j, sq_distance):
            return np.ones(len(atom_i))

    rng = np.random.RandomState(0)
    coord = rng.rand(10, 3) * 50

    _, pairs = sc.compute_hessian(coord, AllConnected(), use_cell_list)
    matrix = np.zeros((10, 10), dtype=bool)
    matrix[pairs[:, 0], pairs[:, 1]] = True
    assert (matrix == ~np.eye(10, dtype=bool)).all()


@pytest.mark.parametrize(
    "make_ff",
    [
        lambda: sc.InvariantForceField(10.0),
        lambda: sc.HinsenForceField(),
        lambda: sc.ParameterFreeForceField(),
        lambda: sc.HinsenForceField(12.0),
    ],
)
def test_dense_matches_host_backend(make_ff):
    """The dense JAX path and the host force_constant path must agree
    bit-for-bit for every analytic force-field family."""
    rng = np.random.RandomState(7)
    coord = rng.rand(80, 3) * 30

    dense_k, dense_pairs = sc.compute_kirchhoff(coord, make_ff())
    host_k, host_pairs = sc.compute_kirchhoff(
        coord, HostOnlyForceField(make_ff())
    )
    assert np.array_equal(dense_pairs, host_pairs)
    assert np.allclose(dense_k, host_k, rtol=1e-12, atol=1e-12)

    dense_h, _ = sc.compute_hessian(coord, make_ff())
    host_h, _ = sc.compute_hessian(coord, HostOnlyForceField(make_ff()))
    assert np.allclose(dense_h, host_h, rtol=1e-12, atol=1e-12)


def test_tabulated_dense_matches_host(two_chain_ca):
    # Separate the chains so no pair distance is zero
    atoms = two_chain_ca.copy()
    atoms.coord = atoms.coord.copy()
    atoms.coord[20:] += np.array([8.0, 0.0, 0.0], dtype=np.float32)

    ff = sc.TabulatedForceField.sd_enm(atoms)
    dense_h, _ = sc.compute_hessian(atoms.coord, ff)
    host_h, _ = sc.compute_hessian(atoms.coord, HostOnlyForceField(ff))
    assert np.allclose(dense_h, host_h, rtol=1e-12, atol=1e-12)


def test_invalid_coord_shape():
    with pytest.raises(ValueError):
        sc.compute_kirchhoff(np.zeros((5, 2)), sc.InvariantForceField(7.0))


def test_natoms_mismatch(ca_1l2y):
    ff = sc.TabulatedForceField.e_anm(ca_1l2y)
    with pytest.raises(ValueError):
        sc.compute_kirchhoff(np.zeros((5, 3)), ff)

"""
Force-field layer tests, mirroring the reference coverage
(``/root/reference/tests/test_forcefield.py``): patched contact
switching, tabulated interaction-matrix contents, input-shape contract,
predefined parameterizations, and Hessian parity with BioPhysConnectoR
and bio3d golden data.
"""

import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.models.forcefield import AA_TO_INDEX
from springcraft_tpu.structure import CellList

from .conftest import load_csv


@pytest.fixture
def atoms(two_chain_ca):
    return two_chain_ca


@pytest.fixture
def atoms_singlechain(two_chain_ca):
    return two_chain_ca[0:20]


def _offdiag(matrix):
    out = matrix.copy()
    np.fill_diagonal(out, 0)
    return out


def test_patched_shutdown(atoms):
    rng = np.random.RandomState(0)
    shutdown = rng.choice(np.arange(len(atoms)), size=5, replace=False)

    base = sc.InvariantForceField(7.0)
    ref, _ = sc.compute_kirchhoff(atoms.coord, base)
    ref[shutdown, :] = 0
    ref[:, shutdown] = 0

    patched = sc.PatchedForceField(base, contact_shutdown=shutdown)
    test, _ = sc.compute_kirchhoff(atoms.coord, patched)
    assert np.all(_offdiag(test) == _offdiag(ref))


def test_patched_pairs_off(atoms):
    rng = np.random.RandomState(0)
    off = rng.choice(np.arange(len(atoms)), size=(5, 2), replace=False)

    base = sc.InvariantForceField(7.0)
    ref, _ = sc.compute_kirchhoff(atoms.coord, base)
    i, j = off.T
    ref[i, j] = 0
    ref[j, i] = 0

    patched = sc.PatchedForceField(base, contact_pair_off=off)
    test, _ = sc.compute_kirchhoff(atoms.coord, patched)
    assert np.all(_offdiag(test) == _offdiag(ref))


def test_patched_pairs_on(atoms):
    rng = np.random.RandomState(0)
    on = rng.choice(np.arange(len(atoms)), size=(5, 2), replace=False)
    constants = rng.rand(5)

    base = sc.InvariantForceField(7.0)
    ref, _ = sc.compute_kirchhoff(atoms.coord, base)
    i, j = on.T
    ref[i, j] = -constants
    ref[j, i] = -constants

    patched = sc.PatchedForceField(
        base, contact_pair_on=on, force_constants=constants
    )
    test, _ = sc.compute_kirchhoff(atoms.coord, patched)
    assert np.all(_offdiag(test) == _offdiag(ref))


def test_patched_requires_constants(atoms):
    with pytest.raises(TypeError):
        sc.PatchedForceField(
            sc.InvariantForceField(7.0), contact_pair_on=np.array([[0, 1]])
        )


def test_patched_out_of_bounds(atoms):
    ff = sc.TabulatedForceField.e_anm(atoms)  # natoms is known
    with pytest.raises(IndexError):
        sc.PatchedForceField(ff, contact_shutdown=np.array([len(atoms) + 5]))


def test_tabulated_homogeneous(atoms):
    """Element-wise check of the interaction matrix with
    type-independent constants."""
    BONDED, INTRA, INTER = 1, 2, 3
    ff = sc.TabulatedForceField(atoms, BONDED, INTRA, INTER, None)

    assert ff.interaction_matrix.shape[2] == 1
    matrix = ff.interaction_matrix[:, :, 0]
    assert np.allclose(matrix, matrix.T)
    for i in range(len(atoms)):
        for j in range(i, len(atoms)):
            if i == j:
                expected = 0
            elif j == i + 1 and atoms.chain_id[i] == atoms.chain_id[j]:
                expected = BONDED
            elif atoms.chain_id[i] == atoms.chain_id[j]:
                expected = INTRA
            else:
                expected = INTER
            assert matrix[i, j] == expected, f"indices {i}, {j}"


def test_tabulated_inhomogeneous(atoms):
    """Element-wise check with random symmetric type-specific tables."""
    mapping = np.array([AA_TO_INDEX[aa] for aa in atoms.res_name])

    rng = np.random.RandomState(0)
    triu = np.triu(rng.rand(3, 20, 20))
    bonded, intra, inter = triu + np.transpose(triu, (0, 2, 1))

    ff = sc.TabulatedForceField(atoms, bonded, intra, inter, None)
    matrix = ff.interaction_matrix[:, :, 0]
    assert np.allclose(matrix, matrix.T)
    for i in range(len(atoms)):
        for j in range(i, len(atoms)):
            if i == j:
                expected = 0.0
            elif j == i + 1 and atoms.chain_id[i] == atoms.chain_id[j]:
                expected = bonded[mapping[i], mapping[j]]
            elif atoms.chain_id[i] == atoms.chain_id[j]:
                expected = intra[mapping[i], mapping[j]]
            else:
                expected = inter[mapping[i], mapping[j]]
            assert matrix[i, j] == pytest.approx(expected), f"{i}, {j}"


def test_tabulated_distance_bins(atoms):
    """Distance-dependent (type-independent) force constants."""
    N_BINS = 100
    rng = np.random.RandomState(0)
    edges = np.sort(rng.rand(N_BINS) * 30)
    assert np.all(np.unique(edges) == edges)

    fc = np.arange(N_BINS)
    ff = sc.TabulatedForceField(atoms, fc, fc, fc, edges)

    assert ff.interaction_matrix.shape == (len(atoms), len(atoms), N_BINS)
    diag = ff.interaction_matrix[np.arange(len(atoms)), np.arange(len(atoms))]
    assert np.all(diag == 0)
    offdiag_rows = ff.interaction_matrix[0, 1:]
    assert np.all(offdiag_rows == fc)

    # force_constant returns the bin index by construction
    atom_i = rng.randint(len(atoms), size=500)
    atom_j = rng.randint(len(atoms), size=500)
    bins = rng.randint(N_BINS, size=500)
    sample_dist = edges[bins]
    constants = ff.force_constant(atom_i, atom_j, sample_dist**2)
    expected = np.where(atom_i != atom_j, bins, 0)
    assert np.allclose(constants, expected)


def test_tabulated_above_cutoff_raises(atoms):
    edges = np.array([2.0, 4.0, 6.0])
    ff = sc.TabulatedForceField(atoms, 1, 1, 1, edges)
    with pytest.raises(ValueError):
        ff.force_constant(np.array([0]), np.array([5]), np.array([49.0]))


@pytest.mark.parametrize("cutoff_distance", [None, 7])
def test_tabulated_cutoff_adjacency(atoms, cutoff_distance):
    """Unit constants reduce the Kirchhoff matrix to (negated)
    adjacency."""
    ff = sc.TabulatedForceField(atoms, 1, 1, 1, cutoff_distance)
    kirchhoff, _ = sc.compute_kirchhoff(atoms.coord, ff)
    adj = -kirchhoff
    np.fill_diagonal(adj, 0)
    assert np.isin(adj.flatten(), [0, 1]).all()
    adj = adj.astype(bool)

    if cutoff_distance is None:
        expected = ~np.eye(atoms.array_length(), dtype=bool)
    else:
        expected = CellList(atoms, cutoff_distance).create_adjacency_matrix(
            cutoff_distance
        )
        np.fill_diagonal(expected, False)
    assert np.all(adj == expected)


@pytest.mark.parametrize(
    "shape, n_edges, is_valid",
    [
        [(), None, True],
        [(), 1, True],
        [(), 10, True],
        [(10,), None, False],
        [(10,), 1, False],
        [(9,), 10, False],
        [(10,), 10, True],
        [(1,), None, True],
        [(20, 1), 1, False],
        [(20, 30), 1, False],
        [(1, 20), 1, False],
        [(30, 20), 1, False],
        [(20, 20), 1, True],
        [(20, 20), None, True],
        [(20, 20), 10, True],
        [(20, 1, 10), 10, False],
        [(20, 30, 10), 10, False],
        [(1, 20, 10), 10, False],
        [(30, 20, 10), 10, False],
        [(20, 20, 10), 10, True],
        [(20, 20, 1), 1, True],
        [(20, 20, 1), None, True],
        [(20, 20, 10), 9, False],
    ],
)
def test_tabulated_input_shapes(atoms, shape, n_edges, is_valid):
    fc = np.ones(shape) if shape != () else 1
    edges = np.arange(n_edges) if n_edges is not None else None

    if is_valid:
        ff = sc.TabulatedForceField(atoms, fc, fc, fc, edges)
        n_bins = n_edges if n_edges is not None else 1
        assert ff.interaction_matrix.shape == (40, 40, n_bins)
    else:
        with pytest.raises(IndexError):
            sc.TabulatedForceField(atoms, fc, fc, fc, edges)


def test_tabulated_asymmetric_raises(atoms):
    table = np.zeros((20, 20))
    table[0, 1] = 1.0
    with pytest.raises(ValueError):
        sc.TabulatedForceField(atoms, table, table, table, None)


def test_tabulated_non_canonical_residue_message(ca_1l2y):
    """A non-canonical residue raises a typed, actionable error rather
    than a bare ``KeyError`` from the type-index lookup."""
    from springcraft_tpu.structure import BadStructureError

    atoms = ca_1l2y.copy()
    atoms.res_name[3] = "MSE"
    with pytest.raises(BadStructureError, match="non-canonical.*'MSE'"):
        sc.TabulatedForceField(atoms, 1, 1, 1, None)


def test_masses_unknown_residue_message(ca_1l2y):
    """masses=True with an unknown residue names the culprit and its
    position instead of dying on a raw dict lookup."""
    atoms = ca_1l2y.copy()
    atoms.res_name[5] = "XYZ"
    with pytest.raises(KeyError, match="'XYZ'.*atom index 5"):
        sc.ANM(atoms, sc.InvariantForceField(7.0), masses=True)


def test_tabulated_requires_ca(ca_1l2y):
    from springcraft_tpu.structure import BadStructureError, load_structure
    from .conftest import data_dir
    from os.path import join

    full = load_structure(join(data_dir(), "1l2y.pdb"), model=1)
    with pytest.raises(BadStructureError):
        sc.TabulatedForceField(full, 1, 1, 1, None)
    with pytest.raises(TypeError):
        sc.TabulatedForceField(ca_1l2y.coord, 1, 1, 1, None)


@pytest.mark.parametrize(
    "name", ["s_enm_10", "s_enm_13", "d_enm", "sd_enm", "e_anm",
             "e_anm_mj", "e_anm_ke"]
)
def test_tabulated_predefined(atoms, name):
    ff = getattr(sc.TabulatedForceField, name)(atoms)
    assert ff is not None
    assert ff.natoms == len(atoms)


def test_parameterfree_kirchhoff():
    """Off-diagonal Kirchhoff entries must equal -1/d^2."""
    rng = np.random.RandomState(0)
    coord = rng.rand(5, 3)

    diff = coord[:, None, :] - coord[None, :, :]
    sq = np.einsum("ijk,ijk->ij", diff, diff)
    np.fill_diagonal(sq, 1.0)
    ref = -1.0 / sq
    np.fill_diagonal(ref, 0)

    test, _ = sc.compute_kirchhoff(coord, sc.ParameterFreeForceField())
    np.fill_diagonal(test, 0)
    assert np.allclose(test, ref)


@pytest.mark.parametrize("ff_name", ["e_anm", "e_anm_mj", "e_anm_ke"])
def test_eanm_hessian_vs_biophysconnector(atoms_singlechain, ff_name):
    ff = getattr(sc.TabulatedForceField, ff_name)(atoms_singlechain)
    ref_file = f"biophysconnector_anm_eanm{ff_name[5:]}_hessian_1l2y.csv.gz"
    ref = load_csv(ref_file, skip_header=1)

    hessian, _ = sc.compute_hessian(atoms_singlechain.coord, ff)
    if ff_name == "e_anm_ke":
        assert np.allclose(hessian, ref, atol=1e-4)
    else:
        assert np.allclose(hessian, ref)


@pytest.mark.parametrize(
    "ff_name, bio3d_name, atol",
    [("hinsen", "calpha", 1e-4), ("sdenm", "sdenm", 0.0),
     ("pfenm", "pfanm", 0.0)],
)
def test_hessian_vs_bio3d(atoms_singlechain, ff_name, bio3d_name, atol):
    if ff_name == "hinsen":
        ff = sc.HinsenForceField()
    elif ff_name == "sdenm":
        ff = sc.TabulatedForceField.sd_enm(atoms_singlechain)
    else:
        ff = sc.ParameterFreeForceField()

    ref = load_csv(f"bio3d_anm_{bio3d_name}_ff_hessian_1l2y.csv.gz")
    hessian, _ = sc.compute_hessian(atoms_singlechain.coord, ff)
    assert np.allclose(hessian, ref, atol=atol)


def test_compact_params_match_pair_table(atoms):
    """The compact (type-table) parameterization must reproduce the
    position-specific interaction matrix exactly."""
    import jax.numpy as jnp

    from springcraft_tpu.ops import assembly

    for maker in (sc.TabulatedForceField.sd_enm, sc.TabulatedForceField.e_anm):
        ff = maker(atoms)
        dense = assembly.hessian_matrix(
            atoms.coord.astype(np.float64), ff.to_params(), jnp
        )
        compact = assembly.hessian_matrix(
            atoms.coord.astype(np.float64), ff.to_compact_params(), jnp
        )
        assert np.allclose(np.asarray(dense), np.asarray(compact),
                           rtol=1e-12, atol=1e-12)

"""Structure-layer tests: PDB parsing, AtomArray operations, residue
masses and cell-list neighbor search."""

from os.path import join

import numpy as np
import pytest

from springcraft_tpu.structure import (
    AtomArray,
    CellList,
    PDBFile,
    check_res_id_continuity,
    coord,
    get_chain_count,
    get_structure,
    info,
    load_structure,
)

from .conftest import data_dir


def test_parse_1l2y():
    pdb = PDBFile.read(join(data_dir(), "1l2y.pdb"))
    atoms = get_structure(pdb, model=1)
    assert atoms.array_length() == 304
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]
    assert ca.array_length() == 20
    assert ca.res_name[0] == "ASN"
    assert np.allclose(ca.coord[0], [-8.608, 3.135, -1.618], atol=1e-3)
    assert ca.coord.dtype == np.float32


def test_parse_7cal_chains():
    atoms = load_structure(join(data_dir(), "7cal.pdb"), model=1)
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]
    assert ca.array_length() == 1776
    assert get_chain_count(ca) == 4
    assert set(np.unique(ca.chain_id)) == {"A", "B", "C", "D"}


def test_atom_array_ops():
    atoms = load_structure(join(data_dir(), "1l2y.pdb"), model=1)
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]

    copy = ca.copy()
    assert copy == ca
    copy.chain_id[:] = "B"
    assert copy != ca
    assert np.all(ca.chain_id == "A")

    merged = ca + copy
    assert merged.array_length() == 40
    assert np.all(merged.chain_id[:20] == "A")
    assert np.all(merged.chain_id[20:] == "B")

    sliced = merged[0:20]
    assert sliced == ca

    # coord() accepts arrays and AtomArrays
    assert np.array_equal(coord(ca), ca.coord)
    assert np.array_equal(coord(ca.coord), ca.coord)
    with pytest.raises(ValueError):
        coord(np.zeros((5, 2)))


def test_res_id_continuity():
    atoms = load_structure(join(data_dir(), "7cal.pdb"), model=1)
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]
    breaks = check_res_id_continuity(ca)
    # 4 chains; every chain boundary (and any internal gap) is a break
    assert len(breaks) >= 3
    for b in breaks:
        assert ca.res_id[b] - ca.res_id[b - 1] not in (0, 1)


def test_residue_masses():
    assert info.mass("GLY", is_residue=True) == pytest.approx(57.05, abs=0.1)
    assert info.mass("TRP", is_residue=True) == pytest.approx(186.2, abs=0.1)
    assert info.mass("C", is_residue=False) == pytest.approx(12.011)
    with pytest.raises(KeyError):
        info.mass("XYZ", is_residue=True)

    masses = info.residue_masses(["ALA", "GLY", "TRP"])
    assert masses.shape == (3,)
    assert masses[1] == pytest.approx(57.0519)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cutoff", [5.0, 13.0])
def test_cell_list_matches_brute_force(seed, cutoff):
    rng = np.random.RandomState(seed)
    coords = rng.rand(400, 3) * 60

    adj = CellList(coords, cutoff).create_adjacency_matrix(cutoff)
    diff = coords[:, None, :] - coords[None, :, :]
    ref = np.einsum("ijk,ijk->ij", diff, diff) <= cutoff**2
    assert np.array_equal(adj, ref)


def test_cell_list_validation():
    coords = np.zeros((4, 3))
    with pytest.raises(ValueError):
        CellList(coords, -1.0)
    with pytest.raises(ValueError):
        CellList(coords, 5.0).create_adjacency_matrix(10.0)


def test_cell_list_python_fallback():
    rng = np.random.RandomState(3)
    coords = rng.rand(300, 3) * 40
    cl = CellList(coords, 8.0)
    py = cl._python_adjacency(8.0)
    diff = coords[:, None, :] - coords[None, :, :]
    ref = np.einsum("ijk,ijk->ij", diff, diff) <= 64.0
    assert np.array_equal(py, ref)


def test_cell_list_python_fallback_grid_path():
    # Force the bucketed-grid branch (n > 2048)
    rng = np.random.RandomState(4)
    coords = rng.rand(2500, 3) * 100
    cl = CellList(coords, 10.0)
    py = cl._python_adjacency(10.0)
    diff = coords[:, None, :] - coords[None, :, :]
    ref = np.einsum("ijk,ijk->ij", diff, diff) <= 100.0
    assert np.array_equal(py, ref)

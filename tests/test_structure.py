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


def test_mmcif_reader(tmp_path):
    """Minimal mmCIF round-trip: write an atom_site loop, read it back."""
    cif_text = """data_test
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 N N ASN A 1 -8.901 4.127 -0.555 1
ATOM 2 C CA ASN A 1 -8.608 3.135 -1.618 1
ATOM 3 C CA LEU A 2 -4.923 4.002 -2.452 1
HETATM 4 O O HOH A 3 1.000 2.000 3.000 1
ATOM 1 N N ASN A 1 -8.001 4.127 -0.555 2
ATOM 2 C CA ASN A 1 -8.008 3.135 -1.618 2
ATOM 3 C CA LEU A 2 -4.023 4.002 -2.452 2
HETATM 4 O O HOH A 3 1.100 2.000 3.000 2
#
"""
    path = tmp_path / "test.cif"
    path.write_text(cif_text)

    from springcraft_tpu.structure import CIFFile, load_structure_cif

    cif = CIFFile.read(path)
    assert cif.get_model_count() == 2

    atoms = load_structure_cif(path, model=1)
    assert atoms.array_length() == 4
    assert atoms.res_name[1] == "ASN"
    assert atoms.atom_name[1] == "CA"
    assert atoms.chain_id[0] == "A"
    assert atoms.hetero[3]
    assert np.allclose(atoms.coord[1], [-8.608, 3.135, -1.618], atol=1e-4)

    atoms2 = load_structure_cif(path, model=2)
    assert np.allclose(atoms2.coord[0], [-8.001, 4.127, -0.555], atol=1e-4)

    # load_structure dispatches on extension
    atoms3 = load_structure(str(path))
    assert atoms3.array_length() == 4


def test_load_ensemble(ca_1l2y, tmp_path):
    from springcraft_tpu.structure import load_ensemble, write_pdb

    rng = np.random.RandomState(0)
    coords = ca_1l2y.coord[None] + 0.2 * rng.randn(5, len(ca_1l2y), 3).astype(
        np.float32
    )
    path = tmp_path / "ens.pdb"
    write_pdb(path, ca_1l2y, coord_models=coords)

    atoms, batch = load_ensemble(path)
    assert atoms.array_length() == len(ca_1l2y)
    assert batch.shape == (5, len(ca_1l2y), 3)
    assert np.allclose(batch, coords, atol=1e-3)


def test_pdb_altloc_first(tmp_path):
    """Alternate locations: only the first altloc of each atom is kept."""
    lines = [
        "ATOM      1  N   ASN A   1      -8.901   4.127  -0.555  1.00  0.00           N",
        "ATOM      2  CA AASN A   1      -8.608   3.135  -1.618  0.60  0.00           C",
        "ATOM      3  CA BASN A   1      -8.500   3.100  -1.600  0.40  0.00           C",
        "ATOM      4  C   ASN A   1      -7.117   2.964  -1.897  1.00  0.00           C",
        "END",
    ]
    path = tmp_path / "altloc.pdb"
    path.write_text("\n".join(lines) + "\n")
    atoms = load_structure(path)
    assert atoms.array_length() == 3
    ca = atoms[atoms.atom_name == "CA"]
    assert ca.array_length() == 1
    assert np.allclose(ca.coord[0], [-8.608, 3.135, -1.618], atol=1e-3)


def test_pdb_element_guess_without_element_column(tmp_path):
    """Blank element columns: CA on an ATOM record is carbon, not
    calcium; CA on a HETATM record is calcium."""
    lines = [
        "ATOM      1  CA  ASN A   1      -8.608   3.135  -1.618  1.00  0.00",
        "HETATM    2 CA    CA A 101       1.000   2.000   3.000  1.00  0.00",
        "END",
    ]
    path = tmp_path / "elem.pdb"
    path.write_text("\n".join(lines) + "\n")
    atoms = load_structure(path)
    assert atoms.element[0] == "C"
    assert atoms.element[1] == "CA"


def test_pdb_missing_model_raises():
    from os.path import join

    pdb = PDBFile.read(join(data_dir(), "1l2y.pdb"))
    with pytest.raises(ValueError):
        get_structure(pdb, model=3)


def test_atom_array_slice_is_independent(ca_1l2y):
    sub = ca_1l2y[0:5]
    original = ca_1l2y.coord[0].copy()
    sub.coord[:] = 0.0
    assert np.allclose(ca_1l2y.coord[0], original)


def test_pdb_altloc_per_residue(tmp_path):
    """Altloc selection is per residue: the first altloc ID wins for the
    whole residue even when atoms list IDs in different orders."""
    lines = [
        "ATOM      1  N  BASN A   1       1.000   0.000   0.000  0.50  0.00           N",
        "ATOM      2  N  AASN A   1       2.000   0.000   0.000  0.50  0.00           N",
        "ATOM      3  CA AASN A   1       3.000   0.000   0.000  0.50  0.00           C",
        "ATOM      4  CA BASN A   1       4.000   0.000   0.000  0.50  0.00           C",
        "END",
    ]
    path = tmp_path / "mixed.pdb"
    path.write_text("\n".join(lines) + "\n")
    atoms = load_structure(path)
    # Residue's first altloc ID is 'B' -> keep N@1.0 and CA@4.0
    assert atoms.array_length() == 2
    assert np.allclose(atoms.coord[:, 0], [1.0, 4.0])


def test_bcif_dispatches_to_binary_reader():
    # .bcif is parsed by the BinaryCIF reader (tests/test_bcif.py);
    # the loader must route there, not the text parsers
    with pytest.raises(FileNotFoundError):
        load_structure("nonexistent.bcif")


def test_cif_primed_names_and_altloc(tmp_path):
    """CIF-legal unquoted primed atom names parse, and altlocs resolve
    to one conformer per residue (first ID wins)."""
    cif_text = """data_t
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM 1 C C1' . DA A 1 1.0 2.0 3.0
ATOM 2 C CA B ASN A 2 4.0 0.0 0.0
ATOM 3 C CA A ASN A 2 5.0 0.0 0.0
ATOM 4 N N . ASN A 2 6.0 0.0 0.0
#
"""
    path = tmp_path / "t.cif"
    path.write_text(cif_text)
    from springcraft_tpu.structure import load_structure_cif

    atoms = load_structure_cif(path)
    assert atoms.array_length() == 3
    assert atoms.atom_name[0] == "C1'"
    assert atoms.coord[1][0] == 4.0  # altloc B (first ID) kept


def test_pdb_microheterogeneity_altloc(tmp_path):
    """Point microheterogeneity (different res_name per altloc in one
    slot) resolves to a single conformer."""
    lines = [
        "ATOM      1  N  ASER A   1       1.000   0.000   0.000  0.50  0.00           N",
        "ATOM      2  CA ASER A   1       2.000   0.000   0.000  0.50  0.00           C",
        "ATOM      3  N  BGLY A   1       3.000   0.000   0.000  0.50  0.00           N",
        "ATOM      4  CA BGLY A   1       4.000   0.000   0.000  0.50  0.00           C",
        "END",
    ]
    path = tmp_path / "micro.pdb"
    path.write_text("\n".join(lines) + "\n")
    atoms = load_structure(path)
    assert atoms.array_length() == 2
    assert np.all(atoms.res_name == "SER")


def test_atom_array_coord_length_check(ca_1l2y):
    copy = ca_1l2y.copy()
    with pytest.raises(IndexError):
        copy.coord = np.zeros((3, 3))


def test_write_pdb_rejects_out_of_range_coords(ca_1l2y, tmp_path):
    from springcraft_tpu.structure import write_pdb

    big = ca_1l2y.copy()
    big.coord = big.coord + np.float32(20000.0)
    with pytest.raises(ValueError):
        write_pdb(tmp_path / "big.pdb", big)


def test_load_ensemble_cif(tmp_path):
    from springcraft_tpu.structure import load_ensemble

    cif_text = """data_t
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 C CA ASN A 1 1.0 0.0 0.0 1
ATOM 2 C CA LEU A 2 2.0 0.0 0.0 1
ATOM 1 C CA ASN A 1 1.5 0.0 0.0 2
ATOM 2 C CA LEU A 2 2.5 0.0 0.0 2
#
"""
    path = tmp_path / "ens.cif"
    path.write_text(cif_text)
    atoms, coords = load_ensemble(path)
    assert atoms.array_length() == 2
    assert coords.shape == (2, 2, 3)
    assert coords[1, 0, 0] == 1.5


def test_cif_multiline_and_wrapped_rows(tmp_path):
    """';'-delimited text fields (in other categories and inside
    atom_site) and rows wrapped over multiple lines parse correctly."""
    cif_text = """data_test
_struct.title
;A title that spans
multiple lines, with loop_ and _tag-looking content
;
#
loop_
_atom_site.group_PDB
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM N N ASN A 1
 -8.901 4.127 -0.555
ATOM C CA
;ASN
;
 A 1 -8.608 3.135 -1.618
ATOM C CA LEU A 2 -4.923 4.002 -2.452
#
"""
    path = tmp_path / "multi.cif"
    path.write_text(cif_text)

    from springcraft_tpu.structure import load_structure_cif

    atoms = load_structure_cif(path)
    assert atoms.array_length() == 3
    assert list(atoms.res_name) == ["ASN", "ASN", "LEU"]
    assert np.allclose(atoms.coord[0], [-8.901, 4.127, -0.555])
    assert np.allclose(atoms.coord[1], [-8.608, 3.135, -1.618])


def test_cif_unterminated_text_field(tmp_path):
    path = tmp_path / "bad.cif"
    path.write_text("data_x\n_struct.title\n;never closed\n")
    from springcraft_tpu.structure import CIFFile

    with pytest.raises(ValueError, match="Unterminated"):
        CIFFile.read(path)

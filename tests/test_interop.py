"""
biotite AtomArray interop: the model and force-field constructors accept
any object duck-typing biotite's ``AtomArray`` attribute surface, so
reference scripts (built on ``biotite.structure``) port with only the
import line changed (cf. reference ``anm.py:63``,
``forcefield.py:438-443``).

biotite is not installed in this environment, so a mock class carrying
the exact attribute surface of ``biotite.structure.AtomArray`` stands in.
"""

import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.structure import (
    AtomArray,
    as_atom_array,
    coord,
    is_atom_array_like,
)


class MockBiotiteAtomArray:
    """Mimics the attribute surface of ``biotite.structure.AtomArray``:
    per-category annotation ndarrays exposed as attributes, an ``(n, 3)``
    ``coord`` array, plus biotite's annotation-introspection methods.
    Deliberately NOT an instance of our AtomArray."""

    def __init__(self, native):
        self.coord = np.asarray(native.coord)
        self._annot = {
            name: np.asarray(native.get_annotation(name))
            for name in native.get_annotation_categories()
        }
        # biotite always carries these extra categories
        n = len(self.coord)
        self._annot.setdefault("ins_code", np.full(n, "", dtype="U1"))
        self._annot.setdefault("hetero", np.zeros(n, dtype=bool))
        for name, arr in self._annot.items():
            setattr(self, name, arr)

    def array_length(self):
        return len(self.coord)

    def get_annotation_categories(self):
        return list(self._annot)

    def get_annotation(self, name):
        return self._annot[name]


@pytest.fixture
def mock_ca(ca_1l2y):
    return MockBiotiteAtomArray(ca_1l2y)


def test_is_atom_array_like(mock_ca, ca_1l2y):
    assert is_atom_array_like(mock_ca)
    assert is_atom_array_like(ca_1l2y)
    assert not is_atom_array_like(np.zeros((5, 3)))
    assert not is_atom_array_like(object())

    class Stack:
        coord = np.zeros((2, 5, 3))  # biotite AtomArrayStack shape

    assert not is_atom_array_like(Stack())


def test_as_atom_array_passthrough_and_convert(mock_ca, ca_1l2y):
    assert as_atom_array(ca_1l2y) is ca_1l2y
    converted = as_atom_array(mock_ca)
    assert isinstance(converted, AtomArray)
    assert np.array_equal(converted.coord, ca_1l2y.coord)
    for name in ("chain_id", "res_id", "res_name", "atom_name", "element"):
        assert np.array_equal(converted.get_annotation(name),
                              ca_1l2y.get_annotation(name)), name
    # extra biotite categories are carried over
    assert "hetero" in converted.get_annotation_categories()
    assert "ins_code" in converted.get_annotation_categories()
    with pytest.raises(TypeError, match="Expected 'AtomArray'"):
        as_atom_array(42)


def test_coord_duck_typed(mock_ca, ca_1l2y):
    assert np.array_equal(coord(mock_ca), ca_1l2y.coord)


def test_anm_accepts_foreign_atom_array(mock_ca, ca_1l2y):
    ff = sc.InvariantForceField(7.9)
    ref = sc.ANM(ca_1l2y, ff).mean_square_fluctuation()
    got = sc.ANM(mock_ca, ff).mean_square_fluctuation()
    assert np.allclose(got, ref)


def test_anm_auto_masses_foreign(mock_ca, ca_1l2y):
    ff = sc.InvariantForceField(7.9)
    ref = sc.ANM(ca_1l2y, ff, masses=True).eigen()[0]
    got = sc.ANM(mock_ca, ff, masses=True).eigen()[0]
    assert np.allclose(got, ref)


def test_tabulated_ff_accepts_foreign(mock_ca, ca_1l2y):
    ff_ref = sc.TabulatedForceField.e_anm(ca_1l2y)
    ff_got = sc.TabulatedForceField.e_anm(mock_ca)
    assert np.array_equal(ff_got.interaction_matrix,
                          ff_ref.interaction_matrix)
    ref = sc.GNM(ca_1l2y, ff_ref).kirchhoff
    got = sc.GNM(mock_ca, ff_got).kirchhoff
    assert np.allclose(got, ref)


def test_reference_script_shape(mock_ca):
    """The reference gallery flow (doc/examples/scripts/basic_nma.py):
    construct from a biotite-style array, run the standard observables."""
    ff = sc.TabulatedForceField.e_anm(mock_ca)
    anm = sc.ANM(mock_ca, ff, masses=True)
    n = mock_ca.array_length()
    assert anm.mean_square_fluctuation().shape == (n,)
    assert anm.bfactor().shape == (n,)
    assert anm.dcc().shape == (n, n)
    disp = anm.normal_mode(index=6, amplitude=1.0, frames=10)
    assert disp.shape == (10, n, 3)

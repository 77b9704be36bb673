"""
Host-side sparse pair lists and float64 pair applies (ops/pairs.py) —
the O(pairs) machinery behind the f64 Rayleigh-Ritz refinement.

Covers: cell-list pair enumeration vs brute force (native and
fallback), per-pair force constants vs the dense masked matrix for
every family (incl. PatchedForceField overlays with forced-on pairs
outside the cutoff), the pair-list H@V / K@V applies vs dense matmuls
(native and numpy fallback), and sparse-vs-dense refinement parity.
"""

import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu import _native
from springcraft_tpu.ops import assembly, ffparams, modes, pairs

from .util import random_coord


def _brute_pairs(coord, cutoff):
    d2 = np.sum((coord[:, None] - coord[None, :]) ** 2, axis=-1)
    i, j = np.nonzero(np.triu(d2 <= cutoff * cutoff, 1))
    return i.astype(np.int64), j.astype(np.int64)


@pytest.mark.parametrize("n,cutoff", [(1, 5.0), (2, 5.0), (60, 8.0),
                                      (400, 13.0)])
def test_neighbor_pairs_match_brute_force(n, cutoff):
    coord = random_coord(0, n_atoms=n, box=30.0)
    i, j = pairs.neighbor_pairs(coord, cutoff)
    bi, bj = _brute_pairs(coord, cutoff)
    assert set(zip(i.tolist(), j.tolist())) == set(
        zip(bi.tolist(), bj.tolist()))
    assert np.all(i < j)


def test_neighbor_pairs_fallback_matches_native(monkeypatch):
    coord = random_coord(1, n_atoms=150, box=25.0)
    want = set(zip(*(a.tolist() for a in _brute_pairs(coord, 9.0))))
    monkeypatch.setattr(_native, "native_neighbor_pairs",
                        lambda *a, **k: None)
    i, j = pairs.neighbor_pairs(coord, 9.0)
    assert set(zip(i.tolist(), j.tolist())) == want


def _dense_constants(coord, params):
    sq = np.sum((coord[:, None] - coord[None, :]) ** 2, axis=-1)
    return np.asarray(ffparams.force_constant_matrix(
        sq, params, np, dtype=np.float64))


@pytest.mark.parametrize("kind", ["invariant", "hinsen", "pfenm"])
def test_pair_list_constants_match_dense(kind):
    coord = random_coord(2, n_atoms=90, box=22.0)
    params = {
        "invariant": ffparams.invariant_params(8.0),
        "hinsen": ffparams.hinsen_params(10.0),
        "pfenm": ffparams.pfenm_params(11.0),
    }[kind]
    i, j, k = pairs.pair_list(coord, params)
    kmat = _dense_constants(coord, params)
    assert np.allclose(k, kmat[i, j], rtol=1e-13)
    # every dense nonzero pair is present
    bi, bj = np.nonzero(np.triu(kmat != 0, 1))
    assert set(zip(bi.tolist(), bj.tolist())) <= set(
        zip(i.tolist(), j.tolist()))


def test_pair_list_compact_table_matches_dense(two_chain_ca):
    params = sc.TabulatedForceField.sd_enm(two_chain_ca)\
        .to_compact_params()
    coord = np.asarray(two_chain_ca.coord, np.float64)
    i, j, k = pairs.pair_list(coord, params)
    kmat = _dense_constants(coord, params)
    assert np.allclose(k, kmat[i, j], rtol=1e-13)


def test_pair_list_overlays_match_dense():
    coord = random_coord(3, n_atoms=70, box=18.0)
    n = len(coord)
    base = ffparams.invariant_params(8.0)
    off = np.zeros((n, n), bool)
    on = np.zeros((n, n), bool)
    values = np.zeros((n, n))
    # switch off one real contact; force on a far pair with a value
    d2 = np.sum((coord[:, None] - coord[None, :]) ** 2, axis=-1)
    ci, cj = np.nonzero(np.triu(d2 <= 64.0, 1))
    off[ci[0], cj[0]] = off[cj[0], ci[0]] = True
    far = np.unravel_index(np.argmax(d2), d2.shape)
    on[far] = on[far[::-1]] = True
    values[far] = values[far[::-1]] = 3.25
    params = ffparams.with_overlay(base, off, on, values, on.copy())

    i, j, k = pairs.pair_list(coord, params)
    kmat = _dense_constants(coord, params)
    kmap = dict(zip(zip(i.tolist(), j.tolist()), k))
    # the forced-on far pair is present with its override value
    far_key = (min(far), max(far))
    assert far_key in kmap and np.isclose(kmap[far_key], 3.25)
    # the switched-off contact contributes nothing
    assert (ci[0], cj[0]) not in kmap or kmap[(ci[0], cj[0])] == 0.0
    for key, v in kmap.items():
        assert np.isclose(v, kmat[key], rtol=1e-13)
    bi, bj = np.nonzero(np.triu(kmat != 0, 1))
    assert set(zip(bi.tolist(), bj.tolist())) <= set(kmap)


def test_pair_list_requires_cutoff():
    with pytest.raises(ValueError, match="cutoff"):
        pairs.pair_list(random_coord(4, 20), ffparams.pfenm_params(None))


@pytest.mark.parametrize("force_fallback", [False, True])
def test_hessian_apply_pairs_matches_dense(monkeypatch, force_fallback):
    coord = random_coord(5, n_atoms=80, box=20.0)
    params = ffparams.hinsen_params(10.0)
    i, j, k = pairs.pair_list(coord, params)
    sq = np.sum((coord[i] - coord[j]) ** 2, axis=1)
    g = k / sq
    rng = np.random.RandomState(6)
    v = rng.randn(len(coord), 3, 7)
    if force_fallback:
        monkeypatch.setattr(_native, "native_enm_hv",
                            lambda *a, **kw: None)
    hv = pairs.hessian_apply_pairs(coord, i, j, g, v)
    h = assembly.hessian_matrix(coord, params, np, dtype=np.float64,
                                layout="atom")
    ref = (h @ v.reshape(-1, 7)).reshape(len(coord), 3, 7)
    assert np.allclose(hv, ref, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_kirchhoff_apply_pairs_matches_dense(monkeypatch, force_fallback):
    coord = random_coord(7, n_atoms=80, box=20.0)
    params = ffparams.invariant_params(9.0)
    i, j, k = pairs.pair_list(coord, params)
    rng = np.random.RandomState(8)
    v = rng.randn(len(coord), 5)
    if force_fallback:
        monkeypatch.setattr(_native, "native_gnm_kv",
                            lambda *a, **kw: None)
    kv = pairs.kirchhoff_apply_pairs(i, j, k, len(coord), v)
    kmat = assembly.kirchhoff_matrix(coord, params, np, dtype=np.float64)
    assert np.allclose(kv, kmat @ v, rtol=1e-11, atol=1e-11)


def test_refine_sparse_matches_dense_method(two_chain_ca):
    """The sparse O(pairs*k) refinement path must agree with the dense
    panel stream to f64 roundoff — same operator, different order."""
    params = sc.TabulatedForceField.sd_enm(two_chain_ca)\
        .to_compact_params()
    coord = np.asarray(two_chain_ca.coord, np.float64)
    n = len(coord)
    rng = np.random.RandomState(9)
    masses = 1.0 + rng.rand(n)

    h64 = assembly.hessian_matrix(coord, params, np, dtype=np.float64,
                                  layout="xyz")
    w3 = np.concatenate([np.repeat(1.0 / np.sqrt(masses), 1)] * 3)
    truth_vecs = np.linalg.eigh(h64 * np.outer(
        np.tile(1.0 / np.sqrt(masses), 3),
        np.tile(1.0 / np.sqrt(masses), 3)))[1]
    approx = (truth_vecs[:, 6:12].T
              + 1e-4 * rng.randn(6, 3 * n)).astype(np.float32)

    dense = modes.refine_modes_f64(coord, params, approx, masses=masses,
                                   layout="xyz", method="dense", block=33)
    sparse = modes.refine_modes_f64(coord, params, approx, masses=masses,
                                    layout="xyz", method="sparse")
    for a, b in zip(dense, sparse):
        assert np.allclose(a, b, rtol=1e-9, atol=1e-13)


def test_refine_gnm_sparse_matches_dense_method(two_chain_ca):
    params = sc.TabulatedForceField.sd_enm(two_chain_ca)\
        .to_compact_params()
    coord = np.asarray(two_chain_ca.coord, np.float64)
    n = len(coord)
    rng = np.random.RandomState(10)
    k64 = assembly.kirchhoff_matrix(coord, params, np, dtype=np.float64)
    truth_vecs = np.linalg.eigh(k64)[1]
    approx = (truth_vecs[:, 1:7].T
              + 1e-4 * rng.randn(6, n)).astype(np.float32)

    dense = modes.refine_modes_f64_gnm(coord, params, approx,
                                       method="dense", block=29)
    sparse = modes.refine_modes_f64_gnm(coord, params, approx,
                                        method="sparse")
    for a, b in zip(dense, sparse):
        assert np.allclose(a, b, rtol=1e-9, atol=1e-13)

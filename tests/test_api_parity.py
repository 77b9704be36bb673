"""API-contract details carried over from the reference: functional vs
method API equivalence, nonbonded-mean eANM variants, custom force
fields with cutoffs, and pair-list ordering."""

import numpy as np
import pytest

import springcraft_tpu as sc

from .util import HostOnlyForceField


def test_functional_api_equals_methods(ca_1l2y):
    anm = sc.ANM(ca_1l2y, sc.InvariantForceField(13.0))

    vals_m, vecs_m = anm.eigen()
    vals_f, vecs_f = sc.eigen(anm)
    assert np.allclose(vals_m, vals_f)
    assert np.allclose(vecs_m, vecs_f)

    assert np.allclose(sc.frequencies(anm), anm.frequencies())
    assert np.allclose(
        sc.mean_square_fluctuation(anm), anm.mean_square_fluctuation()
    )
    assert np.allclose(sc.bfactor(anm), anm.bfactor())
    assert np.allclose(sc.dcc(anm), anm.dcc())
    assert np.allclose(
        sc.normal_mode(anm, 6, 1.0, 5), anm.normal_mode(6, 1.0, 5)
    )
    prs_f = sc.prs(anm)
    prs_m, eff_m, sens_m = anm.prs_effector_sensor()
    assert np.allclose(prs_f, prs_m)
    eff_f, sens_f = sc.effector_sensor(prs_f)
    assert np.allclose(eff_f, eff_m)
    assert np.allclose(sens_f, sens_m)


@pytest.mark.parametrize("name", ["e_anm", "e_anm_mj", "e_anm_ke"])
def test_eanm_nonbonded_mean(two_chain_ca, name):
    """nonbonded_mean=True replaces the type tables by their average —
    all non-bonded constants become homogeneous."""
    maker = getattr(sc.TabulatedForceField, name)
    ff = maker(two_chain_ca, nonbonded_mean=True)
    matrix = ff.interaction_matrix[:, :, 0]

    n = len(two_chain_ca)
    bonded_next = np.zeros(n, dtype=bool)
    same_chain = two_chain_ca.chain_id[:-1] == two_chain_ca.chain_id[1:]
    adjacent = np.diff(two_chain_ca.res_id) == 1
    bonded_next[:-1] = same_chain & adjacent

    offdiag_nonbonded = []
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 and bonded_next[i]:
                assert matrix[i, j] == pytest.approx(82.0)
            else:
                offdiag_nonbonded.append(matrix[i, j])
    # Homogeneous within intra- and inter-chain classes; for the MJ/Ke
    # variants intra == inter, so everything is one value
    uniq = np.unique(np.round(offdiag_nonbonded, 5))
    assert len(uniq) <= 2


def test_custom_forcefield_with_cutoff():
    """User-defined force field exercising the host path with a cutoff
    (cell-list and brute-force agreement)."""

    class DistanceRule(sc.ForceField):
        @property
        def cutoff_distance(self):
            return 10.0

        def force_constant(self, atom_i, atom_j, sq_distance):
            return 2.0 / (1.0 + sq_distance)

    rng = np.random.RandomState(3)
    coord = rng.rand(60, 3) * 25

    k_cell, pairs_cell = sc.compute_kirchhoff(coord, DistanceRule(), True)
    k_brute, pairs_brute = sc.compute_kirchhoff(coord, DistanceRule(), False)
    assert np.array_equal(pairs_cell, pairs_brute)
    assert np.allclose(k_cell, k_brute)

    h_cell, _ = sc.compute_hessian(coord, DistanceRule(), True)
    h_brute, _ = sc.compute_hessian(coord, DistanceRule(), False)
    assert np.allclose(h_cell, h_brute)
    assert np.allclose(h_cell, h_cell.T)


def test_pair_list_ordering(ca_1l2y):
    """Pairs are emitted in row-major order over the adjacency matrix
    (reference `np.where` semantics), identically on both backends."""
    ff = sc.InvariantForceField(8.0)
    _, pairs = sc.compute_kirchhoff(ca_1l2y.coord, ff)
    _, pairs_host = sc.compute_kirchhoff(
        ca_1l2y.coord, HostOnlyForceField(ff)
    )
    assert np.array_equal(pairs, pairs_host)
    # Row-major: lexicographically sorted
    keys = pairs[:, 0] * len(ca_1l2y) + pairs[:, 1]
    assert np.all(np.diff(keys) > 0)


def test_patched_force_field_nesting(two_chain_ca):
    """Patched-of-patched composes patches in the reference order: the
    concatenated shutdown/off patches apply first, then all pair_on
    re-enable — so an inner pair_on survives an outer pair_off.  Both
    backends must agree."""
    base = sc.InvariantForceField(7.0)
    inner = sc.PatchedForceField(
        base, contact_pair_on=np.array([[0, 30]]),
        force_constants=np.array([5.0]),
    )
    outer = sc.PatchedForceField(
        inner, contact_pair_off=np.array([[0, 30]]),
    )

    k_inner, pairs_inner = sc.compute_kirchhoff(two_chain_ca.coord, inner)
    assert k_inner[0, 30] == -5.0

    k_outer, pairs_outer = sc.compute_kirchhoff(two_chain_ca.coord, outer)
    k_host, pairs_host = sc.compute_kirchhoff(
        two_chain_ca.coord, HostOnlyForceField(outer)
    )
    assert np.array_equal(pairs_outer, pairs_host)
    assert np.allclose(k_outer, k_host)
    # pair_on wins over pair_off across nesting levels: the contact
    # stays adjacent …
    assert (pairs_outer == [0, 30]).all(axis=1).any()
    # … but the outer wrapper's cutoff masking zeroes the inner patched
    # constant for pairs beyond the cutoff (d(0, 30) > 7 A here) —
    # reference forcefield.py:188-195 semantics.
    assert k_outer[0, 30] == 0.0

    # Properties concatenate outer-first (reference contract)
    assert outer.contact_pair_on is not None
    assert outer.contact_pair_off is not None


def test_hessian_setter_roundtrip_via_covariance(ca_1l2y):
    """Setting covariance makes the Hessian its pseudo-inverse
    (reference `anm.py:106-118`)."""
    anm = sc.ANM(ca_1l2y, sc.InvariantForceField(13.0))
    cov = anm.covariance.copy()

    fresh = sc.ANM(ca_1l2y, sc.InvariantForceField(13.0))
    fresh.covariance = cov
    recovered = fresh.hessian
    ref = np.linalg.pinv(cov, hermitian=True, rcond=1e-6)
    assert np.allclose(recovered, ref, atol=1e-8)


def test_reference_module_layout():
    """Reference-style submodule imports must work."""
    from springcraft_tpu.forcefield import InvariantForceField
    from springcraft_tpu.anm import ANM
    from springcraft_tpu.gnm import GNM
    from springcraft_tpu.interaction import compute_kirchhoff
    import springcraft_tpu.nma as nma_mod

    assert InvariantForceField is sc.InvariantForceField
    assert ANM is sc.ANM
    assert GNM is sc.GNM
    assert compute_kirchhoff is sc.compute_kirchhoff
    assert nma_mod.eigen is sc.eigen


def test_ensemble_accepts_forcefield_objects(ca_1l2y):
    import jax.numpy as jnp

    from springcraft_tpu.parallel import ensemble_anm

    coords = np.repeat(ca_1l2y.coord[None], 3, axis=0)
    ff = sc.TabulatedForceField.e_anm(ca_1l2y)
    out = ensemble_anm(coords, ff, dtype=jnp.float64)

    anm = sc.ANM(ca_1l2y, ff)
    vals_ref, _ = anm.eigen()
    assert np.allclose(out["eig_values"][0], vals_ref, atol=1e-9)

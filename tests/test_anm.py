"""
ANM tests mirroring ``/root/reference/tests/test_anm.py``: Moore-Penrose
covariance identities, mass-weighting (bio3d golden data, including the
multi-chain 7cal patched sdENM case), BioPhysConnectoR eANM eigenvalues,
the combined frequency/fluctuation/DCC comparison, and ProDy PRS parity.

Expensive 7cal eigendecompositions are shared through module-scoped
fixtures.
"""

import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.structure import check_res_id_continuity, get_chain_count

from .conftest import load_csv

K_B = 1.380649e-23
N_A = 6.02214076e23


def _invariant_anm(ca, cutoff=13):
    return sc.ANM(ca, sc.InvariantForceField(cutoff))


@pytest.fixture(scope="module")
def anm13_1l2y(ca_1l2y):
    return _invariant_anm(ca_1l2y)


@pytest.fixture(scope="module")
def anm13_7cal(ca_7cal):
    return _invariant_anm(ca_7cal)


@pytest.mark.parametrize("struc_name", ["1l2y", "7cal"])
def test_covariance_pseudoinverse(struc_name, anm13_1l2y, anm13_7cal):
    anm = {"1l2y": anm13_1l2y, "7cal": anm13_7cal}[struc_name]
    hessian = anm.hessian
    covariance = anm.covariance

    if struc_name == "1l2y":
        assert np.allclose(hessian, hessian @ covariance @ hessian)
        assert np.allclose(covariance, covariance @ hessian @ covariance)
    else:
        # Moore-Penrose identities H = H C H and C = C H C checked on
        # random probe blocks: (H C H - H) X == 0 for a full-rank
        # 16-column probe X is equivalent up to probe rank, and avoids
        # two O(n^3) dense matmul chains (~2 min single-core at 5328
        # dims) that dwarf every other cost of the suite.
        rng = np.random.RandomState(0)
        x = rng.randn(hessian.shape[0], 16)
        hx = hessian @ x
        assert np.allclose(hessian @ (covariance @ hx), hx)
        cx = covariance @ x
        assert np.allclose(covariance @ (hessian @ cx), cx)


def test_mass_weighting_invariants(ca_1l2y):
    ff = sc.InvariantForceField(7.9)
    plain = sc.ANM(ca_1l2y, ff)
    unit = sc.ANM(ca_1l2y, ff, masses=np.ones(ca_1l2y.array_length()))
    varied = sc.ANM(
        ca_1l2y, ff,
        masses=np.arange(1, ca_1l2y.array_length() + 1, dtype=float),
    )

    assert np.allclose(unit.hessian, plain.hessian)
    assert not np.allclose(varied.hessian, plain.hessian)


@pytest.mark.parametrize("struc_name", ["1l2y", "7cal"])
def test_eanm_eigenvalues_vs_biophysconnector(struc_name, ca_by_name):
    ca = ca_by_name[struc_name]
    ff = sc.TabulatedForceField.e_anm(ca)
    eanm = sc.ANM(ca, ff)

    vals, _ = eanm.eigen()
    ref = load_csv(
        f"biophysconnector_anm_eanm_evals_{struc_name}.csv.gz", skip_header=1
    )
    assert np.allclose(vals[6:], ref[6:])


def _bio3d_forcefield(ca, ff_name):
    """Force field set-up for bio3d comparisons; multi-chain structures
    get the chain-connecting sdENM patch the reference applies for
    consistency with bio3d's chain handling."""
    if ff_name == "calpha":
        return sc.HinsenForceField()
    if ff_name == "pfanm":
        return sc.ParameterFreeForceField()
    ff = sc.TabulatedForceField.sd_enm(ca)
    if get_chain_count(ca) > 1:
        after_break = check_res_id_continuity(ca)
        pairs = np.stack([after_break - 1, after_break], axis=1)
        bonded_constant = 43.52 * 0.0083144621 * 300 * 10
        ff = sc.PatchedForceField(
            ff,
            contact_pair_off=pairs,
            contact_pair_on=pairs,
            force_constants=np.full(len(pairs), bonded_constant),
        )
    return ff


@pytest.mark.parametrize(
    "struc_name, ff_name",
    [("1l2y", "calpha"), ("1l2y", "sdenm"), ("1l2y", "pfanm"),
     ("7cal", "calpha"), ("7cal", "sdenm"), ("7cal", "pfanm")],
)
def test_mass_weighted_eigenvalues_vs_bio3d(struc_name, ff_name, ca_by_name):
    ca = ca_by_name[struc_name]
    ff = _bio3d_forcefield(ca, ff_name)

    masses = load_csv(f"bio3d_mass_{struc_name}.csv.gz")
    ref = load_csv(f"bio3d_anm_{ff_name}_ff_evals_mw_{struc_name}.csv.gz")

    anm = sc.ANM(ca, ff, masses=masses)
    vals, _ = anm.eigen()
    assert np.allclose(vals[6:], ref[6:], rtol=5e-3, atol=2e-3)


def test_invariant_nma_vs_prody(anm13_1l2y):
    """Frequencies, MSF and all DCC variants for the standard ANM."""
    anm = anm13_1l2y

    prody_evals = load_csv("prody_anm_13_ang_cutoff_evals_1l2y.csv.gz")
    ref_freq = np.sqrt(prody_evals) / (2 * np.pi)
    assert np.allclose(anm.frequencies()[6:], ref_freq[6:])

    assert np.allclose(
        anm.mean_square_fluctuation(tem=None),
        load_csv("prody_anm_13_ang_cutoff_fluctuations_1l2y.csv.gz"),
    )
    assert np.allclose(
        anm.dcc(), load_csv("prody_anm_13_ang_cutoff_dcc_norm_1l2y.csv.gz")
    )
    assert np.allclose(
        anm.dcc(norm=False),
        load_csv("prody_anm_13_ang_cutoff_dcc_absolute_1l2y.csv.gz"),
    )
    assert np.allclose(
        anm.dcc(mode_subset=np.arange(6, 36)),
        load_csv("prody_anm_13_ang_cutoff_dcc_norm_subset_1l2y.csv.gz"),
    )


def test_eanm_fluctuations_vs_biophysconnector(ca_1l2y):
    ff = sc.TabulatedForceField.e_anm(ca_1l2y)
    anm = sc.ANM(ca_1l2y, ff)
    fluc = anm.mean_square_fluctuation()
    ref = load_csv("biophysconnector_anm_eanm_bfacs_1l2y.csv.gz",
                   skip_header=1)
    assert np.allclose(fluc, ref)

    # Alternative MSF computation from the covariance diagonal
    diag = anm.covariance.diagonal()
    alternative = diag.reshape(len(ca_1l2y), 3).sum(axis=1)
    assert np.allclose(fluc, alternative)


@pytest.mark.parametrize("ff_name", ["calpha", "sdenm", "pfanm"])
def test_bio3d_nma_observables(ca_1l2y, ff_name):
    """Mass- and temperature-weighted frequencies, fluctuations and DCCs
    vs bio3d golden data."""
    tem = 300
    tem_scaling = K_B * N_A

    ff = _bio3d_forcefield(ca_1l2y, ff_name)
    masses = load_csv("bio3d_mass_1l2y.csv.gz")

    plain = sc.ANM(ca_1l2y, ff)
    weighted = sc.ANM(ca_1l2y, ff, masses=masses)

    ref_freq = load_csv(f"bio3d_anm_{ff_name}_ff_frequencies_mw_1l2y.csv.gz")
    assert np.allclose(weighted.frequencies()[6:], ref_freq[6:],
                       rtol=5e-3, atol=2e-3)

    fluc = weighted.mean_square_fluctuation(
        tem=tem, tem_factors=tem_scaling
    ) / (1000 * masses)
    ref_fluc = load_csv(
        f"bio3d_anm_{ff_name}_ff_fluctuations_non_mw_1l2y.csv.gz"
    )
    assert np.allclose(fluc, ref_fluc, rtol=5e-3, atol=2e-3)

    fluc_subset = weighted.mean_square_fluctuation(
        tem=tem, tem_factors=tem_scaling, mode_subset=np.arange(11, 33)
    ) / (1000 * masses)
    ref_subset = load_csv(
        f"bio3d_anm_{ff_name}_ff_fluctuations_subset_mw_1l2y.csv.gz"
    )
    assert np.allclose(fluc_subset, ref_subset, rtol=5e-3, atol=2e-3)

    assert np.allclose(
        weighted.dcc(), load_csv(f"bio3d_anm_{ff_name}_ff_dcc_mw_1l2y.csv.gz"),
        rtol=5e-3, atol=2e-3,
    )
    assert np.allclose(
        weighted.dcc(mode_subset=np.arange(6, 36)),
        load_csv(f"bio3d_anm_{ff_name}_ff_dcc_subset_mw_1l2y.csv.gz"),
        rtol=5e-3, atol=2e-3,
    )

    # Non-mass-weighted MSF equals the covariance-diagonal method
    fluc_nomw = plain.mean_square_fluctuation(tem=tem,
                                              tem_factors=tem_scaling)
    diag = plain.covariance.diagonal().reshape(len(ca_1l2y), 3).sum(axis=1)
    assert np.allclose(fluc_nomw, diag * tem * tem_scaling)


@pytest.mark.parametrize("struc_name", ["1l2y", "7cal"])
def test_prs_vs_prody(struc_name, anm13_1l2y, anm13_7cal):
    anm = {"1l2y": anm13_1l2y, "7cal": anm13_7cal}[struc_name]
    prs_mat, eff, sens = anm.prs_effector_sensor()

    if struc_name == "1l2y":
        ref_prs = load_csv("prody_anm_13_ang_cutoff_prs_mat_1l2y.csv.gz")
        assert np.allclose(prs_mat, ref_prs)
    ref_eff = load_csv(f"prody_anm_13_ang_cutoff_prs_eff_{struc_name}.csv.gz")
    ref_sens = load_csv(
        f"prody_anm_13_ang_cutoff_prs_sens_{struc_name}.csv.gz"
    )
    assert np.allclose(eff, ref_eff)
    assert np.allclose(sens, ref_sens)


def test_normal_mode_trajectory(anm13_1l2y):
    n = len(anm13_1l2y._coord)
    disp = anm13_1l2y.normal_mode(6, amplitude=2.0, frames=8)
    assert disp.shape == (8, n, 3)
    # Peak frame of a sine with 8 frames is frame 2 (t = 0.25)
    lengths = np.linalg.norm(disp[2], axis=-1)
    assert np.isclose(lengths.max(), 2.0)
    # Frame 0 is the undisplaced structure
    assert np.allclose(disp[0], 0.0)

    tri = anm13_1l2y.normal_mode(6, amplitude=1.0, frames=8,
                                 movement="triangle")
    assert tri.shape == (8, n, 3)
    with pytest.raises(ValueError):
        anm13_1l2y.normal_mode(6, 1.0, 8, movement="bogus")


def test_linear_response(anm13_1l2y):
    n = len(anm13_1l2y._coord)
    force = np.zeros((n, 3))
    force[0, 0] = 1.0

    disp = anm13_1l2y.linear_response(force)
    assert disp.shape == (n, 3)
    # Flat input must give the same answer
    disp_flat = anm13_1l2y.linear_response(force.flatten())
    assert np.allclose(disp, disp_flat)
    # Equals the corresponding covariance column, folded
    assert np.allclose(disp.flatten(), anm13_1l2y.covariance[:, 0])

    with pytest.raises(ValueError):
        anm13_1l2y.linear_response(np.zeros((n + 1, 3)))
    with pytest.raises(ValueError):
        anm13_1l2y.linear_response(np.zeros(5))
    with pytest.raises(ValueError):
        anm13_1l2y.linear_response(np.zeros((1, 2, 3)))


def test_hessian_setter(ca_1l2y):
    anm = _invariant_anm(ca_1l2y, 13)
    n3 = 3 * len(ca_1l2y)
    with pytest.raises(IndexError):
        anm.hessian = np.zeros((5, 5))
    with pytest.raises(IndexError):
        anm.covariance = np.zeros((5, 5))

    scaled = _invariant_anm(ca_1l2y, 13)
    scaled.hessian = anm.hessian * 2.0
    vals, _ = anm.eigen()
    vals2, _ = scaled.eigen()
    assert np.allclose(vals2, vals * 2.0)


def test_nma_type_dispatch(ca_1l2y):
    gnm = sc.GNM(ca_1l2y, sc.InvariantForceField(7.0))
    with pytest.raises(ValueError):
        sc.normal_mode(gnm, 1, 1.0, 8)
    with pytest.raises(ValueError):
        sc.linear_response(gnm, np.zeros(3 * len(ca_1l2y)))
    with pytest.raises(ValueError):
        sc.prs(gnm)
    with pytest.raises(ValueError):
        sc.eigen(object())

"""
Batched blocked SPD inverse (`ops.pallas_linalg`): panel kernel
correctness, blocked inverse vs `np.linalg.inv`, and equivalence of the
`inverse="blocked"` covariance engine with the `cho_solve` path in
`ops.rigid.covariance_cholesky` / the ensemble fluctuation pipelines.

Kernels run in interpret mode on the CPU backend (compiled-Mosaic
behavior is covered by `bench.py --smoke` on the real chip).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from springcraft_tpu.ops import ffparams, pallas_linalg, rigid
from springcraft_tpu.parallel import pipeline


def _random_spd(b, m, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    a = rng.randn(b, m, m).astype(dtype)
    return a @ a.transpose(0, 2, 1) / m + 3.0 * np.eye(m, dtype=dtype)


def _random_coords(b, n, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(n, 3) * 12.0).astype(np.float32)
    return base[None] + 0.05 * rng.randn(b, n, 3).astype(np.float32)


@pytest.mark.parametrize("pb", [16, 64])
def test_panel_cholesky_matches_numpy(pb):
    d = _random_spd(5, pb, seed=1)
    l, w = pallas_linalg.panel_cholesky_batched(jnp.asarray(d))
    l, w = np.asarray(l), np.asarray(w)
    ref = np.linalg.cholesky(d)
    assert np.allclose(l, ref, atol=1e-5 * np.max(np.abs(ref)))
    # W = L^-1
    assert np.allclose(w @ ref, np.eye(pb)[None], atol=2e-5)
    # strict upper triangles are exactly zero
    iu = np.triu_indices(pb, k=1)
    assert np.all(l[:, iu[0], iu[1]] == 0)
    assert np.all(w[:, iu[0], iu[1]] == 0)


@pytest.mark.parametrize("pb", [16, 64])
def test_panel_inverse_augmented_matches_numpy(pb):
    d = _random_spd(5, pb, seed=4)
    w = np.asarray(pallas_linalg.panel_inverse_batched(jnp.asarray(d)))
    ref = np.linalg.cholesky(d.astype(np.float64))
    assert np.allclose(w @ ref, np.eye(pb)[None], atol=2e-5)
    iu = np.triu_indices(pb, k=1)
    assert np.all(w[:, iu[0], iu[1]] == 0)


def test_panel_inverse_batch_padding():
    d = _random_spd(3, 16, seed=5)
    w = np.asarray(pallas_linalg.panel_inverse_batched(
        jnp.asarray(d), batch_chunk=8))
    ref = np.linalg.inv(np.linalg.cholesky(d.astype(np.float64)))
    assert w.shape == (3, 16, 16)
    assert np.allclose(w, ref, atol=2e-5)


def test_panel_cholesky_batch_padding():
    # batch not a multiple of the chunk: padded entries must not
    # contaminate real results
    d = _random_spd(3, 16, seed=2)
    l, w = pallas_linalg.panel_cholesky_batched(jnp.asarray(d),
                                                batch_chunk=8)
    assert np.allclose(np.asarray(l), np.linalg.cholesky(d), atol=1e-5)
    assert l.shape == (3, 16, 16)


@pytest.mark.parametrize("m,block", [(60, 32), (150, 32), (96, 96)])
def test_spd_inverse_blocked_matches_inv(m, block):
    a = _random_spd(4, m, seed=3)
    inv = np.asarray(pallas_linalg.spd_inverse_blocked(
        jnp.asarray(a), block=block))
    ref = np.linalg.inv(a.astype(np.float64))
    assert np.max(np.abs(inv - ref)) / np.max(np.abs(ref)) < 1e-5


def test_spd_inverse_blocked_unbatched_and_f64():
    a = _random_spd(1, 70, seed=4)[0].astype(np.float64)
    inv = np.asarray(pallas_linalg.spd_inverse_blocked(
        jnp.asarray(a), block=32))
    assert inv.shape == (70, 70)
    assert np.allclose(inv @ a, np.eye(70), atol=1e-10)


def test_covariance_cholesky_blocked_engine_matches():
    coords = _random_coords(3, 40, seed=5)
    params = ffparams.invariant_params(7.0)
    from springcraft_tpu.ops import assembly

    hessians = jnp.stack([
        assembly.hessian_matrix(jnp.asarray(c), params, jnp,
                                dtype=jnp.float32, layout="xyz")
        for c in coords
    ])
    bases = jnp.stack([
        rigid.rigid_modes_anm(jnp.asarray(c), layout="xyz")
        for c in coords
    ])
    ref = rigid.covariance_cholesky(hessians, bases)
    got = rigid.covariance_cholesky(hessians, bases, inverse="blocked")
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-4


def test_blocked_breakdown_is_detectable():
    # A matrix that is not SPD (rank-deficient beyond the caller's
    # regularization) must surface as non-finite output — matching XLA
    # cholesky's detectable NaN — never silent finite garbage.
    a = _random_spd(2, 32, seed=9)
    u = np.random.RandomState(9).randn(2, 32, 1).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    deficient = a - (a @ u) @ np.swapaxes(a @ u, 1, 2) / np.einsum(
        "bif,bif->b", u, a @ u)[:, None, None]
    inv = np.asarray(pallas_linalg.spd_inverse_blocked(
        jnp.asarray(deficient), block=16))
    assert not np.isfinite(inv).all()


def test_covariance_cholesky_blocked_rejects_block_size():
    a = jnp.asarray(_random_spd(1, 12)[0])
    basis = jnp.ones((12, 1)) / np.sqrt(12)
    with pytest.raises(ValueError, match="incompatible"):
        rigid.covariance_cholesky(a, basis, block_size=4,
                                  inverse="blocked")


def test_covariance_cholesky_rejects_unknown_engine():
    a = jnp.asarray(_random_spd(1, 12)[0])
    with pytest.raises(ValueError, match="inverse engine"):
        rigid.covariance_cholesky(a, jnp.ones((12, 1)) / np.sqrt(12),
                                  inverse="qr")


@pytest.mark.parametrize("with_prs", [False, True])
def test_ensemble_anm_fluctuations_blocked_matches_vmap(with_prs):
    coords = _random_coords(4, 30, seed=6)
    params = ffparams.invariant_params(7.0)
    ref = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="cho_solve", with_prs=with_prs)
    got = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked", with_prs=with_prs)
    assert set(got) == set(ref)
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        err = float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale
        assert err < 2e-4, (key, err)


def test_ensemble_gnm_fluctuations_blocked_matches_vmap():
    coords = _random_coords(4, 30, seed=7)
    params = ffparams.invariant_params(7.0)
    ref = pipeline.ensemble_gnm_fluctuations(
        coords, params, inverse="cho_solve")
    got = pipeline.ensemble_gnm_fluctuations(
        coords, params, inverse="blocked")
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        assert float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale < 2e-4


def test_ensemble_spectral_blocked_matches_cho_solve():
    coords = _random_coords(3, 24, seed=10)
    params = ffparams.invariant_params(7.0)
    ref = pipeline.ensemble_anm_spectral(
        coords, params, n_modes=4, inverse="cho_solve")
    got = pipeline.ensemble_anm_spectral(
        coords, params, n_modes=4, inverse="blocked")
    for key in ("covariance", "msf", "dcc", "eig_values",
                "mode_values"):
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        err = float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale
        assert err < 5e-4, (key, err)


def test_ensemble_gnm_spectral_matches_single():
    coords = _random_coords(3, 24, seed=11)
    params = ffparams.invariant_params(7.0)
    ens = pipeline.ensemble_gnm_spectral(
        coords, params, n_modes=3, inverse="cho_solve")
    for i in range(3):
        one = pipeline.gnm_spectral(jnp.asarray(coords[i]), params)
        for key in ("covariance", "msf", "eig_values", "dcc"):
            scale = float(jnp.max(jnp.abs(one[key]))) or 1.0
            err = float(jnp.max(jnp.abs(ens[key][i] - one[key]))) / scale
            assert err < 5e-4, (key, err)
    # blocked engine agrees
    blk = pipeline.ensemble_gnm_spectral(
        coords, params, n_modes=3, inverse="blocked")
    for key in ("covariance", "msf", "eig_values", "mode_values"):
        scale = float(jnp.max(jnp.abs(ens[key]))) or 1.0
        assert float(jnp.max(jnp.abs(blk[key] - ens[key]))) / scale < 5e-4


def test_ensemble_fluctuations_blocked_masses():
    coords = _random_coords(3, 25, seed=8)
    params = ffparams.invariant_params(7.0)
    masses = np.linspace(1.0, 3.0, 25).astype(np.float32)
    ref = pipeline.ensemble_anm_fluctuations(
        coords, params, masses=jnp.asarray(masses), inverse="cho_solve")
    got = pipeline.ensemble_anm_fluctuations(
        coords, params, masses=jnp.asarray(masses), inverse="blocked")
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        assert float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale < 2e-4


def test_ensemble_fluctuations_megabatch_chunked():
    """chunk= must produce identical results to the unchunked blocked
    pipeline (one lax.map program vs one call), ANM and GNM."""
    coords = _random_coords(6, 30, seed=6)
    params = ffparams.invariant_params(7.0)
    ref = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked")
    got = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked", chunk=2)
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        assert float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale < 1e-6

    gref = pipeline.ensemble_gnm_fluctuations(
        coords, params, inverse="blocked")
    ggot = pipeline.ensemble_gnm_fluctuations(
        coords, params, inverse="blocked", chunk=3)
    for key in gref:
        scale = float(jnp.max(jnp.abs(gref[key]))) or 1.0
        assert float(jnp.max(jnp.abs(ggot[key] - gref[key]))) / scale < 1e-6

    # chunk >= batch is a no-op; non-divisible batches are rejected
    same = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked", chunk=6)
    assert set(same) == set(ref)
    with pytest.raises(ValueError, match="divide"):
        pipeline.ensemble_anm_fluctuations(
            coords, params, inverse="blocked", chunk=4)


def test_fused_prep_planes_matches_concatenated():
    """The fused regularize/stitch prep fed by raw assembly planes must
    reproduce the concatenated-Hessian prep to f32 rounding (the rank-6
    null-space term is exact-f32 broadcast fmas in the kernel vs a
    HIGHEST bf16x6 matmul in the XLA path — one ULP apart), and the
    planes-based covariance / trace engines must match the assembled
    blocked engines."""
    from springcraft_tpu.ops import pallas_kernels, rigid as rigid_mod
    import jax

    coords = jnp.asarray(_dense_coords(4, 37, seed=11))
    n = coords.shape[1]
    params = ffparams.invariant_params(7.0)

    h = pallas_kernels.hessian_pallas_ensemble(coords, params,
                                               dtype=jnp.float32)
    planes = pallas_kernels.hessian_pallas_ensemble(
        coords, params, dtype=jnp.float32, raw_planes=True)
    assert len(planes) == 9
    # raw planes reassemble to the concatenated Hessian exactly
    hs = jnp.concatenate(
        [jnp.concatenate([planes[3 * a + b][:, :n, :n]
                          for b in range(3)], axis=2)
         for a in range(3)], axis=1)
    assert float(jnp.max(jnp.abs(hs - h))) == 0.0

    bases = jax.vmap(
        lambda c: rigid_mod.rigid_modes_anm(c, layout="xyz")
    )(coords).astype(jnp.float32)

    ref_reg, ref_scale, ref_sigma = rigid_mod._regularize_equilibrated(
        h, bases, None, pad_to=pallas_linalg.padded_size(3 * n))
    got_reg, got_scale, got_sigma = \
        rigid_mod._regularize_equilibrated_planes(planes, n, bases, None)
    assert float(jnp.max(jnp.abs(got_reg - ref_reg))) < 1e-6
    assert float(jnp.max(jnp.abs(got_scale - ref_scale))) == 0.0
    assert float(jnp.max(jnp.abs(got_sigma - ref_sigma))) == 0.0

    ref_tr = rigid_mod.covariance_plane_traces(h, bases,
                                               inverse="blocked")
    got_tr = rigid_mod.covariance_plane_traces_from_planes(
        planes, n, bases)
    scale = float(jnp.max(jnp.abs(ref_tr)))
    assert float(jnp.max(jnp.abs(got_tr - ref_tr))) / scale < 1e-5

    ref_cov = rigid_mod.covariance_cholesky(h, bases, inverse="blocked")
    got_cov = rigid_mod.covariance_cholesky_from_planes(planes, n, bases)
    scale = float(jnp.max(jnp.abs(ref_cov)))
    assert float(jnp.max(jnp.abs(got_cov - ref_cov))) / scale < 1e-5


def test_fused_prep_planes_masses():
    """Mass weights fold into the stitch kernel's scale vector:
    planes stay unweighted, results match weighting the assembled
    Hessian (different association order -> small f32 tolerance)."""
    from springcraft_tpu.ops import pallas_kernels, rigid as rigid_mod
    import jax

    coords = jnp.asarray(_dense_coords(3, 29, seed=12))
    n = coords.shape[1]
    params = ffparams.invariant_params(7.0)
    masses = jnp.asarray(np.linspace(1.0, 3.0, n).astype(np.float32))

    h = pallas_kernels.hessian_pallas_ensemble(coords, params,
                                               dtype=jnp.float32)
    # mass-weighted Hessian convention: W = diag(1 / sqrt(m))
    w_xyz = jnp.tile(1.0 / jnp.sqrt(masses), 3)
    hw = h * w_xyz[None, :, None] * w_xyz[None, None, :]
    planes = pallas_kernels.hessian_pallas_ensemble(
        coords, params, dtype=jnp.float32, raw_planes=True)
    bases = jax.vmap(
        lambda c: rigid_mod.rigid_modes_anm(c, masses=masses,
                                            layout="xyz")
    )(coords).astype(jnp.float32)

    ref = rigid_mod.covariance_plane_traces(hw, bases, inverse="blocked")
    got = rigid_mod.covariance_plane_traces_from_planes(
        planes, n, bases, masses=masses)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 5e-6


def _dense_coords(b, n, seed):
    # tighter spread than _random_coords: guarantees a connected
    # network at cutoff 7 (a disconnected one has a >6-dim null space
    # and the factor surfaces breakdown as NaN by design)
    rng = np.random.RandomState(seed)
    base = (rng.rand(n, 3) * 6.0).astype(np.float32)
    return base[None] + 0.05 * rng.randn(b, n, 3).astype(np.float32)


def test_fused_prep_pipeline_use_pallas():
    """With use_pallas=True the blocked ensemble pipeline takes the
    fused planes path (CPU: interpret mode) — observables must match
    the XLA-assembled blocked pipeline."""
    coords = _dense_coords(4, 30, seed=13)
    params = ffparams.invariant_params(7.0)
    for kwargs in ({}, {"with_covariance": False}):
        ref = pipeline.ensemble_anm_fluctuations(
            coords, params, inverse="blocked", use_pallas=False, **kwargs)
        got = pipeline.ensemble_anm_fluctuations(
            coords, params, inverse="blocked", use_pallas=True, **kwargs)
        for key in ref:
            scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
            dev = float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale
            assert dev < 1e-4, (key, kwargs, dev)

    # masses through the fused path
    masses = jnp.asarray(np.linspace(0.8, 2.5, 30).astype(np.float32))
    ref = pipeline.ensemble_anm_fluctuations(
        coords, params, masses=masses, inverse="blocked",
        use_pallas=False)
    got = pipeline.ensemble_anm_fluctuations(
        coords, params, masses=masses, inverse="blocked",
        use_pallas=True)
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        assert float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale < 2e-5


def test_fused_prep_pipeline_tabulated(ca_1l2y):
    """The tabulated (table_compact) family through the fused planes
    path: its assembly tile comes from _ensemble_tile, the raw planes
    carry a pad region, and the stitch plan may host-truncate them —
    results must still match the XLA-assembled blocked pipeline."""
    import springcraft_tpu as sc

    ff = sc.TabulatedForceField.sd_enm(ca_1l2y)
    params = ff.to_compact_params()
    rng = np.random.RandomState(3)
    coords = (ca_1l2y.coord[None]
              + 0.05 * rng.randn(3, len(ca_1l2y), 3)).astype(np.float32)
    ref = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked", use_pallas=False,
        with_covariance=False)
    got = pipeline.ensemble_anm_fluctuations(
        coords, params, inverse="blocked", use_pallas=True,
        with_covariance=False)
    for key in ref:
        scale = float(jnp.max(jnp.abs(ref[key]))) or 1.0
        dev = float(jnp.max(jnp.abs(got[key] - ref[key]))) / scale
        assert dev < 1e-4, (key, dev)

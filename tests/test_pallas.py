"""
Pallas kernel parity tests (interpreter mode on CPU): the fused tiled
assembly must match the XLA dense path at float32 precision for every
supported force-field family, including padded (non-tile-divisible)
sizes and the compact tabulated family.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import springcraft_tpu as sc
from springcraft_tpu.ops import assembly, ffparams, pallas_kernels


def _rel_err(test, ref):
    scale = max(float(np.max(np.abs(ref))), 1e-12)
    return float(np.max(np.abs(test - ref))) / scale


@pytest.fixture(scope="module")
def coords():
    rng = np.random.RandomState(0)
    return (rng.rand(100, 3) * 12).astype(np.float32)


@pytest.mark.parametrize(
    "make_params",
    [
        lambda: ffparams.invariant_params(8.0),
        lambda: ffparams.hinsen_params(),
        lambda: ffparams.pfenm_params(),
        lambda: ffparams.hinsen_params(9.0),
    ],
)
@pytest.mark.parametrize("tile", [32, 64])
def test_hessian_analytic(coords, make_params, tile):
    params = make_params()
    ref = np.asarray(
        assembly.hessian_matrix(coords.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(coords, params, tile=tile,
                                      interpret=True)
    )
    assert test.shape == ref.shape
    assert _rel_err(test, ref) < 1e-6


@pytest.mark.parametrize("tile", [32])
def test_kirchhoff_analytic(coords, tile):
    for params in (ffparams.invariant_params(8.0), ffparams.pfenm_params()):
        ref = np.asarray(
            assembly.kirchhoff_matrix(coords.astype(np.float64), params,
                                      jnp)
        ).astype(np.float32)
        test = np.asarray(
            pallas_kernels.kirchhoff_pallas(coords, params, tile=tile,
                                            interpret=True)
        )
        assert _rel_err(test, ref) < 1e-6


@pytest.fixture(scope="module")
def shifted_two_chain(ca_1l2y):
    first = ca_1l2y.copy()
    second = ca_1l2y.copy()
    first.chain_id[:] = "A"
    second.chain_id[:] = "B"
    second.coord = second.coord + np.float32(8.0)
    return first + second


@pytest.mark.parametrize("maker", ["e_anm", "sd_enm", "s_enm_10"])
def test_hessian_tabulated_compact(shifted_two_chain, maker):
    ff = getattr(sc.TabulatedForceField, maker)(shifted_two_chain)
    params = ff.to_compact_params()
    coord = shifted_two_chain.coord

    ref = np.asarray(
        assembly.hessian_matrix(coord.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(coord, params, tile=16,
                                      interpret=True)
    )
    assert _rel_err(test, ref) < 1e-5

    kref = np.asarray(
        assembly.kirchhoff_matrix(coord.astype(np.float64), params, jnp)
    ).astype(np.float32)
    ktest = np.asarray(
        pallas_kernels.kirchhoff_pallas(coord, params, tile=16,
                                        interpret=True)
    )
    assert _rel_err(ktest, kref) < 1e-5


def test_padding(coords):
    """Non-tile-divisible n exercises the pad + slice path."""
    params = ffparams.invariant_params(8.0)
    sub = coords[:70]
    ref = np.asarray(
        assembly.hessian_matrix(sub.astype(np.float64), params, jnp,
                                layout="xyz")
    ).astype(np.float32)
    test = np.asarray(
        pallas_kernels.hessian_pallas(sub, params, tile=32, interpret=True)
    )
    assert test.shape == (210, 210)
    assert _rel_err(test, ref) < 1e-6


def test_unsupported_params_raise(coords):
    params = ffparams.table_pair_params(np.zeros((100, 100, 1)), None)
    with pytest.raises(ValueError):
        pallas_kernels.hessian_pallas(coords, params)
    assert not pallas_kernels.supports_params(params)

# ---------------------------------------------------------------------------
# Batched ensemble kernels
# ---------------------------------------------------------------------------

def _jiggle(coord, n_conf, scale=0.3, seed=7):
    rng = np.random.RandomState(seed)
    return (coord[None] + scale * rng.randn(n_conf, *coord.shape)
            ).astype(np.float32)


@pytest.mark.parametrize("maker", ["e_anm", "sd_enm"])
def test_hessian_ensemble_tabulated(shifted_two_chain, maker):
    """Batch-inside-kernel assembly with hoisted pair-constant planes
    must match vmap of the single-structure kernel exactly (the same
    table values are selected either way)."""
    ff = getattr(sc.TabulatedForceField, maker)(shifted_two_chain)
    params = ff.to_compact_params()
    coords = _jiggle(shifted_two_chain.coord, 3)

    assert pallas_kernels.supports_ensemble(params, coords.shape[1])
    test = np.asarray(
        pallas_kernels.hessian_pallas_ensemble(coords, params, tile=16,
                                               interpret=True)
    )
    for c, t in zip(coords, test):
        ref = np.asarray(
            assembly.hessian_matrix(c.astype(np.float64), params, jnp,
                                    layout="xyz")
        ).astype(np.float32)
        assert _rel_err(t, ref) < 1e-5

    ktest = np.asarray(
        pallas_kernels.kirchhoff_pallas_ensemble(coords, params, tile=16,
                                                 interpret=True)
    )
    for c, t in zip(coords, ktest):
        kref = np.asarray(
            assembly.kirchhoff_matrix(c.astype(np.float64), params, jnp)
        ).astype(np.float32)
        assert _rel_err(t, kref) < 1e-5


@pytest.mark.parametrize("maker", ["e_anm", "sd_enm"])
def test_hessian_ensemble_batch_inner_grid(shifted_two_chain, maker):
    """The conformer-innermost grid order (pair-plane block reuse
    across the batch, per-conformer accumulator slots) is bit-identical
    to the conformer-middle order for both batched kernels, and the
    auto rule picks it exactly for the tabulated family with a
    VMEM-sized accumulator."""
    ff = getattr(sc.TabulatedForceField, maker)(shifted_two_chain)
    params = ff.to_compact_params()
    coords = _jiggle(shifted_two_chain.coord, 3)

    h_mid = np.asarray(pallas_kernels.hessian_pallas_ensemble(
        coords, params, tile=16, interpret=True, batch_inner=False))
    h_inner = np.asarray(pallas_kernels.hessian_pallas_ensemble(
        coords, params, tile=16, interpret=True, batch_inner=True))
    assert np.array_equal(h_mid, h_inner)

    k_mid = np.asarray(pallas_kernels.kirchhoff_pallas_ensemble(
        coords, params, tile=16, interpret=True, batch_inner=False))
    k_inner = np.asarray(pallas_kernels.kirchhoff_pallas_ensemble(
        coords, params, tile=16, interpret=True, batch_inner=True))
    assert np.array_equal(k_mid, k_inner)

    # auto: on for tabulated with a small accumulator, off for
    # analytic families (no pair planes to reuse) and huge batches
    f32, f64 = np.float32, np.float64
    assert pallas_kernels._batch_inner_auto(params, 128, 128, 9, f32)
    assert not pallas_kernels._batch_inner_auto(params, 8192, 128, 9, f32)
    assert not pallas_kernels._batch_inner_auto(
        ffparams.invariant_params(8.0), 128, 128, 9, f32)
    # the VMEM accumulator guard scales with the kernel dtype: a
    # configuration just under the 4 MB limit in f32 is over it in f64
    assert pallas_kernels._batch_inner_auto(params, 128, 512, 9, f32)
    assert not pallas_kernels._batch_inner_auto(params, 128, 512, 9, f64)

    # the analytic families accept an explicit override too
    inv = ffparams.invariant_params(8.0)
    a_mid = np.asarray(pallas_kernels.hessian_pallas_ensemble(
        coords, inv, tile=16, interpret=True, batch_inner=False))
    a_inner = np.asarray(pallas_kernels.hessian_pallas_ensemble(
        coords, inv, tile=16, interpret=True, batch_inner=True))
    assert np.array_equal(a_mid, a_inner)


def test_hessian_ensemble_analytic(coords):
    """The analytic families run through the same batched kernel when
    called explicitly (the pipelines vmap them instead)."""
    params = ffparams.invariant_params(8.0)
    batch = _jiggle(coords[:70], 2)
    test = np.asarray(
        pallas_kernels.hessian_pallas_ensemble(batch, params, tile=32,
                                               interpret=True)
    )
    assert test.shape == (2, 210, 210)
    for c, t in zip(batch, test):
        ref = np.asarray(
            assembly.hessian_matrix(c.astype(np.float64), params, jnp,
                                    layout="xyz")
        ).astype(np.float32)
        assert _rel_err(t, ref) < 1e-6


def test_pair_constant_planes_values(shifted_two_chain):
    """The precomputed planes must reproduce the reference interaction
    rules: bonded neighbours read the bonded table, same-chain pairs the
    intra table, cross-chain pairs the inter table."""
    ff = sc.TabulatedForceField.sd_enm(shifted_two_chain)
    params = ff.to_compact_params()
    n = len(shifted_two_chain)
    planes = np.asarray(
        pallas_kernels.pair_constant_planes(params, n, n)
    )
    assert planes.shape == (params.n_bins, n, n)
    ti = np.asarray(params.type_idx)
    bins_to_check = [0, params.n_bins // 2, params.n_bins - 1]
    n_half = n // 2  # two equal chains appended
    for b in bins_to_check:
        # bonded neighbour inside chain A
        assert planes[b, 0, 1] == pytest.approx(
            float(np.asarray(params.bonded_table)[ti[0], ti[1], b]))
        # non-bonded same-chain pair
        assert planes[b, 0, 2] == pytest.approx(
            float(np.asarray(params.intra_table)[ti[0], ti[2], b]))
        # cross-chain pair
        assert planes[b, 0, n_half + 2] == pytest.approx(
            float(np.asarray(params.inter_table)[ti[0], ti[n_half + 2], b]))
        # chain boundary: last of A / first of B must NOT be bonded
        assert planes[b, n_half - 1, n_half] == pytest.approx(
            float(np.asarray(params.inter_table)[
                ti[n_half - 1], ti[n_half], b]))


# ---------------------------------------------------------------------------
# Patch overlays: sparse rank correction on top of the fused kernels
# ---------------------------------------------------------------------------


def _overlay_params(coord, base):
    """An overlay that switches off real contacts and forces on a
    distant pair with an override value."""
    n = len(coord)
    d2 = np.sum((coord[:, None] - coord[None, :]) ** 2, axis=-1)
    off = np.zeros((n, n), bool)
    on = np.zeros((n, n), bool)
    values = np.zeros((n, n))
    ci, cj = np.nonzero(np.triu(d2 <= 36.0, 1))
    for t in range(min(3, len(ci))):
        off[ci[t], cj[t]] = off[cj[t], ci[t]] = True
    far = np.unravel_index(np.argmax(d2), d2.shape)
    on[far] = on[far[::-1]] = True
    values[far] = values[far[::-1]] = 2.5
    return ffparams.with_overlay(base, off, on, values, on.copy())


def test_hessian_pallas_overlays_match_dense(coords):
    params = _overlay_params(coords, ffparams.invariant_params(8.0))
    assert pallas_kernels.supports_params(params)
    ref = np.asarray(assembly.hessian_matrix(
        coords.astype(np.float64), params, jnp, layout="xyz"))
    test = np.asarray(pallas_kernels.hessian_pallas(
        coords, params, tile=32, interpret=True))
    assert _rel_err(test, ref.astype(np.float32)) < 1e-6


def test_kirchhoff_pallas_overlays_match_dense(coords):
    params = _overlay_params(coords, ffparams.invariant_params(8.0))
    ref = np.asarray(assembly.kirchhoff_matrix(
        coords.astype(np.float64), params, jnp))
    test = np.asarray(pallas_kernels.kirchhoff_pallas(
        coords, params, tile=32, interpret=True))
    assert _rel_err(test, ref.astype(np.float32)) < 1e-6


def test_ensemble_kernels_overlays_match_dense(coords):
    params = _overlay_params(coords, ffparams.invariant_params(8.0))
    rng = np.random.RandomState(5)
    batch = np.stack([coords,
                      coords + 0.02 * rng.randn(*coords.shape)
                      .astype(np.float32)])
    ref_h = np.stack([np.asarray(assembly.hessian_matrix(
        c.astype(np.float64), params, jnp, layout="xyz")) for c in batch])
    test_h = np.asarray(pallas_kernels.hessian_pallas_ensemble(
        batch, params, tile=32, interpret=True))
    assert _rel_err(test_h, ref_h.astype(np.float32)) < 1e-6
    ref_k = np.stack([np.asarray(assembly.kirchhoff_matrix(
        c.astype(np.float64), params, jnp)) for c in batch])
    test_k = np.asarray(pallas_kernels.kirchhoff_pallas_ensemble(
        batch, params, tile=32, interpret=True))
    assert _rel_err(test_k, ref_k.astype(np.float32)) < 1e-6

    # an explicit batch_inner override survives the overlay recursion
    # (the stripped-params base must not silently re-auto-select)
    for bi in (False, True):
        h_bi = np.asarray(pallas_kernels.hessian_pallas_ensemble(
            batch, params, tile=32, interpret=True, batch_inner=bi))
        assert _rel_err(h_bi, ref_h.astype(np.float32)) < 1e-6
        k_bi = np.asarray(pallas_kernels.kirchhoff_pallas_ensemble(
            batch, params, tile=32, interpret=True, batch_inner=bi))
        assert _rel_err(k_bi, ref_k.astype(np.float32)) < 1e-6


def test_patched_force_field_routes_through_pallas(two_chain_ca):
    """A model-level PatchedForceField (reference forcefield.py:117-261)
    now satisfies supports_params, so the fused kernels accept its
    to_params() output directly."""
    inner = sc.InvariantForceField(8.0)
    ff = sc.PatchedForceField(inner, contact_pair_on=[(0, 30)],
                              force_constants=[4.0])
    params = ff.to_params(two_chain_ca.array_length())
    assert pallas_kernels.supports_params(params)
    coord = np.asarray(two_chain_ca.coord, np.float32)
    ref = np.asarray(assembly.hessian_matrix(
        coord.astype(np.float64), params, jnp, layout="xyz"))
    test = np.asarray(pallas_kernels.hessian_pallas(
        coord, params, tile=32, interpret=True))
    assert _rel_err(test, ref.astype(np.float32)) < 1e-6

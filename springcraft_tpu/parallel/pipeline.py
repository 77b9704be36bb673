"""
Fused, jit-compiled NMA pipelines.

These are the TPU throughput paths: one traced function goes from
coordinates to observables (assembly -> eigh -> MSF/B-factors/
frequencies/DCC) with static shapes throughout, so XLA fuses the
elementwise work into the assembly and the whole pipeline is
``vmap``-able over conformer ensembles and shardable over device meshes.

Unlike the user-facing model classes (which mirror the reference's lazy
OO API), everything here is purely functional: force fields enter as
:class:`FFParams` pytrees, observables leave as a flat dict of arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import assembly, nma_core, rigid

__all__ = [
    "anm_observables",
    "anm_spectral",
    "gnm_spectral",
    "gnm_observables",
    "anm_fluctuations",
    "gnm_fluctuations",
    "ensemble_anm",
    "ensemble_anm_spectral",
    "ensemble_gnm_spectral",
    "ensemble_gnm",
    "ensemble_anm_fluctuations",
    "ensemble_gnm_fluctuations",
]


def _mass_weight(matrix, masses, repeat3):
    if masses is None:
        return matrix
    w = 1.0 / jnp.sqrt(masses)
    if repeat3:
        w = jnp.repeat(w, 3)
    return matrix * jnp.outer(w, w)


def _resolve_use_pallas(use_pallas, params, dtype):
    """``"auto"`` (the default) takes the fused Pallas assembly on TPU
    for float32 whenever the family is supported — measured ~10x for
    tabulated assembly vs the XLA dense path, parity-checked compiled
    in ``bench.py --smoke``.  Compiled Mosaic needs a real TPU and the
    kernels are f32; everything else resolves to the XLA path."""
    if use_pallas == "auto":
        from ..ops import pallas_kernels

        return (jax.default_backend() == "tpu"
                and dtype == jnp.float32
                and pallas_kernels.supports_params(params))
    return use_pallas


def _build_hessian_xyz(coord, params, dtype, use_pallas):
    """Dense (3n, 3n) xyz-layout Hessian via XLA or the Pallas kernel."""
    if _resolve_use_pallas(use_pallas, params, dtype):
        from ..ops import pallas_kernels

        return pallas_kernels.hessian_pallas(coord, params, dtype=dtype)
    return assembly.hessian_matrix(coord, params, jnp, dtype=dtype,
                                   layout="xyz")


@functools.partial(
    jax.jit,
    static_argnames=("with_dcc", "with_covariance", "n_modes", "dtype",
                     "use_pallas"),
)
def anm_observables(coord, params, masses=None, *, with_dcc=False,
                    with_covariance=False, n_modes=None, dtype=jnp.float32,
                    use_pallas="auto", tem=None, tem_factors=nma_core.K_B):
    """
    Full ANM NMA for one structure: Hessian (xyz plane layout), batched
    eigensolve, and the standard observables with the six trivial modes
    excluded.

    Parameters
    ----------
    coord : ndarray, shape=(n, 3)
    params : FFParams
    masses : ndarray, shape=(n,), optional
        Mass-weights the Hessian like the reference (``anm.py:89-96``).
    with_dcc : bool
        Also return the normalized ``(n, n)`` DCC matrix.
    with_covariance : bool
        Also return the pseudo-inverse covariance (xyz layout).
    n_modes : int, optional
        If given, restrict observables to the `n_modes` lowest
        non-trivial modes.

    Returns
    -------
    dict with ``eig_values``, ``eig_vectors`` (modes in rows, xyz
    layout), ``frequencies``, ``msf``, ``bfactor`` and optionally
    ``dcc`` / ``covariance``.
    """
    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    hessian = _build_hessian_xyz(coord, params, dtype, use_pallas)
    if masses is not None:
        hessian = _mass_weight_xyz(hessian, masses)

    vals, vecs = jnp.linalg.eigh(hessian)
    vecs = vecs.T  # modes in rows
    return _anm_observables_from_eigensystem(
        vals, vecs, n, with_dcc=with_dcc,
        with_covariance=with_covariance, n_modes=n_modes, tem=tem,
        tem_factors=tem_factors)


def _anm_observables_from_eigensystem(vals, vecs, n, *, with_dcc,
                                      with_covariance, n_modes, tem,
                                      tem_factors):
    n_trivial = 6
    if n_modes is not None and not (
        0 < n_modes <= 3 * n - n_trivial
    ):
        raise ValueError(
            f"n_modes={n_modes} must be in [1, {3 * n - n_trivial}]"
        )
    stop = 3 * n if n_modes is None else n_trivial + n_modes
    mode_indices = jnp.arange(n_trivial, stop)

    out = {
        "eig_values": vals,
        "eig_vectors": vecs,
        "frequencies": nma_core.frequencies_from_eigenvalues(
            vals, n_trivial, jnp
        ),
        "msf": nma_core.mean_square_fluctuation(
            vals, vecs, mode_indices, jnp, num_dim=3, layout="xyz",
            tem=tem, tem_factors=tem_factors,
        ),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])

    if with_dcc:
        dcc = nma_core.dcc_from_modes(vals, vecs, mode_indices, jnp,
                                      num_dim=3, layout="xyz")
        out["dcc"] = nma_core.normalize_dcc(dcc, jnp)
    if with_covariance:
        inv_vals = jnp.zeros_like(vals).at[mode_indices].set(
            1.0 / vals[mode_indices]
        )
        out["covariance"] = jnp.einsum(
            "ki,k,kj->ij", vecs, inv_vals, vecs, precision="highest"
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("with_dcc", "with_covariance", "n_modes", "dtype",
                     "use_pallas", "bandwidth", "n_iter_bisect"),
)
def ensemble_anm_banded(coords, params, masses=None, *, with_dcc=False,
                        with_covariance=False, n_modes=None,
                        dtype=jnp.float32, use_pallas="auto",
                        bandwidth=8, n_iter_bisect=40, tem=None,
                        tem_factors=nma_core.K_B):
    """
    Ensemble ANM with the **full eigensystem from the two-stage banded
    solver** (``ops.spectrum.eigh_banded`` — no O(n^3) dense eigh; 1.6x
    faster at (64, 900) f32 on v5e): Hessians assembled per conformer
    via vmap, one natively batched two-stage eigensolve (batch x shifts
    ride the vector lanes — do NOT vmap it), observables via vmap.

    Same outputs as :func:`ensemble_anm`; f32 accuracy is
    iterative-solver level (~1e-5 relative residuals after the built-in
    polish + windowed Rayleigh-Ritz refinement).
    """
    from ..ops import spectrum

    params = _resolve_params(params)
    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[-2]

    hessians = _build_hessians_batched(coords, params, masses, dtype,
                                       use_pallas)
    vals, vecs = spectrum.eigh_banded(hessians, bandwidth=bandwidth,
                                      n_iter=n_iter_bisect)
    return jax.vmap(
        lambda v, u: _anm_observables_from_eigensystem(
            v, u, n, with_dcc=with_dcc, with_covariance=with_covariance,
            n_modes=n_modes, tem=tem, tem_factors=tem_factors)
    )(vals, vecs)


def _mass_weight_xyz(hessian, masses):
    """Mass weighting in xyz plane layout: the weight vector is tiled
    (not repeated) over the three component blocks."""
    w = 1.0 / jnp.sqrt(masses)
    w3 = jnp.tile(w, 3)
    return hessian * jnp.outer(w3, w3)


def _build_kirchhoff(coord, params, dtype, use_pallas):
    if _resolve_use_pallas(use_pallas, params, dtype):
        from ..ops import pallas_kernels

        return pallas_kernels.kirchhoff_pallas(coord, params, dtype=dtype)
    return assembly.kirchhoff_matrix(coord, params, jnp, dtype=dtype)


def _build_hessians_batched(coords, params, masses, dtype, use_pallas):
    """Ensemble Hessian stack ``(B, 3n, 3n)``.

    On the Pallas path the tabulated family uses the batch-inside-kernel
    ensemble kernel with the one-hot table products hoisted out of the
    batch (:func:`springcraft_tpu.ops.pallas_kernels.
    hessian_pallas_ensemble`) — ``vmap(hessian_pallas)`` repeats
    3*n_bins inner-dim-32 matmuls per tile per conformer instead.
    Everything else vmaps the single-structure build."""
    use_pallas = _resolve_use_pallas(use_pallas, params, dtype)
    if use_pallas:
        from ..ops import pallas_kernels

        if pallas_kernels.supports_ensemble(params, coords.shape[1]):
            hessians = pallas_kernels.hessian_pallas_ensemble(
                coords, params, dtype=dtype)
            if masses is not None:
                hessians = jax.vmap(
                    lambda h: _mass_weight_xyz(h, masses))(hessians)
            return hessians

    def build(coord):
        h = _build_hessian_xyz(coord, params, dtype, use_pallas)
        if masses is not None:
            h = _mass_weight_xyz(h, masses)
        return h

    return jax.vmap(build)(coords)


def _build_kirchhoffs_batched(coords, params, masses, dtype, use_pallas):
    """Ensemble Kirchhoff stack ``(B, n, n)`` (see
    :func:`_build_hessians_batched`)."""
    use_pallas = _resolve_use_pallas(use_pallas, params, dtype)
    if use_pallas:
        from ..ops import pallas_kernels

        if pallas_kernels.supports_ensemble(params, coords.shape[1]):
            matrices = pallas_kernels.kirchhoff_pallas_ensemble(
                coords, params, dtype=dtype)
            if masses is not None:
                matrices = jax.vmap(
                    lambda m: _mass_weight(m, masses, repeat3=False)
                )(matrices)
            return matrices

    def build(coord):
        kirchhoff = _build_kirchhoff(coord, params, dtype, use_pallas)
        return _mass_weight(kirchhoff, masses, repeat3=False)

    return jax.vmap(build)(coords)


@functools.partial(
    jax.jit,
    static_argnames=("with_dcc", "n_modes", "dtype", "use_pallas"),
)
def gnm_observables(coord, params, masses=None, *, with_dcc=False,
                    n_modes=None, dtype=jnp.float32, use_pallas="auto",
                    tem=None, tem_factors=nma_core.K_B):
    """GNM analogue of :func:`anm_observables` over the Kirchhoff
    matrix (one trivial mode)."""
    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    kirchhoff = _build_kirchhoff(coord, params, dtype, use_pallas)
    kirchhoff = _mass_weight(kirchhoff, masses, repeat3=False)

    vals, vecs = jnp.linalg.eigh(kirchhoff)
    vecs = vecs.T
    return _gnm_observables_from_eigensystem(
        vals, vecs, n, with_dcc=with_dcc, n_modes=n_modes, tem=tem,
        tem_factors=tem_factors)


def _gnm_observables_from_eigensystem(vals, vecs, n, *, with_dcc,
                                      n_modes, tem, tem_factors):
    n_trivial = 1
    if n_modes is not None and not (0 < n_modes <= n - n_trivial):
        raise ValueError(
            f"n_modes={n_modes} must be in [1, {n - n_trivial}]"
        )
    stop = n if n_modes is None else n_trivial + n_modes
    mode_indices = jnp.arange(n_trivial, stop)

    out = {
        "eig_values": vals,
        "eig_vectors": vecs,
        "frequencies": nma_core.frequencies_from_eigenvalues(
            vals, n_trivial, jnp
        ),
        "msf": nma_core.mean_square_fluctuation(
            vals, vecs, mode_indices, jnp, num_dim=1,
            tem=tem, tem_factors=tem_factors,
        ),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        dcc = nma_core.dcc_from_modes(vals, vecs, mode_indices, jnp,
                                      num_dim=1)
        out["dcc"] = nma_core.normalize_dcc(dcc, jnp)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("with_dcc", "n_modes", "dtype", "use_pallas",
                     "bandwidth", "n_iter_bisect"),
)
def ensemble_gnm_banded(coords, params, masses=None, *, with_dcc=False,
                        n_modes=None, dtype=jnp.float32,
                        use_pallas="auto", bandwidth=8, n_iter_bisect=40,
                        tem=None, tem_factors=nma_core.K_B):
    """GNM analogue of :func:`ensemble_anm_banded`: full eigensystems
    of the Kirchhoff ensemble from the natively batched two-stage
    banded solver (no O(n^3) dense eigh)."""
    from ..ops import spectrum

    params = _resolve_params(params)
    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[-2]

    matrices = _build_kirchhoffs_batched(coords, params, masses, dtype,
                                         use_pallas)
    vals, vecs = spectrum.eigh_banded(matrices, bandwidth=bandwidth,
                                      n_iter=n_iter_bisect)
    return jax.vmap(
        lambda v, u: _gnm_observables_from_eigensystem(
            v, u, n, with_dcc=with_dcc, n_modes=n_modes, tem=tem,
            tem_factors=tem_factors)
    )(vals, vecs)


@functools.partial(
    jax.jit,
    static_argnames=("n_modes", "with_dcc", "dtype", "use_pallas",
                     "bandwidth", "n_iter_bisect", "n_iter_modes"),
)
def anm_spectral(coord, params, masses=None, *, n_modes=None,
                 with_dcc=True, dtype=jnp.float32, use_pallas="auto",
                 bandwidth=8, n_iter_bisect=40, n_iter_modes=24):
    """
    Full spectral ANM NMA **without a dense eigh** — the TPU-fast
    route to the same observables:

    * all eigenvalues / frequencies via the blocked two-stage banded
      solver (:func:`springcraft_tpu.ops.spectrum.eigvalsh_banded`);
    * all-mode MSF / B-factors / DCC via the regularized Cholesky
      covariance;
    * optionally the `n_modes` lowest mode *shapes* by subspace
      iteration **on the covariance already in hand**
      (:func:`springcraft_tpu.ops.modes.modes_from_covariance`).

    One regularized Cholesky solve serves both the covariance
    observables and the mode extraction, and every heavy op is a
    matmul or triangular solve.  Output keys match :func:`anm_observables` (plus
    ``covariance``), except the full modal matrix ``eig_vectors`` is
    replaced by the ``n_modes`` requested rows (``mode_vectors`` /
    ``mode_values``).  Requires a *connected* network (analytic rigid
    null space), like :func:`anm_fluctuations`.
    """
    from ..ops import modes as modes_mod
    from ..ops import spectrum

    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    hessian = _build_hessian_xyz(coord, params, dtype, use_pallas)
    if masses is not None:
        hessian = _mass_weight_xyz(hessian, masses)
    basis = rigid.rigid_modes_anm(coord, masses=masses, layout="xyz")
    basis = jnp.asarray(basis, dtype=dtype)

    # One regularized, equilibrated Cholesky pseudo-inverse (shared
    # implementation with the fluctuation pipelines)
    cov = rigid.covariance_cholesky(hessian, basis)

    planes = cov.reshape(3, n, 3, n)
    traces = sum(planes[a, :, a, :] for a in range(3))
    vals = spectrum.eigvalsh_banded(hessian, bandwidth=bandwidth,
                                    n_iter=n_iter_bisect)
    out = {
        "covariance": cov,
        "eig_values": vals,
        "frequencies": nma_core.frequencies_from_eigenvalues(vals, 6,
                                                             jnp),
        "msf": jnp.diagonal(traces),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = nma_core.normalize_dcc(traces, jnp)
    if n_modes is not None:
        # Subspace iteration on the covariance already in hand — modes
        # cost only batched matmuls (no extra factorization, no
        # per-conformer QR chain)
        mode_vals, mode_vecs = modes_mod.modes_from_covariance(
            cov, hessian, basis, k=n_modes, n_iter=n_iter_modes
        )
        out["mode_values"] = mode_vals
        out["mode_vectors"] = mode_vecs
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_modes", "with_dcc", "dtype", "use_pallas",
                     "bandwidth", "n_iter_bisect", "n_iter_modes",
                     "inverse"),
)
def _ensemble_anm_spectral_impl(coords, params, masses, *, n_modes,
                                with_dcc, dtype, use_pallas, bandwidth,
                                n_iter_bisect, n_iter_modes,
                                inverse="cho_solve"):
    from ..ops import modes as modes_mod
    from ..ops import spectrum


    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[1]

    hessians = _build_hessians_batched(coords, params, masses, dtype,
                                       use_pallas)      # (B, 3n, 3n)
    bases = jax.vmap(
        lambda c: jnp.asarray(
            rigid.rigid_modes_anm(c, masses=masses, layout="xyz"),
            dtype=dtype)
    )(coords)
    covs = rigid.covariance_cholesky(hessians, bases, inverse=inverse)

    planes = covs.reshape(-1, 3, n, 3, n)
    traces = sum(planes[:, a, :, a, :] for a in range(3))
    # Native batch through the two-stage solver: the Pallas bisection
    # vectorizes batch x shifts internally — vmapping it instead would
    # run one batch row per grid cell at 1/8 sublane utilization
    vals = spectrum.eigvalsh_banded(hessians, bandwidth=bandwidth,
                                    n_iter=n_iter_bisect)
    out = {
        "covariance": covs,
        "eig_values": vals,
        "frequencies": jax.vmap(
            lambda v: nma_core.frequencies_from_eigenvalues(v, 6, jnp)
        )(vals),
        "msf": jnp.diagonal(traces, axis1=1, axis2=2),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = jax.vmap(
            lambda t: nma_core.normalize_dcc(t, jnp))(traces)
    if n_modes is not None:
        mode_vals, mode_vecs = jax.vmap(
            lambda c, h, t: modes_mod.modes_from_covariance(
                c, h, t, k=n_modes, n_iter=n_iter_modes)
        )(covs, hessians, bases)
        out["mode_values"] = mode_vals
        out["mode_vectors"] = mode_vecs
    return out


def ensemble_anm_spectral(coords, params, masses=None, *, n_modes=None,
                          with_dcc=True, dtype=jnp.float32,
                          use_pallas="auto", bandwidth=8,
                          n_iter_bisect=40, n_iter_modes=16,
                          inverse="auto"):
    """
    Batched :func:`anm_spectral` over a conformer ensemble.

    Not a plain ``vmap`` of the single-structure pipeline: the
    eigenvalue stage flows through :func:`ops.spectrum.eigvalsh_banded`
    as a native batch so its Pallas bisection kernel keeps full
    sublane utilization, and the shared covariance solve takes the
    batched blocked-inverse engine (``inverse`` — see
    :func:`ensemble_anm_fluctuations`).
    """
    params = _resolve_params(params)
    inverse = _resolve_inverse(inverse, dtype)
    return _ensemble_anm_spectral_impl(
        jnp.asarray(coords), params, masses, n_modes=n_modes,
        with_dcc=with_dcc, dtype=dtype, use_pallas=use_pallas,
        bandwidth=bandwidth, n_iter_bisect=n_iter_bisect,
        n_iter_modes=n_iter_modes, inverse=inverse)


@functools.partial(
    jax.jit,
    static_argnames=("with_dcc", "dtype", "use_pallas", "bandwidth",
                     "n_iter_bisect"),
)
def gnm_spectral(coord, params, masses=None, *, with_dcc=True,
                 dtype=jnp.float32, use_pallas="auto", bandwidth=8,
                 n_iter_bisect=40):
    """
    GNM analogue of :func:`anm_spectral`: all Kirchhoff eigenvalues /
    frequencies via the blocked two-stage banded solver, all-mode MSF /
    B-factors / DCC via the regularized Cholesky covariance (one
    trivial constant mode) — no dense eigh.  Requires a connected
    network.
    """
    from ..ops import spectrum


    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    kirchhoff = _build_kirchhoff(coord, params, dtype, use_pallas)
    kirchhoff = _mass_weight(kirchhoff, masses, repeat3=False)
    basis = rigid.null_mode_gnm(n, masses=masses, dtype=dtype)
    cov = rigid.covariance_cholesky(kirchhoff, basis)

    vals = spectrum.eigvalsh_banded(kirchhoff, bandwidth=bandwidth,
                                    n_iter=n_iter_bisect)
    out = {
        "covariance": cov,
        "eig_values": vals,
        "frequencies": nma_core.frequencies_from_eigenvalues(vals, 1,
                                                             jnp),
        "msf": jnp.diagonal(cov),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = nma_core.normalize_dcc(cov, jnp)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_modes", "with_dcc", "dtype", "use_pallas",
                     "bandwidth", "n_iter_bisect", "n_iter_modes",
                     "inverse"),
)
def _ensemble_gnm_spectral_impl(coords, params, masses, *, n_modes,
                                with_dcc, dtype, use_pallas, bandwidth,
                                n_iter_bisect, n_iter_modes,
                                inverse="cho_solve"):
    from ..ops import modes as modes_mod
    from ..ops import spectrum

    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[1]

    kirchhoffs = _build_kirchhoffs_batched(coords, params, masses, dtype,
                                           use_pallas)
    basis = rigid.null_mode_gnm(n, masses=masses, dtype=dtype)
    covs = rigid.covariance_cholesky(kirchhoffs, basis, inverse=inverse)
    vals = spectrum.eigvalsh_banded(kirchhoffs, bandwidth=bandwidth,
                                    n_iter=n_iter_bisect)
    out = {
        "covariance": covs,
        "eig_values": vals,
        "frequencies": jax.vmap(
            lambda v: nma_core.frequencies_from_eigenvalues(v, 1, jnp)
        )(vals),
        "msf": jnp.diagonal(covs, axis1=1, axis2=2),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = jax.vmap(
            lambda c: nma_core.normalize_dcc(c, jnp))(covs)
    if n_modes is not None:
        mode_vals, mode_vecs = jax.vmap(
            lambda c, m: modes_mod.modes_from_covariance(
                c, m, basis, k=n_modes, n_iter=n_iter_modes)
        )(covs, kirchhoffs)
        out["mode_values"] = mode_vals
        out["mode_vectors"] = mode_vecs
    return out


def ensemble_gnm_spectral(coords, params, masses=None, *, n_modes=None,
                          with_dcc=True, dtype=jnp.float32,
                          use_pallas="auto", bandwidth=8,
                          n_iter_bisect=40, n_iter_modes=16,
                          inverse="auto"):
    """
    Batched :func:`gnm_spectral` over a conformer ensemble — the GNM
    analogue of :func:`ensemble_anm_spectral`: all Kirchhoff
    eigenvalues through the natively batched two-stage banded solver,
    all-mode covariance observables through the shared (optionally
    blocked-Pallas) Cholesky engine, and optionally the ``n_modes``
    lowest mode shapes by subspace iteration on the covariance.
    """
    params = _resolve_params(params)
    inverse = _resolve_inverse(inverse, dtype)
    return _ensemble_gnm_spectral_impl(
        jnp.asarray(coords), params, masses, n_modes=n_modes,
        with_dcc=with_dcc, dtype=dtype, use_pallas=use_pallas,
        bandwidth=bandwidth, n_iter_bisect=n_iter_bisect,
        n_iter_modes=n_iter_modes, inverse=inverse)


@functools.partial(
    jax.jit, static_argnames=("with_dcc", "with_prs", "with_covariance",
                              "dtype", "use_pallas")
)
def anm_fluctuations(coord, params, masses=None, *, with_dcc=True,
                     with_prs=False, with_covariance=True,
                     dtype=jnp.float32, use_pallas="auto"):
    """
    Covariance-derived ANM observables via the fast Cholesky path —
    no eigendecomposition.

    The six rigid-body modes of a connected network are known
    analytically, so the pseudo-inverse covariance is obtained from a
    regularized Cholesky solve (see
    :func:`springcraft_tpu.ops.rigid.covariance_cholesky`), which runs
    an order of magnitude faster than ``eigh`` on TPU.  Produces every
    all-mode observable: MSF, B-factors, normalized DCC and optionally
    PRS + effector/sensor profiles.  (Results match the eigh path; for
    disconnected networks fall back to :func:`anm_observables`.)

    With ``with_covariance=False`` the full ``(3n, 3n)`` covariance is
    never formed: the pipeline computes only the ``(n, n)`` plane-trace
    matrix (:func:`springcraft_tpu.ops.rigid.covariance_plane_traces`)
    that MSF/B-factors/DCC consume — identical observables at roughly
    half the cost (the ``covariance`` output is then omitted, and PRS
    is unavailable since it needs all nine plane blocks).
    """
    coord = jnp.asarray(coord, dtype=dtype)
    hessian = _build_hessian_xyz(coord, params, dtype, use_pallas)
    if masses is not None:
        hessian = _mass_weight_xyz(hessian, masses)
    basis = rigid.rigid_modes_anm(coord, masses=masses, layout="xyz")
    if not with_covariance:
        if with_prs:
            raise ValueError(
                "with_prs=True requires with_covariance=True — PRS "
                "consumes all nine covariance plane blocks, not just "
                "the traces")
        traces = rigid.covariance_plane_traces(hessian, basis)
        return _anm_trace_observables(traces, with_dcc)
    cov = rigid.covariance_cholesky(hessian, basis)
    return _anm_cov_observables(cov, coord.shape[0], with_dcc, with_prs)


def _anm_trace_observables(traces, with_dcc):
    # `traces` is the (n, n) plane-trace matrix of the covariance —
    # see ops.rigid.covariance_plane_traces
    out = {"msf": jnp.diagonal(traces)}
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = nma_core.normalize_dcc(traces, jnp)
    return out


def _anm_cov_observables(cov, n, with_dcc, with_prs):
    # In xyz layout the 3x3 superelement trace over components a is
    # sum_a cov[a*n + i, a*n + j]
    planes = cov.reshape(3, n, 3, n)
    traces = sum(planes[a, :, a, :] for a in range(3))
    out = {
        "covariance": cov,
        "msf": jnp.diagonal(traces),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = nma_core.normalize_dcc(traces, jnp)
    if with_prs:
        sq = jnp.square(planes).sum(axis=(0, 2))
        prs = sq / jnp.diagonal(sq)[:, None]
        out["prs"] = prs
        eff, sens = nma_core.effector_sensor_profiles(prs, jnp)
        out["effector"] = eff
        out["sensor"] = sens
    return out


@functools.partial(
    jax.jit, static_argnames=("with_dcc", "dtype", "use_pallas")
)
def gnm_fluctuations(coord, params, masses=None, *, with_dcc=True,
                     dtype=jnp.float32, use_pallas="auto"):
    """GNM analogue of :func:`anm_fluctuations`: covariance via the
    regularized Cholesky solve with the analytic constant null mode."""
    coord = jnp.asarray(coord, dtype=dtype)
    n = coord.shape[0]
    kirchhoff = _build_kirchhoff(coord, params, dtype, use_pallas)
    kirchhoff = _mass_weight(kirchhoff, masses, repeat3=False)
    basis = rigid.null_mode_gnm(n, masses=masses, dtype=dtype)
    cov = rigid.covariance_cholesky(kirchhoff, basis)
    return _gnm_cov_observables(cov, with_dcc)


def _gnm_cov_observables(cov, with_dcc):
    out = {
        "covariance": cov,
        "msf": jnp.diagonal(cov),
    }
    out["bfactor"] = nma_core.bfactor_from_msf(out["msf"])
    if with_dcc:
        out["dcc"] = nma_core.normalize_dcc(cov, jnp)
    return out


def ensemble_anm_fluctuations(coords, params, masses=None, *,
                              inverse="auto", **options):
    """Batched fast-covariance ANM over a conformer ensemble.

    ``inverse`` selects the covariance engine: ``"blocked"`` runs the
    whole ensemble through the batched Pallas panel-Cholesky inverse
    (:func:`springcraft_tpu.ops.pallas_linalg.spd_inverse_blocked`) —
    substantially faster than per-conformer ``cho_solve`` on TPU, where
    XLA Cholesky's ~m sequential HBM-bound steps dominate the pipeline;
    ``"cho_solve"`` vmaps the per-conformer path; ``"auto"`` picks
    ``"blocked"`` on TPU backends for float32.

    Pass ``with_covariance=False`` when only MSF/B-factors/DCC are
    needed: the pipeline then computes the ``(n, n)`` covariance
    plane-trace matrix directly and never materializes the ``(3n, 3n)``
    covariance — identical observables at roughly half the cost (see
    :func:`anm_fluctuations`).

    ``chunk`` (int, blocked engine only): process a megabatch as ONE
    device program that maps over ``chunk``-conformer chunks — pays the
    relayed-TPU per-call dispatch floor (~28 ms) once per megabatch
    instead of once per chunk while keeping the blocked kernels at
    their batch sweet spot.  The batch must divide by ``chunk``; 128 is
    the measured optimum at N=300.

    ``prep`` (blocked engine only): ``"planes"`` (default) builds raw
    assembly planes with the Pallas ensemble kernel and stitches them
    into the factor input; ``"direct"`` recomputes the planes inside
    the stitch kernel so they never touch HBM.  Interleaved A/B at the
    (1024, 300) headline measured identical checksums with planes
    ~0.8% faster, so direct is opt-in (see docs/performance.md).
    """
    params = _resolve_params(params)
    coords = jnp.asarray(coords)
    chunk = options.pop("chunk", None)
    inverse = _resolve_inverse(inverse, options.get("dtype", jnp.float32))
    if inverse == "blocked":
        if chunk is not None and coords.shape[0] > chunk:
            return _anm_fluctuations_megabatch(
                coords, params, masses, chunk, _freeze_options(options))
        return _ensemble_anm_fluctuations_blocked(
            coords, params, masses, **options)
    fn = functools.partial(anm_fluctuations, params=params, masses=masses,
                           **options)
    return jax.vmap(lambda c: fn(c))(coords)


def _freeze_options(options):
    return tuple(sorted(options.items()))


def _reshape_chunks(coords, chunk):
    batch = coords.shape[0]
    if batch % chunk:
        raise ValueError(
            f"megabatch of {batch} conformers must divide into chunks "
            f"of {chunk}")
    return coords.reshape(batch // chunk, chunk, *coords.shape[1:])


@functools.partial(jax.jit, static_argnames=("chunk", "frozen_options"))
def _anm_fluctuations_megabatch(coords, params, masses, chunk,
                                frozen_options):
    """One device program over a conformer megabatch: ``lax.map`` of the
    blocked pipeline over fixed-size chunks.

    Each jitted call on the relayed TPU target pays a ~28 ms dispatch
    floor — ~40% of a 128-conformer fluctuation call at N=300.  Mapping
    chunks *inside* one program pays that floor once per megabatch while
    the per-chunk working set keeps the blocked covariance kernels in
    their measured batch-128 sweet spot (192 shows HBM pressure, 256
    trips the remote compiler)."""
    chunks = _reshape_chunks(coords, chunk)
    out = jax.lax.map(
        lambda c: _ensemble_anm_fluctuations_blocked(
            c, params, masses, **dict(frozen_options)),
        chunks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(coords.shape[0], *x.shape[2:]), out)


def _blocked_auto_ok(dtype):
    # The compiled Mosaic panel kernel is float32-only; f64 parity
    # ensembles (x64 on TPU) must keep the cho_solve route.
    return (jax.default_backend() == "tpu" and dtype == jnp.float32)


def _resolve_inverse(inverse, dtype):
    if inverse == "auto":
        return "blocked" if _blocked_auto_ok(dtype) else "cho_solve"
    return inverse


def ensemble_gnm_fluctuations(coords, params, masses=None, *,
                              inverse="auto", with_dcc=True,
                              dtype=jnp.float32, use_pallas="auto",
                              chunk=None):
    """GNM analogue of :func:`ensemble_anm_fluctuations` (same
    ``inverse`` engine selection and ``chunk`` megabatch option)."""
    params = _resolve_params(params)
    coords = jnp.asarray(coords)
    inverse = _resolve_inverse(inverse, dtype)
    if inverse == "blocked":
        if chunk is not None and coords.shape[0] > chunk:
            return _gnm_fluctuations_megabatch(
                coords, params, masses, chunk,
                _freeze_options(dict(with_dcc=with_dcc, dtype=dtype,
                                     use_pallas=use_pallas)))
        return _ensemble_gnm_fluctuations_blocked(
            coords, params, masses, with_dcc=with_dcc, dtype=dtype,
            use_pallas=use_pallas)
    fn = functools.partial(gnm_fluctuations, params=params, masses=masses,
                           with_dcc=with_dcc, dtype=dtype,
                           use_pallas=use_pallas)
    return jax.vmap(lambda c: fn(c))(coords)


@functools.partial(jax.jit, static_argnames=("chunk", "frozen_options"))
def _gnm_fluctuations_megabatch(coords, params, masses, chunk,
                                frozen_options):
    """GNM analogue of :func:`_anm_fluctuations_megabatch`."""
    chunks = _reshape_chunks(coords, chunk)
    out = jax.lax.map(
        lambda c: _ensemble_gnm_fluctuations_blocked(
            c, params, masses, **dict(frozen_options)),
        chunks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(coords.shape[0], *x.shape[2:]), out)


@functools.partial(
    jax.jit, static_argnames=("with_dcc", "dtype", "use_pallas")
)
def _ensemble_gnm_fluctuations_blocked(coords, params, masses=None,
                                       with_dcc=True, dtype=jnp.float32,
                                       use_pallas="auto"):
    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[1]

    kirchhoffs = _build_kirchhoffs_batched(coords, params, masses, dtype,
                                           use_pallas)
    basis = rigid.null_mode_gnm(n, masses=masses, dtype=dtype)
    cov = rigid.covariance_cholesky(kirchhoffs, basis, inverse="blocked")
    return jax.vmap(lambda c: _gnm_cov_observables(c, with_dcc))(cov)


@functools.partial(
    jax.jit, static_argnames=("with_dcc", "with_prs", "with_covariance",
                              "dtype", "use_pallas", "prep")
)
def _ensemble_anm_fluctuations_blocked(coords, params, masses=None,
                                       with_dcc=True, with_prs=False,
                                       with_covariance=True,
                                       dtype=jnp.float32,
                                       use_pallas="auto",
                                       prep="planes"):
    coords = jnp.asarray(coords, dtype=dtype)
    n = coords.shape[1]
    if prep not in ("planes", "direct"):
        raise ValueError(
            f"prep must be 'planes' or 'direct', got {prep!r}")
    if with_prs and not with_covariance:
        raise ValueError(
            "with_prs=True requires with_covariance=True — PRS "
            "consumes all nine covariance plane blocks, not just "
            "the traces")

    bases = jax.vmap(
        lambda c: rigid.rigid_modes_anm(c, masses=masses, layout="xyz")
    )(coords)

    if prep == "direct" and _fused_direct_applies(coords, params, dtype,
                                                  use_pallas):
        # Assembly-fused prep (opt-in): the pair planes are recomputed
        # inside the stitch kernel and never materialize in HBM —
        # drops both the assembly kernel's plane writes and the
        # stitch's plane reads from the pipeline (analytic families;
        # see rigid._regularize_equilibrated_direct).  Matches the
        # planes path to f32 summation order
        # (tests/test_pallas_linalg.py::test_assembly_fused_*).
        # Interleaved A/B at the (1024, 300) headline measured it a
        # consistent ~0.8% BEHIND the planes path with identical
        # checksums, and its program misses the persistent compile
        # cache — hence planes stays the default (docs/performance.md,
        # "Assembly-fused direct prep").
        if not with_covariance:
            traces = rigid.covariance_plane_traces_direct(
                coords, params, bases, masses=masses)
            return jax.vmap(
                lambda t: _anm_trace_observables(t, with_dcc)
            )(traces)
        cov = rigid.covariance_cholesky_direct(
            coords, params, bases, masses=masses)
        return jax.vmap(
            lambda c: _anm_cov_observables(c, n, with_dcc, with_prs)
        )(cov)

    planes = _build_hessian_planes_batched(coords, params, dtype,
                                           use_pallas)
    if planes is not None:
        # Fused prep: regularize/equilibrate/pad straight from the raw
        # assembly planes (Pallas stitch kernel), skipping the
        # lane-misaligned concatenated Hessian and the separate XLA
        # prep pass; optional masses fold into the kernel's scale
        # vector.  Matches the concatenated path to f32 rounding
        # (tests/test_pallas_linalg.py::test_fused_prep_*).
        if not with_covariance:
            traces = rigid.covariance_plane_traces_from_planes(
                planes, n, bases, masses=masses)
            return jax.vmap(
                lambda t: _anm_trace_observables(t, with_dcc)
            )(traces)
        cov = rigid.covariance_cholesky_from_planes(
            planes, n, bases, masses=masses)
    else:
        hessians = _build_hessians_batched(coords, params, masses,
                                           dtype, use_pallas)
        if not with_covariance:
            traces = rigid.covariance_plane_traces(hessians, bases,
                                                   inverse="blocked")
            return jax.vmap(
                lambda t: _anm_trace_observables(t, with_dcc)
            )(traces)
        cov = rigid.covariance_cholesky(hessians, bases,
                                        inverse="blocked")
    return jax.vmap(
        lambda c: _anm_cov_observables(c, n, with_dcc, with_prs)
    )(cov)


def _fused_direct_applies(coords, params, dtype, use_pallas):
    """Whether the assembly-fused prep (coordinates -> factor input in
    one kernel) covers this configuration: Pallas-eligible analytic
    family, no overlays, and a VMEM-feasible row-tile plan."""
    from ..ops import pallas_kernels, pallas_linalg

    if not _resolve_use_pallas(use_pallas, params, dtype):
        return False
    if params.overlays or params.kind not in ("invariant", "hinsen",
                                              "pfenm"):
        return False
    n = coords.shape[1]
    mp = pallas_linalg.padded_size(3 * n)
    return pallas_kernels.assembly_prep_plan(
        n, mp, jnp.dtype(dtype).itemsize) is not None


def _build_hessian_planes_batched(coords, params, dtype, use_pallas):
    """Raw component planes for the fused-prep blocked path, or None
    when it does not apply (non-Pallas params, overlays, or no
    VMEM-feasible stitch plan)."""
    from ..ops import pallas_kernels, pallas_linalg

    if not _resolve_use_pallas(use_pallas, params, dtype):
        return None
    if params.overlays:
        return None
    n = coords.shape[1]
    if params.kind == "table_compact":
        if not pallas_kernels.supports_ensemble(params, n):
            return None
        tile = pallas_kernels._ensemble_tile(n, params.n_bins)
    elif n <= 384:
        # tile = n: the raw planes carry no pad region at all — less
        # HBM both out of the assembly kernel and into the stitch
        # (measured ~0.7 ms/chunk at (128, 300) vs the lane-rounded
        # 384 tile), and the smaller plane blocks buy the stitch a
        # larger row tile within its VMEM budget.
        tile = n
    else:
        tile = pallas_kernels._auto_tile(n)
    n_pad = -(-n // tile) * tile
    mp = pallas_linalg.padded_size(3 * n)
    plan = pallas_kernels.fused_prep_plan(n, n_pad, mp,
                                          jnp.dtype(dtype).itemsize)
    if plan is None:
        return None
    return pallas_kernels.hessian_pallas_ensemble(
        coords, params, dtype=dtype, raw_planes=True, tile=tile)


def _resolve_params(params):
    """Accept either an FFParams pytree or a ForceField object (lowered
    to its compact device form when available)."""
    to_compact = getattr(params, "to_compact_params", None)
    if to_compact is not None:
        return to_compact()
    to_params = getattr(params, "to_params", None)
    if to_params is not None and not hasattr(params, "kind"):
        lowered = to_params()
        if lowered is None:
            raise ValueError(
                "This force field has no device parameterization; use "
                "the host API (compute_kirchhoff/compute_hessian)"
            )
        return lowered
    return params


def ensemble_anm(coords, params, masses=None, **options):
    """
    Batched ANM NMA over an ensemble of conformers.

    Parameters
    ----------
    coords : ndarray, shape=(b, n, 3)
        Conformer batch (e.g. MD snapshots of one protein).
    params : FFParams or ForceField
        Shared force-field parameterization (per-structure tables are
        valid across conformers of the same sequence).
    masses : ndarray, shape=(n,), optional

    Returns
    -------
    dict of batched observables (leading axis = conformer).
    """
    params = _resolve_params(params)
    fn = functools.partial(anm_observables, params=params, masses=masses,
                           **options)
    return jax.vmap(lambda c: fn(c))(jnp.asarray(coords))


def ensemble_gnm(coords, params, masses=None, **options):
    """Batched GNM NMA over an ensemble of conformers
    (see :func:`ensemble_anm`)."""
    params = _resolve_params(params)
    fn = functools.partial(gnm_observables, params=params, masses=masses,
                           **options)
    return jax.vmap(lambda c: fn(c))(jnp.asarray(coords))

"""
Anisotropic Network Model.

API-compatible with reference ``anm.py``: lazy ``hessian`` /
``covariance`` duals with setters, optional mass weighting, and the full
NMA observable set (``eigen``, ``frequencies``, ``normal_mode``,
``linear_response``, ``mean_square_fluctuation``, ``bfactor``, ``dcc``,
``prs_effector_sensor``).
"""

from __future__ import annotations

from . import nma
from .base import ElasticNetworkModel
from .interaction import compute_hessian
from .nma import K_B

__all__ = ["ANM"]


class ANM(ElasticNetworkModel):
    """
    Anisotropic Network Model: directional ENM over the ``(3n, 3n)``
    Hessian matrix (atom-interleaved layout
    ``[x1, y1, z1, ..., xn, yn, zn]``).

    Parameters
    ----------
    atoms : AtomArray, shape=(n,) or ndarray, shape=(n,3)
        Model atoms (usually CA) or their coordinates.
    force_field : ForceField
        Spring-constant rule.
    masses : bool or ndarray, shape=(n,), optional
        ``True`` infers per-residue masses from ``res_name``; an array
        gives explicit masses; default is no mass weighting.  The Hessian
        is weighted with ``outer(1/sqrt(m))`` with each weight repeated
        three times.
    use_cell_list : bool, optional
        Use a cell list for neighbor search on the host path.
    """

    _num_dim = 3

    def _compute_matrix(self):
        hessian, _ = compute_hessian(
            self._coord, self._ff, self._use_cell_list, return_pairs=False
        )
        return hessian

    @property
    def hessian(self):
        """The ``(3n, 3n)`` Hessian matrix (lazily computed; assignable —
        assigning invalidates the covariance)."""
        return self._get_matrix()

    @hessian.setter
    def hessian(self, value):
        self._set_matrix(value, error_cls=IndexError)

    def normal_mode(self, index, amplitude, frames, movement="sine"):
        """Displacement trajectory ``(frames, n, 3)`` depicting normal
        mode `index` (the first six modes are rigid-body motions)."""
        return nma.normal_mode(self, index, amplitude, frames, movement)

    def linear_response(self, force, matrix_free=False, **options):
        """Displacements induced by `force` via linear response theory.

        ``matrix_free=True`` computes ``pinv(H) @ force`` by deflated
        preconditioned CG on the implicit operator
        (``ops.matfree.covariance_solve_matfree``) — for systems whose
        covariance exceeds device memory; extra `options` (``tol``,
        ``max_iter``, ...) pass through.  The dense path matches the
        reference exactly (``nma.py:422-473``)."""
        if not matrix_free:
            self._dense_path_rejects("linear_response", options)
            return nma.linear_response(self, force)

        import numpy as np

        from ..ops import matfree
        from ..parallel.pipeline import _resolve_params

        self._require_force_field_matrix(
            "linear_response(matrix_free=True)")
        params = _resolve_params(self._ff)
        force = np.asarray(force)
        n = len(self._coord)
        tol = options.setdefault("tol", 1e-6)
        disp, n_it, res = matfree.linear_response_matfree(
            self._coord, params, force, masses=self._masses, **options)
        disp = np.asarray(disp)
        max_res = float(np.max(np.asarray(res)))
        if not np.all(np.isfinite(disp)) or max_res > 10 * tol:
            raise ValueError(
                f"matrix-free linear response did not converge: max "
                f"relative residual {max_res:.2e} after {int(n_it)} CG "
                f"iterations (tol {tol:.0e}) — raise max_iter, or check "
                "network connectivity")
        return disp.reshape(n, 3) if force.ndim == 1 else disp

    def frequencies(self):
        """Mode frequencies in ascending order (first six trivial)."""
        return nma.frequencies(self)

    def mean_square_fluctuation(self, mode_subset=None, tem=None,
                                tem_factors=K_B, matrix_free=False,
                                modes=None, probes=None, **options):
        """MSF per node; equals the superelement traces of the covariance
        when all non-trivial modes are included.

        ``matrix_free=True`` estimates the *all-mode* MSF over all
        atoms without the covariance (``ops.matfree.msf_stochastic``):
        deflated Hutchinson probes through one batched CG solve,
        unbiased at every atom with ``modes`` (``k`` for
        ``lowest_modes(k, matrix_free=True)``, or an explicit
        ``(values, vectors)`` pair) as the deflation subspace and
        exact rank-k floor.  Returns ``(msf, stderr)`` — the per-atom
        standard error is part of the estimate.  `mode_subset` is not
        supported on this path (all-mode quantity); extra `options`
        (``tol``, ``max_iter``, ...) pass through to the CG solver.
        Mode vectors default to the model's atom-interleaved layout
        (what :meth:`lowest_modes` and :meth:`eigen` return); pass
        ``layout="xyz"`` for ops-level ``lowest_modes_matfree``
        output.
        """
        if not matrix_free:
            self._dense_path_rejects(
                "mean_square_fluctuation", options, modes=modes,
                probes=probes)
            return nma.mean_square_fluctuation(self, mode_subset, tem,
                                               tem_factors)
        return self._stochastic_msf(
            "msf_stochastic", mode_subset, tem, tem_factors, modes,
            probes, options, atom_layout=True)

    def bfactor(self, mode_subset=None, tem=None, tem_factors=K_B,
                matrix_free=False, **options):
        """Isotropic B-factors from the MSF.

        ``matrix_free=True`` scales the stochastic all-mode MSF
        estimate (see :meth:`mean_square_fluctuation`); returns
        ``(bfactor, stderr)``."""
        if not matrix_free:
            self._dense_path_rejects("bfactor", options)
            return nma.bfactor(self, mode_subset, tem, tem_factors)
        from ..ops import nma_core
        msf, stderr = self.mean_square_fluctuation(
            mode_subset, tem, tem_factors, matrix_free=True, **options)
        return (nma_core.bfactor_from_msf(msf),
                nma_core.bfactor_from_msf(stderr))

    def dcc(self, mode_subset=None, norm=True, tem=None, tem_factors=K_B,
            matrix_free=False, sites=None, msf=None, modes=None,
            probes=None, **options):
        """Dynamic cross-correlation between nodes.

        ``matrix_free=True`` computes all-mode DCC *rows* for the given
        `sites` by deflated CG on the implicit operator
        (``ops.matfree.dcc_rows_matfree``) — for systems whose
        covariance exceeds device memory.  With ``norm=True`` the
        normalization diagonal (the all-mode MSF) comes from `msf`
        (e.g. :meth:`mean_square_fluctuation(matrix_free=True)
        <mean_square_fluctuation>` — unbiased — or the truncated
        mode-sum from :meth:`lowest_modes`; exact traces give exact
        reference parity) — or, with `msf` omitted, is estimated **in
        place** from ``modes=<k | (values, vectors)>`` (optionally
        ``probes=<p>``, default 64) via the unbiased stochastic MSF:
        one extra batched CG solve, per-atom stderr propagating as
        ``~(sem_i/msf_i + sem_j/msf_j)/2`` relative error on row
        ``ij``.  Returns the ``(len(sites), n)`` row block;
        `mode_subset` is not supported on this path (it is an all-mode
        quantity).  Extra `options` (``tol``, ``max_iter``, ...) pass
        through to the CG solver.
        """
        if not matrix_free:
            self._dense_path_rejects("dcc", options, sites=sites,
                                     msf=msf, modes=modes,
                                     probes=probes)
            return nma.dcc(self, mode_subset, norm, tem, tem_factors)
        return self._matfree_dcc(
            mode_subset, norm, tem, tem_factors, sites, msf, modes,
            probes, options, rows_op_name="dcc_rows_matfree",
            msf_op_name="msf_stochastic", atom_layout=True)

    def prs_effector_sensor(self, norm=True, matrix_free=False,
                            sites=None, prs_diag=None, modes=None,
                            probes=None, **options):
        """
        Perturbation-response-scanning matrix plus the derived effector
        (row-average) and sensor (column-average) profiles.

        ``matrix_free=True`` avoids the dense covariance two ways:

        * ``sites=<atom indices>`` — *exact* profile values at selected
          sites (``ops.matfree.effector_sensor_matfree``): three
          deflated-CG covariance columns per site, one batched solve.
          With ``norm=True`` (the reference's standard normalization)
          the ``(n,)`` folded-PRS diagonal ``P_ii`` comes from
          `prs_diag` — or, with `prs_diag` omitted, from
          ``modes=<k | (values, vectors)>`` via the rank-k mode-sum
          (``ops.matfree.prs_diag_from_modes``; converges as
          ``1/lambda^2`` but is a truncated lower bound — pass a
          measured `prs_diag` for unbiased normalization).
        * ``modes=k`` or ``modes=(values, vectors)`` — profiles over
          **all** atoms by the O(n k^2) mode-sum contraction
          (``ops.matfree.effector_sensor_from_modes``); an integer
          solves the k lowest non-trivial modes first
          (:meth:`lowest_modes(matrix_free=True) <lowest_modes>`,
          extra `options` pass through).  The result is the exact
          profile of the rank-k covariance (the standard
          mode-truncated PRS): equal to the dense path with the
          complete non-trivial set, but a *low-mode subspace*
          quantity under truncation — see the op's docstring.
        * ``probes=p`` — unbiased **all-mode** profiles over **all**
          atoms by Hutchinson stochastic diagonal estimation
          (``ops.matfree.effector_sensor_stochastic``): one batched
          CG solve over ``2 p`` Rademacher columns, ``~sqrt(2 / p)``
          relative standard error independent of system size.
          Combine with ``modes=`` (an integer or the
          ``lowest_modes`` output) to deflate: the rank-k part of the
          profiles is then computed exactly as a control variate and
          only the residual is sampled — far tighter per-atom error
          bars at the same probe count.  With `prs_diag` omitted the
          normalizer is estimated in place from `modes` by the
          unbiased ``prs_diag_stochastic`` (one extra batched CG on
          an independent probe seed; so ``probes=p, modes=k`` alone
          is a complete call).

        In every matrix-free mode the full ``(n, n)`` PRS matrix is
        never formed and ``None`` is returned in its place:
        ``(None, effector, sensor)``.
        """
        if not matrix_free:
            self._dense_path_rejects(
                "prs_effector_sensor", options, sites=sites,
                prs_diag=prs_diag, modes=modes, probes=probes)
            prs_mat = nma.prs(self, norm)
            eff, sens = nma.effector_sensor(prs_mat)
            return prs_mat, eff, sens

        import numpy as np

        from ..ops import matfree
        from ..parallel.pipeline import _resolve_params

        if sites is not None and probes is not None:
            raise ValueError(
                "prs_effector_sensor(matrix_free=True): sites= (exact "
                "CG profile values at selected sites) is exclusive "
                "with probes= (stochastic full-atom estimator) — the "
                "exact site path would silently ignore it")
        if sites is None and modes is None and probes is None:
            raise ValueError(
                "prs_effector_sensor(matrix_free=True) needs "
                "sites=<atom indices> (exact profile values at "
                "selected sites by batched CG), modes=<k | (values, "
                "vectors)> (rank-k mode-sum profiles over all atoms), "
                "or probes=<p> (stochastic all-mode profiles over all "
                "atoms): the full (n, n) PRS matrix requires the "
                "dense covariance")
        if probes is not None:
            self._require_force_field_matrix(
                "prs_effector_sensor(matrix_free=True)")
            params = _resolve_params(self._ff)
            modes = self._resolve_deflation_modes(
                modes, options, atom_layout=True)
            tol = options.setdefault("tol", 1e-6)
            seed = options.pop("seed", 0)
            if prs_diag is None:
                # auto-normalizer (one more batched CG): unbiased
                # stochastic P_ii, deflated on the same mode set; an
                # independent probe seed keeps the normalizer noise
                # uncorrelated with the profile probes below
                if modes is None:
                    raise ValueError(
                        "prs_effector_sensor(matrix_free=True, "
                        "probes=...) without prs_diag= needs modes=<k "
                        "| (values, vectors)> to estimate the "
                        "folded-PRS diagonal in place "
                        "(prs_diag_stochastic) — or pass prs_diag= "
                        "directly")
                prs_diag, pd_sem, pd_it, pd_res = (
                    matfree.prs_diag_stochastic(
                        self._coord, params, modes, probes=probes,
                        masses=self._masses, seed=seed + 1, **options))
                pd_max_res = float(np.max(np.asarray(pd_res)))
                if (not np.all(np.isfinite(prs_diag))
                        or pd_max_res > 10 * tol):
                    raise ValueError(
                        f"stochastic prs_diag normalizer did not "
                        f"converge: max relative residual "
                        f"{pd_max_res:.2e} after {int(pd_it)} CG "
                        f"iterations (tol {tol:.0e}) — raise "
                        "max_iter, or check network connectivity")
            eff, sens, _, _, n_it, res = (
                matfree.effector_sensor_stochastic(
                    self._coord, params, prs_diag, probes=probes,
                    norm=norm, masses=self._masses, modes=modes,
                    seed=seed, **options))
            max_res = float(np.max(np.asarray(res)))
            if (not (np.all(np.isfinite(eff))
                     and np.all(np.isfinite(sens)))
                    or max_res > 10 * tol):
                raise ValueError(
                    f"stochastic effector/sensor did not converge: "
                    f"max relative residual {max_res:.2e} after "
                    f"{int(n_it)} CG iterations (tol {tol:.0e}) — "
                    "raise max_iter, or check network connectivity")
            return None, eff, sens
        if sites is None:
            if prs_diag is not None:
                # fail fast: effector_sensor_from_modes computes its
                # own rank-k diagonal — a user-passed normalizer would
                # be silently ignored here
                raise ValueError(
                    "prs_effector_sensor(matrix_free=True, modes=...): "
                    "prs_diag= applies to the sites=/probes= paths; "
                    "the mode-sum computes its own rank-k "
                    "normalization diagonal")
            layout = options.pop("layout", None)
            if isinstance(modes, (int, np.integer)) \
                    and not isinstance(modes, bool):
                if layout not in (None, "atom"):
                    raise ValueError(
                        "layout= applies to explicit modes=(values, "
                        "vectors); modes=<k> solves lowest_modes, "
                        "which returns atom-interleaved vectors")
                layout = "atom"
            elif layout is None:
                layout = "atom"
            # no CG follows on this path: every remaining option
            # belongs to lowest_modes
            vals, vecs = self._resolve_deflation_modes(
                modes, options, atom_layout=False, forward_all=True)
            eff, sens = matfree.effector_sensor_from_modes(
                vals, vecs, norm=norm, layout=layout)
            return None, eff, sens
        self._require_force_field_matrix(
            "prs_effector_sensor(matrix_free=True)")
        params = _resolve_params(self._ff)
        if modes is not None:
            if not (norm and prs_diag is None):
                raise ValueError(
                    "prs_effector_sensor(matrix_free=True, sites=...): "
                    "modes= serves only to build the prs_diag "
                    "normalizer (norm=True with prs_diag omitted); "
                    "here it would be silently ignored")
            modes_r = self._resolve_deflation_modes(
                modes, options, atom_layout=True)
            layout = options.pop("layout", "atom")
            prs_diag = matfree.prs_diag_from_modes(
                modes_r[0], modes_r[1], layout=layout)
        tol = options.setdefault("tol", 1e-6)
        eff, sens, n_it, res = matfree.effector_sensor_matfree(
            self._coord, params, sites, prs_diag=prs_diag, norm=norm,
            masses=self._masses, **options)
        max_res = float(np.max(np.asarray(res)))
        if (not (np.all(np.isfinite(eff)) and np.all(np.isfinite(sens)))
                or max_res > 10 * tol):
            raise ValueError(
                f"matrix-free effector/sensor did not converge: max "
                f"relative residual {max_res:.2e} after {int(n_it)} CG "
                f"iterations (tol {tol:.0e}) — raise max_iter, or "
                "check network connectivity")
        return None, eff, sens

    def lowest_modes(self, k, matrix_free=False, refine=False,
                     **options):
        """
        The `k` lowest non-trivial modes on device *without* a full
        eigendecomposition — green-field beyond the reference, which
        always runs dense ``eigh`` (reference ``nma.py:61``).

        ``matrix_free=False`` (default): dense Hessian on device +
        Cholesky shift-invert subspace iteration — the mega-assembly
        path (seconds at 30k dims).  ``matrix_free=True``: the
        block-sparse Chebyshev solver; the Hessian is never formed, for
        systems beyond device memory (``ops.matfree``).  Extra
        `options` pass through to the solver.  Requires a force field
        with a device parameterization (``to_params``).

        ``refine=True`` follows the f32 device solve with a float64
        Rayleigh-Ritz pass on host (``ops.modes.refine_modes_f64``):
        for cutoff force fields the f64 operator is applied from a
        cell-list pair list (O(pairs * k) — ~0.3 s at n=10k, ~3 s at
        100k atoms; native C++ kernels), so it composes freely with
        ``matrix_free=True``; no-cutoff families fall back to streamed
        dense f64 row panels (O(k n^2)).  Refined eigenvalues are
        accurate to ~1e-9 rtol vs f64 truth with *true* f64 residuals —
        the mega-scale accuracy story (BASELINE.json north-star demands
        1e-6 rtol, beyond raw f32).  The device solve is widened by
        ``refine_buffer`` (default 4) extra modes so the slow-converging
        subspace boundary stays outside the returned block.

        Returns
        -------
        eig_values : ndarray, shape=(k,)
            Smallest non-trivial eigenvalues, ascending.
        eig_vectors : ndarray, shape=(k, 3n)
            Modes in rows, atom-interleaved layout (as :meth:`eigen`).
        residuals : ndarray, shape=(k,)
            Relative eigenpair residuals — always check convergence.
        """
        import jax.numpy as jnp
        import numpy as np

        from ..ops import assembly, matfree, modes
        from ..parallel.pipeline import _resolve_params

        self._require_force_field_matrix("lowest_modes")
        params = _resolve_params(self._ff)
        coord = self._coord
        n = coord.shape[0]
        masses = self._masses

        refine_block = options.pop("refine_block", 256)
        buffer = options.pop("refine_buffer", 4) if refine else 0
        k_solve = k + buffer
        if matrix_free:
            vals, vecs, res = matfree.lowest_modes_matfree(
                coord, params, k_solve, masses=masses, **options)
        else:
            dtype = options.pop("dtype", jnp.float32)
            hessian = assembly.hessian_matrix(
                coord, params, jnp, dtype=dtype, layout="xyz")
            if masses is not None:
                w = 1.0 / jnp.sqrt(jnp.asarray(masses, dtype))
                w3 = jnp.tile(w, 3)
                hessian = hessian * w3[:, None] * w3[None, :]
            vals, vecs = modes.lowest_modes_anm(
                hessian, jnp.asarray(coord, dtype), k_solve,
                masses=masses, **options)
            res = modes.mode_residuals(hessian, vals, vecs)

        if refine:
            vals, vecs, res = modes.refine_modes_f64(
                coord, params, np.asarray(vecs), masses=masses,
                layout="xyz", block=refine_block)
            vals, vecs, res = vals[:k], vecs[:k], res[:k]

        # xyz plane layout -> the model's atom-interleaved layout
        inv = (np.arange(3)[None, :] * n
               + np.arange(n)[:, None]).reshape(-1)
        return vals, vecs[:, inv], res

"""
Gaussian Network Model.

API-compatible with reference ``gnm.py``: lazy ``kirchhoff`` /
``covariance`` duals with setters, optional mass weighting, and the NMA
observable methods (``eigen``, ``frequencies``,
``mean_square_fluctuation``, ``bfactor``, ``dcc``).
"""

from __future__ import annotations

from . import nma
from .base import ElasticNetworkModel
from .interaction import compute_kirchhoff
from .nma import K_B

__all__ = ["GNM"]


class GNM(ElasticNetworkModel):
    """
    Gaussian Network Model: isotropic ENM over the ``(n, n)`` Kirchhoff
    matrix.

    Parameters
    ----------
    atoms : AtomArray, shape=(n,) or ndarray, shape=(n,3)
        Model atoms (usually CA) or their coordinates.
    force_field : ForceField
        Spring-constant rule.
    masses : bool or ndarray, shape=(n,), optional
        ``True`` infers per-residue masses from ``res_name``; an array
        gives explicit masses; default is no mass weighting.  The
        Kirchhoff matrix is weighted with ``outer(1/sqrt(m))``.
    use_cell_list : bool, optional
        Use a cell list for neighbor search on the host path.
    """

    _num_dim = 1

    def _compute_matrix(self):
        kirchhoff, _ = compute_kirchhoff(
            self._coord, self._ff, self._use_cell_list, return_pairs=False
        )
        return kirchhoff

    @property
    def kirchhoff(self):
        """The ``(n, n)`` Kirchhoff matrix (lazily computed; assignable —
        assigning invalidates the covariance)."""
        return self._get_matrix()

    @kirchhoff.setter
    def kirchhoff(self, value):
        self._set_matrix(value, error_cls=ValueError)

    def frequencies(self):
        """Mode frequencies in ascending order (first mode trivial)."""
        return nma.frequencies(self)

    def mean_square_fluctuation(self, mode_subset=None, tem=None,
                                tem_factors=K_B, matrix_free=False,
                                modes=None, probes=None, **options):
        """MSF per node; equals the covariance diagonal when all
        non-trivial modes are included.

        ``matrix_free=True`` estimates the *all-mode* MSF over all
        atoms without the covariance
        (``ops.matfree.msf_stochastic_gnm``): deflated Hutchinson
        probes through one batched CG solve, unbiased at every atom
        with ``modes`` (``k`` or an explicit ``(values, vectors)``
        pair) as the deflation subspace and exact rank-k floor.
        Returns ``(msf, stderr)``; `mode_subset` is not supported on
        this path.  Extra `options` (``tol``, ``max_iter``,
        ``precond``, ...) pass through to the solver.
        """
        if not matrix_free:
            self._dense_path_rejects(
                "mean_square_fluctuation", options, modes=modes,
                probes=probes)
            return nma.mean_square_fluctuation(self, mode_subset, tem,
                                               tem_factors)
        return self._stochastic_msf(
            "msf_stochastic_gnm", mode_subset, tem, tem_factors, modes,
            probes, options, atom_layout=False)

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
        `sites` by deflated CG on the implicit Kirchhoff operator
        (``ops.matfree.dcc_rows_matfree_gnm``) — for systems whose
        covariance exceeds device memory.  ``norm=True`` takes the
        all-mode GNM MSF from `msf` (e.g.
        :meth:`mean_square_fluctuation(matrix_free=True)
        <mean_square_fluctuation>`, unbiased, or the truncated
        mode-sum from :meth:`lowest_modes`) — or, with `msf` omitted,
        estimates it **in place** from ``modes=<k | (values,
        vectors)>`` (optionally ``probes=<p>``, default 64) via the
        stochastic MSF; the estimate's per-atom stderr propagates as
        ``~(sem_i/msf_i + sem_j/msf_j)/2`` relative error on row
        ``ij``.  Extra `options` (``tol``, ``max_iter``, ``precond``,
        ...) pass through to the solver.
        """
        if not matrix_free:
            self._dense_path_rejects("dcc", options, sites=sites,
                                     msf=msf, modes=modes,
                                     probes=probes)
            return nma.dcc(self, mode_subset, norm, tem, tem_factors)
        return self._matfree_dcc(
            mode_subset, norm, tem, tem_factors, sites, msf, modes,
            probes, options, rows_op_name="dcc_rows_matfree_gnm",
            msf_op_name="msf_stochastic_gnm", atom_layout=False)

    def lowest_modes(self, k, matrix_free=False, refine=False,
                     **options):
        """
        The `k` lowest non-trivial GNM modes on device without a full
        eigendecomposition (see :meth:`ANM.lowest_modes`): dense
        Cholesky shift-invert by default, or the matrix-free Chebyshev
        solver (`matrix_free=True`) when the Kirchhoff matrix exceeds
        device memory.  ``refine=True`` adds the float64 host
        Rayleigh-Ritz pass (``ops.modes.refine_modes_f64_gnm``:
        O(pairs * k) cell-list pair apply for cutoff families — viable
        even at 10^6 atoms — streamed dense Kirchhoff row panels
        otherwise; ``refine_buffer`` extra device modes) for
        ~1e-9-rtol eigenvalues and true f64 residuals.
        Returns ``(values, modes (k, n), residuals)``.
        """
        import numpy as np

        import jax.numpy as jnp

        from ..ops import assembly, matfree, modes, rigid
        from ..parallel.pipeline import _resolve_params

        self._require_force_field_matrix("lowest_modes")
        params = _resolve_params(self._ff)
        coord = self._coord
        masses = self._masses

        refine_block = options.pop("refine_block", 2048)
        buffer = options.pop("refine_buffer", 4) if refine else 0
        k_solve = k + buffer

        if matrix_free:
            vals, vecs, res = matfree.lowest_modes_matfree_gnm(
                coord, params, k_solve, masses=masses, **options)
        else:
            dtype = options.pop("dtype", jnp.float32)
            kirchhoff = assembly.kirchhoff_matrix(coord, params, jnp,
                                                  dtype=dtype)
            if masses is not None:
                w = 1.0 / jnp.sqrt(jnp.asarray(masses, dtype))
                kirchhoff = kirchhoff * w[:, None] * w[None, :]
            basis = rigid.null_mode_gnm(coord.shape[0], masses=masses,
                                        dtype=dtype)
            if 2 * max(k_solve, 8) + 2 * k_solve >= kirchhoff.shape[0]:
                vals, vecs = modes._dense_lowest(kirchhoff, k_solve,
                                                 basis)
            else:
                vals, vecs = modes.lowest_modes_shift_invert(
                    kirchhoff, basis, k=k_solve, **options)
            res = modes.mode_residuals(kirchhoff, vals, vecs)

        if refine:
            vals, vecs, res = modes.refine_modes_f64_gnm(
                coord, params, np.asarray(vecs), masses=masses,
                block=refine_block)
            vals, vecs, res = vals[:k], vecs[:k], res[:k]
        return vals, vecs, res

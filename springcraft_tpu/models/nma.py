"""
Extended normal-mode analysis as standalone functions.

Reference-compatible functional API (reference ``nma.py``): each function
takes a :class:`GNM`/:class:`ANM` model object and dispatches to the
array-level kernels in :mod:`springcraft_tpu.ops.nma_core`.  Unlike the
reference — which re-runs the eigensolve inside every observable
(``nma.py:145``) — the eigensystem is computed once and cached on the
model.
"""

from __future__ import annotations

import numpy as np

from ..ops import nma_core
from ..ops.nma_core import K_B, N_A  # re-export
from ..utils.config import resolve_backend

__all__ = [
    "eigen",
    "frequencies",
    "mean_square_fluctuation",
    "bfactor",
    "dcc",
    "normal_mode",
    "linear_response",
    "prs",
    "effector_sensor",
    "K_B",
    "N_A",
]


def _model_info(enm):
    """(is_anm, n_trivial_modes, num_dim) for a model instance."""
    from .anm import ANM
    from .gnm import GNM

    if isinstance(enm, ANM):
        return True, 6, 3
    if isinstance(enm, GNM):
        return False, 1, 1
    raise ValueError("Instance of GNM/ANM class expected.")


def _xp_for(arr):
    if resolve_backend(np.asarray(arr).dtype) == "numpy":
        return np
    import jax.numpy as jnp

    return jnp


def eigen(enm):
    """
    Eigenvalues (ascending) and eigenvectors (modes in rows) of the
    model's Kirchhoff/Hessian matrix (reference ``nma.py:29-63``).
    """
    _model_info(enm)
    return enm.eigen()


def _eigen_view(enm):
    """Cached eigensystem without defensive copies (read-only use)."""
    return enm._eigen()


def frequencies(enm):
    """
    Mode frequencies ``sqrt(lambda) / 2 pi``; trivial-mode eigenvalues
    are taken as absolute values (reference ``nma.py:66-105``).
    """
    _, n_trivial, _ = _model_info(enm)
    eig_values, _ = _eigen_view(enm)
    xp = _xp_for(eig_values)
    return np.array(
        nma_core.frequencies_from_eigenvalues(
            xp.asarray(eig_values), n_trivial, xp
        )
    )


def _resolve_mode_subset(mode_subset, n_modes, n_trivial):
    """Default to all non-trivial modes; reject subsets containing
    trivial modes (reference ``nma.py:159-165``)."""
    if mode_subset is None:
        return np.arange(n_trivial, n_modes), True
    mode_subset = np.asarray(mode_subset)
    if (mode_subset <= n_trivial - 1).any():
        raise ValueError(
            "Trivial modes are included in the current selection."
            " Please check your input."
        )
    return mode_subset, False


def mean_square_fluctuation(enm, mode_subset=None, tem=None,
                            tem_factors=K_B):
    """
    Mean square fluctuation per node over the selected modes
    (reference ``nma.py:108-184``).
    """
    is_anm, n_trivial, num_dim = _model_info(enm)
    eig_values, eig_vectors = _eigen_view(enm)
    modes, _ = _resolve_mode_subset(mode_subset, len(eig_values), n_trivial)
    xp = _xp_for(eig_values)
    return np.array(
        nma_core.mean_square_fluctuation(
            xp.asarray(eig_values), xp.asarray(eig_vectors), modes, xp,
            num_dim=num_dim, tem=tem, tem_factors=tem_factors,
        )
    )


def bfactor(enm, mode_subset=None, tem=None, tem_factors=K_B):
    """Isotropic B-factors ``8 pi^2 MSF / 3``
    (reference ``nma.py:187-230``)."""
    msf = mean_square_fluctuation(enm, mode_subset, tem, tem_factors)
    return nma_core.bfactor_from_msf(msf)


def dcc(enm, mode_subset=None, norm=True, tem=None, tem_factors=K_B):
    """
    Dynamic cross-correlation between nodes
    (reference ``nma.py:233-359``).  With all (non-trivial) modes the DCC
    is taken from the covariance (GNM: covariance itself; ANM: traces of
    its 3x3 superelements); for a mode subset it is accumulated from the
    selected modes.
    """
    is_anm, n_trivial, num_dim = _model_info(enm)
    eig_values, eig_vectors = _eigen_view(enm)
    modes, all_modes = _resolve_mode_subset(
        mode_subset, len(eig_values), n_trivial
    )

    if all_modes:
        cov = enm.covariance
        xp = _xp_for(cov)
        if is_anm:
            result = nma_core.dcc_from_covariance_anm(xp.asarray(cov), xp)
        else:
            result = xp.asarray(cov)
    else:
        xp = _xp_for(eig_values)
        result = nma_core.dcc_from_modes(
            xp.asarray(eig_values), xp.asarray(eig_vectors), modes, xp,
            num_dim=num_dim,
        )

    if norm:
        result = nma_core.normalize_dcc(result, xp)
    if tem is not None:
        result = result * tem * tem_factors
    return np.array(result)


def normal_mode(anm, index, amplitude, frames, movement="sine"):
    """
    Displacement trajectory depicting one ANM normal mode
    (reference ``nma.py:363-419``).
    """
    from .anm import ANM

    if not isinstance(anm, ANM):
        raise ValueError("Instance of ANM class expected.")
    _, eig_vectors = _eigen_view(anm)
    xp = _xp_for(eig_vectors)
    return np.array(
        nma_core.normal_mode_displacements(
            xp.asarray(eig_vectors[index]), amplitude, frames, xp,
            movement=movement,
        )
    )


def linear_response(anm, force):
    """
    Atom displacements induced by `force` via linear response theory
    (reference ``nma.py:422-473``).
    """
    from .anm import ANM

    if not isinstance(anm, ANM):
        raise ValueError("Instance of ANM class expected.")
    force = np.asarray(force)
    n = len(anm._coord)
    if force.ndim == 2:
        if force.shape != (n, 3):
            raise ValueError(
                f"Expected force with shape {(n, 3)}, got {force.shape}"
            )
    elif force.ndim == 1:
        if len(force) != n * 3:
            raise ValueError(
                f"Expected force with length {n * 3}, got {len(force)}"
            )
    else:
        raise ValueError(
            f"Expected 1D or 2D array, got {force.ndim} dimensions"
        )
    cov = anm.covariance
    xp = _xp_for(cov)
    return np.array(
        nma_core.linear_response_displacement(
            xp.asarray(cov), xp.asarray(force), xp
        )
    )


def prs(anm, norm=True):
    """
    Perturbation-response-scanning matrix
    (reference ``nma.py:476-524``).
    """
    from .anm import ANM

    if not isinstance(anm, ANM):
        raise ValueError("Instance of ANM class expected.")
    cov = anm.covariance
    xp = _xp_for(cov)
    return np.array(nma_core.prs_matrix(xp.asarray(cov), xp, norm=norm))


def effector_sensor(prs_matrix):
    """
    Effector/sensor profiles from a (normalized) PRS matrix
    (reference ``nma.py:527-569``).
    """
    prs_matrix = np.asarray(prs_matrix)
    eff, sens = nma_core.effector_sensor_profiles(prs_matrix, np)
    return eff, sens

"""
Normal-mode-analysis observables as pure array functions.

Functional core shared by the user-facing :mod:`springcraft_tpu.nma`
module, the batched/ensemble pipelines and the sharded multi-chip path.
Semantics follow reference ``nma.py`` exactly (citations inline); the
implementations are dense einsum/reshape algebra (no ``np.add.reduceat``,
no Python mode loops) so every function is jit- and vmap-compatible.

All functions take the array module ``xp`` (``jax.numpy`` or ``numpy``).
"""

from __future__ import annotations

import math

__all__ = [
    "K_B",
    "N_A",
    "fold_modes",
    "frequencies_from_eigenvalues",
    "mean_square_fluctuation",
    "bfactor_from_msf",
    "dcc_from_modes",
    "dcc_from_covariance_anm",
    "normalize_dcc",
    "normal_mode_displacements",
    "linear_response_displacement",
    "prs_matrix",
    "effector_sensor_profiles",
]

K_B = 1.380649e-23
N_A = 6.02214076e23


def fold_modes(sq_vectors, xp, num_dim=3, layout="atom"):
    """
    Fold squared mode vectors from 3n to n components per mode
    (reference ``nma.py:148-150``; identity for GNM, ``num_dim=1``).
    """
    if num_dim == 1:
        return sq_vectors
    m = sq_vectors.shape[0]
    if layout == "atom":
        return sq_vectors.reshape(m, -1, num_dim).sum(axis=-1)
    # xyz layout: components are grouped in contiguous blocks
    return sq_vectors.reshape(m, num_dim, -1).sum(axis=-2)


def frequencies_from_eigenvalues(eig_values, n_trivial, xp):
    """
    ``nu = sqrt(lambda) / (2 pi)`` with the trivial modes' eigenvalues
    taken as absolute values to avoid NaN from negative zeros
    (reference ``nma.py:97-103``).
    """
    n = eig_values.shape[-1]
    idx = xp.arange(n)
    vals = xp.where(idx < n_trivial, xp.abs(eig_values), eig_values)
    return xp.sqrt(vals) / (2 * math.pi)


def temperature_scaling(tem, tem_factors):
    """Reference ``nma.py:177-182``."""
    return 1.0 if tem is None else tem * tem_factors


def mean_square_fluctuation(eig_values, eig_vectors, mode_indices, xp,
                            num_dim=3, layout="atom",
                            tem=None, tem_factors=K_B):
    """
    MSF per node: ``sum_modes vec^2 / lambda`` over the selected modes,
    optionally temperature-scaled (reference ``nma.py:108-184``).

    `mode_indices` selects the (non-trivial) modes to include.
    """
    vals = eig_values[mode_indices]
    vecs = eig_vectors[mode_indices]
    folded = fold_modes(xp.square(vecs), xp, num_dim=num_dim, layout=layout)
    msf = xp.sum(folded / vals[:, None], axis=0)
    return msf * temperature_scaling(tem, tem_factors)


def bfactor_from_msf(msf):
    """``B = 8 pi^2 MSF / 3`` (reference ``nma.py:228``)."""
    return (8 * math.pi**2) * msf / 3


def dcc_from_modes(eig_values, eig_vectors, mode_indices, xp, num_dim=3,
                   layout="atom"):
    """
    Unnormalized DCC from a mode subset:
    ``sum_k u_k u_k^T / lambda_k`` with mode vectors reshaped to
    ``(n, num_dim)`` (reference ``nma.py:337-347``), expressed as a
    single einsum instead of a Python loop over modes.
    """
    vals = eig_values[mode_indices]
    vecs = eig_vectors[mode_indices]
    m = vecs.shape[0]
    if layout == "atom":
        modes = vecs.reshape(m, -1, num_dim)
    else:
        modes = vecs.reshape(m, num_dim, -1).transpose(0, 2, 1)
    kwargs = {} if xp.__name__ == "numpy" else {"precision": "highest"}
    return xp.einsum("kid,kjd,k->ij", modes, modes, 1.0 / vals, **kwargs)


def dcc_from_covariance_anm(covariance, xp):
    """
    All-modes ANM DCC: trace of each 3x3 superelement of the covariance
    (reference ``nma.py:326-336``).  For GNMs the all-modes DCC is the
    covariance itself (``nma.py:324-325``).
    """
    n3 = covariance.shape[0]
    n = n3 // 3
    reshaped = covariance.reshape(n, 3, n, 3)
    # Explicit diagonal sum, not einsum (see assembly._hessian_blocks)
    return sum(reshaped[:, a, :, a] for a in range(3))


def normalize_dcc(dcc, xp):
    """``nDCC_ij = DCC_ij / sqrt(DCC_ii DCC_jj)`` (``nma.py:350-353``)."""
    diag = xp.diagonal(dcc)
    return dcc / xp.sqrt(diag[None, :] * diag[:, None])


def normal_mode_displacements(mode_vector, amplitude, frames, xp,
                              movement="sine"):
    """
    Displacement trajectory depicting one ANM normal mode
    (reference ``nma.py:363-419``): the mode vector is reshaped to
    ``(n, 3)``, rescaled so its longest atom vector has length
    `amplitude`, then modulated over `frames` time steps.
    """
    mode = mode_vector.reshape(-1, 3)
    lengths = xp.sqrt(xp.sum(mode**2, axis=-1))
    mode = mode * (amplitude / xp.max(lengths))

    time = xp.linspace(0.0, 1.0, frames, endpoint=False)
    if movement == "sine":
        modulation = xp.sin(time * 2 * math.pi)
    elif movement == "triangle":
        modulation = 2 * xp.abs(2 * (time - xp.floor(time + 0.5))) - 1
    else:
        raise ValueError(f"Movement '{movement}' is unknown")
    return modulation[:, None, None] * mode


def linear_response_displacement(covariance, force, xp):
    """LRT displacement ``C @ f`` reshaped to ``(n, 3)``
    (reference ``nma.py:457-473``)."""
    flat = force.reshape(-1)
    if xp.__name__ == "numpy":
        disp = covariance @ flat
    else:
        disp = xp.matmul(covariance, flat, precision="highest")
    return disp.reshape(-1, 3)


def prs_matrix(covariance, xp, norm=True):
    """
    Perturbation-response scanning: element-wise squared covariance
    folded 3n -> n along both axes, optionally row-normalized by the
    diagonal (reference ``nma.py:511-523``).
    """
    n3 = covariance.shape[0]
    n = n3 // 3
    sq = xp.square(covariance).reshape(n, 3, n, 3)
    prs = sq.sum(axis=(1, 3))
    if norm:
        prs = prs / xp.diagonal(prs)[:, None]
    return prs


def effector_sensor_profiles(prs, xp):
    """
    Effector/sensor profiles: row/column means of the PRS matrix with the
    diagonal excluded (reference ``nma.py:562-568``).
    """
    n = prs.shape[0]
    diag = xp.diagonal(prs)
    effector = (prs.sum(axis=1) - diag) / (n - 1)
    sensor = (prs.sum(axis=0) - diag) / (n - 1)
    return effector, sensor

"""Pure-JAX functional core: force-field parameter pytrees, dense
interaction-matrix assembly, eigensolves, and NMA observable kernels."""

from . import assembly, ffparams, linalg, nma_core
from .assembly import hessian_matrix, hessian_rows, kirchhoff_matrix
from .ffparams import FFParams, force_constant_matrix, pairwise_sq_distance
from .linalg import eigensystem, eigh, pinvh

__all__ = [
    "assembly",
    "ffparams",
    "linalg",
    "nma_core",
    "FFParams",
    "force_constant_matrix",
    "pairwise_sq_distance",
    "kirchhoff_matrix",
    "hessian_matrix",
    "hessian_rows",
    "eigh",
    "eigensystem",
    "pinvh",
]

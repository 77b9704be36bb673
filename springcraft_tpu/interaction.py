"""Alias of :mod:`springcraft_tpu.models.interaction` mirroring the
reference's module layout."""

from .models.interaction import (  # noqa: F401
    compute_hessian,
    compute_kirchhoff,
)

__all__ = ["compute_kirchhoff", "compute_hessian"]

"""
Checkpoint / resume for ENM models and analysis results.

The reference has no persistence layer; its manual equivalent is
assigning precomputed matrices to the ``hessian``/``kirchhoff``/
``covariance`` setters (reference ``anm.py:120-148``).  Here model state
round-trips through a single ``.npz`` file: coordinates, masses and
whichever of the dual matrix caches are populated are stored, and
loading restores a model with identical lazy-cache semantics (the force
field itself is reconstructed by the caller; matrices take precedence,
so analyses resume without recomputation).
"""

from __future__ import annotations

import numpy as np

from .models.anm import ANM
from .models.gnm import GNM

__all__ = ["save_model", "load_model", "save_results", "load_results"]


def save_model(path, model):
    """Serialize a :class:`GNM`/:class:`ANM` to an ``.npz`` file."""
    payload = {
        "kind": np.array("anm" if isinstance(model, ANM) else "gnm"),
        "coord": np.asarray(model._coord),
    }
    if model.masses is not None:
        payload["masses"] = np.asarray(model.masses)
    if model._matrix is not None:
        payload["matrix"] = np.asarray(model._matrix)
    if model._covariance is not None:
        payload["covariance"] = np.asarray(model._covariance)
    np.savez_compressed(path, **payload)


class _NullForceField:
    """Placeholder for models restored from checkpoints that carry their
    matrices; any attempt to rebuild from the force field errors
    clearly."""

    cutoff_distance = None
    contact_shutdown = None
    contact_pair_off = None
    contact_pair_on = None
    natoms = None

    def force_constant(self, atom_i, atom_j, sq_distance):
        raise RuntimeError(
            "Model was restored from a checkpoint without a force field; "
            "assign a matrix or pass force_field= to load_model"
        )

    def to_params(self, natoms=None):
        return None


def load_model(path, force_field=None):
    """
    Restore a model saved with :func:`save_model`.

    Parameters
    ----------
    path : str
    force_field : ForceField, optional
        Attach a force field so the model can also recompute matrices
        from scratch; without it, only the checkpointed matrices are
        usable (which suffices for all observables).
    """
    with np.load(path, allow_pickle=False) as data:
        kind = str(data["kind"])
        coord = data["coord"]
        masses = data["masses"] if "masses" in data else None
        matrix = data["matrix"] if "matrix" in data else None
        covariance = data["covariance"] if "covariance" in data else None

    cls = ANM if kind == "anm" else GNM
    model = cls(coord, force_field or _NullForceField(), masses=masses)
    if matrix is not None:
        model._matrix = matrix
    if covariance is not None:
        model._covariance = covariance
    return model


def save_results(path, results):
    """Store a dict of observable arrays (e.g. a pipeline output)."""
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in results.items()}
    )


def load_results(path):
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}

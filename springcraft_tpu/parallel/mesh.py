"""
Device-mesh utilities for multi-chip execution.

The reference framework is single-process NumPy with no parallel or
distributed layer at all (SURVEY.md §2, "Parallelism: none"), so the
multi-chip design here is green-field and follows the standard JAX
recipe: build a :class:`jax.sharding.Mesh` over the available devices,
annotate shardings with ``NamedSharding``/``PartitionSpec``, and let XLA
insert the ICI collectives.

Mesh axes used by this framework:

* ``"ens"`` — data parallelism over conformer ensembles (each device
  solves complete NMA problems for its shard of conformers).
* ``"row"`` — model parallelism over interaction-matrix row blocks for
  mega-assembly Hessians that are built (and stored) sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ensemble_sharding", "P", "NamedSharding"]


def make_mesh(n_devices=None, row_axis=1, devices=None):
    """
    Build a 2D ``("ens", "row")`` mesh over `n_devices` devices.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices to use (default: all available).
    row_axis : int
        Size of the ``"row"`` (model-parallel) axis; must divide
        `n_devices`.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % row_axis != 0:
        raise ValueError(
            f"row_axis={row_axis} does not divide n_devices={n_devices}"
        )
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // row_axis, row_axis
    )
    return Mesh(grid, axis_names=("ens", "row"))


def ensemble_sharding(mesh):
    """Sharding placing the leading (conformer) axis across the full
    mesh (both axes act as data parallelism for ensembles)."""
    return NamedSharding(mesh, P(("ens", "row")))

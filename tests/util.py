"""Shared test helpers."""

import numpy as np

import springcraft_tpu as sc


class HostOnlyForceField(sc.ForceField):
    """
    Wrapper that hides ``to_params`` so the wrapped force field is
    evaluated through the host (``force_constant``) path — used to test
    that the dense JAX backend and the host backend agree.
    """

    def __init__(self, inner):
        self._inner = inner

    def force_constant(self, atom_i, atom_j, sq_distance):
        return self._inner.force_constant(atom_i, atom_j, sq_distance)

    @property
    def cutoff_distance(self):
        return self._inner.cutoff_distance

    @property
    def contact_shutdown(self):
        return self._inner.contact_shutdown

    @property
    def contact_pair_off(self):
        return self._inner.contact_pair_off

    @property
    def contact_pair_on(self):
        return self._inner.contact_pair_on

    @property
    def natoms(self):
        return self._inner.natoms

    def to_params(self, natoms=None):
        return None


def random_coord(seed, n_atoms=100, box=50.0):
    rng = np.random.RandomState(seed)
    return rng.rand(n_atoms, 3) * box

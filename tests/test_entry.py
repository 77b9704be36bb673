"""Driver entry points: single-chip compile check and the multi-chip
dryrun on the 8-device virtual mesh."""

import importlib
import sys
from os.path import dirname, realpath

import jax
import numpy as np
import pytest

sys.path.insert(0, dirname(dirname(realpath(__file__))))


@pytest.fixture(scope="module")
def graft_entry():
    return importlib.import_module("__graft_entry__")


def test_entry_compiles(graft_entry):
    fn, args = graft_entry.entry()
    out = jax.jit(fn)(*args)
    n = args[0].shape[0]
    assert np.asarray(out["msf"]).shape == (n,)
    assert np.asarray(out["eig_values"]).shape == (3 * n,)
    assert np.isfinite(np.asarray(out["msf"])).all()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip(graft_entry):
    graft_entry.dryrun_multichip(8)

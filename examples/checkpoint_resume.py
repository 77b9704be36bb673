"""
Checkpoint / resume
===================

Persist a computed model to disk and resume analyses later without
recomputation — the framework's replacement for the reference's manual
"assign a precomputed matrix to the setter" pattern.

Run:  python examples/checkpoint_resume.py
"""

import sys
from os.path import abspath, dirname, join

sys.path.insert(0, dirname(dirname(abspath(__file__))))  # in-repo run

import numpy as np

import springcraft_tpu as sc
from springcraft_tpu.io import load_model, save_model
from springcraft_tpu.structure import load_structure

path = join(dirname(dirname(abspath(__file__))), "tests", "data",
            "1l2y.pdb")
atoms = load_structure(path, model=1)
ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]

# Compute once ...
anm = sc.ANM(ca, sc.TabulatedForceField.e_anm(ca))
_ = anm.covariance  # populate the expensive caches
save_model("anm_checkpoint.npz", anm)
print("saved anm_checkpoint.npz")

# ... resume later: no force field needed, matrices come from disk
restored = load_model("anm_checkpoint.npz")
msf = restored.mean_square_fluctuation()
print("resumed MSF matches:",
      bool(np.allclose(msf, anm.mean_square_fluctuation())))
prs, eff, sens = restored.prs_effector_sensor()
print("PRS from checkpoint:", prs.shape)

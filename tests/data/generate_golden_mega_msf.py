"""
Generate the float64 all-mode MSF ground truth for the mega-scale
observable-accuracy bench line (``bench.py``: "mega all-mode MSF vs
committed f64 golden").

System: ``bench.make_ca_atoms(6912, seed=5)`` (deterministic synthetic
CA blob at protein density), sdENM compact tables, no mass weighting —
20,736-dim ANM Hessian, the size the single-chip all-mode
``ops.rigid.pinv_diagonal`` path is validated to.

Truth definition (matches ``pinv_diagonal`` semantics exactly):
``msf_i = sum_a diag(pinv(H))[a * n + i]`` with the six rigid-body
modes as the known null space.  Computed without an eigendecomposition
via the shift trick: for orthonormal null basis ``T`` and any
``sigma > 0``, ``A = H + sigma T T^t`` is SPD and
``diag(pinv(H)) = diag(A^-1) - (1/sigma) * diag(T T^t)`` —
one float64 Cholesky + triangular inverse (~10 min single-core at this
size; the artifact is ~100 KB and committed so bench runs pay nothing).

Run from the repo root:  python tests/data/generate_golden_mega_msf.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), "..", ".."))

N_RES = 6912          # 20,736-dim Hessian
SEED = 5
OUT = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                   "golden_mega_msf_20736.npz")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from bench import make_ca_atoms
    from springcraft_tpu.models import TabulatedForceField
    from springcraft_tpu.ops import assembly, modes
    from springcraft_tpu.utils import network

    atoms = make_ca_atoms(N_RES, seed=SEED)
    params = TabulatedForceField.sd_enm(atoms).to_compact_params()
    coord = np.asarray(atoms.coord, np.float64)
    assert network.is_connected(coord,
                                float(np.sqrt(params.cutoff_sq))), \
        "test system must be a connected network (pinv semantics)"

    t0 = time.time()
    h = assembly.hessian_matrix(coord, params, np, dtype=np.float64,
                                layout="xyz")
    print(f"assembled {h.shape} f64 Hessian in {time.time() - t0:.0f}s",
          flush=True)

    # _rigid_basis_np is atom-interleaved; permute to the xyz layout of
    # the Hessian above
    t = modes._rigid_basis_np(coord)[
        assembly.atom_to_xyz_permutation(N_RES)]
    sigma = float(np.mean(np.diagonal(h)))
    h += sigma * (t @ t.T)

    from scipy.linalg import cholesky, lapack

    t0 = time.time()
    chol = cholesky(h, lower=True, overwrite_a=True, check_finite=False)
    print(f"dpotrf in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    linv, info = lapack.dtrtri(chol, lower=1, overwrite_c=1)
    assert info == 0, info
    print(f"dtrtri in {time.time() - t0:.0f}s", flush=True)

    diag_inv = np.einsum("ki,ki->i", linv, linv)         # col sq-norms
    diag_pinv = diag_inv - np.sum(t * t, axis=1) / sigma
    n = N_RES
    msf = diag_pinv[:n] + diag_pinv[n:2 * n] + diag_pinv[2 * n:]

    np.savez_compressed(OUT, msf=msf, n_res=N_RES, seed=SEED,
                        sigma=sigma,
                        description="f64 all-mode MSF truth, sdENM, "
                                    "make_ca_atoms(6912, seed=5)")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes); "
          f"msf range [{msf.min():.3e}, {msf.max():.3e}]")


if __name__ == "__main__":
    main()

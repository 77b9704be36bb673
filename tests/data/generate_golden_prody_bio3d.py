"""
Regenerate the ProDy / bio3d golden CSVs in this directory.

Not runnable in the normal development environment — requires the
pinned legacy stack in ``golden_env.yml`` (ProDy, biotite <= 0.41,
rpy2 + R with bio3d 2.4).  Output naming matches the corpus the parity
tests load (cf. upstream provenance:
``/root/reference/tests/data/test_data_prep_prody_bio3d.py``):

* ``prody_{anm|gnm}_{cutoff}_ang_cutoff_{output}_{struc}.csv.gz``
* ``prody_{gnm|anm}_{cutoff}_ang_cutoff_{kirchhoff|hessian}_random_coords_seed_{s}.csv.gz``
* ``bio3d_anm_{ff}_ff_{output}_{struc}.csv.gz`` / ``bio3d_mass_{struc}.csv.gz``
* ``random_coord_seed_{s}.csv.gz``

Run from this directory: ``python generate_golden_prody_bio3d.py``.
"""

import numpy as np

import biotite.structure as struc
import biotite.structure.io as bstio
import prody


def load_ca(path):
    atoms = bstio.load_structure(path, model=1)
    return atoms[
        struc.filter_canonical_amino_acids(atoms)
        & (atoms.atom_name == "CA")
    ]


def save(name, arr):
    np.savetxt(name, np.asarray(arr), delimiter=",")
    print("wrote", name)


# --------------------------------------------------------------------------
# ProDy: GNM/ANM matrices, spectra, fluctuations, DCC variants, PRS
# --------------------------------------------------------------------------

PRODY_OUTPUTS = {
    # marker -> callable(model) (PRS handled separately: three outputs)
    "evals": lambda m: m.getEigvals(),
    "evecs": lambda m: m.getEigvecs().T,
    "fluctuations": lambda m: prody.calcSqFlucts(m),
    "dcc_norm": lambda m: prody.calcCrossCorr(m),
    "dcc_absolute": lambda m: prody.calcCrossCorr(m, norm=False),
}


def prody_golden(kind, struc_name, cutoffs, markers):
    ca = load_ca(f"{struc_name}.pdb")
    for cutoff in cutoffs:
        if kind == "anm":
            model = prody.ANM()
            model.buildHessian(ca.coord, gamma=1.0, cutoff=cutoff)
            matrix, matrix_name = model.getHessian(), "hessian"
            triv, sub_hi = 6, 36
        else:
            model = prody.GNM()
            model.buildKirchhoff(ca.coord, gamma=1.0, cutoff=cutoff)
            matrix, matrix_name = model.getKirchhoff(), "kirchhoff"
            triv, sub_hi = 1, 17
        model.calcModes(n_modes="all", zeros=True)

        stem = f"prody_{kind}_{cutoff}_ang_cutoff"
        for marker in markers:
            if marker == "hess_kirchhoff":
                save(f"{stem}_{matrix_name}_{struc_name}.csv.gz", matrix)
            elif marker == "dcc_norm_subset":
                save(
                    f"{stem}_dcc_norm_subset_{struc_name}.csv.gz",
                    prody.calcCrossCorr(model[triv:sub_hi], norm=True),
                )
            elif marker == "prs":
                mat, eff, sens = prody.calcPerturbResponse(model)
                for tag, out in (("mat", mat), ("eff", eff),
                                 ("sens", sens)):
                    save(f"{stem}_prs_{tag}_{struc_name}.csv.gz", out)
            else:
                save(f"{stem}_{marker}_{struc_name}.csv.gz",
                     PRODY_OUTPUTS[marker](model))


def prody_random_coord_golden(seeds=(1, 323, 777, 999), n_atoms=500,
                              box=40, cutoffs=(5, 10, 15)):
    for seed in seeds:
        # NOTE: the upstream script seeded with the whole seed list on
        # every iteration (`np.random.seed(SEED)`), so all four files
        # share one stream seeded by hashing the list; reproduce that
        # to keep byte-identical data.
        np.random.seed([1, 323, 777, 999])
        coord = np.random.rand(n_atoms, 3) * box
        save(f"random_coord_seed_{seed}.csv.gz", coord)
        for cutoff in cutoffs:
            gnm = prody.GNM()
            gnm.buildKirchhoff(coord, gamma=1.0, cutoff=cutoff)
            save(
                f"prody_gnm_{cutoff}_ang_cutoff_kirchhoff_random_coords"
                f"_seed_{seed}.csv.gz",
                gnm.getKirchhoff(),
            )
            if cutoff < 10:
                continue  # low-cutoff random ANMs are degenerate
            anm = prody.ANM()
            anm.buildHessian(coord, gamma=1.0, cutoff=cutoff)
            save(
                f"prody_anm_{cutoff}_ang_cutoff_hessian_random_coords"
                f"_seed_{seed}.csv.gz",
                anm.getHessian(),
            )


# --------------------------------------------------------------------------
# bio3d (R, via rpy2): mass-weighted NMA for calpha/sdenm/pfanm
# --------------------------------------------------------------------------


def bio3d_golden(struc_name, ff, markers):
    import rpy2.robjects as ro
    from rpy2.robjects.packages import importr

    bio3d = importr("bio3d")
    pdb = bio3d.read_pdb(f"{struc_name}.pdb")
    nma = bio3d.nma(pdb=pdb, ff=ff, mass=True)

    def rx(name):
        return np.array(nma.rx2[name])

    for marker in markers:
        if marker == "masses":
            save(f"bio3d_mass_{struc_name}.csv.gz", rx("mass"))
            continue
        if marker == "hessian":
            # Raw (non-mass-weighted) Hessian on the CA trace
            ca = load_ca(f"{struc_name}.pdb")
            out = _bio3d_hessian(bio3d, ca, ff)
        elif marker == "evals_mw":
            out = rx("L")
        elif marker == "frequencies_mw":
            out = rx("frequencies")
        elif marker == "fluctuations_non_mw":
            out = rx("fluctuations")
        elif marker == "fluctuations_subset_mw":
            out = np.array(
                bio3d.fluct_nma(nma, mode_inds=ro.r["seq"](12, 33))
            )
        elif marker == "dcc_mw":
            out = np.array(bio3d.dccm(nma))
        elif marker == "dcc_subset_mw":
            out = np.array(bio3d.dccm(nma, nmodes=30))
        else:
            raise ValueError(marker)
        save(f"bio3d_anm_{ff}_ff_{marker}_{struc_name}.csv.gz", out)


def _bio3d_hessian(bio3d, ca, ff):
    """build.hessian on a synthetic bio3d pdb object carrying only the
    CA trace (bio3d's own reader keeps all atoms)."""
    import rpy2.robjects as ro
    from rpy2.robjects import numpy2ri
    from rpy2.robjects.conversion import localconverter

    n = len(ca)
    xyz = ro.r.matrix(ro.FloatVector(ca.coord.ravel()), nrow=1)
    with localconverter(ro.default_converter + numpy2ri.converter):
        atom = ro.vectors.DataFrame({
            "type": ro.StrVector(["ATOM"] * n),
            "eleno": ro.IntVector(np.arange(1, n + 1)),
            "elety": ro.StrVector(ca.atom_name),
            "alt": ro.StrVector(["NA"] * n),
            "resid": ro.StrVector(ca.res_name),
            "chain": ro.StrVector(ca.chain_id),
            "resno": ro.IntVector(ca.res_id),
            "x": ro.FloatVector(ca.coord[:, 0]),
            "y": ro.FloatVector(ca.coord[:, 1]),
            "z": ro.FloatVector(ca.coord[:, 2]),
            "o": ro.IntVector([1] * n),
            "b": ro.IntVector([0] * n),
        })
        calpha = np.isin(
            np.arange(ca.res_id[0], ca.res_id[-1] + 1), ca.res_id
        )
    pdb = ro.ListVector({"xyz": xyz, "atom": atom, "calpha": ro.NULL})
    pdb.rclass = ro.StrVector(["pdb", "sse"])
    pdb.rx2["calpha"] = calpha
    ff_fun = bio3d.load_enmff(ff=ff)
    return np.array(
        bio3d.build_hessian(pdb.rx2("xyz"), pfc_fun=ff_fun, pdb=pdb)
    )


if __name__ == "__main__":
    # 1l2y: full observable battery
    prody_golden("anm", "1l2y", [13],
                 ["evals", "fluctuations", "dcc_norm", "dcc_norm_subset",
                  "dcc_absolute", "prs"])
    prody_golden("gnm", "1l2y", [4, 7, 13],
                 ["hess_kirchhoff", "evals", "evecs", "fluctuations",
                  "dcc_norm", "dcc_norm_subset", "dcc_absolute"])
    for ff in ("calpha", "sdenm", "pfanm"):
        bio3d_golden("1l2y", ff,
                     ["masses", "hessian", "evals_mw", "frequencies_mw",
                      "fluctuations_non_mw", "fluctuations_subset_mw",
                      "dcc_mw", "dcc_subset_mw"])

    prody_random_coord_golden()

    # 7cal: spectra only (1,776 CA — full matrices are large)
    prody_golden("anm", "7cal", [13], ["evals", "prs"])
    for ff in ("calpha", "sdenm", "pfanm"):
        bio3d_golden("7cal", ff, ["evals_mw", "masses"])

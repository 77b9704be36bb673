# Regenerate the BioPhysConnectoR golden CSVs in this directory
# (biophysconnector_anm_{eanm|eanm_mj|eanm_ke}_{hessian|evals|bfacs}_{struc}.csv.gz).
#
# Requires R with BioPhysConnectoR and the LRTNullModel4 data package
# (Miyazawa-Jernigan / Keskin tables); see golden_env.yml for the pinned
# Python side.  Run from this directory: Rscript generate_golden_eanm.R
#
# eANM construction (matches springcraft's TabulatedForceField.e_anm*):
# 13 A cutoff contacts, Miyazawa-Jernigan table for intra-chain and
# Keskin for inter-chain pairs (or MJ/MJ, Keskin/Keskin for the _mj/_ke
# variants), bonded constant alpha = 82.

library(BioPhysConnectoR)

write_gz_csv <- function(data, path) {
    con <- gzfile(path, "w")
    write.csv(data, con, row.names = FALSE)
    close(con)
    cat("wrote", path, "\n")
}

mj <- as.matrix(read.table(system.file("extdata", "mj1.txt",
                                       package = "LRTNullModel4")))
ke <- as.matrix(read.table(system.file("extdata", "mj2.txt",
                                       package = "LRTNullModel4")))

variants <- list(
    eanm    = list(intra = mj, inter = ke),
    eanm_mj = list(intra = mj, inter = mj),
    eanm_ke = list(intra = ke, inter = ke)
)

for (pdb_file in c("1l2y.pdb", "7cal.pdb")) {
    name <- strsplit(pdb_file, "\\.")[[1]][1]
    pdb <- extractPDB(pdb_file)
    contacts <- build.contacts(length(pdb$caseq), 13^2, pdb$coords)

    for (variant in names(variants)) {
        tables <- variants[[variant]]
        im <- build.interact(pdb$caseq, mj1 = tables$intra,
                             mj2 = tables$inter, d = pdb$chains,
                             alpha = 82)
        hess <- build.hess(cm = contacts$cm, im = im,
                           deltas = contacts$deltas)
        write_gz_csv(hess, sprintf(
            "biophysconnector_anm_%s_hessian_%s.csv.gz", variant, name))

        if (variant == "eanm") {
            # Spectrum and predicted B-factors only for the standard eANM
            write_gz_csv(get.svd(hess)$ev, sprintf(
                "biophysconnector_anm_%s_evals_%s.csv.gz", variant, name))
            covmat <- get.cov(contacts$cm, im, contacts$deltas)
            write_gz_csv(get.bfacs(covmat), sprintf(
                "biophysconnector_anm_%s_bfacs_%s.csv.gz", variant, name))
        }
    }
}

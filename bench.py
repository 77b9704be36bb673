"""
Benchmark harness.

Headline metric (cf. BASELINE.json "NMA solves/sec batched"): complete
fluctuation-NMA solves per second — Hessian assembly + all-mode
covariance + MSF + B-factors + normalized DCC for a 300-residue
protein, batched over a conformer ensemble on one chip.  The TPU path
uses the analytic-null-space Cholesky covariance; the CPU baseline
computes the *same observables* the reference way (pair-list assembly
+ `np.linalg.pinv(hermitian=True)`), single-threaded float64 NumPy —
the reference has no GPU/TPU path and publishes no numbers, so the
baseline is architecture-equivalent reference code, not literal
reference code (biotite/springcraft are not installable here).

Secondary stderr metrics:

* full spectral pipeline (eigh) vs an eigh CPU baseline;
* tabulated sdENM (compact ``(20,20,27)`` tables) batched fluctuation
  pipeline, XLA vs the fused Pallas assembly kernel;
* mega-assembly: 10k-residue (30k-dim) sdENM Hessian build + 20 lowest
  modes + f64 sparse-pair eigenvalue refinement (the BASELINE.json
  north-star config, both clauses in one budget) + mode-sum MSF/DCC
  observable error at full scale;
* matrix-free: 30k-atom block-sparse H@X + Chebyshev modes with
  refined f64 eigenvalues; XL entries at 100k atoms (ANM) and
  1,000,000 atoms (GNM) — skip with ``--no-xl``;
* single-structure 7cal end-to-end (the staged banded solver is
  opt-in via ``--banded-single``: measured 14x slower than XLA eigh
  at this size).

Run structure (hardened after round 4's driver timeout erased the
already-measured headline): the headline megabatch is measured FIRST
and the driver-facing JSON line printed immediately, with the
committed idle-host CPU baseline (``BASELINE_CPU.json``) as the
denominator; the secondary sections then run inside a whole-run
wall-clock budget (``BENCH_BUDGET_S``, default 1200 s — skipped
sections are named); and because the driver artifact keeps only the
stderr TAIL, every section appends its key evidence lines to a recap
that is re-logged at the very end of the run.

Every secondary section runs in its OWN subprocess (``python bench.py
--section NAME`` is the child entry) so a hard relay fault in one —
RESOURCE_EXHAUSTED wedges the whole client process — cannot cascade
into the remaining sections or the smoke checks.

``python bench.py --smoke`` runs the TPU regression checks instead:
compiled-Mosaic Pallas kernels vs XLA parity at two sizes/families and
the 7cal eANM f32-vs-f64 MSF check (guards the MXU bf16 hazard — see
CLAUDE.md); exits nonzero on failure.

Timing methodology: every jitted program returns a scalar checksum of
all outputs and the clock stops on fetching it — plain
``block_until_ready`` does not synchronize on relayed TPU backends.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import functools
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the remote TPU compiles take minutes;
# caching amortizes them across bench runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          ".jax_cache")


def _enable_compile_cache():
    """Explicit config update, NOT the env var: the axon sitecustomize
    pre-imports ``jax._src.config`` at interpreter startup, so
    ``JAX_COMPILATION_CACHE_DIR`` set here is read too late and the
    persistent cache silently never engages (measured: the 30k-dim
    modes program recompiled 297->304 s across back-to-back runs)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N_RES = 300
#: Conformers per device program.  Every jitted call pays a ~28 ms
#: relay floor on this target (see CLAUDE.md), and the blocked-inverse
#: pipeline is compute-bound beyond ~64 — 128 amortizes the floor and
#: measured fastest per solve (192 already shows HBM pressure; 256
#: trips a remote-compiler failure).
BATCH = 128
CUTOFF = 13.0
TPU_ITERS = 8
CPU_ITERS = 3


def log(*args):
    print(*args, file=sys.stderr, flush=True)


#: Key-evidence recap: the driver records only the LAST ~2.5 KB of
#: stderr, so every section appends its headline lines to this file
#: (path exported by the parent) and the parent re-logs the whole
#: recap at the very end of the run — the artifact tail then carries
#: the full evidence no matter how long the middle was.
_SUMMARY_ENV = "BENCH_SUMMARY_FILE"


def summary(msg):
    """Log `msg` to stderr AND append it to the end-of-run recap."""
    log(msg)
    path = os.environ.get(_SUMMARY_ENV)
    if path:
        try:
            with open(path, "a") as fh:
                fh.write(msg + "\n")
        except OSError:
            pass


def make_batches(n_batches, batch, n_res, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(n_res, 3) * 34.0).astype(np.float32)
    return [
        base[None] + 0.05 * rng.randn(batch, n_res, 3).astype(np.float32)
        for _ in range(n_batches)
    ]


#: CA-atom number density of the n=300 batches above (atoms/A^3); used
#: to size larger random blobs so cutoff connectivity stays realistic.
_CA_DENSITY = 300 / 34.0**3

# ---------------------------------------------------------------------------
# Roofline accounting (TPU v5e, single chip)
# ---------------------------------------------------------------------------
#: Peak MXU throughput.  f32 matmuls with precision='highest' run as
#: 6-pass bf16 products, ~1/4 of the bf16 rate in practice.
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0
V5E_HBM_GBPS = 819.0


def mfu(name, rate, flops_per_solve, note="", recap=False):
    """Achieved GFLOP/s (canonical task flops x solve rate) and
    percent of the v5e f32 peak — the denominator VERDICT r2 asked
    for.  Canonical counts are documented in docs/performance.md."""
    gflops = flops_per_solve * rate / 1e9
    pct = 100.0 * gflops / (V5E_F32_TFLOPS * 1e3)
    emit = summary if recap else log
    emit(f"  mfu[{name}]: {gflops:.0f} GFLOP/s = {pct:.1f}% of f32 peak"
         f"{' (' + note + ')' if note else ''}")


_BASELINE_CPU_PATH = os.path.join(
    os.path.dirname(os.path.realpath(__file__)), "BASELINE_CPU.json")


def _load_cpu_baseline():
    """The committed single-thread f64 NumPy baseline measurement
    (``BASELINE_CPU.json``) — deterministic reference-architecture
    code, measured once on an idle host and re-verified by the
    ``cpu-baseline`` section instead of re-timed on the critical path
    of every run (the live measurement lands *after* the headline JSON
    otherwise, which is how round 4 lost its artifact)."""
    try:
        with open(_BASELINE_CPU_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def bandwidth(name, seconds, bytes_moved):
    gbps = bytes_moved / seconds / 1e9
    pct = 100.0 * gbps / V5E_HBM_GBPS
    log(f"  bw[{name}]: {gbps:.0f} GB/s = {pct:.1f}% of HBM peak")

_AA20 = [
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
]


def make_ca_atoms(n, seed=0, spread=None):
    """Synthetic all-CA AtomArray (random sequence, one chain) at
    protein-like density — input for tabulated force fields."""
    from springcraft_tpu.structure import AtomArray

    rng = np.random.RandomState(seed)
    if spread is None:
        spread = (n / _CA_DENSITY) ** (1.0 / 3.0)
    atoms = AtomArray(n)
    atoms.coord = (rng.rand(n, 3) * spread).astype(np.float32)
    atoms.atom_name = np.full(n, "CA")
    atoms.element = np.full(n, "C")
    atoms.chain_id = np.full(n, "A")
    atoms.res_id = np.arange(1, n + 1)
    atoms.res_name = np.array(_AA20)[rng.randint(0, 20, n)]
    return atoms


def _timed(fn, inputs):
    """Compile on inputs[0], then time scalar fetches over the rest."""
    t0 = time.perf_counter()
    float(fn(inputs[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    vals = [fn(b) for b in inputs[1:]]
    checksum = sum(float(v) for v in vals)
    return compile_s, time.perf_counter() - t0, checksum


def bench_headline():
    """The headline measurement ALONE — production-throughput
    fluctuation NMA (MSF + B-factors + normalized DCC per conformer):
    plane-trace covariance engine + Pallas assembly (auto tile) + ONE
    megabatch program (lax.map over 128-conformer chunks pays the
    ~28 ms relay call floor once instead of once per batch).  Kept
    minimal (one ~20 s cold compile) so the driver-facing JSON line is
    out the door minutes into the run; every comparison pipeline lives
    in a budgeted secondary section."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams
    from springcraft_tpu.parallel import pipeline

    params = ffparams.invariant_params(CUTOFF)
    # 3 measured megabatch calls after the compile call: one call is
    # ~200 ms and carries ~±1% relay jitter — the headline value is
    # too load-bearing for a single sample.
    mega = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(4, TPU_ITERS * BATCH, N_RES, seed=3)
    ]
    prod_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in
                      pipeline.ensemble_anm_fluctuations(
                          b, params, with_dcc=True,
                          with_covariance=False, dtype=jnp.float32,
                          use_pallas=True, inverse="blocked",
                          chunk=BATCH).values())
    )
    compile_s, elapsed, _ = _timed(prod_fn, mega)
    n_solves = (len(mega) - 1) * TPU_ITERS * BATCH
    prod_rate = n_solves / elapsed
    m = 3 * N_RES
    summary(f"tpu[{jax.devices()[0].device_kind}] fluctuation pipeline "
            f"(megabatch {TPU_ITERS * BATCH}, chunk={BATCH}, trace "
            f"engine, Pallas assembly): compile {compile_s:.1f}s; "
            f"{n_solves} solves (N={N_RES}) in {elapsed:.3f}s "
            f"-> {prod_rate:.1f} solves/s")
    mfu("fluctuation-megabatch", prod_rate, m**3 * 7 / 3,
        "chol + m-rhs cho_solve canonical", recap=True)
    return prod_rate


def bench_fluct_variants():
    """Fluctuation-pipeline comparison points: the per-batch blocked
    Pallas-panel covariance pipeline (materializes the covariance) vs
    the XLA cho_solve formulation."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams
    from springcraft_tpu.parallel import pipeline

    params = ffparams.invariant_params(CUTOFF)
    batches = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(TPU_ITERS + 1, BATCH, N_RES)
    ]
    solves = TPU_ITERS * BATCH
    m = 3 * N_RES

    fluct_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in
                      pipeline.ensemble_anm_fluctuations(
                          b, params, with_dcc=True, dtype=jnp.float32,
                          inverse="blocked").values())
    )
    compile_s, elapsed, _ = _timed(fluct_fn, batches)
    fluct_rate = solves / elapsed
    summary(f"tpu fluctuation pipeline (blocked Pallas-panel "
            f"covariance, per-batch): compile {compile_s:.1f}s; "
            f"{solves} solves (N={N_RES}) in {elapsed:.3f}s -> "
            f"{fluct_rate:.1f} solves/s")
    mfu("fluctuation", fluct_rate, m**3 * 7 / 3,
        "chol + m-rhs cho_solve canonical")

    # The per-conformer cho_solve formulation, for comparison
    cho_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in
                      pipeline.ensemble_anm_fluctuations(
                          b, params, with_dcc=True, dtype=jnp.float32,
                          inverse="cho_solve").values())
    )
    compile_s, elapsed, _ = _timed(cho_fn, batches)
    cho_rate = solves / elapsed
    log(f"tpu fluctuation pipeline (XLA cho_solve covariance): compile "
        f"{compile_s:.1f}s; {solves} solves in {elapsed:.3f}s -> "
        f"{cho_rate:.1f} solves/s "
        f"({fluct_rate / cho_rate:.2f}x from the blocked inverse)")


def bench_spectral():
    """Spectral pipelines: the green-field banded two-stage solver
    (k-modes and full-eigensystem forms) FIRST, the XLA full-eigh
    baseline LAST — the eigh program never lands in the persistent
    compile cache (measured 32-186 s recompiles across warm runs), so
    when a tight budget slice truncates this section it must cut the
    baseline, not the flagship."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams
    from springcraft_tpu.parallel import pipeline

    params = ffparams.invariant_params(CUTOFF)
    batches = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(TPU_ITERS + 1, BATCH, N_RES)
    ]
    solves = TPU_ITERS * BATCH
    m = 3 * N_RES

    # Eigh-free spectral pipeline: banded two-stage eigenvalues (Pallas
    # bisection) + Cholesky covariance observables + 20 mode shapes
    fast_spectral_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in pipeline.ensemble_anm_spectral(
            b, params, dtype=jnp.float32, n_modes=20,
            n_iter_bisect=32).values())
    )
    compile_s, elapsed, _ = _timed(fast_spectral_fn, batches)
    fast_rate = solves / elapsed
    summary(f"tpu spectral pipeline (banded two-stage + Cholesky, k=20 "
            f"modes): compile {compile_s:.1f}s; {solves} solves in "
            f"{elapsed:.3f}s -> {fast_rate:.1f} solves/s")
    mfu("spectral-banded-k20", fast_rate, 5 * m**3,
        "band reduction + chol covariance estimate", recap=True)

    # Spectral speedup vs the committed single-thread CPU eigh
    # baseline, logged BEFORE the slow eigh baseline compile
    base = _load_cpu_baseline()
    if base is not None:
        summary(f"spectral speedup vs committed CPU eigh baseline: "
                f"{fast_rate / base['spectral_solves_per_s']:.1f}x "
                f"(banded-k20)")

    # Full eigensystem via the two-stage banded solver (no dense
    # eigh): same outputs as the eigh pipeline
    banded_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in pipeline.ensemble_anm_banded(
            b, params, dtype=jnp.float32).values())
    )
    compile_s, elapsed, _ = _timed(banded_fn, batches)
    banded_rate = solves / elapsed
    summary(f"tpu spectral pipeline (two-stage full eigensystem): "
            f"compile {compile_s:.1f}s; {solves} solves in {elapsed:.3f}s "
            f"-> {banded_rate:.1f} solves/s")
    mfu("spectral-two-stage-full", banded_rate, 9 * m**3,
        "canonical full-eigensystem 9m^3")

    # Full spectral pipeline (eigh) — the on-chip baseline
    spectral = jax.vmap(
        functools.partial(pipeline.anm_observables, params=params,
                          dtype=jnp.float32)
    )
    spectral_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in spectral(b).values())
    )
    compile_s, elapsed, _ = _timed(spectral_fn, batches)
    spectral_rate = solves / elapsed
    log(f"tpu spectral pipeline (full eigh): compile {compile_s:.1f}s; "
        f"{solves} solves in {elapsed:.3f}s -> "
        f"{spectral_rate:.1f} solves/s")
    mfu("spectral-eigh", spectral_rate, 9 * m**3,
        "canonical full-eigensystem 9m^3")
    summary(f"tpu spectral banded-vs-eigh: k20 {fast_rate:.1f} "
            f"({fast_rate / spectral_rate:.1f}x), full "
            f"{banded_rate:.1f} ({banded_rate / spectral_rate:.1f}x) "
            f"vs eigh {spectral_rate:.1f} solves/s")


def bench_tabulated_tpu():
    """Tabulated sdENM (compact type tables) batched fluctuation
    pipeline — the flagship Pallas path — XLA dense vs Pallas fused."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.models import TabulatedForceField
    from springcraft_tpu.parallel import pipeline

    params = TabulatedForceField.sd_enm(
        make_ca_atoms(N_RES)
    ).to_compact_params()
    batches = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(TPU_ITERS + 1, BATCH, N_RES)
    ]
    solves = TPU_ITERS * BATCH

    rates = {}
    for use_pallas in (False, True):
        fn = jax.jit(
            lambda b, up=use_pallas: sum(
                jnp.sum(v) for v in pipeline.ensemble_anm_fluctuations(
                    b, params, with_dcc=True, dtype=jnp.float32,
                    use_pallas=up, inverse="blocked").values())
        )
        compile_s, elapsed, _ = _timed(fn, batches)
        rates[use_pallas] = solves / elapsed
        path = "pallas-assembly" if use_pallas else "xla-assembly"
        log(f"tpu tabulated sdENM fluctuation pipeline [{path}, "
            f"blocked covariance]: "
            f"compile {compile_s:.1f}s; {solves} solves (N={N_RES}) in "
            f"{elapsed:.3f}s -> {rates[use_pallas]:.1f} solves/s")
    log(f"tpu tabulated sdENM [pallas vs xla assembly, blocked "
        f"covariance]: {rates[True] / rates[False]:.1f}x")

    # The PRODUCTION configuration — identical to the invariant
    # headline (megabatch, trace engine, no covariance output) so the
    # tabulated-vs-invariant family gap is measured like-for-like
    # (VERDICT r4 #6 compared a with-covariance batched sdENM number
    # against the invariant trace-engine megabatch).
    mega = [
        jax.device_put(jnp.asarray(b))
        for b in make_batches(2, TPU_ITERS * BATCH, N_RES, seed=3)
    ]
    prod_fn = jax.jit(
        lambda b: sum(jnp.sum(v) for v in
                      pipeline.ensemble_anm_fluctuations(
                          b, params, with_dcc=True,
                          with_covariance=False, dtype=jnp.float32,
                          use_pallas=True, inverse="blocked",
                          chunk=BATCH).values())
    )
    compile_s, elapsed, _ = _timed(prod_fn, mega)
    mega_rate = (TPU_ITERS * BATCH) / elapsed
    summary(f"tpu tabulated sdENM fluctuation pipeline (megabatch "
            f"{TPU_ITERS * BATCH}, chunk={BATCH}, trace engine, Pallas "
            f"assembly — the headline config): compile {compile_s:.1f}s; "
            f"{TPU_ITERS * BATCH} solves (N={N_RES}) in {elapsed:.3f}s "
            f"-> {mega_rate:.1f} solves/s")
    m = 3 * N_RES
    mfu("tabulated-megabatch", mega_rate, m**3 * 7 / 3,
        "chol + m-rhs cho_solve canonical", recap=True)
    return rates


def bench_mega_tpu(n_res=10_000, k_modes=20):
    """Mega-assembly north star (BASELINE.json): 10k-residue sdENM —
    30k-dim Hessian build (Pallas) + 20 lowest non-trivial modes."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.models import TabulatedForceField
    from springcraft_tpu.ops import modes, pallas_kernels

    atoms = make_ca_atoms(n_res, seed=2)
    params = TabulatedForceField.sd_enm(atoms).to_compact_params()
    coord = jax.device_put(jnp.asarray(atoms.coord))

    build = jax.jit(
        functools.partial(pallas_kernels.hessian_pallas, params=params,
                          dtype=jnp.float32)
    )
    build_sum = jax.jit(lambda c: jnp.sum(build(c)))
    t0 = time.perf_counter()
    float(build_sum(coord))
    build_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(build_sum(coord))
    build_s = time.perf_counter() - t0

    hessian = build(coord)

    # 4 buffer modes beyond k: the subspace-boundary modes converge
    # slowest, so keeping them out of the reported block is what buys
    # the refined 1e-9 rtol (see refine_modes_f64)
    k_buf = k_modes + 4

    def modes_checked(h, c):
        # Shift-invert subspace iteration (the reflected-spectrum LOBPCG
        # false-converges at this scale); the residual makes the timing
        # self-validating.
        vals, vecs = modes.lowest_modes_anm(h, c, k=k_buf)
        res = modes.mode_residuals(h, vals, vecs)
        return (jnp.sum(vals) + jnp.sum(vecs) + 0.0 * jnp.sum(res),
                res, vals, vecs)

    modes_fn = jax.jit(modes_checked)
    t0 = time.perf_counter()
    out = modes_fn(hessian, coord)
    float(out[0])
    modes_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = modes_fn(hessian, coord)
    float(out[0])
    modes_s = time.perf_counter() - t0
    max_res = float(np.max(np.asarray(out[1])[:k_modes]))

    m = 3 * n_res
    bandwidth("mega-build", build_s, m * m * 4)
    p = 2 * k_buf  # oversampled subspace width
    modes_flops = m**3 / 3 + 24 * 2 * m * m * p
    mfu("mega-modes", 1.0 / modes_s, modes_flops,
        "chol + 24 shift-invert sweeps")

    # North-star ACCURACY clause (BASELINE.json: eigenvalues to 1e-6
    # rtol).  The raw f32 device eigenvalues carry O(1e-4) error; the
    # f64 Rayleigh-Ritz refinement (ops.modes.refine_modes_f64 — host
    # cell-list pair apply, O(pairs * k)) recovers f64-accurate values
    # fast enough to live inside the <10 s budget.
    raw_vals, raw_vecs = out[2], out[3]
    t0 = time.perf_counter()
    ref_vals, ref_vecs, ref_res = modes.refine_modes_f64(
        np.asarray(coord), params, np.asarray(raw_vecs), layout="xyz")
    refine_s = time.perf_counter() - t0
    raw_vs_ref = float(np.max(
        np.abs(np.asarray(raw_vals, np.float64)[:k_modes]
               - ref_vals[:k_modes]) / ref_vals[:k_modes]))
    total = build_s + modes_s + refine_s
    log(f"tpu mega-assembly (n={n_res}, dim={3 * n_res}): Pallas build "
        f"{build_s:.2f}s (compile {build_compile_s:.1f}s) + "
        f"{k_modes}(+4 buffer) lowest modes {modes_s:.2f}s (compile "
        f"{modes_compile_s:.1f}s, max rel residual {max_res:.1e}) + "
        f"f64 Rayleigh-Ritz refinement {refine_s:.2f}s (host, sparse "
        f"pair apply) -> total {total:.2f}s (north star: <10s incl. "
        f"the accuracy pass)")
    log(f"tpu mega-assembly accuracy: raw f32 eigenvalue rtol vs "
        f"refined {raw_vs_ref:.1e}; refined f64 residuals max "
        f"{float(np.max(ref_res[:k_modes])):.1e}")

    # Observable-level error at mega scale (VERDICT r3 #5): the
    # quantities users actually plot from the mega path — mode-sum MSF
    # and a DCC row block — f32 device values vs the f64-refined
    # modes, at the full 30k dims.
    def _mode_observables(vals, vecs, sites=64):
        vals = np.asarray(vals, np.float64)[:k_modes]
        planes = (np.asarray(vecs, np.float64)[:k_modes]
                  .reshape(k_modes, 3, n_res))       # xyz layout
        weighted = planes / vals[:, None, None]
        msf = np.einsum("kai,kai->i", weighted, planes, optimize=True)
        rows = np.einsum("kai,kaj->ij", weighted[:, :, :sites], planes,
                         optimize=True)              # site x all traces
        dcc = rows / np.sqrt(msf[:sites, None] * msf[None, :])
        return msf, dcc
    msf32, dcc32 = _mode_observables(raw_vals, raw_vecs)
    msf64, dcc64 = _mode_observables(ref_vals, ref_vecs)
    # Free the 30k-dim device buffers before the proof/golden parts —
    # donation is not honored on the relay backend, so pinv_diagonal
    # below peaks at ~3 m^2 of its own; with the 3.6 GB Hessian (and
    # the mode block) still alive the r4 run tripped RESOURCE_EXHAUSTED
    # here and wedged the process.
    del hessian, out, raw_vals, raw_vecs
    msf_err = float(np.sqrt(np.mean((msf32 - msf64) ** 2)
                            / np.mean(msf64 ** 2)))
    dcc_err = float(np.max(np.abs(dcc32 - dcc64)))
    msf_status = "ok" if msf_err <= 1e-3 else "FAIL"
    dcc_status = "ok" if dcc_err <= 1e-2 else "FAIL"
    summary(f"tpu mega-assembly observables (dim={m}, {k_modes}-mode "
            f"sum): mega MSF rel err {msf_err:.1e} (f32 vs "
            f"f64-refined, tol 1e-03) {msf_status}; DCC 64-row block "
            f"max abs err {dcc_err:.1e} (tol 1e-02, correlations in "
            f"[-1,1]) {dcc_status}")

    # Ground-truth proof at a size where dense f64 eigh is feasible:
    # the refined eigenvalues must hit <=1e-6 rtol vs f64 truth.
    n_proof = 1000
    atoms_p = make_ca_atoms(n_proof, seed=3)
    params_p = TabulatedForceField.sd_enm(atoms_p).to_compact_params()
    coord_p = jax.device_put(jnp.asarray(atoms_p.coord))
    h_p = jax.jit(functools.partial(
        pallas_kernels.hessian_pallas, params=params_p,
        dtype=jnp.float32))(coord_p)
    raw_vals_p, raw_vecs_p = modes.lowest_modes_anm(
        h_p, coord_p, k=k_buf)
    ref_vals_p, _, _ = modes.refine_modes_f64(
        atoms_p.coord, params_p, np.asarray(raw_vecs_p), layout="xyz",
        block=512)
    raw_vals_p = np.asarray(raw_vals_p)[:k_modes]
    ref_vals_p = ref_vals_p[:k_modes]
    from springcraft_tpu.ops import assembly as assembly_mod
    h64 = assembly_mod.hessian_matrix(
        np.asarray(atoms_p.coord, np.float64), params_p, np,
        dtype=np.float64, layout="xyz")
    truth = np.linalg.eigvalsh(h64)[6:6 + k_modes]
    raw_rtol = float(np.max(np.abs(
        np.asarray(raw_vals_p, np.float64) - truth) / truth))
    ref_rtol = float(np.max(np.abs(ref_vals_p - truth) / truth))
    status = "ok" if ref_rtol <= 1e-6 else "FAIL"
    log(f"tpu mega-assembly accuracy proof (n={n_proof}, f64 eigh "
        f"truth): raw f32 eigenvalue rtol {raw_rtol:.1e} -> refined "
        f"{ref_rtol:.1e} (north-star clause: <=1e-6) {status}")

    # ONE self-contained driver-artifact line carrying both
    # BASELINE.json north-star clauses in one measured budget
    # (VERDICT r4 #2): the <10 s 30k-dim time AND the <=1e-6
    # eigenvalue-accuracy proof.
    time_status = "ok" if total <= 10.0 else "FAIL"
    summary(f"tpu NORTH-STAR (BASELINE.json, n={n_res}, dim={m}): "
            f"sdENM Pallas build {build_s:.2f}s + {k_modes}(+4) modes "
            f"{modes_s:.2f}s + f64 refine {refine_s:.2f}s = {total:.2f}s "
            f"total (<10s clause {time_status}; compiles "
            f"{build_compile_s:.0f}+{modes_compile_s:.0f}s cached "
            f"separately); max rel residual {max_res:.1e}; raw-f32 vs "
            f"refined eigenvalue rtol {raw_vs_ref:.1e}; refined vs f64 "
            f"eigh truth rtol {ref_rtol:.1e} at n={n_proof} (<=1e-6 "
            f"clause {status})")

    # All-mode observable accuracy at >=20k dims vs a COMMITTED f64
    # ground truth (tests/data/golden_mega_msf_20736.npz, generated by
    # tests/data/generate_golden_mega_msf.py — f64 Cholesky+trtri on
    # host): the f32 pinv_diagonal all-mode MSF must track it.
    golden_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), "tests", "data",
        "golden_mega_msf_20736.npz")
    # The 20736-dim all-mode pinv_diagonal check measured ~190 s on the
    # relay — with the whole-run budget nearly spent it would crowd out
    # every later section, and the north-star evidence above is already
    # emitted.
    remaining = float(os.environ.get("BENCH_REMAINING_S", "1e9"))
    if remaining < 600.0:
        log(f"tpu mega all-mode MSF golden check skipped "
            f"(~190 s; {remaining:.0f}s of run budget left)")
    elif os.path.exists(golden_path):
        from springcraft_tpu.ops import rigid
        golden = np.load(golden_path)
        n_g = int(golden["n_res"])
        atoms_g = make_ca_atoms(n_g, seed=int(golden["seed"]))
        params_g = TabulatedForceField.sd_enm(atoms_g)\
            .to_compact_params()
        coord_g = jax.device_put(jnp.asarray(atoms_g.coord))
        h_g = jax.jit(functools.partial(
            pallas_kernels.hessian_pallas, params=params_g,
            dtype=jnp.float32))(coord_g)
        t_g = jnp.asarray(rigid.rigid_modes_anm(coord_g, layout="xyz"),
                          jnp.float32)
        t0 = time.perf_counter()
        diag = np.asarray(rigid.pinv_diagonal(h_g, t_g,
                                              block_size=1296),
                          np.float64)
        allmode_s = time.perf_counter() - t0
        msf_dev = diag[:n_g] + diag[n_g:2 * n_g] + diag[2 * n_g:]
        truth = np.asarray(golden["msf"], np.float64)
        allmode_err = float(np.sqrt(np.mean((msf_dev - truth) ** 2)
                                    / np.mean(truth ** 2)))
        am_status = "ok" if allmode_err <= 1e-3 else "FAIL"
        summary(f"tpu mega all-mode MSF (dim={3 * n_g}, f32 "
                f"pinv_diagonal {allmode_s:.1f}s) vs committed f64 "
                f"golden: rel RMSE {allmode_err:.1e} (tol 1e-03) "
                f"{am_status}")
    return total


def bench_matfree_tpu(n_atoms=30_000, k_modes=10):
    """Matrix-free mega-scale (beyond the dense regime — the Hessian
    would need 32 GB at this size): block-sparse ``H @ X`` and the
    Chebyshev lowest-mode solver."""
    import jax
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams, matfree

    rng = np.random.RandomState(4)
    spread = (n_atoms / _CA_DENSITY) ** (1.0 / 3.0)
    coord = (rng.rand(n_atoms, 3) * spread).astype(np.float32)
    params = ffparams.invariant_params(13.0)

    perm = matfree.spatial_sort_permutation(coord)
    sorted_c = coord[perm]
    nbr, counts = matfree.tile_neighbor_lists(sorted_c, 13.0, 256)
    x = jax.device_put(jnp.asarray(
        rng.randn(3 * n_atoms, 20).astype(np.float32)))
    sorted_d = jax.device_put(jnp.asarray(sorted_c))
    ids = jax.device_put(jnp.asarray(perm, dtype=jnp.int32))

    apply_fn = jax.jit(lambda c, v, oi: jnp.sum(
        matfree.hessian_apply_pallas_sparse(
            c, v, params, nbr, counts, orig_ids=oi)))
    t0 = time.perf_counter()
    float(apply_fn(sorted_d, x, ids))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        float(apply_fn(sorted_d, x, ids))
    apply_ms = (time.perf_counter() - t0) / 5 * 1e3
    summary(f"tpu matrix-free (n={n_atoms}, dim={3 * n_atoms}; dense "
            f"Hessian would be {(3 * n_atoms) ** 2 * 4 / 2**30:.0f} GB): "
            f"block-sparse H@X(20) {apply_ms:.1f} ms "
            f"(compile {compile_s:.1f}s; "
            f"{counts.mean():.0f}/{nbr.shape[0]} mean tile neighbors)")
    tile_pairs = float(np.sum(np.asarray(counts))) * 256**2
    k_cols = x.shape[1]
    mfu("matfree-apply", 1e3 / apply_ms, tile_pairs * (18 * k_cols + 30),
        "visited tile pairs x per-pair superelement work")

    t0 = time.perf_counter()
    vals, vecs, res = matfree.lowest_modes_matfree(
        coord, params, k_modes + 4, degree=96, n_outer=10, tol=2e-4)
    float(jnp.sum(vals))
    total_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    vals, vecs, res = matfree.lowest_modes_matfree(
        coord, params, k_modes + 4, degree=96, n_outer=10, tol=2e-4)
    float(jnp.sum(vals))
    steady_s = time.perf_counter() - t0
    log(f"tpu matrix-free Chebyshev modes (k={k_modes}+4 buffer, "
        f"deg=96, tol=2e-4): {steady_s:.1f}s steady (first run "
        f"{total_s:.1f}s), max rel residual "
        f"{float(jnp.max(res[:k_modes])):.1e}")

    # f64 accuracy in the matrix-free regime (VERDICT r3 #2): the
    # sparse pair-list refinement upgrades the f32 Chebyshev modes to
    # f64-certified eigenvalues at O(pairs * k) host cost.
    from springcraft_tpu.ops import modes as modes_mod
    t0 = time.perf_counter()
    ref_vals, _, ref_res = modes_mod.refine_modes_f64(
        coord, params, np.asarray(vecs), layout="xyz")
    refine_s = time.perf_counter() - t0
    raw_vs_ref = float(np.max(np.abs(
        np.asarray(vals, np.float64)[:k_modes] - ref_vals[:k_modes])
        / ref_vals[:k_modes]))
    summary(f"tpu matrix-free accuracy (n={n_atoms}, dim={3 * n_atoms}): "
            f"f64 sparse-pair refinement {refine_s:.1f}s (host); raw f32 "
            f"eigenvalue rtol vs refined {raw_vs_ref:.1e}; refined true "
            f"f64 residuals max {float(np.max(ref_res[:k_modes])):.1e}")

    # Matrix-free effector/sensor profiles (reference nma.py:527-569
    # at a scale the reference cannot reach): 42 sites -> 126 RHS
    # columns in ONE batched deflated-CG call (lane padding to 128 is
    # free); the sensor normalizer (folded-PRS diagonal) comes from
    # the Chebyshev mode set already in hand.
    sites = np.linspace(0, n_atoms - 1, 42).astype(np.int64)
    prs_diag = matfree.prs_diag_from_modes(vals, np.asarray(vecs),
                                           layout="xyz")
    t0 = time.perf_counter()
    eff, sens, es_it, es_res, self_p = matfree.effector_sensor_matfree(
        coord, params, sites, prs_diag=prs_diag, return_diag=True)
    es_s = time.perf_counter() - t0
    log(f"tpu matrix-free effector/sensor (n={n_atoms}, 42 sites, "
        f"126-column batched CG): {es_s:.1f}s, {es_it} iterations, "
        f"max CG rel residual {float(np.max(np.asarray(es_res))):.1e}")
    # The one approximation every normalized mega-scale profile
    # shares: the rank-k mode-sum P_ii normalizer.  The site columns
    # carry the EXACT all-mode P_ss — quantify the truncation.
    diag_err = float(np.max(np.abs(prs_diag[sites] - self_p)
                            / self_p))
    log(f"  rank-{k_modes} prs_diag vs exact P_ss at the 42 sites: "
        f"max rel deviation {diag_err:.2f} (the shared normalizer "
        f"truncation of all normalized mega-scale profiles)")
    # The unbiased route: one more batched CG lifts the rank-k
    # normalizer to a stochastic estimate (split-probe product
    # estimator, rank-k PSD clamp, per-atom stderr).
    t0 = time.perf_counter()
    pd_st, pd_sem, pd_it, pd_res = matfree.prs_diag_stochastic(
        coord, params, (vals, np.asarray(vecs)), probes=48, seed=17)
    pd_s = time.perf_counter() - t0
    pd_dev = float(np.max(np.abs(pd_st[sites] - self_p) / self_p))
    log(f"  stochastic prs_diag (48 probes, {pd_s:.1f}s, {pd_it} "
        f"iterations): max rel deviation at the sites {pd_dev:.2f} "
        f"vs the mode-sum's {diag_err:.2f}")

    # Full-atom profiles by the O(n k^2) mode-sum contraction — no CG
    # sweep; the exact CG values at the 42 probe sites quantify the
    # k-mode truncation error of the all-atom profile.
    t0 = time.perf_counter()
    eff_full, sens_full = matfree.effector_sensor_from_modes(
        vals[:k_modes], np.asarray(vecs)[:k_modes], layout="xyz")
    full_s = time.perf_counter() - t0
    sens_dev = float(np.max(np.abs(sens_full[sites] - sens)
                            / np.abs(sens)))

    def _spearman(x, y):
        rx = np.argsort(np.argsort(x)).astype(np.float64)
        ry = np.argsort(np.argsort(y)).astype(np.float64)
        rx -= rx.mean()
        ry -= ry.mean()
        return float((rx @ ry) / np.sqrt((rx @ rx) * (ry @ ry)))

    sens_rank = _spearman(sens_full[sites], np.asarray(sens))
    eff_rank = _spearman(eff_full[sites], np.asarray(eff))
    log(f"tpu matrix-free FULL effector/sensor (n={n_atoms} atoms, "
        f"k={k_modes} mode-sum = exact rank-k PRS profiles): "
        f"{full_s * 1e3:.0f} ms host; vs exact all-mode CG values at "
        f"the 42 probe sites: effector Spearman {eff_rank:.3f}, "
        f"sensor Spearman {sens_rank:.3f}, max sensor rel deviation "
        f"{sens_dev:.1e} (rank-{k_modes} truncation error — use the "
        f"stochastic route below for all-mode profiles)")

    # Unbiased ALL-MODE full-atom profiles: Hutchinson stochastic
    # diagonal estimation — the profile numerators are diag(C^2) and
    # diag(C W C), each estimable from Rademacher probe columns of the
    # SAME batched CG that served the site solves.  The Chebyshev
    # modes already in hand serve as an exact rank-k control variate
    # (modes=): the dominant rank-k part of both profiles is computed
    # exactly and only the residual is sampled.
    n_probes = 48
    t0 = time.perf_counter()
    eff_st, sens_st, eff_sem, sens_sem, st_it, st_res = (
        matfree.effector_sensor_stochastic(
            coord, params, prs_diag, probes=n_probes, seed=11,
            modes=(vals, np.asarray(vecs))))
    st_s = time.perf_counter() - t0
    # Exact expectations of the stochastic estimates from the CG
    # quantities — the two routes subtract different self terms and
    # normalizers (CG: exact P_ss; stochastic: the shared rank-k
    # prs_diag), so correct for both before forming z-scores: the
    # effector numerator is sum_i P_is = eff_cg (n-1) P_ss + P_ss,
    # and the sensor offset is (P_ss / prs_diag_s - 1) / (n - 1).
    # After the corrections only sampling noise remains.
    nm1 = n_atoms - 1
    eff_expect = (np.asarray(eff) * nm1 * self_p + self_p
                  - prs_diag[sites]) / (nm1 * prs_diag[sites])
    sens_expect = (np.asarray(sens)
                   + (self_p / prs_diag[sites] - 1.0) / nm1)
    eff_z = float(np.max(np.abs(eff_st[sites] - eff_expect)
                         / eff_sem[sites]))
    sens_z = float(np.max(np.abs(sens_st[sites] - sens_expect)
                          / sens_sem[sites]))
    log(f"tpu matrix-free STOCHASTIC all-mode effector/sensor "
        f"(n={n_atoms} atoms, {n_probes} Rademacher probes, "
        f"rank-{k_modes + 4} exact control variate, "
        f"{2 * n_probes}-column batched CG): {st_s:.1f}s, {st_it} "
        f"iterations; vs the exact CG expectations at the 42 sites: "
        f"effector Spearman "
        f"{_spearman(eff_st[sites], eff_expect):.3f} "
        f"(max |dev|/stderr {eff_z:.1f}), sensor Spearman "
        f"{_spearman(sens_st[sites], sens_expect):.3f} "
        f"(max |dev|/stderr {sens_z:.1f}) — unbiased, only the "
        f"post-deflation residual is sampled")

    # All-mode MSF at mega scale: the mode-sum MSF is a truncated
    # LOWER BOUND (it can sit far below the all-mode value for atoms
    # the low modes barely move); msf_stochastic lifts it to an
    # unbiased estimate via deflated Hutchinson probes.  Truth at 8
    # probe sites: exact covariance-column traces (dcc_rows_matfree
    # norm=False diagonal, 24 CG columns).
    msf_sites = sites[::5][:8]
    t0 = time.perf_counter()
    dcc_rows, dcc_it, dcc_res = matfree.dcc_rows_matfree(
        coord, params, msf_sites, norm=False)
    msf_truth = np.array([np.asarray(dcc_rows)[s, site]
                          for s, site in enumerate(msf_sites)])
    truth_s = time.perf_counter() - t0
    modesum = np.einsum(
        "kan,kan,k->n",
        np.asarray(vecs, np.float64).reshape(-1, 3, n_atoms),
        np.asarray(vecs, np.float64).reshape(-1, 3, n_atoms),
        1.0 / np.asarray(vals, np.float64), optimize=True)
    t0 = time.perf_counter()
    msf_st, msf_sem, ms_it, ms_res = matfree.msf_stochastic(
        coord, params, (vals, np.asarray(vecs)), probes=n_probes,
        seed=13)
    ms_s = time.perf_counter() - t0
    modesum_dev = float(np.max(
        np.abs(modesum[msf_sites] - msf_truth) / msf_truth))
    st_dev = float(np.max(
        np.abs(msf_st[msf_sites] - msf_truth) / msf_truth))
    st_z = float(np.max(np.abs(msf_st[msf_sites] - msf_truth)
                        / np.maximum(msf_sem[msf_sites], 1e-300)))
    log(f"tpu matrix-free STOCHASTIC all-mode MSF (n={n_atoms} atoms, "
        f"{n_probes} probes, rank-{k_modes + 4} deflation): "
        f"{ms_s:.1f}s, {ms_it} iterations; vs exact covariance-column "
        f"traces at 8 sites ({truth_s:.1f}s, max CG rel residual "
        f"{float(np.max(np.asarray(dcc_res))):.1e}): mode-sum max rel "
        f"deviation {modesum_dev:.2f} (truncated lower bound) -> "
        f"stochastic {st_dev:.3f} (max |dev|/stderr {st_z:.1f})")


def bench_matfree_xl_tpu():
    """The far end of the matrix-free regime on ONE chip: 100k-atom ANM
    (300k dims) and 1,000,000-atom GNM — block-sparse Chebyshev modes
    with f64-certified refined eigenvalues (sparse pair apply; the
    dense panel stream could never run here)."""
    import jax.numpy as jnp

    from springcraft_tpu.ops import ffparams, matfree, modes

    rng = np.random.RandomState(7)
    params = ffparams.invariant_params(13.0)

    # (a) 100k-atom ANM, 300k-dim operator
    n = 100_000
    spread = (n / _CA_DENSITY) ** (1.0 / 3.0)
    coord = (rng.rand(n, 3) * spread).astype(np.float32)
    k = 10
    t0 = time.perf_counter()
    vals, vecs, res = matfree.lowest_modes_matfree(
        coord, params, k + 4, degree=96, n_outer=8, tol=5e-4, retries=1)
    float(jnp.sum(vals))
    solve_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_vals, _, ref_res = modes.refine_modes_f64(
        coord, params, np.asarray(vecs), layout="xyz")
    refine_s = time.perf_counter() - t0
    raw_vs_ref = float(np.max(np.abs(
        np.asarray(vals, np.float64)[:k] - ref_vals[:k])
        / ref_vals[:k]))
    summary(f"tpu matrix-free XL ANM (n={n}, dim={3 * n}): {k}(+4) "
            f"Chebyshev modes {solve_s:.0f}s (max f32 rel residual "
            f"{float(jnp.max(res[:k])):.1e}) + f64 sparse-pair refinement "
            f"{refine_s:.1f}s; raw-vs-refined eigenvalue rtol "
            f"{raw_vs_ref:.1e}, refined true f64 residuals max "
            f"{float(np.max(ref_res[:k])):.1e}")

    # (b) 1M-atom GNM
    n = 1_000_000
    spread = (n / _CA_DENSITY) ** (1.0 / 3.0)
    coord = (rng.rand(n, 3) * spread).astype(np.float32)
    k = 6
    t0 = time.perf_counter()
    vals, vecs, res = matfree.lowest_modes_matfree_gnm(
        coord, params, k + 4, degree=96, n_outer=6, tol=5e-4, retries=1)
    float(jnp.sum(vals))
    solve_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_vals, _, ref_res = modes.refine_modes_f64_gnm(
        coord, params, np.asarray(vecs))
    refine_s = time.perf_counter() - t0
    raw_vs_ref = float(np.max(np.abs(
        np.asarray(vals, np.float64)[:k] - ref_vals[:k])
        / ref_vals[:k]))
    summary(f"tpu matrix-free XL GNM (n={n}): {k}(+4) Chebyshev modes "
            f"{solve_s:.0f}s (max f32 rel residual "
            f"{float(jnp.max(res[:k])):.1e}) + f64 sparse-pair refinement "
            f"{refine_s:.1f}s; raw-vs-refined eigenvalue rtol "
            f"{raw_vs_ref:.1e}, refined true f64 residuals max "
            f"{float(np.max(ref_res[:k])):.1e}")


def bench_single_structure(k_modes=20, ca_limit=None,
                           ensemble_point=True, banded=False):
    """The first regime real users hit: ONE large protein end-to-end.
    7cal (1,776 CA -> 5,328-dim ANM): full eigh vs shift-invert
    lowest-k on TPU, vs the single-thread f64 CPU reference
    architecture; plus an N=2,000 ensemble point.  ``banded=True``
    (CLI ``--banded-single``) additionally times the staged two-stage
    banded solver at this size — measured 14x slower than XLA eigh
    with a ~97 s compile (its domain is batched mid-size spectra, see
    docs/performance.md), so it is opt-in rather than paying ~2 min
    of every bench run for a path users are steered away from."""
    import jax
    import jax.numpy as jnp

    import springcraft_tpu as sc
    from springcraft_tpu.ops import assembly, ffparams, modes
    from springcraft_tpu.parallel import pipeline
    from springcraft_tpu.structure import load_structure

    pdb = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                       "tests", "data", "7cal.pdb")
    atoms = load_structure(pdb, model=1)
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]
    if ca_limit is not None:
        ca = ca[:ca_limit]
    n = ca.array_length()
    m = 3 * n
    ff = sc.TabulatedForceField.e_anm(ca)
    params = ff.to_compact_params()
    coord = jax.device_put(jnp.asarray(ca.coord, jnp.float32))

    def timed_once(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda v: float(jnp.sum(v)) if hasattr(v, "dtype") else v,
            out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda v: float(jnp.sum(v)) if hasattr(v, "dtype") else v,
            out)
        return compile_s, time.perf_counter() - t0, out

    build = jax.jit(functools.partial(
        assembly.hessian_matrix, params=params, xp=jnp,
        dtype=jnp.float32, layout="xyz"))

    # (a) shift-invert lowest k FIRST — the 5328-dim XLA eigh baseline
    # below never lands in the persistent compile cache (measured
    # ~360 s recompiles across warm runs), so a tight budget slice
    # must cut the baseline, not the production path.
    def lowk(c):
        h = build(c)
        vals, vecs = modes.lowest_modes_anm(h, c, k=k_modes)
        return vals, vecs, modes.mode_residuals(h, vals, vecs)

    lowk_fn = jax.jit(lowk)
    c_s, lowk_s, out = timed_once(lowk_fn, coord)
    summary(f"tpu single-structure 7cal (n={n}, dim={m}): {k_modes} "
            f"lowest modes (shift-invert) {lowk_s:.2f}s (compile "
            f"{c_s:.1f}s, max rel residual {float(jnp.max(out[2])):.1e})")

    # (b) full dense eigh
    eigh_fn = jax.jit(lambda c: jnp.linalg.eigh(build(c)))
    c_s, eigh_s, _ = timed_once(eigh_fn, coord)
    log(f"tpu single-structure 7cal (n={n}, dim={m}): full eigh "
        f"{eigh_s:.2f}s (compile {c_s:.1f}s, {eigh_s / lowk_s:.1f}x "
        f"the lowest-{k_modes} solve)")
    mfu("7cal-eigh", 1.0 / eigh_s, 9 * m**3)

    # (c) two-stage banded full eigensystem, OPT-IN (staged: four
    # separate device programs — the monolithic form crashed the
    # remote compiler at this size until the use_pallas VMEM-guard
    # fix; the batched mid-size pipelines remain the banded solver's
    # win, while at large single-structure sizes XLA eigh is faster)
    from springcraft_tpu.ops import spectrum
    try:
        if not banded:
            raise _SkipBanded()
        hmat = build(coord)
        t0 = time.perf_counter()
        out_b = spectrum.eigh_banded_staged(hmat)
        float(jnp.sum(out_b[0]))
        c_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_b = spectrum.eigh_banded_staged(hmat)
        float(jnp.sum(out_b[0]) + jnp.sum(out_b[1]))
        banded_s = time.perf_counter() - t0
        ok = bool(np.all(np.isfinite(np.asarray(out_b[1]))))
        log(f"tpu single-structure 7cal: two-stage banded full "
            f"eigensystem (staged) {banded_s:.2f}s (compile "
            f"{c_s:.1f}s, {eigh_s / banded_s:.2f}x eigh, "
            f"finite={ok})")
        mfu("7cal-banded", 1.0 / banded_s, 9 * m**3)
    except _SkipBanded:
        log("tpu single-structure 7cal: staged banded solver skipped "
            "(opt-in via --banded-single; 14x slower than eigh here — "
            "its domain is batched mid-size spectra)")
    except Exception as exc:
        log(f"tpu single-structure banded failed: "
            f"{type(exc).__name__}: {exc}")

    # CPU reference architecture: f64 assembly + np.linalg.eigh,
    # measured at full 7cal size (~30 s single-thread)
    anm_cpu = sc.ANM(ca, ff)
    t0 = time.perf_counter()
    anm_cpu.eigen()
    cpu_s = time.perf_counter() - t0
    summary(f"cpu single-structure reference (f64 assembly + eigh, "
            f"n={n}): {cpu_s:.1f}s; tpu full eigh speedup "
            f"{cpu_s / eigh_s:.0f}x, lowest-{k_modes} speedup "
            f"{cpu_s / lowk_s:.0f}x")

    if not ensemble_point:
        return
    # N=2,000 ensemble point (batch 8): the mid-size ensemble regime
    n2, b2 = 2000, 8
    rng = np.random.RandomState(6)
    spread = (n2 / _CA_DENSITY) ** (1.0 / 3.0)
    base = (rng.rand(n2, 3) * spread).astype(np.float32)
    batches = [
        jax.device_put(jnp.asarray(
            base[None] + 0.05 * rng.randn(b2, n2, 3).astype(np.float32)))
        for _ in range(3)
    ]
    params2 = ffparams.invariant_params(13.0)
    # with_covariance=False: the plane-trace engine
    # (ops.rigid.covariance_plane_traces) skips the full (3n, 3n)
    # covariance Gram — measured 1.19x at this size (the crossover is
    # ~N=1000; at N=300 the aligned full Gram is already MXU-efficient
    # and trace-only does not pay — see docs/performance.md)
    fn2 = jax.jit(
        lambda b: sum(jnp.sum(v) for v in
                      pipeline.ensemble_anm_fluctuations(
                          b, params2, with_dcc=True, dtype=jnp.float32,
                          inverse="auto",
                          with_covariance=False).values()))
    t0 = time.perf_counter()
    float(fn2(batches[0]))
    c2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for x in batches[1:]:
        float(fn2(x))
    e2 = time.perf_counter() - t0
    rate2 = (len(batches) - 1) * b2 / e2
    summary(f"tpu ensemble point (N={n2}, batch {b2}, plane-trace "
            f"covariance engine): compile {c2:.1f}s; "
            f"{rate2:.2f} fluctuation solves/s")
    mfu("ensemble-n2000", rate2, (3 * n2)**3 * 7 / 3, recap=True)


class _SkipBanded(Exception):
    """Control-flow marker: staged banded solver not requested."""


def run_smoke():
    """TPU regression checks: compiled-Mosaic Pallas vs XLA parity and
    the 7cal eANM f32-vs-f64 MSF bf16-hazard check.  Returns the number
    of failures (0 = pass)."""
    import jax
    import jax.numpy as jnp

    import springcraft_tpu as sc
    from springcraft_tpu.ops import assembly, ffparams, pallas_kernels
    from springcraft_tpu.parallel import pipeline
    from springcraft_tpu.structure import load_structure

    backend = jax.default_backend()
    if backend != "tpu":
        log(f"smoke: WARNING backend is {backend!r}; Pallas kernels run "
            "in interpret mode — this does not validate Mosaic")
    failures = 0

    def check(name, got, ref, tol):
        nonlocal failures
        got = np.asarray(got, dtype=np.float64)
        ref = np.asarray(ref, dtype=np.float64)
        scale = np.max(np.abs(ref)) or 1.0
        rel = float(np.max(np.abs(got - ref)) / scale)
        status = "ok" if rel <= tol else "FAIL"
        if rel > tol:
            failures += 1
        log(f"smoke: {name}: max rel err {rel:.2e} (tol {tol:.0e}) "
            f"{status}")

    from springcraft_tpu.models import TabulatedForceField

    for n, seed in ((512, 0), (2048, 1)):
        rng = np.random.RandomState(seed)
        spread = (n / _CA_DENSITY) ** (1.0 / 3.0)
        coord = jnp.asarray(
            (rng.rand(n, 3) * spread).astype(np.float32)
        )
        inv = ffparams.invariant_params(13.0)
        sdenm = TabulatedForceField.sd_enm(
            make_ca_atoms(n, seed=seed)
        ).to_compact_params()
        for fam, params in (("invariant", inv), ("sdENM", sdenm)):
            h_xla = jax.jit(
                lambda c, p=params: assembly.hessian_matrix(
                    c, p, jnp, dtype=jnp.float32, layout="xyz"
                )
            )(coord)
            h_pal = jax.jit(
                lambda c, p=params: pallas_kernels.hessian_pallas(
                    c, p, dtype=jnp.float32
                )
            )(coord)
            check(f"hessian pallas==xla [{fam}, n={n}]", h_pal, h_xla,
                  5e-5)
        k_xla = jax.jit(
            lambda c: assembly.kirchhoff_matrix(c, inv, jnp,
                                                dtype=jnp.float32)
        )(coord)
        k_pal = jax.jit(
            lambda c: pallas_kernels.kirchhoff_pallas(c, inv,
                                                      dtype=jnp.float32)
        )(coord)
        check(f"kirchhoff pallas==xla [invariant, n={n}]", k_pal, k_xla,
              5e-5)

    # PatchedForceField overlays ride the fused kernels as a sparse
    # rank correction — Pallas must match the XLA dense path with
    # patches applied (VERDICT r3 #6)
    rng = np.random.RandomState(7)
    n_p = 2048
    spread = (n_p / _CA_DENSITY) ** (1.0 / 3.0)
    coord_p = jnp.asarray((rng.rand(n_p, 3) * spread).astype(np.float32))
    host_c = np.asarray(coord_p, np.float64)
    d2 = np.sum((host_c[:, None] - host_c[None, :]) ** 2, axis=-1)
    off = np.zeros((n_p, n_p), bool)
    on = np.zeros((n_p, n_p), bool)
    values = np.zeros((n_p, n_p), np.float32)
    ci, cj = np.nonzero(np.triu(d2 <= 169.0, 1))
    pick = rng.choice(len(ci), size=8, replace=False)
    off[ci[pick], cj[pick]] = off[cj[pick], ci[pick]] = True
    far = np.unravel_index(np.argmax(d2), d2.shape)
    on[far] = on[far[::-1]] = True
    values[far] = values[far[::-1]] = 2.5
    patched = ffparams.with_overlay(
        ffparams.invariant_params(13.0), off, on, values, on.copy())
    h_xla_p = jax.jit(
        lambda c: assembly.hessian_matrix(c, patched, jnp,
                                          dtype=jnp.float32,
                                          layout="xyz"))(coord_p)
    h_pal_p = jax.jit(
        lambda c: pallas_kernels.hessian_pallas(c, patched,
                                                dtype=jnp.float32)
    )(coord_p)
    check(f"hessian pallas==xla [patched invariant, n={n_p}]", h_pal_p,
          h_xla_p, 5e-5)

    # batched ensemble assembly (hoisted pair-constant planes) must
    # match vmap of the single-structure kernel, compiled
    sd_small = TabulatedForceField.sd_enm(
        make_ca_atoms(300, seed=2)
    ).to_compact_params()
    rng = np.random.RandomState(4)
    ens_coords = jnp.asarray(
        make_batches(1, 4, 300, seed=4)[0].astype(np.float32))
    h_ens = jax.jit(
        lambda c: pallas_kernels.hessian_pallas_ensemble(
            c, sd_small, dtype=jnp.float32)
    )(ens_coords)
    h_vmap = jax.jit(
        jax.vmap(lambda c: pallas_kernels.hessian_pallas(
            c, sd_small, dtype=jnp.float32))
    )(ens_coords)
    check("ensemble hessian kernel == vmap [sdENM]", h_ens, h_vmap,
          5e-5)
    k_ens = jax.jit(
        lambda c: pallas_kernels.kirchhoff_pallas_ensemble(
            c, sd_small, dtype=jnp.float32)
    )(ens_coords)
    k_vmap = jax.jit(
        jax.vmap(lambda c: pallas_kernels.kirchhoff_pallas(
            c, sd_small, dtype=jnp.float32))
    )(ens_coords)
    check("ensemble kirchhoff kernel == vmap [sdENM]", k_ens, k_vmap,
          5e-5)

    # blocked-inverse engine (compiled Mosaic panel kernel + matmul
    # substitution) must match the XLA cho_solve covariance end to end
    rng = np.random.RandomState(3)
    ens = jnp.asarray(
        (rng.rand(16, 300, 3) * 34.0).astype(np.float32))
    inv = ffparams.invariant_params(13.0)
    blocked = pipeline.ensemble_anm_fluctuations(
        ens, inv, with_dcc=True, inverse="blocked")
    chosolve = pipeline.ensemble_anm_fluctuations(
        ens, inv, with_dcc=True, inverse="cho_solve")
    for key in ("msf", "dcc", "covariance"):
        check(f"blocked inverse == cho_solve [{key}]", blocked[key],
              chosolve[key], 5e-4)

    # bf16-hazard regression: production f32 MSF at 7cal scale must
    # track the f64 host truth at ~1e-5 relative error, not ~1e-2
    # (dot_general without precision='highest' rounds through bf16).
    pdb = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                       "tests", "data", "7cal.pdb")
    atoms = load_structure(pdb, model=1)
    ca = atoms[(atoms.atom_name == "CA") & (atoms.element == "C")]
    ff = sc.TabulatedForceField.e_anm(ca)
    msf64 = sc.ANM(ca, ff).mean_square_fluctuation()  # host f64 (NumPy)
    out = pipeline.anm_fluctuations(
        jnp.asarray(ca.coord, dtype=jnp.float32),
        ff.to_compact_params(), with_dcc=False,
    )
    msf32 = np.asarray(out["msf"], dtype=np.float64)
    rel_rmse = float(
        np.sqrt(np.mean((msf32 - msf64) ** 2) / np.mean(msf64**2))
    )
    status = "ok" if rel_rmse <= 1e-3 else "FAIL"
    if rel_rmse > 1e-3:
        failures += 1
    log(f"smoke: 7cal eANM f32 MSF vs f64 truth: rel RMSE "
        f"{rel_rmse:.2e} (tol 1e-03, expected ~1e-5) {status}")

    summary(f"smoke: {failures} failure(s)")
    return failures


def _cpu_hessian(coord):
    """Reference-architecture assembly: pair list + scatter, float64."""
    diff = coord[:, None, :] - coord[None, :, :]
    sq = np.einsum("ijk,ijk->ij", diff, diff)
    adj = (sq <= CUTOFF**2) & ~np.eye(N_RES, dtype=bool)
    i, j = np.where(adj)
    disp = coord[j] - coord[i]
    sqd = np.einsum("kd,kd->k", disp, disp)
    blocks = np.zeros((N_RES, N_RES, 3, 3))
    blocks[i, j] = -(1.0 / sqd)[:, None, None] * np.einsum(
        "ka,kb->kab", disp, disp
    )
    idx = np.arange(N_RES)
    blocks[idx, idx] = -blocks.sum(axis=0)
    return blocks.transpose(0, 2, 1, 3).reshape(3 * N_RES, 3 * N_RES)


def bench_cpu_baselines():
    """Reference-equivalent CPU paths for both pipelines, float64 NumPy:

    * fluctuation: Hessian + ``np.linalg.pinv(hermitian=True)``
      covariance + MSF/B-factor/DCC (reference ``anm.py:133-136``,
      ``nma.py:324-353``);
    * spectral: Hessian + full ``np.linalg.eigh`` + observables
      (reference ``nma.py:61``).
    """
    coords = [b[0].astype(np.float64) for b in
              make_batches(CPU_ITERS, 1, N_RES, seed=1)]

    def fluct_solve(coord):
        hessian = _cpu_hessian(coord)
        cov = np.linalg.pinv(hessian, hermitian=True, rcond=1e-6)
        traces = np.einsum("iaja->ij", cov.reshape(N_RES, 3, N_RES, 3))
        msf = np.diagonal(traces)
        bfac = (8 * np.pi**2) * msf / 3
        dcc = traces / np.sqrt(msf[None, :] * msf[:, None])
        return msf, bfac, dcc

    def spectral_solve(coord):
        hessian = _cpu_hessian(coord)
        vals, vecs = np.linalg.eigh(hessian)
        sq_vecs = np.square(vecs.T[6:]).reshape(3 * N_RES - 6, N_RES, 3)
        msf = (sq_vecs.sum(-1) / vals[6:, None]).sum(0)
        return vals, msf

    def best_rate(solve):
        # Median per-solve time over the coords, repeated twice, for
        # robustness against transient host load
        times = []
        for _ in range(2):
            for c in coords:
                t0 = time.perf_counter()
                solve(c)
                times.append(time.perf_counter() - t0)
        times.sort()
        return 1.0 / times[len(times) // 2]

    fluct_rate = best_rate(fluct_solve)
    log(f"cpu fluctuation baseline (pinv, float64): "
        f"{fluct_rate:.3f} solves/s")
    spectral_rate = best_rate(spectral_solve)
    log(f"cpu spectral baseline (eigh, float64): "
        f"{spectral_rate:.3f} solves/s")
    return fluct_rate, spectral_rate


def bench_cpu_baseline_verify():
    """Re-measure the committed BASELINE_CPU.json on this host and log
    the drift — the live measurement is a verification, not the
    denominator of the already-printed headline JSON."""
    fluct, spectral = bench_cpu_baselines()
    base = _load_cpu_baseline()
    if base is None:
        summary("cpu-baseline: BASELINE_CPU.json missing — live "
                f"measurement fluct {fluct:.3f} / spectral "
                f"{spectral:.3f} solves/s (commit these)")
        return
    summary(f"cpu-baseline drift vs committed BASELINE_CPU.json: "
            f"fluct {fluct:.3f} vs {base['fluct_solves_per_s']:.3f}, "
            f"spectral {spectral:.3f} vs "
            f"{base['spectral_solves_per_s']:.3f} solves/s "
            f"(live host / committed idle-host)")


#: Secondary sections, each run in its OWN subprocess: a hard relay
#: fault (e.g. RESOURCE_EXHAUSTED) wedges the whole client process
#: (see CLAUDE.md / utils/elastic.py), so in-process section isolation
#: cannot stop one failure from cascading into every later section —
#: the r4 run lost four sections plus smoke to one OOM this way.
#: Compile caches live on the relay side + the persistent cache dir,
#: so child processes stay warm.
#:
#: ORDER = evidence value (VERDICT r4 #1c): the north-star mega proof
#: and the smoke regression checks must land even if the whole-run
#: budget truncates the tail sections.
_SECTIONS = ("mega-assembly", "smoke", "spectral", "fluctuation",
             "tabulated", "single-structure", "matrix-free",
             "matrix-free-xl", "cpu-baseline")
#: Per-section ceiling: a cold-cache mega section measured ~45 min when
#: the remote compiler was slow; warm (persistent-cache) runs take
#: minutes.  The whole-run budget below is the binding limit.
_SECTION_TIMEOUT_S = int(os.environ.get("BENCH_SECTION_TIMEOUT_S",
                                        "3600"))
#: Whole-run wall-clock budget for the secondary sections (seconds,
#: measured from process start).  The driver's bench budget is finite —
#: round 4 hit it (rc 124) and lost the artifact; now the headline JSON
#: is printed first and the sections stop launching when the budget is
#: spent, logging exactly which were skipped.  1200 s keeps the total
#: run (headline + sections + recap) safely under a ~25 min ceiling.
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))

#: Minimum remaining budget worth LAUNCHING each section with (warm-
#: cache wall measured 2026-08-20): launching into a smaller slice
#: just burns the slice on a partial run that times out (the r5
#: validation run spent 113 s on a single-structure attempt that needs
#: ~240 s).
_SECTION_MIN_S = {
    "mega-assembly": 240,
    "smoke": 150,
    "spectral": 300,
    "fluctuation": 120,
    "tabulated": 120,
    "single-structure": 300,
    "matrix-free": 300,
    "matrix-free-xl": 500,
    "cpu-baseline": 20,
}


def _run_section(name, banded_single=False):
    if name == "mega-assembly":
        bench_mega_tpu()
    elif name == "smoke":
        sys.exit(1 if run_smoke() else 0)
    elif name == "spectral":
        bench_spectral()
    elif name == "fluctuation":
        bench_fluct_variants()
    elif name == "tabulated":
        bench_tabulated_tpu()
    elif name == "single-structure":
        bench_single_structure(banded=banded_single)
    elif name == "matrix-free":
        bench_matfree_tpu()
    elif name == "matrix-free-xl":
        bench_matfree_xl_tpu()
    elif name == "cpu-baseline":
        bench_cpu_baseline_verify()
    else:
        raise ValueError(f"unknown bench section: {name}")


def _run_section_subprocess(name, extra_args, timeout_s):
    import subprocess

    cmd = [sys.executable, os.path.realpath(__file__),
           "--section", name] + extra_args
    env = dict(os.environ,
               BENCH_REMAINING_S=str(int(timeout_s)))
    try:
        proc = subprocess.run(cmd, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        summary(f"tpu {name} bench failed: timeout after "
                f"{timeout_s:.0f}s")
        return False
    if proc.returncode != 0:
        summary(f"tpu {name} bench failed: subprocess exit "
                f"{proc.returncode}")
        return False
    return True


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    t_start = time.perf_counter()
    _enable_compile_cache()
    if "--smoke" in argv:
        sys.exit(1 if run_smoke() else 0)
    if "--section" in argv:
        name = argv[argv.index("--section") + 1]
        try:
            _run_section(name, banded_single="--banded-single" in argv)
        except Exception as exc:
            log(f"tpu {name} bench failed: {type(exc).__name__}: {exc}")
            sys.exit(1)
        sys.exit(0)

    # Fresh recap file for this run; children append through the env.
    summary_path = os.path.join(
        os.path.dirname(os.path.realpath(__file__)), ".bench_summary")
    try:
        with open(summary_path, "w"):
            pass
        os.environ[_SUMMARY_ENV] = summary_path
    except OSError:
        summary_path = None

    try:
        tpu_fluct = bench_headline()
    except Exception as exc:
        # One retry: transient relay faults are the dominant failure
        # mode (utils/elastic.py) and the headline JSON line must not
        # be lost to one.
        log(f"tpu headline bench failed ({type(exc).__name__}: {exc}); "
            f"retrying in 30s")
        time.sleep(30.0)
        tpu_fluct = bench_headline()

    # The driver-facing JSON line goes out IMMEDIATELY — round 4's
    # bench timed out with the headline measured but unprinted.  The
    # denominator is the committed idle-host CPU baseline (verified by
    # the cpu-baseline section); a live fallback only if it is missing.
    base = _load_cpu_baseline()
    if base is None:
        log("BASELINE_CPU.json missing; measuring the CPU baseline "
            "live before printing the headline JSON")
        cpu_fluct, cpu_spectral = bench_cpu_baselines()
    else:
        cpu_fluct = base["fluct_solves_per_s"]
    result = {
        "metric": f"anm_fluctuation_nma_solves_per_sec_batched_n{N_RES}",
        "value": round(tpu_fluct, 2),
        "unit": "solves/s",
        "vs_baseline": round(tpu_fluct / cpu_fluct, 2),
    }
    print(json.dumps(result), flush=True)
    summary(f"headline: {result['value']} solves/s = "
            f"{result['vs_baseline']}x the single-thread f64 CPU "
            f"reference architecture (committed idle-host baseline)")

    extra = [a for a in argv if a == "--banded-single"]
    skipped = []
    for name in _SECTIONS:
        if name == "matrix-free-xl" and "--no-xl" in argv:
            continue
        remaining = _BUDGET_S - (time.perf_counter() - t_start)
        if remaining < max(90.0, _SECTION_MIN_S.get(name, 90.0)):
            skipped.append(name)
            continue
        _run_section_subprocess(
            name, extra, min(_SECTION_TIMEOUT_S, remaining))
    if skipped:
        summary(f"budget ({_BUDGET_S:.0f}s) spent — sections skipped: "
                f"{', '.join(skipped)} (run `python bench.py --section "
                f"NAME` or raise BENCH_BUDGET_S)")

    # Re-log the recap LAST: the driver artifact keeps only the stderr
    # tail, so the key evidence lines from every section must be the
    # final thing on the stream.
    if summary_path:
        try:
            with open(summary_path) as fh:
                lines = fh.read().splitlines()
        except OSError:
            lines = []
        del os.environ[_SUMMARY_ENV]  # recap itself must not re-append
        log(f"=== bench recap ({time.perf_counter() - t_start:.0f}s "
            f"wall) ===")
        for line in lines:
            log(line)


if __name__ == "__main__":
    main()

"""Guards on the driver-facing bench harness (``bench.py``).

The bench runs on real TPU hardware only, but its host-side pieces —
the CPU reference baseline, the batch generators, and the roofline
accounting helpers — are pure NumPy and must not bit-rot: the headline
``vs_baseline`` figure is only meaningful if the CPU baseline computes
the *same observables* as the TPU pipeline (reference semantics:
``/root/reference/src/springcraft/anm.py:133-136``, ``nma.py:324-353``).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py"))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_bench_surface(bench):
    # The driver invokes main(); --smoke is a documented flag.
    for name in ("main", "bench_headline", "bench_mega_tpu",
                 "run_smoke", "bench_cpu_baselines", "make_batches",
                 "mfu", "bandwidth", "summary", "_load_cpu_baseline"):
        assert callable(getattr(bench, name)), name


def test_section_dispatch_names(bench):
    """Every advertised section dispatches; unknown names raise.  The
    driver-facing contract: sections run in their own subprocess so a
    hard relay fault cannot cascade (the r4 run lost four sections
    plus smoke to one RESOURCE_EXHAUSTED this way), the headline JSON
    prints before any of them, and the evidence-ordered list runs
    under a whole-run budget (the r4 artifact died rc=124 with the
    headline measured but unprinted)."""
    assert bench._SECTIONS == (
        "mega-assembly", "smoke", "spectral", "fluctuation",
        "tabulated", "single-structure", "matrix-free",
        "matrix-free-xl", "cpu-baseline")
    with pytest.raises(ValueError, match="unknown bench section"):
        bench._run_section("no-such-section")


def test_committed_cpu_baseline_loads(bench):
    """BASELINE_CPU.json (the headline JSON's denominator) is
    committed, loads, and carries plausible idle-host rates."""
    base = bench._load_cpu_baseline()
    assert base is not None, "BASELINE_CPU.json missing or unreadable"
    assert 0.1 < base["fluct_solves_per_s"] < 1000
    assert 0.1 < base["spectral_solves_per_s"] < 1000
    assert base["n_res"] == bench.N_RES


def test_summary_appends_to_recap(bench, tmp_path, monkeypatch):
    """summary() logs AND appends to the end-of-run recap file — the
    driver artifact keeps only the stderr tail, so the recap re-log is
    what carries each section's key evidence."""
    path = tmp_path / "recap"
    monkeypatch.setenv(bench._SUMMARY_ENV, str(path))
    bench.summary("line one")
    bench.summary("line two")
    assert path.read_text() == "line one\nline two\n"
    monkeypatch.delenv(bench._SUMMARY_ENV)
    bench.summary("not recorded")
    assert path.read_text() == "line one\nline two\n"


def test_enable_compile_cache_is_explicit_config(bench, tmp_path):
    """The cache must engage via jax.config.update: the axon
    sitecustomize pre-imports jax config, so env vars are read too
    late on the TPU image (the 30k modes program recompiled 297->304 s
    across runs before this fix)."""
    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        from springcraft_tpu.utils.config import enable_compile_cache

        enable_compile_cache(tmp_path / "cc", min_compile_time_secs=7)
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / "cc")
        assert jax.config.jax_persistent_cache_min_compile_time_secs \
            == 7.0
        bench._enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == bench._CACHE_DIR
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_cpu_baseline_hessian_matches_library(bench):
    """bench._cpu_hessian == the library's reference-parity assembly."""
    from springcraft_tpu import InvariantForceField
    from springcraft_tpu.models.interaction import compute_hessian

    coord = bench.make_batches(1, 1, bench.N_RES, seed=3)[0][0]
    coord = np.asarray(coord, dtype=np.float64)
    baseline = bench._cpu_hessian(coord)
    lib, _ = compute_hessian(
        coord, InvariantForceField(bench.CUTOFF), return_pairs=False)
    np.testing.assert_allclose(baseline, np.asarray(lib),
                               rtol=1e-10, atol=1e-10)


def test_cpu_baseline_observables(bench):
    """The baseline solve returns finite MSF/B-factor/DCC with the
    reference's shapes and the DCC unit diagonal."""
    coord = np.asarray(
        bench.make_batches(1, 1, bench.N_RES, seed=4)[0][0],
        dtype=np.float64)
    hessian = bench._cpu_hessian(coord)
    cov = np.linalg.pinv(hessian, hermitian=True, rcond=1e-6)
    traces = np.einsum(
        "iaja->ij", cov.reshape(bench.N_RES, 3, bench.N_RES, 3))
    msf = np.diagonal(traces)
    dcc = traces / np.sqrt(msf[None, :] * msf[:, None])
    assert msf.shape == (bench.N_RES,)
    assert np.all(msf > 0)
    np.testing.assert_allclose(np.diagonal(dcc), 1.0, atol=1e-12)
    assert np.all(np.isfinite(dcc))


def test_roofline_helpers(bench, capsys):
    bench.mfu("unit-test", rate=10.0, flops_per_solve=1e9)
    bench.bandwidth("unit-test", seconds=0.5, bytes_moved=1e9)
    err = capsys.readouterr().err
    assert "% of f32 peak" in err
    assert "GB/s" in err


def test_golden_mega_msf_artifact_and_generator_formula(bench):
    """The committed 20,736-dim f64 all-mode MSF golden must (a) load
    with consistent metadata and (b) be produced by a sound formula:
    the generator's shift-trick (``diag(pinv(H)) = diag((H + sigma
    T T^t)^-1) - diag(T T^t)/sigma``) is re-derived here at small scale
    against ``pinvh``."""
    path = os.path.join(_REPO, "tests", "data",
                        "golden_mega_msf_20736.npz")
    golden = np.load(path)
    assert int(golden["n_res"]) == 6912
    msf = np.asarray(golden["msf"])
    assert msf.shape == (6912,)
    assert np.all(np.isfinite(msf)) and np.all(msf > 0)

    # formula check at n=120 vs exact pinvh
    import jax.numpy as jnp
    from scipy.linalg import cholesky, lapack

    from springcraft_tpu.ops import assembly, ffparams, linalg, modes

    from springcraft_tpu.utils import network

    rng = np.random.RandomState(3)
    coord = rng.rand(120, 3) * 14.0
    params = ffparams.invariant_params(9.0)
    # the shift trick assumes the six rigid modes are the WHOLE null
    # space — guaranteed only on a connected network (same assert as
    # the generator)
    assert network.is_connected(coord, 9.0)
    h = np.asarray(assembly.hessian_matrix(coord, params, np,
                                           dtype=np.float64,
                                           layout="xyz"))
    t = modes._rigid_basis_np(coord)[
        assembly.atom_to_xyz_permutation(120)]
    sigma = float(np.mean(np.diagonal(h)))
    a = h + sigma * (t @ t.T)
    chol = cholesky(a, lower=True)
    linv, info = lapack.dtrtri(chol, lower=1)
    assert info == 0
    diag = np.einsum("ki,ki->i", linv, linv) \
        - np.sum(t * t, axis=1) / sigma
    exact = np.diagonal(np.asarray(linalg.pinvh(jnp.asarray(h))))
    assert np.allclose(diag, exact, rtol=1e-8, atol=1e-10)

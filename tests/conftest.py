"""Test configuration: force CPU with 8 virtual devices and enable x64.

Accuracy gates mirror the reference test suite (f64 tolerances,
``test/quadratic_program.jl:16-17`` etc.); multi-chip sharding tests run on the
virtual CPU mesh.

Note: this environment pre-imports jax at interpreter startup and pre-sets
``JAX_PLATFORMS=axon`` (the TPU tunnel), so plain env vars are too late —
``jax.config.update`` still works because the backend is not yet initialized
when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Raise the kernel's mmap-region cap (default 65530) if we can: every
# XLA:CPU executable holds mmap'd code sections, and the at-scale tier's
# largest compiles (the n=16 nsipm family-gate programs) segfault LLVM
# mid-compile when the process walks into the cap — reproduced even in a
# fresh process running only test_conic_polish.py -m "". Best-effort: in
# unprivileged environments the cache-clearing fixtures below are the
# remaining line of defense.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read().strip() or 0) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    Every XLA:CPU executable holds mmap'd code sections; a full-suite run
    compiles thousands of programs and pytest keeps every module's jitted
    entry points (and their executables) alive, so the process walks into
    the kernel's vm.max_map_count (default 65530) and LLVM aborts with
    'Cannot allocate memory' in allocateMappedMemory — reproduced
    deterministically at ~2/3 through the suite. Dropping the caches at
    module boundaries keeps the live-mapping count at the per-module peak
    (cross-module compile reuse is negligible: modules exercise distinct
    programs)."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_slow_items(request):
    """Free compiled executables after each @slow test item.

    Module-boundary clearing is not enough for the at-scale tier: a single
    heavy module (e.g. the f32 family gate's psd4/psd6/exp_big params in
    ``test_conic_polish.py``) can accumulate enough mmap'd XLA:CPU
    executables *within* the module to segfault LLVM mid-compile
    (reproduced in a full-suite ``-m ""`` run at ~32%). Slow items are
    deselected from the fast tier, so per-item clearing here costs the
    inner loop nothing while keeping the full suite's live-mapping count
    at the per-item peak."""
    yield
    if request.node.get_closest_marker("slow") is not None:
        jax.clear_caches()


# ---------------------------------------------------------------------------
# Smoke tier: one fast test per backend / kernel / parallel path, so a
# regression is catchable inside a session (<5 min) without the ~40-minute
# fast tier. Run with:  python -m pytest tests/ -m smoke -q
# (the trailing -m overrides the default "-m 'not slow'" in pytest.ini).
# ---------------------------------------------------------------------------

_SMOKE_TESTS = {
    # QP: embedded IPM, golden-file reverse, adjoint identity, fused kernel
    "test_qp_solver.py::test_simple_qp_eq_ineq",
    "test_qp_diff.py::test_golden_reverse_gradients",
    "test_qp_diff.py::test_adjoint_identity",
    "test_fused_pdip.py::test_fused_matches_staged_and_kkt",
    # LP / degenerate KKT path
    "test_linear_programs.py::test_lp_rhs_sensitivity_both_backends",
    # AD entry points + status surfacing
    "test_solve_ad.py::test_grad_through_solve_qp",
    "test_solve_ad.py::test_unconverged_conic_surfaces_flag",
    # conic: NT IPM, diffcp oracle, adjoint, PSD, exp/pow, fused kernel,
    # HSDE polish, LSQR
    "test_conic_ipm.py::test_socp_matches_dr_oracle",
    "test_conic.py::test_socp_forward_matches_diffcp",
    "test_conic.py::test_conic_adjoint_identity",
    "test_conic_ipm_psd.py::test_simple_psd3_through_ipm",
    "test_conic_nsipm.py::test_entropy_maximization_nsipm",
    "test_pow_rsoc_programs.py::test_rsoc_program_solve_and_diff",
    "test_conic_fused.py::test_fused_soc_matches_xla_ipm",
    "test_conic_polish.py::test_refinement_reduces_residual_from_perturbed_point",
    "test_lsqr.py::test_conic_lsqr_path_matches_dense",
    # cones substrate
    "test_cones.py::test_soc_dpi_matches_jacfwd",
    "test_cones.py::test_exp_cone_projection",
    # NLP: solver + sIpopt sensitivity (the solve_nlp AD entry shares the
    # same reverse rule; its dedicated test lives in the fast tier)
    "test_nlp_solver.py::test_sipopt_solution",
    "test_nlp_diff.py::test_sipopt_example",
    # parameter layer + bridges
    "test_parameters_bridges.py::test_readme_forward_p",
    "test_parameters_bridges.py::test_readme_reverse",
    "test_qp_via_conic.py::test_epigraph_lowering_solution_matches_qp",
    # contexts + heterogeneous batching
    "test_api_utils.py::test_context_matches_functional_verbs",
    "test_api_utils.py::test_pad_and_stack_preserves_solutions",
    # batch-path convergence flags (the c264648 regression class: a perf
    # retune flipping `converged` on a padded nsipm batch must fail INSIDE
    # the inner loop, not 40 minutes later in the fast tier)
    "test_batching_grad.py::test_unpad_cone_tangent_slices_reverse_verbs",
    # parallel: Schur coupling, shard_map, tensor-parallel chol, runtime
    "test_schur.py::test_schur_matches_monolithic",
    "test_schur.py::test_solve_two_stage_sharded",
    "test_tp_chol.py::test_tp_cholesky_matches_local",
    "test_runtime.py::test_global_mesh_covers_all_devices",
    # native packer
    "test_native_packer.py::test_pack_coo_matches_numpy",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        short = item.nodeid.rsplit("/", 1)[-1]
        if short in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)

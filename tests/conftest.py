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

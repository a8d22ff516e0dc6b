"""Test configuration: run on a virtual 8-device CPU mesh in float64.

Mirrors the reference CI setup (``JAX_ENABLE_X64=1``,
mici/pyproject.toml:227-269) and the multi-device test strategy from
SURVEY.md §4: multi-chip sharding is exercised with
``xla_force_host_platform_device_count=8`` in place of real TPU slices.
"""

import os

# Must run before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Fast lane: centrally mark long-running tests as ``slow`` so
# ``pytest -m "not slow"`` gives a quick (<5 min single-core) smoke lane
# while the full suite stays the default.  Patterns are substring matches
# against the test node id, maintained from ``--durations`` ledgers.
# ---------------------------------------------------------------------------

_SLOW_NODEID_PATTERNS = (
    # whole modules dominated by compile-heavy grids / long sampling runs
    "test_benchmarks.py",
    "test_nuts_equivalence.py",
    "test_statistical.py",
    "test_parity.py",
    # heavy individual tests
    "test_interop.py::test_sample_stan_model",
    "test_samplers.py::test_trace_",
    "test_samplers.py::test_sharded_",
    "test_samplers.py::test_chunked_execution_matches_unchunked",
    "test_samplers.py::test_auto_chunks_match_whole_stage_chunks_windowed",
    "test_samplers.py::test_windowed_stager_used_for_slow_adapters",
    "test_samplers.py::test_resume_from_final_states",
    "test_samplers.py::test_progress_bar_display",
    "test_samplers.py::test_sample_chains[dynamic",
    "test_samplers.py::test_sample_chains_rebatch_",
    "test_samplers.py::test_rebatch_grouping_bit_identical",
    "test_interface.py::test_sample_constrained",
    "test_interface.py::test_sample_hmc_chains_sampler_classes",
    "test_interface.py::test_sample_hmc_chains_integrator_classes",
    "test_interface.py::test_sample_hmc_chains[3-",
    "test_interface.py::test_sample_hmc_chains[1-2",
    "test_solvers.py::test_acceleration_reduces_iterations",
    "test_robustness.py::test_riemannian_singular_metric_region",
    "test_adapters.py::test_default_adapters_include_rebatch_tuning",
    "test_adapters.py::test_tree_depth_cap_end_to_end",
    "test_adapters.py::test_tree_depth_rebatch_mode_end_to_end",
    "test_api_behaviors.py::test_sampler_rng_coercions",
    "test_api_behaviors.py::test_eager_debug_mode_end_to_end",
    "test_dispatch.py::test_eigh_vmapped_kernel_matches_xla",
)

#: Parameterized grids where only the implicit-integrator / Riemannian
#: combinations are slow (fixed-point solves + eigh compile cost).
_SLOW_PARAM_SUBSTRINGS = ("implicit", "softabs", "constrained")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid
        if any(pat in nodeid for pat in _SLOW_NODEID_PATTERNS):
            item.add_marker(pytest.mark.slow)
        elif "test_integrators.py" in nodeid and any(
            sub in nodeid for sub in _SLOW_PARAM_SUBSTRINGS
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The suite compiles many hundreds of distinct XLA CPU programs; keeping
    them all loaded has triggered segfaults in the XLA CPU JIT late in the
    run.  Dropping the caches bounds resident compiled code (at the cost of
    a few recompilations of shared fixtures).
    """
    yield
    jax.clear_caches()

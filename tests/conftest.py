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

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (conftest is imported first
by pytest), so sharding tests see 8 devices without TPU hardware.
"""

import os

# Force CPU: the session may have JAX_PLATFORMS=axon (real TPU) preset, but
# unit tests must run on the virtual 8-device CPU mesh. Opt out by setting
# MAMBA_UNET_TPU_TEST_PLATFORM (e.g. to run kernel tests on hardware).
_platform = os.environ.get("MAMBA_UNET_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (preinstalled in this image) force-registers itself and
# ignores JAX_PLATFORMS from the environment; the config update below is the
# authoritative override.
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The `-m fast` subset (VERDICT r1 #9): kernel differential tests + losses +
# metrics + pure data ops — the correctness core, ~6 min on this single-core
# host vs ~45 min for the full suite. Milestone cadence runs everything.
_FAST_MODULES = {
    "test_selective_scan",
    "test_losses",
    "test_metrics",
    "test_cross_scan",
    "test_cube",
    "test_data",
    "test_ctaugment",
    "test_native",
    "test_vat_sdf",
    "test_lm_eval",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(1337)

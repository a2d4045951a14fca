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


@pytest.fixture
def rng():
    return np.random.default_rng(1337)

"""Test configuration: force a genuine 8-virtual-device CPU platform.

This image force-registers an 'axon' TPU PJRT plugin via a sitecustomize hook
at interpreter startup, which pins ``JAX_PLATFORMS=axon`` before pytest loads
this file. Setting the env var here is too late, but the backends themselves
are initialised lazily — so ``jax.config.update("jax_platforms", "cpu")``
still wins as long as it runs before the first device query. ``XLA_FLAGS`` is
likewise read at backend-init time, so the 8-device virtual CPU mesh for
multi-chip sharding tests can be requested here too.

Tests must run identically with or without a real TPU attached.
"""
import os

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)

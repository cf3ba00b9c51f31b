"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver environment force-registers the `axon` TPU backend in every
interpreter via sitecustomize and JAX_PLATFORMS=axon; tests must run on
CPU (fast compiles, 8 virtual devices for sharding tests), so we both
set the env *and* override jax.config, which wins over the plugin.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # Deterministic PER-TEST stream: the old session-scoped generator
    # made every test's draws depend on which tests ran before it
    # (order/selection-dependent failures).
    seed = int.from_bytes(request.node.name.encode(), "little") % (2**31)
    return np.random.default_rng(seed)

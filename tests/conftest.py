"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard way to exercise mesh/shard_map code without TPU
hardware (SURVEY.md §7.4).  Must run before jax initializes a backend.
"""

import os

# Force CPU even when the environment points JAX at a real accelerator
# (JAX_PLATFORMS=axon on this box) — the suite must run on the virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Plugins (jaxtyping) may import jax before this conftest runs, making the
# env vars above too late; the config route still works until the backend
# actually initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    "test suite requires the virtual 8-device CPU mesh; got "
    f"{jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

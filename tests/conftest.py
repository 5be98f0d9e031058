"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh (the TPU analog of a fake
backend) and enables x64 so golden parity tests run at f64 tolerance, per
the baseline protocol. Must run before any jax import in test modules.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would make every test compile over the wire.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

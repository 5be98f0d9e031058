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

# Persistent compilation cache: the suite's wall time is dominated by
# XLA compiles (fused while-loop optimizers, t_ppf Newton kernels, SPMD
# solves), which are identical run-to-run. First run populates the
# repo-local cache; repeat runs (and the driver's full-suite run) reuse it.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test harness: force an 8-virtual-device CPU platform before the JAX
backend initializes.

Real runs target one TPU chip (the container pre-sets JAX_PLATFORMS=axon);
tests must run on host CPU: x64 parity math, deterministic fp64, and a
virtual 8-device mesh for sharding tests. The config API is used (not just
env vars) because a pytest plugin may import jax before this conftest runs —
config.update works any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# persistent compile cache (measured 7 s vs 250 s on repeated programs —
# CLAUDE.md round-3 notes); entries are keyed by backend+HLO, so CPU test
# programs share the directory with the TPU benchmark programs safely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU, got " + jax.devices()[0].platform
    )
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)

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
# NO persistent compile cache for tests. Two reproducible failure modes on
# the XLA:CPU backend (observed round 3): (1) stale CPU executables from an
# earlier container boot with different CPU features SIGILL on load
# ("Machine type used for XLA:CPU compilation doesn't match"), because the
# cache key does not cover the host feature set; (2) serializing one of the
# suite's compiled programs (test_lm_solver tiled-matvec comparison)
# SEGFAULTS in put_executable_and_time even into a fresh cache dir —
# killing the whole suite. The TPU benchmark processes keep their own
# .jax_cache (those writes are reliable and save ~250 s per re-compile).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU, got " + jax.devices()[0].platform
    )
    yield


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA:CPU backend segfaults DURING A COMPILE once a single process
    has accumulated a few hundred compiled programs (reproducible at the
    same suite position across runs; every implicated program compiles fine
    in a fresh process). Dropping the executables between test modules
    keeps the monolithic `pytest tests/` run inside the backend's envelope
    at the cost of some duplicate compiles."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)

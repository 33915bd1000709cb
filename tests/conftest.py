"""Test harness: force an 8-virtual-device CPU platform before JAX loads.

Real runs target one TPU chip; sharding tests emulate a mesh on host CPU
(same XLA collectives, no hardware needed). x64 is enabled so parity tests
can check the fp64 reference algebra exactly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

"""Pallas band-matvec kernel vs the XLA entry-major reference (interpret
mode on CPU; the real-device parity check runs in benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.ops import pallas_band


def _ref(D, B, x):
    F = B.shape[0]

    def sd(v, f):
        return jnp.concatenate(
            [jnp.zeros(v.shape[:-1] + (f,), v.dtype), v[..., :-f]], -1)

    def su(v, f):
        return jnp.concatenate(
            [v[..., f:], jnp.zeros(v.shape[:-1] + (f,), v.dtype)], -1)

    y = jnp.stack([sum(D[6 * i + j] * x[j] for j in range(6))
                   for i in range(6)])
    for f in range(F):
        xs = sd(x, f + 1)
        y = y + jnp.stack([sum(B[f, 6 * i + j] * xs[j] for j in range(6))
                           for i in range(6)])
        z = jnp.stack([sum(B[f, 6 * i + j] * x[i] for i in range(6))
                       for j in range(6)])
        y = y + su(z, f + 1)
    return y


@pytest.mark.parametrize("n,bn", [(256, 128), (512, 256), (512, 512)])
def test_band_matvec_interpret(rng, n, bn):
    F = 5
    D = jnp.asarray(rng.normal(size=(36, n)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(F, 36, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(6, n)), jnp.float32)
    y0 = _ref(D, B, x)
    y1 = pallas_band.band_matvec(D, B, x, block_n=bn, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-4, rtol=1e-5)


def test_shift_band_up(rng):
    F, n = 3, 64
    B = jnp.asarray(rng.normal(size=(F, 36, n)), jnp.float32)
    Bup = pallas_band.shift_band_up(B)
    for f in range(F):
        np.testing.assert_allclose(
            np.asarray(Bup[f, :, : n - f - 1]),
            np.asarray(B[f, :, f + 1:]))
        assert float(abs(Bup[f, :, n - f - 1:]).max()) == 0.0

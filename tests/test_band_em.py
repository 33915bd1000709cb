"""Entry-major BCR band preconditioner (ops/band_em.py) vs the AoS oracle
(ops/band.py): same algorithm, different layout — results must agree to
floating-point reordering."""

import numpy as np
import jax.numpy as jnp
import pytest

from solve_keyframe_pose_graph_tpu.ops import band as band_ops
from solve_keyframe_pose_graph_tpu.ops import band_em
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops


G = 5  # fanout / nodes per super-node


def _random_band(nc=37, seed=0, dtype=np.float64):
    """Random diag-dominant band system in BOTH layouts."""
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(nc, 6, 6))
    D = D @ np.swapaxes(D, -1, -2) + 8.0 * np.eye(6)    # SPD, dominant
    B = 0.1 * rng.normal(size=(G, nc, 6, 6))
    for f in range(G):
        B[f, : f + 1] = 0.0                             # no u-f below 0
    Dt = jnp.asarray(np.moveaxis(D, 0, -1).reshape(36, nc), dtype)
    Bt = jnp.asarray(np.moveaxis(B, 1, -1).reshape(G, 36, nc), dtype)
    return (jnp.asarray(D, dtype), jnp.asarray(B, dtype)), (Dt, Bt)


def _perm():
    """super-node entry permutation: AoS p = 6r+i  ->  EM p = i*G+r."""
    p = np.zeros(6 * G, np.int32)
    for r in range(G):
        for i in range(6):
            p[6 * r + i] = i * G + r
    return p


def test_build_matches_aos():
    (D, B), (Dt, Bt) = _random_band()
    A0, C0, npad0 = band_ops.build_band_system(D, B, group=G)
    A1, C1, npad1 = band_em.build_band_system_em(Dt, Bt, group=G)
    assert npad0 == npad1
    P = _perm()
    A1aos = np.moveaxis(np.array(A1), -1, 0)[:, P][:, :, P]
    C1aos = np.moveaxis(np.array(C1), -1, 0)[:, P][:, :, P]
    np.testing.assert_allclose(A1aos, np.array(A0), atol=1e-12)
    np.testing.assert_allclose(C1aos, np.array(C0), atol=1e-12)


def test_gj_inv_em():
    rng = np.random.default_rng(3)
    m, d = 7, 12
    A = rng.normal(size=(m, d, d))
    A = A @ np.swapaxes(A, -1, -2) + 5.0 * np.eye(d)
    Aem = jnp.asarray(np.moveaxis(A, 0, -1))
    inv = np.moveaxis(np.array(band_em.gj_inv_em(Aem)), -1, 0)
    np.testing.assert_allclose(inv, np.linalg.inv(A), atol=1e-9)


@pytest.mark.parametrize("levels", [None, 2])
def test_precond_apply_matches_aos(levels):
    (D, B), (Dt, Bt) = _random_band(nc=53, seed=5)
    A0, C0, _ = band_ops.build_band_system(D, B, group=G)
    fac0 = band_ops.bcr_factorize(A0, C0, group=G, max_levels=levels)
    A1, C1, _ = band_em.build_band_system_em(Dt, Bt, group=G)
    fac1 = band_em.bcr_factorize_em(A1, C1, max_levels=levels)

    r = jnp.asarray(np.random.default_rng(7).normal(size=(6, 53)))
    x0 = band_ops.band_precond_apply(fac0, r.T).T
    x1 = band_em.band_precond_apply_em(fac1, r)
    np.testing.assert_allclose(np.array(x1), np.array(x0), atol=1e-9)


def test_build_emb_matches_aos():
    """The emb build (entry-major gathers, AoS-ordered static index maps,
    one transpose) must reproduce band.build_band_system EXACTLY — it is
    the same numbers moved differently."""
    (D, B), (Dt, Bt) = _random_band(nc=41, seed=3)
    A0, C0, npad0 = band_ops.build_band_system(D, B, group=G)
    A1, C1, npad1 = band_em.build_band_system_emb(Dt, Bt, group=G)
    assert npad0 == npad1
    np.testing.assert_allclose(np.array(A1), np.array(A0), atol=0)
    np.testing.assert_allclose(np.array(C1), np.array(C0), atol=0)


@pytest.mark.parametrize("impl", ["em", "emb"])
def test_lm_solve_band_impl_parity(impl):
    """Whole-solve agreement: band_impl is a pure layout choice."""
    from solve_keyframe_pose_graph_tpu.ops.lm import lm_solve
    from tests.test_lm_solver import build_circle_problem

    _, prob = build_circle_problem(n=200, n_loops=30)
    kw = dict(max_iterations=8, preconditioner="band+coarse",
              coarse_group=16)
    r0 = lm_solve(prob, band_impl="aos", **kw)
    r1 = lm_solve(prob, band_impl=impl, **kw)
    np.testing.assert_allclose(float(r1.final_cost), float(r0.final_cost),
                               rtol=1e-8)
    np.testing.assert_allclose(np.array(r1.t), np.array(r0.t), atol=1e-6)


def test_lm_solve_emb16_bf16_factor():
    """band_impl="emb16" (entry-major build, bf16-STORED BCR factor): a
    preconditioner-only perturbation — same optimum as "emb", the factor
    cast only changes the CG trajectory (ops/lm.py band_impl docs)."""
    from solve_keyframe_pose_graph_tpu.ops.lm import lm_solve
    from tests.test_lm_solver import build_circle_problem

    _, prob = build_circle_problem(n=200, n_loops=30)
    kw = dict(max_iterations=8, preconditioner="band+coarse",
              coarse_group=16)
    r0 = lm_solve(prob, band_impl="emb", **kw)
    r1 = lm_solve(prob, band_impl="emb16", **kw)
    np.testing.assert_allclose(float(r1.final_cost), float(r0.final_cost),
                               rtol=5e-3, atol=1e-8)

"""Band preconditioner (cyclic reduction) correctness vs dense solve."""

import numpy as np
import jax.numpy as jnp

from solve_keyframe_pose_graph_tpu.ops import band


def _random_spd_tridiag(rng, m, d, dtype=np.float64):
    """Random SPD block-tridiagonal (A diag blocks, C sub-diag blocks)."""
    C = rng.normal(size=(m, d, d)) * 0.3
    C[0] = 0.0
    A = np.zeros((m, d, d))
    for i in range(m):
        A[i] = np.eye(d) * (d * 2.0)
        A[i] += rng.normal(size=(d, d)) * 0.1
        A[i] = 0.5 * (A[i] + A[i].T)
    return A.astype(dtype), C.astype(dtype)


def _dense_from_tridiag(A, C):
    m, d, _ = A.shape
    H = np.zeros((m * d, m * d))
    for i in range(m):
        H[i * d:(i + 1) * d, i * d:(i + 1) * d] = A[i]
        if i > 0:
            H[i * d:(i + 1) * d, (i - 1) * d:i * d] = C[i]
            H[(i - 1) * d:i * d, i * d:(i + 1) * d] = C[i].T
    return H


def test_bcr_solves_block_tridiagonal_exactly(rng):
    for m in (2, 4, 8, 16):
        d = 12
        A, C = _random_spd_tridiag(rng, m, d)
        H = _dense_from_tridiag(A, C)
        b = rng.normal(size=(m, d))

        fac = band.bcr_factorize(jnp.asarray(A), jnp.asarray(C), group=2)
        x = np.array(band.bcr_solve(fac, jnp.asarray(b)))
        x_dense = np.linalg.solve(H, b.reshape(-1)).reshape(m, d)
        np.testing.assert_allclose(x, x_dense, rtol=1e-9, atol=1e-9)


def test_band_system_matches_gn_hessian(rng):
    """build_band_system must reproduce exactly the banded part of the
    scaled+damped GN Hessian: check against a dense reconstruction from the
    assembled blocks on a small problem."""
    from tests.test_lm_solver import build_circle_problem
    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops

    g_, prob = build_circle_problem(n=40, n_loops=5, seed=5)
    blocks = gn_ops.assemble(prob, prob.q, prob.t, prob.switch)
    Nc = prob.n_cap
    F = prob.fanout

    diag_n = np.array(jnp.diagonal(blocks.D, axis1=-2, axis2=-1))
    scale_n = 1.0 / (1.0 + np.sqrt(np.maximum(diag_n, 0)))
    lm_n = np.ones_like(diag_n) * 0.01

    # pre-scale/damp the blocks (the ReducedSystem path does this)
    D = np.array(blocks.D)
    B = np.array(blocks.B)
    Dh = D * scale_n[:, :, None] * scale_n[:, None, :]
    Dh = Dh + np.eye(6)[None] * lm_n[:, None, :]
    Bh = np.zeros_like(B)
    for f in range(1, F + 1):
        s2 = np.zeros_like(scale_n)
        s2[f:] = scale_n[:-f]
        Bh[f - 1] = B[f - 1] * scale_n[:, :, None] * s2[:, None, :]

    A, C, n_pad = band.build_band_system(
        jnp.asarray(Dh), jnp.asarray(Bh), group=F
    )
    A, C = np.array(A), np.array(C)

    # dense banded reference
    Hd = np.zeros((n_pad * 6, n_pad * 6))
    for u in range(Nc):
        Hd[u * 6:(u + 1) * 6, u * 6:(u + 1) * 6] = Dh[u]
    for u in range(n_pad - Nc):
        i = (Nc + u) * 6
        Hd[i:i + 6, i:i + 6] = np.eye(6)
    for f in range(1, F + 1):
        for u in range(f, Nc):
            Hd[u * 6:(u + 1) * 6, (u - f) * 6:(u - f + 1) * 6] += Bh[f - 1, u]
            Hd[(u - f) * 6:(u - f + 1) * 6, u * 6:(u + 1) * 6] += Bh[f - 1, u].T

    Hb = _dense_from_tridiag(A, C)
    np.testing.assert_allclose(Hb, Hd, rtol=1e-10, atol=1e-10)


def test_band_preconditioner_speeds_up_cg():
    """With the band factored exactly, CG work is bounded by the rank of the
    loop-closure correction, not the chain conditioning. On a loop-sparse
    graph that bound is small, so band-PCG must converge tightly in few
    iterations while block-Jacobi grinds against the chain."""
    from tests.test_lm_solver import build_circle_problem
    from solve_keyframe_pose_graph_tpu.ops.lm import lm_solve

    g_, prob = build_circle_problem(n=300, n_loops=5, seed=3)
    r_jac = lm_solve(prob, max_iterations=10, preconditioner="jacobi",
                     max_cg_iterations=500, cg_q_tolerance=0.0)
    r_band = lm_solve(prob, max_iterations=10, preconditioner="band",
                      max_cg_iterations=500, cg_q_tolerance=0.0)
    # both reach comparable chi^2 ...
    assert float(r_band.final_cost) <= 1.05 * float(r_jac.final_cost) + 1e-9
    # ... but the band preconditioner needs far fewer CG iterations
    # (bounded ~ by 12-13 x n_loops + band roundoff, vs chain-limited)
    assert int(r_band.total_cg_iterations) < 0.5 * int(r_jac.total_cg_iterations)

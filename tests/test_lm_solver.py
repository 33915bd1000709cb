"""End-to-end LM solver tests on synthetic graphs (fp64, CPU).

Exercises BASELINE.md configs 1 (plain odometry+loops) and 2 (switchable
constraints with outliers): cost must collapse, trajectory must snap back to
ground truth, and switch variables must shut off outlier edges."""

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.ops.lm import lm_solve
from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np


def build_circle_problem(n=300, n_loops=40, outlier_fraction=0.0, seed=3,
                         dtype=np.float64):
    g = synthetic.circle_graph(
        n_nodes=n, n_loops=n_loops, outlier_fraction=outlier_fraction, seed=seed
    )
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t,            # initial guess = drifted VIO
        vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(n, bool),
        loop_pairs=g.loop_pairs,
        loop_q=g.loop_q, loop_t=g.loop_t, loop_w=g.loop_w,
        loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]),
        prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([2.0]),
        n_cap=512, e_cap=64, p_cap=4,
        dtype=dtype,
    )
    return g, prob


def test_lm_reduces_cost_and_recovers_trajectory():
    g, prob = build_circle_problem(outlier_fraction=0.0)
    res = lm_solve(prob, max_iterations=15)

    assert float(res.final_cost) < 0.05 * float(res.initial_cost)
    assert int(res.successful_steps) >= 1

    n = g.n_nodes
    ate_before = synthetic.ate_rmse(g.vio_q, g.vio_t, g.gt_q, g.gt_t)
    q_est = np.array(res.q[:n])
    t_est = np.array(res.t[:n])
    ate_after = synthetic.ate_rmse(q_est, t_est, g.gt_q, g.gt_t)
    # drifted input should be visibly off; solution should be much closer
    assert ate_after < 0.5 * ate_before
    assert ate_after < 0.5  # meters, on a radius-20 circle


def test_switch_variables_reject_outliers():
    g, prob = build_circle_problem(outlier_fraction=0.3, seed=7)
    res = lm_solve(prob, max_iterations=25)

    sw = np.array(res.switch[: g.n_loops])
    out = g.loop_is_outlier
    assert out.any() and (~out).any()
    # outlier switches must collapse; inliers stay near 1
    assert sw[out].mean() < 0.35
    assert sw[~out].mean() > 0.8

    # and the trajectory still improves despite 30% outliers. The bound is
    # deliberately loose: chi^2 (the parity metric) is near-flat along
    # weakly-observed directions, so the exact trajectory inside that flat
    # valley depends on inner linear-solve accuracy — tight solves give
    # ~0.7 m here, the Q-rule forcing sequence ~1.6 m, at the SAME chi^2.
    n = g.n_nodes
    ate_before = synthetic.ate_rmse(g.vio_q, g.vio_t, g.gt_q, g.gt_t)
    ate_after = synthetic.ate_rmse(
        np.array(res.q[:n]), np.array(res.t[:n]), g.gt_q, g.gt_t
    )
    assert ate_after < ate_before


def test_masked_padding_untouched():
    g, prob = build_circle_problem()
    res = lm_solve(prob, max_iterations=5)
    n = g.n_nodes
    # padded nodes keep identity quaternion / zero translation
    np.testing.assert_allclose(np.array(res.q[n:, 3]), 1.0, atol=0)
    np.testing.assert_allclose(np.array(res.q[n:, :3]), 0.0, atol=0)
    np.testing.assert_allclose(np.array(res.t[n:]), 0.0, atol=0)
    # padded switches keep their init
    np.testing.assert_allclose(np.array(res.switch[g.n_loops:]), 0.99, atol=0)


def test_float32_solve_close_to_float64():
    g, prob64 = build_circle_problem(seed=11)
    _, prob32 = build_circle_problem(seed=11, dtype=np.float32)
    r64 = lm_solve(prob64, max_iterations=10)
    r32 = lm_solve(prob32, max_iterations=10)
    c64, c32 = float(r64.final_cost), float(r32.final_cost)
    # fp32 device path should land within a few percent of the fp64 chi^2
    assert c32 < 1.10 * c64 + 1e-3


def test_assemble_direct_matches_ref():
    """Direct (block-product + gather) assembly == reference (jacobian
    einsum + scatter) assembly, fp64."""
    import jax.numpy as jnp

    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    g = synthetic.circle_graph(n_nodes=150, n_loops=30, seed=9)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w,
        loop_valid=np.arange(g.n_loops) % 7 != 0,   # some masked edges
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=192, e_cap=48, p_cap=4, dtype=np.float64,
    )
    a = gn_ops.assemble(prob, prob.q, prob.t, prob.switch)
    b = gn_ops.assemble_ref(prob, prob.q, prob.t, prob.switch)
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-12)
    for name in ("D", "B", "Aba", "cb", "ca", "ds", "g_n", "g_s"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=1e-10, err_msg=name)


def test_block_gj_inv_matches_numpy(rng):
    import jax.numpy as jnp

    from solve_keyframe_pose_graph_tpu.ops.smallinv import (
        block_gj_inv, gauss_jordan_inv,
    )

    G = rng.normal(size=(8, 30, 30))
    A = jnp.asarray(np.einsum("mij,mkj->mik", G, G) + 10.0 * np.eye(30))
    X0 = np.linalg.inv(np.asarray(A))
    np.testing.assert_allclose(np.asarray(block_gj_inv(A)), X0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gauss_jordan_inv(A, unroll=True)), X0, atol=1e-10)

def test_sorted_loop_matvec_matches_scatter():
    """The scatter-free (dest-sorted duplicated cumsum) loop matvec must
    equal the scatter-add form on random vectors."""
    import jax.numpy as jnp
    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops

    _, prob = build_circle_problem(n=120, n_loops=25, seed=13)
    blocks = gn_ops.assemble_t(prob, prob.q, prob.t, prob.switch)
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = gn_ops.schur_reduce_t(blocks, prob, scale_n, scale_s, lm_n, lm_s)

    inc = gn_ops.build_sorted_incidence(prob)
    dup = gn_ops.dup_sorted_blocks(red, inc)
    dup36 = gn_ops.dup_sorted_blocks36(red, inc)
    np.testing.assert_allclose(
        np.array(dup), np.array(jnp.moveaxis(dup36, 0, -1).reshape(-1, 6, 6)),
        rtol=0, atol=0)
    rng = np.random.default_rng(5)
    for _ in range(5):
        p = jnp.asarray(rng.normal(size=(6, prob.n_cap)))
        ref = gn_ops.loop_matvec_t(red, prob, p)
        got = gn_ops.loop_matvec_sorted(inc, dup, p)
        np.testing.assert_allclose(np.array(got), np.array(ref),
                                   rtol=1e-12, atol=1e-12)
        got36 = gn_ops.loop_matvec_sorted36(inc, dup36, p)
        np.testing.assert_allclose(np.array(got36), np.array(ref),
                                   rtol=1e-12, atol=1e-12)
        full_ref = gn_ops.reduced_matvec_t(red, prob, p)
        full_new = gn_ops.reduced_matvec_t(red, prob, p, inc=inc,
                                           blocks_dup=dup)
        np.testing.assert_allclose(np.array(full_new), np.array(full_ref),
                                   rtol=1e-12, atol=1e-12)
        full_36 = gn_ops.reduced_matvec_t(red, prob, p, inc=inc,
                                          blocks_dup=dup36)
        np.testing.assert_allclose(np.array(full_36), np.array(full_ref),
                                   rtol=1e-12, atol=1e-12)
        inc2 = gn_ops.build_sorted_incidence2(prob)
        got2 = gn_ops.loop_matvec_sorted2(inc2, red, prob, p)
        np.testing.assert_allclose(np.array(got2), np.array(ref),
                                   rtol=1e-12, atol=1e-12)

def test_tiled_loop_matvec_matches_scatter():
    """The tile-padded one-hot loop matvec (both gather modes) must equal
    the scatter-add form, and the full tiledrows solve must match sorted2.
    This is the production TPU path since round 3 (BASELINE.md): the
    one-hot contraction replaces permute+cumsum+boundary-gather, and the
    row-form consumption avoids the transpose-back that costs ~0.7 ms per
    CG iteration in-context on TPU."""
    import dataclasses

    import jax.numpy as jnp
    from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
    from solve_keyframe_pose_graph_tpu.ops import lm

    _, prob = build_circle_problem(n=120, n_loops=25, seed=13)
    blocks = gn_ops.assemble_t(prob, prob.q, prob.t, prob.switch)
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = gn_ops.schur_reduce_t(blocks, prob, scale_n, scale_s, lm_n, lm_s)

    K = gn_ops.tile_k_for(prob.loop_b, prob.loop_a, prob.n_cap,
                          loop_mask=prob.loop_mask)
    inc = gn_ops.build_tiled_incidence(prob, K)
    # every valid dup edge must land in exactly one slot
    n_valid = int(2 * np.sum(np.array(prob.loop_mask) > 0.5))
    assert int(np.sum(np.array(inc.slot_edge) < 2 * prob.e_cap)) == n_valid

    blk36 = gn_ops.tiled_blocks36(red, inc)
    blkrows = gn_ops.tiled_blocks_rows(red, inc)
    np.testing.assert_allclose(np.array(blkrows), np.array(blk36.T),
                               rtol=0, atol=0)
    rng = np.random.default_rng(5)
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(6, prob.n_cap)))
        ref = gn_ops.loop_matvec_t(red, prob, p)
        got = gn_ops.loop_matvec_tiled(inc, blk36, p)
        np.testing.assert_allclose(np.array(got), np.array(ref),
                                   rtol=1e-12, atol=1e-12)
        got_rows = gn_ops.loop_matvec_tiled_rows(inc, blkrows, p)
        np.testing.assert_allclose(np.array(got_rows), np.array(ref),
                                   rtol=1e-12, atol=1e-12)
        # rows6: j-reduction hoisted before the one-hot dot (the round-3
        # production form — 6x smaller MXU contraction, no 36->6 combine)
        got6 = gn_ops.loop_matvec_tiled_rows6(inc, blkrows, p)
        np.testing.assert_allclose(np.array(got6), np.array(ref),
                                   rtol=1e-12, atol=1e-12)
        inc_rows = dataclasses.replace(inc, gather_mode="rowsdot")
        full_ref = gn_ops.reduced_matvec_t(red, prob, p)
        full_new = gn_ops.reduced_matvec_t(red, prob, p, inc=inc_rows)
        np.testing.assert_allclose(np.array(full_new), np.array(full_ref),
                                   rtol=1e-12, atol=1e-12)

    r1 = lm.lm_solve(prob, max_iterations=6, loop_impl="sorted2")
    for impl in ("tiledrows", "tiledrows6"):
        r2 = lm.lm_solve(prob, max_iterations=6, loop_impl=impl, tile_k=K)
        assert abs(float(r1.final_cost) - float(r2.final_cost)) < 1e-10 * max(
            1.0, float(r1.final_cost)), impl
        assert int(r1.total_cg_iterations) == int(r2.total_cg_iterations)
    # band_impl="aos16" (bf16-stored BCR factor): a preconditioner-only
    # perturbation — the solve must still converge to the same optimum
    r3 = lm.lm_solve(prob, max_iterations=6, band_impl="aos16")
    np.testing.assert_allclose(float(r3.final_cost), float(r1.final_cost),
                               rtol=1e-3)


def test_four_dof_mode_end_to_end():
    """residual_mode='4dof' (the reference's yaw-weighted Euler family,
    CeresResidues.h:252-422) must drive a full LM solve: large cost
    reduction and a usable trajectory on the circle graph."""
    from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops

    g, prob = build_circle_problem(n=150, n_loops=25, seed=9)
    res = lm_ops.lm_solve(prob, max_iterations=10, residual_mode="4dof")
    assert float(res.final_cost) < 0.01 * float(res.initial_cost)
    n = g.n_nodes
    ate_before = synthetic.ate_rmse(g.vio_q, g.vio_t, g.gt_q, g.gt_t)
    q_est = np.asarray(res.q)[:n]
    t_est = np.asarray(res.t)[:n]
    ate_after = synthetic.ate_rmse(q_est, t_est, g.gt_q, g.gt_t)
    assert ate_after < 0.7 * ate_before

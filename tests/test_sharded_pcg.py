"""Explicitly-sharded PCG (ppermute halos + psum collectives) vs the
single-device reduced solve, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from solve_keyframe_pose_graph_tpu.graph import synthetic  # noqa: F401
from solve_keyframe_pose_graph_tpu.ops import gn as gn_ops
from solve_keyframe_pose_graph_tpu.ops import pcg as pcg_ops
from solve_keyframe_pose_graph_tpu.ops import band as band_ops
from solve_keyframe_pose_graph_tpu.parallel import make_mesh
from solve_keyframe_pose_graph_tpu.parallel.sharded_pcg import pcg_sharded


def _reduced_system():
    prob = ge._make_problem(n_nodes=256, n_loops=32, n_cap=256, e_cap=32)
    prob = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if x.dtype in (jnp.float64,) else x, prob)
    blocks = gn_ops.assemble_t(prob, prob.q, prob.t, prob.switch)
    diag_n = blocks.D[jnp.arange(0, 36, 7)]
    scale_n = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag_n, 0)))
    scale_s = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(blocks.ds, 0)))
    lm_n = jnp.clip(diag_n * scale_n**2, 1e-6, 1e32) / 1e4
    lm_s = jnp.clip(blocks.ds * scale_s**2, 1e-6, 1e32) / 1e4
    red = gn_ops.schur_reduce_t(blocks, prob, scale_n, scale_s, lm_n, lm_s)
    return prob, red


def test_sharded_pcg_matches_single_device():
    prob, red = _reduced_system()
    mesh = make_mesh(8)

    x_sh = pcg_sharded(
        red.Dh, red.Bh, red.Aba_h, prob.loop_b, prob.loop_a, red.rhs_n,
        mesh=mesh, max_iterations=400, r_tolerance=1e-8,
        fanout=prob.fanout)

    def mk_pc(red):
        Dh_aos = gn_ops.t_blocks_to_aos(red.Dh)
        Bh_aos = jnp.stack([gn_ops.t_blocks_to_aos(red.Bh[f])
                            for f in range(prob.fanout)])
        A_band, C_band, _ = band_ops.build_band_system(
            Dh_aos, Bh_aos, group=prob.fanout)
        fac = band_ops.bcr_factorize(A_band, C_band, group=prob.fanout)
        return lambda r: band_ops.band_precond_apply(fac, r.T).T

    sol = pcg_ops.pcg_nodes(
        lambda p: gn_ops.reduced_matvec_t(red, prob, p), mk_pc(red),
        red.rhs_n, max_iterations=400, r_tolerance=1e-8, q_tolerance=0.0)

    # the decisive check: the sharded solution satisfies the SAME system
    resid = gn_ops.reduced_matvec_t(red, prob, x_sh) - red.rhs_n
    rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(red.rhs_n))
    assert rel < 1e-4, rel

    # and agrees with the single-device solution up to the fp32 accuracy of
    # two independently-rounded CG runs (weakly-determined components can
    # differ at ~1e-3 absolute)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(sol.x),
                               atol=5e-3)


def test_sharded_pcg_with_coarse_level():
    """The explicitly-collective two-level preconditioner (per-shard band
    BCR + replicated coarse inverse with a psum-assembled coarse residual)
    must solve the same system, in no more iterations than band-only
    asks of the residual rule."""
    prob, red = _reduced_system()
    mesh = make_mesh(8)

    x_sh = pcg_sharded(
        red.Dh, red.Bh, red.Aba_h, prob.loop_b, prob.loop_a, red.rhs_n,
        mesh=mesh, max_iterations=400, r_tolerance=1e-8,
        fanout=prob.fanout, coarse_group=8, free_mask=prob.free_mask)

    resid = gn_ops.reduced_matvec_t(red, prob, x_sh) - red.rhs_n
    rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(red.rhs_n))
    assert rel < 1e-4, rel

"""Adaptive-precision escalation ladder (reference capability: fp64 Ceres
end-to-end never yields a chaotic outcome, /root/reference/src/
PoseGraphSLAM.cpp:1270, CeresResidues.h:19-222 templated on double).

The ladder (ops/lm.lm_solve_adaptive): fp32 solve first; if it rejects
>= escalate_rejects LM steps, re-solve with precision="mixed" (fp64
assembly/cost + fp32 linear algebra); if mixed still rejects, full fp64.
These tests exercise the machinery on CPU with a well-conditioned graph
(forced escalation via escalate_rejects=0) — the quality outcome on the
actually fp32-hostile manhattan class is measured on hardware in
benchmarks/exp_precision.py -> benchmarks/precision.json.
"""

import jax.numpy as jnp
import numpy as np

from solve_keyframe_pose_graph_tpu.ops.lm import (
    lm_solve,
    lm_solve_adaptive,
    mixed_resolve,
)
from solve_keyframe_pose_graph_tpu.solver.problem import problem_astype
from tests.test_lm_solver import build_circle_problem


def test_problem_astype_casts_float_leaves_only():
    _, prob = build_circle_problem(n=60, n_loops=8, dtype=np.float32)
    p64 = problem_astype(prob, jnp.float64)
    assert p64.q.dtype == jnp.float64
    assert p64.t.dtype == jnp.float64
    assert p64.switch.dtype == jnp.float64
    assert p64.loop_a.dtype == jnp.int32          # int leaves untouched
    assert p64.loop_b.dtype == jnp.int32
    np.testing.assert_allclose(np.array(p64.t), np.array(prob.t), rtol=1e-6)


def test_healthy_fp32_solve_does_not_escalate():
    """A converged healthy solve may benignly reject trailing steps at its
    fp32 noise floor; those must NOT count as distress (the escalation is a
    ~50x-cost fp64 re-solve). Run well past convergence so noise-floor
    rejections actually occur, then assert distress stayed 0 at the DEFAULT
    threshold."""
    _, prob = build_circle_problem(n=120, n_loops=16, dtype=np.float32)
    res, rung = lm_solve_adaptive(prob, escalate_rejects=2,
                                  max_iterations=14)
    rejected = int(res.iterations) - int(res.successful_steps)
    assert int(res.distress_rejects) == 0, (rejected, int(res.distress_rejects))
    assert rung is False
    assert res.q.dtype == jnp.float32


def test_forced_escalation_climbs_to_fp64_and_matches_direct_fp64():
    """escalate_rejects=0 always 'distresses': the ladder must climb mixed ->
    fp64 and the escalated result must match a direct fp64 solve exactly
    (same program, same inputs)."""
    _, prob = build_circle_problem(n=120, n_loops=16, dtype=np.float32)
    # pin the DEVICE ladder (fp64_backend="tpu"): the product default routes
    # the full rung to the native CPU LDL^T (tests/test_cpu_rung.py)
    res, rung = lm_solve_adaptive(prob, escalate_rejects=0, max_iterations=8,
                                  fp64_backend="tpu")
    assert rung == "fp64"
    assert res.q.dtype == jnp.float64

    # the fp64 rung solves its linear systems NEAR-EXACTLY (tight forcing
    # 1e-5, cap 100 — lm.fp64_resolve) so the escalated trajectory tracks
    # the exact-step reference; the direct solve must mirror that to be
    # the same program
    res64 = lm_solve(problem_astype(prob, jnp.float64), max_iterations=8,
                     matvec_impl="xla", cg_tolerance=1e-5,
                     max_cg_iterations=100)
    np.testing.assert_allclose(
        float(res.final_cost), float(res64.final_cost), rtol=1e-12)


def test_mixed_precision_matches_native_on_healthy_graph():
    """precision="mixed" (fp64 assembly + parameter state, fp32 reduced
    system/CG) on a well-conditioned graph must land the same optimum as the
    native fp32 solve — it only changes WHERE rounding happens, and here
    neither rounding matters."""
    _, prob = build_circle_problem(n=120, n_loops=16, dtype=np.float32)
    res32 = lm_solve(prob, max_iterations=10)
    resm = mixed_resolve(prob, dict(max_iterations=10))
    # parameter state is carried in fp64
    assert resm.q.dtype == jnp.float64
    assert float(resm.final_cost) <= 1.02 * float(res32.final_cost) + 1e-9
    # and the costs agree to fp32-level accuracy
    np.testing.assert_allclose(
        float(resm.final_cost), float(res32.final_cost), rtol=5e-3)


def test_consistent_graph_with_midcourse_rejections_does_not_escalate():
    """A perfectly-consistent graph (optimum chi^2 ~ 0, e.g. the engine's
    warmup dummy) rejects a couple of mid-descent steps — normal trust-
    region dynamics that an exact fp64 solver reproduces — while converging
    to the noise floor. That must NOT read as fp32 distress: healthy
    solves show <= 2 overshoot rejections vs the distressed 5-7, and
    lm.needs_escalation additionally gates on non-convergence."""
    import numpy as np
    from solve_keyframe_pose_graph_tpu.graph import synthetic
    from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

    g = synthetic.circle_graph(n_nodes=64, n_loops=8, seed=0)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]), n_cap=256, e_cap=256, p_cap=16,
        dtype=np.float32)
    res, rung = lm_solve_adaptive(prob, max_iterations=10,
                                  preconditioner="band+coarse",
                                  coarse_group=64, bcr_levels=2,
                                  max_cg_iterations=45)
    assert rung is False
    assert res.q.dtype == jnp.float32
    assert float(res.final_cost) < 1e-9

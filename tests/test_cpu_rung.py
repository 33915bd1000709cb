"""Native-CPU fp64 insurance rung (solver/cpu_rung.py).

The rung replaces the TPU-emulated fp64 re-solve with an exact-step
hardware-fp64 LM (framework assembly + native block LDL^T) — the
reference's own processor for fp64 solves (Ceres SPARSE_NORMAL_CHOLESKY on
CPU, /root/reference/src/PoseGraphSLAM.cpp:1270)."""

import numpy as np
import pytest

from solve_keyframe_pose_graph_tpu.graph import synthetic
from solve_keyframe_pose_graph_tpu.ops import lm as lm_ops
from solve_keyframe_pose_graph_tpu.solver import cpu_rung
from solve_keyframe_pose_graph_tpu.solver.problem import build_problem_np

LM_KW = dict(max_iterations=10, preconditioner="band+coarse",
             coarse_group=16, loop_impl="sorted2")


def _problem(n=96, loops=12, n_cap=None, e_cap=None, dtype=np.float64):
    g = synthetic.circle_graph(n_nodes=n, n_loops=loops, seed=3)
    return build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=n_cap or n, e_cap=e_cap or loops, p_cap=4, dtype=dtype,
    )


@pytest.fixture(scope="module")
def rung_ready():
    if not cpu_rung.available():
        pytest.skip("native CPU rung unavailable (libkpg_ldl/scipy)")


def test_available_gates_residual_family(rung_ready):
    assert cpu_rung.available(dict(residual_mode="6dof", use_switch=True))
    assert not cpu_rung.available(dict(residual_mode="4dof"))
    assert not cpu_rung.available(dict(use_switch=False))


def test_native_matches_near_exact_lm_solve(rung_ready):
    """Exact-step host LM tracks lm_solve-with-near-exact-CG: identical
    trust-region semantics + exact steps => same trajectory class. Both
    must converge to the same chi^2 on a well-conditioned graph."""
    prob = _problem(dtype=np.float64)
    kw = dict(LM_KW, cg_tolerance=1e-12, max_cg_iterations=400)
    ref = lm_ops.lm_solve(prob, **kw)
    res = cpu_rung.lm_solve_native(prob, kw)
    assert float(res.initial_cost) == pytest.approx(
        float(ref.initial_cost), rel=1e-9)
    assert float(res.final_cost) == pytest.approx(
        float(ref.final_cost), rel=1e-4)
    assert res.q.shape == prob.q.shape
    assert float(res.final_cost) < float(res.initial_cost)


def test_escalate_resolve_routes_to_cpu_and_pads_back(rung_ready):
    """fp64_backend='cpu' routes the full rung to the native solver;
    the result is padded back to the caller's (oversized) capacities."""
    prob = _problem(n=80, loops=10, n_cap=2048, e_cap=256,
                    dtype=np.float32)
    kw = dict(LM_KW, cg_tolerance=1e-2, max_cg_iterations=45)
    res, rung = lm_ops.escalate_resolve(prob, kw, 0, fp64_backend="cpu")
    assert rung == "fp64-cpu"
    assert res.q.shape == (2048, 4)
    assert res.switch.shape == (256,)
    assert float(res.final_cost) < float(res.initial_cost)
    # the repacked live range was solved; the padding kept its input values
    np.testing.assert_allclose(np.asarray(res.q)[1500:],
                               np.asarray(prob.q)[1500:], atol=0)


def test_auto_policy_prefers_cpu(rung_ready):
    prob = _problem(n=64, loops=8, dtype=np.float32)
    kw = dict(LM_KW, cg_tolerance=1e-2, max_cg_iterations=45)
    _, rung = lm_ops.escalate_resolve(prob, kw, 0, fp64_backend="auto")
    assert rung == "fp64-cpu"
    # non-6dof families fall back to the TPU (emulated) rung under auto
    kw4 = dict(kw, residual_mode="4dof", use_switch=False)
    _, rung4 = lm_ops.escalate_resolve(prob, kw4, 0, fp64_backend="auto")
    assert rung4 == "fp64"


def test_warm_precompiles_and_repack_uses_pow2_buckets(rung_ready):
    """cpu_rung.warm pre-traces the rung at a power-of-two bucket; a
    subsequent escalation from live lengths inside that bucket repacks to
    EXACTLY those capacities (pow2, not 1024-granular), so the warmed
    executables are the ones dispatched (engine._cpu_rung_warm)."""
    assert cpu_rung.warm(1024, 256, fanout=5, p_cap=4)
    # live (300, 40) inside caps (2048, 256) -> pow2 repack to the engine
    # bucket floor (1024, 256)
    g = synthetic.circle_graph(n_nodes=300, n_loops=40, seed=5)
    prob = build_problem_np(
        q=g.vio_q, t=g.vio_t, vio_q=g.vio_q, vio_t=g.vio_t,
        node_valid=np.ones(g.n_nodes, bool),
        loop_pairs=g.loop_pairs, loop_q=g.loop_q, loop_t=g.loop_t,
        loop_w=g.loop_w, loop_valid=np.ones(g.n_loops, bool),
        switch=np.full(g.n_loops, 0.99),
        prior_idx=np.array([0]), prior_q=g.vio_q[:1], prior_t=g.vio_t[:1],
        prior_w=np.array([1.1]),
        n_cap=2048, e_cap=256, p_cap=4, fanout=5, dtype=np.float32)
    res = cpu_rung.cpu_fp64_resolve(prob, dict(LM_KW, max_iterations=4))
    assert cpu_rung._LAST_STATS["n_cap"] == 1024
    assert cpu_rung._LAST_STATS["e_cap"] == 256
    assert res.q.shape == (2048, 4)
    assert float(res.final_cost) < float(res.initial_cost)


def test_engine_cpu_rung_warm_covers_warmup_pairs(rung_ready, monkeypatch):
    """engine.warmup kicks off the best-effort cpu-rung warm thread over
    the same bucket staircase as the device programs."""
    from solve_keyframe_pose_graph_tpu.config import Config
    from solve_keyframe_pose_graph_tpu.graph.store import GraphStore
    from solve_keyframe_pose_graph_tpu.solver.engine import SolverEngine

    warmed = []
    monkeypatch.setattr(cpu_rung, "warm",
                        lambda n, e, fanout=1, p_cap=16:
                        warmed.append((n, e)) or True)
    eng = SolverEngine(GraphStore(), Config())
    eng.warmup(600, 80)
    t = getattr(eng, "_cpu_rung_warm_thread", None)
    assert t is not None
    t.join(timeout=60)
    assert warmed, "cpu-rung warm thread ran no buckets"
    assert (1024, 256) in warmed     # the final bucket pair
    assert warmed == sorted(warmed)  # smallest-first
